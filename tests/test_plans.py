"""Plan-shape pins: the properties that make queries scale, asserted on the
physical plan so they can't silently regress (SURVEY.md §4)."""

from __future__ import annotations

from kinesis_test_spark import plans, registry

registry.load_all()


def q(name, spark, sf_dir):
    return registry.QUERIES[name](spark, sf_dir)


def test_scan_prunes_columns(spark, sf_dir):
    """Projection must reach the parquet reader — 3 of 11 columns read."""
    rs = plans.read_schema(q("q_scan_prune", spark, sf_dir))
    assert "l_orderkey" in rs and "l_extendedprice" in rs
    assert "l_comment" not in rs and "l_quantity" not in rs


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    pf = plans.pushed_filters(q("q_filter_range", spark, sf_dir))
    assert "l_shipdate" in pf and "l_quantity" in pf


def test_dim_joins_broadcast(spark, sf_dir):
    """lineitem ⋈ supplier ⋈ nation ⋈ region: every dim side broadcast —
    the fact table must never shuffle for dim joins."""
    plan = plans.formatted(q("q_join_broadcast", spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # formatted lists tree + details
    assert "SortMergeJoin" not in plan


def test_topk_uses_heap_not_global_sort(spark, sf_dir):
    assert not plans.has(q("q_sort_limit", spark, sf_dir), "TakeOrderedAndProject")


def test_window_topk_group_limit(spark, sf_dir):
    """rn <= k must push into the window sort (WindowGroupLimit)."""
    assert not plans.has(q("q_topk_per_group", spark, sf_dir), "WindowGroupLimit")


def test_agg_is_partial_final(spark, sf_dir):
    """Q1-shape agg: map-side combine before the shuffle."""
    plan = plans.formatted(q("q_agg_group", spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_semi_join_broadcast_no_shuffle_of_fact(spark, sf_dir):
    plan = plans.formatted(q("q_join_semi", spark, sf_dir))
    assert "LeftSemi" in plan


def test_sim_search_broadcasts_query_vector(spark, sf_dir):
    plan = plans.formatted(q("q_sim_search", spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert not plans.has(q("q_sim_search", spark, sf_dir), "TakeOrderedAndProject")


def test_asof_join_pushes_group_limit(spark, sf_dir):
    """rn=1 compiles to WindowGroupLimit on both sides of the exchange —
    the as-of join never fully sorts a key's matches."""
    plan = plans.formatted(q("q_join_asof", spark, sf_dir))
    assert plan.count("WindowGroupLimit") >= 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_sessionize_single_exchange(spark, sf_dir):
    """lag-window, cumsum-window and the final agg all ride ONE shuffle on
    user_id (grouping keys are a superset of the window partitioning)."""
    tree = plans.formatted(q("q_sessionize", spark, sf_dir)).split("\n\n")[0]
    assert tree.count("Exchange") == 1


def test_join_hints_are_honored(spark, sf_dir):
    """SHUFFLE_HASH and MERGE hints override Catalyst's default choice —
    the escape hatch when statistics mislead the planner at scale."""
    from kinesis_test_spark.sources import views

    views(spark, sf_dir)
    sh = spark.sql(
        "SELECT /*+ SHUFFLE_HASH(c) */ o_orderkey, c_name "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    )
    assert "ShuffledHashJoin" in plans.formatted(sh)
    mj = spark.sql(
        "SELECT /*+ MERGE(c) */ o_orderkey, c_name "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    )
    assert "SortMergeJoin" in plans.formatted(mj)


def test_cached_table_scans_from_memory(spark, sf_dir):
    """df.cache() materializes the columnar in-memory format; downstream
    plans must scan InMemoryTableScan, not parquet."""
    df = q("q_scan_prune", spark, sf_dir).cache()
    try:
        df.count()  # materialize
        plan = plans.formatted(df.filter("l_extendedprice > 0"))
        assert "InMemoryTableScan" in plan
    finally:
        df.unpersist()


def test_ann_batch_broadcasts_queries_once(spark, sf_dir):
    """Batch ANN: the query batch must be the broadcast side (one corpus
    scan serves all queries) and the per-query top-k must push into the
    window sort."""
    plan = plans.formatted(q("q_ann_batch", spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_emb_centroid_partial_final_agg(spark, sf_dir):
    """Centroid means: map-side combine before the (label, dim) shuffle."""
    plan = plans.formatted(q("q_emb_centroid", spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_q18_semi_probe_is_broadcast(spark, sf_dir):
    """Q18: the HAVING-filtered aggregate must reach orders as a broadcast
    LEFT SEMI probe, not a shuffled join."""
    plan = plans.formatted(q("q_tpch_q18", spark, sf_dir))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_nearest_join_uses_window_group_limit(spark, sf_dir):
    """Bounded nearest-event join: the per-purchase argmin must push into
    the window sort (WindowGroupLimit), and candidates must come from an
    equi-join (no BroadcastNestedLoopJoin over the band predicate)."""
    plan = plans.formatted(q("q_join_nearest", spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_codebook_is_broadcast(spark, sf_dir):
    """Product quantization: the (m, code) codebook side must broadcast —
    the corpus never shuffles for the assignment."""
    plan = plans.formatted(q("q_emb_pq", spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q1_is_scan_plus_single_agg(spark, sf_dir):
    """Q1: shipdate predicate on the scan, partial+final agg, NO join —
    the bandwidth-bound shape that survives 100 TB."""
    df = q("q_tpch_q1", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    assert "l_shipdate" in plans.pushed_filters(df)


def test_tpch_q4_semi_join_date_pruned(spark, sf_dir):
    """Q4: date window pushed to the orders scan; EXISTS runs as a semi
    join (never a full join + distinct)."""
    df = q("q_tpch_q4", spark, sf_dir)
    plan = plans.formatted(df)
    assert "LeftSemi" in plan
    assert "o_orderdate" in plans.pushed_filters(df)


def test_tpch_q10_broadcast_dims_heap_topk(spark, sf_dir):
    """Q10: customer/nation never shuffle the fact side; top-20 is a heap
    (TakeOrderedAndProject), not a global sort."""
    df = q("q_tpch_q10", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert not plans.has(df, "TakeOrderedAndProject")


def test_tpch_q14_broadcast_part_single_row_agg(spark, sf_dir):
    """Q14: part is the broadcast side; the date-pruned fact scan feeds one
    partial+final aggregate collapsing to a single row."""
    df = q("q_tpch_q14", spark, sf_dir)
    plan = plans.formatted(df)
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "l_shipdate" in plans.pushed_filters(df)


def test_semantic_dedup_pairs_only_inside_cells(spark, sf_dir):
    """SemDeDup: the coarse codebook broadcasts for assignment (the only
    nested-loop allowed — 8 centroids), and the candidate pair relation
    is an EQUI-join on (cell id, keepability-rank block) — never a
    cartesian over the corpus, and never a cid-only join that would still
    execute |cell|² inside a hot cell (r11 VERDICT #1: pair space
    Σ|cell|·SEM_CELL_CAP; linearity pinned with an exact count in
    tests/test_dedup_semantic.py). The assignment subtree is checkpointed
    inside the operator (it fans out to three joins), so its broadcast
    shape is pinned on the shared _sem_assigned relation."""
    from kinesis_test_spark.operators.dedup import _sem_assigned

    assign_plan = plans.formatted(_sem_assigned(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in assign_plan  # 8-row codebook bcast
    df = q("q_dedup_semantic", spark, sf_dir)
    plan = plans.formatted(df)
    assert "CartesianProduct" not in plan
    # pair join: hash/merge equi-join keyed on (cell, rank block)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "probe_blk" in plan and "blk_a" in plan


def test_tpch_q7_broadcast_everything_but_fact(spark, sf_dir):
    """Q7: nation-pair filter keeps all dims broadcast; no cartesian."""
    df = q("q_tpch_q7", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_tpch_q8_single_fact_shuffle(spark, sf_dir):
    """Q8: seven-way join with every dimension broadcast — at most the
    orders join shuffles the fact side."""
    df = q("q_tpch_q8", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


def test_tpch_q15_single_fact_scan(spark, sf_dir):
    """Q15: the global-max filter must NOT recompute the revenue aggregate
    — exactly one lineitem scan plus one supplier scan (formatted lists
    each scan twice: tree + details)."""
    df = q("q_tpch_q15", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("Scan parquet") <= 4  # 2 scans × (tree + details)


def test_tpch_q22_anti_join_broadcast_threshold(spark, sf_dir):
    """Q22: the balance threshold arrives as a broadcast, the no-recent-
    orders test is an anti join, and the orders date filter is pushed."""
    df = q("q_tpch_q22", spark, sf_dir)
    plan = plans.formatted(df)
    assert "LeftAnti" in plan
    assert "o_orderdate" in plans.pushed_filters(df)


def test_tpch_q9_broadcast_dims(spark, sf_dir):
    """Q9: part/supplier/nation broadcast; the fact side shuffles at most
    once (orders join)."""
    df = q("q_tpch_q9", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_feature_snapshot_cutoff_pushed_to_scan(spark, sf_dir):
    """q_feature_snapshot: the leakage cutoff must reach the parquet reader
    in the RAW ts dtype (events_until), not run post-normalization — at
    100 TB the difference is min/max row-group skipping vs a full scan."""
    df = q("q_feature_snapshot", spark, sf_dir)
    assert "ts" in plans.pushed_filters(df)


def test_tpch_q12_date_window_pushed(spark, sf_dir):
    """Q12: the shipdate year window is the pushed scan predicate; one
    orderkey shuffle feeds the CASE aggregation."""
    df = q("q_tpch_q12", spark, sf_dir)
    assert "l_shipdate" in plans.pushed_filters(df)


def test_tpch_q17_single_fact_scan_window_avg(spark, sf_dir):
    """Q17: the correlated per-part average must be a window over the
    brand-restricted relation, NOT a scalar-subquery self-join — one
    lineitem scan + one part scan (each listed twice: tree + details)."""
    df = q("q_tpch_q17", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("Scan parquet") <= 4
    assert "Window" in plan


def test_tpch_q19_disjunctive_envelopes_pushed(spark, sf_dir):
    """Q19: the implied per-side envelopes of the OR-of-ANDs reach both
    parquet scans."""
    df = q("q_tpch_q19", spark, sf_dir)
    pf = plans.pushed_filters(df)
    assert "l_quantity" in pf
    assert "p_size" in pf


def test_tpch_q21_single_fact_scan_no_self_joins(spark, sf_dir):
    """Q21: the EXISTS / NOT-EXISTS pair must collapse into per-order
    window aggregates — one lineitem scan (no l2/l3 self-join re-scans),
    no semi/anti join operators."""
    df = q("q_tpch_q21", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("Scan parquet") <= 6  # lineitem + orders + supplier
    assert "Window" in plan
    assert "LeftSemi" not in plan and "LeftAnti" not in plan


def test_tpch_q2_single_ps_derivation_window_min(spark, sf_dir):
    """Q2: the correlated min-cost subquery must be a window MIN over the
    single derived ps relation — one lineitem scan (5 tables × tree+details
    = 10), all dims broadcast, no sort-merge recompute."""
    df = q("q_tpch_q2", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("Scan parquet") <= 10
    assert "Window" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q11_global_total_window_single_scan(spark, sf_dir):
    """Q11: the global-total threshold is a window over the aggregated
    per-part relation — one lineitem scan (3 tables × 2 = 6), not a scalar
    subquery recompute."""
    df = q("q_tpch_q11", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("Scan parquet") <= 6
    assert "Window" in plan


def test_tpch_q16_complainer_exclusion_broadcast_anti(spark, sf_dir):
    """Q16: the complaint-supplier NOT-IN must be a broadcast anti join."""
    plan = plans.formatted(q("q_tpch_q16", spark, sf_dir))
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q20_one_lineitem_scan_semi_probes(spark, sf_dir):
    """Q20: availqty and the 1996 shipped quantity must come from ONE
    lineitem groupBy (conditional sum), part/nation membership as broadcast
    semi joins — 4 tables × 2 = 8 scans max."""
    df = q("q_tpch_q20", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("Scan parquet") <= 8
    assert "LeftSemi" in plan


def test_dedup_paragraph_no_cartesian_hash_keys(spark, sf_dir):
    """Paragraph dedup: segment index + regroup — hash shuffles only, no
    pair explosion (no cartesian/nested-loop operators)."""
    plan = plans.formatted(q("q_dedup_paragraph", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_pii_no_shuffle_before_sort(spark, sf_dir):
    """PII scan: per-row regex, the only exchange is the presentation
    sort — no joins, no aggregates."""
    plan = plans.formatted(q("q_text_pii", spark, sf_dir))
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_bpe_pairs_topk_heap(spark, sf_dir):
    """BPE pair counting: the top-k must be a TakeOrderedAndProject heap,
    never a global sort of the pair relation."""
    df = q("q_bpe_pair_counts", spark, sf_dir)
    assert not plans.has(df, "TakeOrderedAndProject")


def test_ann_recall_broadcast_only_joins(spark, sf_dir):
    """Recall eval: queries/centroids/cell-routing all broadcast — the
    corpus must never sort-merge."""
    plan = plans.formatted(q("q_ann_recall", spark, sf_dir))
    assert "SortMergeJoin" not in plan


def test_cdc_changes_period_predicates_pushed(spark, sf_dir):
    """CDC diff: both period windows must reach the parquet reader (raw ts
    domain) — 2 scans max per side; the full-outer join runs over the
    per-key aggregates, never events."""
    df = q("q_cdc_changes", spark, sf_dir)
    assert "ts" in plans.pushed_filters(df)
    assert plans.formatted(df).count("Scan parquet") <= 4


def test_ab_test_single_scan_no_join(spark, sf_dir):
    """A/B readout: one filtered scan, one aggregate, a 2-row pivot — no
    join operators anywhere."""
    plan = plans.formatted(q("q_ab_test", spark, sf_dir))
    assert plan.count("Scan parquet") <= 2
    assert "Join" not in plan


def test_compaction_planner_single_scan_partitioned_window(spark, sf_dir):
    """Planner: one events scan; the prefix-sum window is PARTITIONED by
    event_type (never a single global sort)."""
    df = q("q_compaction_planner", spark, sf_dir)
    plan = plans.formatted(df)
    assert plan.count("Scan parquet") <= 2
    assert "Window" in plan


def test_zorder_layout_tightens_both_dims(spark, sf_dir):
    """The point of the z-key: files cut from a zkey-sorted layout carry
    tight [min,max] ranges on BOTH interleaved dimensions, where a
    ts-sorted layout leaves the user dimension spanning ~its full range
    per file. Quantified: mean per-file user-bucket range width must
    shrink vs the ts-sorted baseline while hour stays no worse."""
    from pyspark.sql import functions as F

    from kinesis_test_spark.sources import t

    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).cast("bigint").alias("dx"),
        F.hour("ts").cast("bigint").alias("dy"),
        "ts",
    )
    zkey = F.expr(
        "aggregate(sequence(0, 7), 0L,"
        " (acc, i) -> acc + ((dx >> i) & 1) * shiftleft(1L, 2 * i)"
        " + ((dy >> i) & 1) * shiftleft(1L, 2 * i + 1))"
    )

    def mean_file_width(df, order_col, n_files=16):
        ranked = df.withColumn(
            "f",
            F.ntile(n_files).over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                    order_col
                )
            ),
        )
        widths = ranked.groupBy("f").agg(
            (F.max("dx") - F.min("dx")).alias("wx"),
            (F.max("dy") - F.min("dy")).alias("wy"),
        )
        row = widths.agg(F.avg("wx").alias("ax"), F.avg("wy").alias("ay")).collect()[0]
        return row.ax, row.ay

    z_dx, z_dy = mean_file_width(ev.withColumn("z", zkey), "z")
    t_dx, t_dy = mean_file_width(ev, "ts")
    # ts-sorted files see nearly all user buckets; z-sorted files must not
    assert z_dx < 0.7 * t_dx, (z_dx, t_dx)
    assert z_dy <= t_dy * 1.1 + 1, (z_dy, t_dy)


def test_shingle_identity_dedup_reuses_partitioning(spark, sf_dir, tmp_path):
    """The doc-identity dedup (tests/test_edge_dupkeys.py contract) must
    not add a shuffle: _build_shingles repartitions by doc_id FIRST, so
    the dropDuplicates aggregate reuses that exchange. One Exchange total
    — at corpus scale a second full-shuffle of the documents table would
    double the most expensive stage of every shingle consumer.

    Pinned against a RESTAGED copy of the fixture, not sf_dir: when the
    suite's parity module runs first it session-caches the shingles
    relation at sf_dir, and Spark's CacheManager substitutes any plan
    EQUAL to a cached one with its InMemoryRelation — the fresh build's
    explain would then show an InMemoryTableScan and zero Exchanges
    (the pin would measure the cache, not the build)."""
    import shutil

    from kinesis_test_spark.operators.dedup import _build_shingles

    shutil.copy(f"{sf_dir}/documents.parquet", tmp_path / "documents.parquet")
    plan = plans.formatted(_build_shingles(spark, str(tmp_path)))
    # formatted() prints each node twice (tree line + detail section) —
    # count tree nodes only
    assert plan.count("+- Exchange") == 1, plan


def test_quality_classifier_zero_shuffle(spark, sf_dir):
    """The hashed-feature linear classifier is ONE scan-side projection:
    weight lookup via a literal array + element_at, per-doc sum inside
    F.aggregate over the token array. No explode, no join, no Exchange —
    the gate is embarrassingly parallel at any scale (VERDICT r9 #4's
    'no shuffle before the gate')."""
    plan = plans.formatted(q("q_quality_classifier", spark, sf_dir))
    assert "Exchange" not in plan, plan
    # formatted() prints each node twice (tree line + detail section)
    assert plan.count("Scan parquet") == 2


def test_join_interval_bucketed_no_cartesian(spark, sf_dir):
    """The interval-overlap join must decompose to an EQUI-join on
    (user, day-bucket) — an inequality-only formulation would plan as a
    BroadcastNestedLoopJoin (per-user cartesian), the scale-killer this
    operator exists to avoid."""
    plan = plans.formatted(q("q_join_interval", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_substring_linear_no_cartesian(spark, sf_dir):
    """Exact-substring dedup: window-hash inverted index + one linear
    island/rollup tail — hash shuffles only, no pair explosion, and the
    marked-window relation is consumed ONCE (a branched tail re-derived
    the explode+md5 from the scan on every arm: 8 parquet scans; the
    linear form holds at 4 — both sides of the frequency-index join)."""
    plan = plans.formatted(q("q_dedup_substring", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") <= 4


def test_sketch_kmv_topk_heap_no_global_sort(spark, sf_dir):
    """KMV's K smallest hashes come from TakeOrderedAndProject (per-partition
    K-heap, merge of K) — never a full |vocab| sort."""
    plan = plans.formatted(q("q_sketch_kmv", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_join_bloom_all_broadcast_no_fact_shuffle(spark, sf_dir):
    """The bloom bit-set and the exact member set are dim-derived and
    broadcast; the fact side (orders) must never shuffle — membership
    testing is map-side at any fact scale."""
    plan = plans.formatted(q("q_join_bloom", spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # 3 probe joins + member join


def test_graph_triangles_oriented_materialized_no_cartesian(spark, sf_dir):
    """Degree-ordered triangle counting: the oriented edge list is
    materialized once (three self-join legs must not re-run the lineitem
    self-join — the final plan carries NO parquet scan), and the wedge +
    closing joins are conditioned joins, never a cartesian pair explosion."""
    plan = plans.formatted(q("q_graph_triangles", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 0
    # the wedge/closing joins must be EQUI joins; the strategy is the
    # planner's call from the materialized edge stats (sort-merge on a
    # big edge list, broadcast-hash when the oriented relation fits —
    # the r14 group-local pair build shrank the estimate at gate scale)
    assert (
        plan.count("SortMergeJoin Inner")
        + plan.count("ShuffledHashJoin Inner")
        + plan.count("BroadcastHashJoin Inner")
        >= 1
    )


def test_sample_importance_broadcast_max_no_fact_shuffle(spark, sf_dir):
    """max(w) joins in as a broadcast 1-row aggregate; the acceptance test
    runs at scan time — no shuffle of the doc relation before the per-lang
    summary (the only Exchange is the summary's partial/final agg)."""
    plan = plans.formatted(q("q_sample_importance", spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan


def test_ivf_assignment_is_aggregate_not_window(spark, sf_dir):
    """Cell assignment (similarity.assign_cells) must compile to a
    partial/final max_by AGGREGATE — map-side combine collapses the n×k
    scored relation before the shuffle. A Window.partitionBy(vec_id)
    regression would shuffle and sort all n×k rows (shows as a Window
    node above the scored crossJoin)."""
    plan = plans.formatted(q("q_sim_search_ivf", spark, sf_dir))
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2 or plan.count("SortAggregate") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # codebook broadcast


def test_sq8_quantize_is_scan_side_with_broadcast_scalars(spark, sf_dir):
    """q_emb_sq8: quantize/reconstruct must stay a scan-side projection —
    the scale and the error bound join in as BROADCAST 1-row aggregates
    and both rankings are k-heaps (TakeOrderedAndProject), never a global
    sort or a shuffled join of the corpus against a scalar."""
    df = q("q_emb_sq8", spark, sf_dir)
    plan = plans.formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # scalars broadcast, corpus never shuffles
    assert plan.count("BroadcastNestedLoopJoin") >= 2  # s / err / query 1-row joins


def test_semantic_incremental_band_join_is_equi_keyed(spark, sf_dir):
    """q_dedup_semantic_incremental: the new-vs-keeper match must carry
    the (cell, rank-block) equi-keys (bidirectional band — keeper side
    probes three blocks); a cid-only join would re-open the hot-cell
    quadratic the base operator closed."""
    df = q("q_dedup_semantic_incremental", spark, sf_dir)
    plan = plans.formatted(df)
    assert "CartesianProduct" not in plan
    assert "probe_blk" in plan and "blk_a" in plan


def test_ivfpq_search_is_lut_priced_with_topk_heap(spark, sf_dir):
    """q_sim_search_ivfpq: candidate pricing must be LUT lookups — the
    ADC join is broadcast-equi on (cell, subspace, code), the only
    nested-loop is the sanctioned 1-row query-vector broadcast, and the
    top-k is a heap (TakeOrderedAndProject), never a global sort. The
    residual/coding subtree is checkpointed away."""
    import re

    df = q("q_sim_search_ivfpq", spark, sf_dir)
    plan = plans.formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # exactly one distinct BNLJ node: the broadcast 1-row qe join
    bnlj = set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", plan))
    assert len(bnlj) == 1, plan
    assert "qcode" in plan  # the LUT equi-key reached the join


def test_index_versioned_search_is_broadcast_topk(spark, sf_dir):
    """q_index_versioned: both generation searches must be the sim-search
    shape — the 1-row query vector is the only nested-loop (broadcast),
    the top-k is a heap (TakeOrderedAndProject), and the final per-rank
    diff joins two k-row relations (SortMergeJoin/BHJ on rank is fine,
    a CartesianProduct is not)."""
    df = q("q_index_versioned", spark, sf_dir)
    plan = plans.formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_dedup_near_verdict_join_is_equi_keyed(spark, sf_dir):
    """s_dedup_near's batch verdict: the band join must be an EQUI join
    on the band key (bkey reaches the join), with no cartesian/
    nested-loop fallback — the winners relation is keyed exactly like
    the band relation."""
    df = q("s_dedup_near", spark, sf_dir)
    plan = plans.formatted(df)
    assert "bkey" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
