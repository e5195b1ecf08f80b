"""Quality assertions for rows-only queries (no SQL oracle exists, but the
results still have checkable properties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_test_spark import registry
from kinesis_test_spark.streaming.pipeline import local_rows

registry.load_all()


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = registry.QUERIES["q_agg_approx_distinct"](spark, sf_dir).first()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact_parts = li.select("l_partkey").distinct().count()
    exact_orders = li.select("l_orderkey").distinct().count()
    assert abs(approx["approx_parts"] - exact_parts) <= 0.05 * exact_parts
    assert abs(approx["approx_orders"] - exact_orders) <= 0.05 * exact_orders


def test_ivf_results_subset_of_exact_ranking(spark, sf_dir):
    """IVF probes one cell, so its hits must be genuine high-cosine vectors:
    every IVF hit must appear in the exact top-50."""
    from kinesis_test_spark.operators import similarity

    exact = (
        registry.QUERIES["q_sim_search"](spark, sf_dir)
        .select("vec_id")
        .toPandas()["vec_id"]
        .tolist()
    )
    v = similarity._vectors(spark, sf_dir)
    q = F.broadcast(
        v.filter(F.col("vec_id") == similarity.QUERY_VEC_ID).select(F.col("e").alias("qe"))
    )
    top50 = (
        v.filter(F.col("vec_id") != similarity.QUERY_VEC_ID)
        .crossJoin(q)
        .select("vec_id", similarity.cosine(F.col("e"), F.col("qe")).alias("c"))
        .orderBy(F.col("c").desc(), "vec_id")
        .limit(50)
        .toPandas()["vec_id"]
        .tolist()
    )
    ivf = registry.QUERIES["q_sim_search_ivf"](spark, sf_dir).toPandas()["vec_id"].tolist()
    assert ivf, "IVF probe returned nothing"
    assert set(ivf) <= set(top50)
    assert set(exact[:3]) & set(top50[:3])  # sanity: exact query self-consistent


def test_mllib_minhash_agrees_with_portable(spark, sf_dir):
    """Both LSH implementations hunt the same planted near-dups: the
    high-estimate portable pairs should be found by MLlib too."""
    portable = registry.QUERIES["q_dedup_minhash"](spark, sf_dir).toPandas()
    mllib = registry.QUERIES["q_dedup_minhash_mllib"](spark, sf_dir).toPandas()
    strong = {
        (a, b)
        for a, b, e in portable[["doc_a", "doc_b", "est_jaccard"]].itertuples(index=False)
        if e >= 0.99
    }
    mllib_pairs = set(map(tuple, mllib[["doc_a", "doc_b"]].itertuples(index=False)))
    assert strong, "no strong near-dup pairs found by portable minhash"
    missing = strong - mllib_pairs
    assert len(missing) <= max(1, len(strong) // 10), f"MLlib missed {missing}"


def test_kmeans_converges_and_reduces_inertia(spark, sf_dir):
    """Full k-means: final centroids must fit the data at least as well as
    the initial codebook (mean best-cosine non-decreasing), and every
    cluster in the output is non-empty with all 64 dims present."""
    import pandas as pd

    from kinesis_test_spark.operators import similarity

    out = registry.QUERIES["q_kmeans"](spark, sf_dir).toPandas()
    assert set(out["dim"]) == set(range(1, 65))
    assert (out["n_members"] > 0).all()

    v = similarity._vectors(spark, sf_dir)
    init = v.filter(F.col("vec_id") < similarity.N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    final_pdf = out.pivot_table(index="cid", columns="dim", values="centroid_val")
    rows = [
        (int(cid), [float(x) for x in final_pdf.loc[cid].tolist()])
        for cid in final_pdf.index
    ]
    final = local_rows(spark, rows, "cid int, ce array<double>")

    def mean_best_cosine(cents):
        scored = v.crossJoin(F.broadcast(cents)).select(
            "vec_id", similarity.cosine(F.col("e"), F.col("ce")).alias("sim")
        )
        best = scored.groupBy("vec_id").agg(F.max("sim").alias("best"))
        return best.agg(F.avg("best")).first()[0]

    assert mean_best_cosine(final) >= mean_best_cosine(init) - 1e-9


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """approx_percentile (the sketch quantile for 100 TB) must land within
    a tight band of the exact percentile."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = li.agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)").alias("p")
    ).first()["p"]
    exact = li.agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p50"),
        F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p90"),
    ).first()
    assert abs(approx[0] - exact["p50"]) <= 0.02 * exact["p50"]
    assert abs(approx[1] - exact["p90"]) <= 0.02 * exact["p90"]


def test_monotonic_id_unique_across_partitions(spark, sf_dir):
    """monotonically_increasing_id: the zero-shuffle row-id generator —
    values are partition-encoded (not dense) but must be globally unique."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(8)
    with_id = ev.withColumn("rid", F.monotonically_increasing_id())
    n = with_id.count()
    assert with_id.select("rid").distinct().count() == n


def test_approx_quantile_within_rank_error(spark, sf_dir):
    """approx_percentile(accuracy=10000) must land within a generous rank
    window of the exact percentile: its value must fall between the exact
    p45/p55 (for p50) and p85/p95 (for p90) per group."""
    from pyspark.sql import functions as F

    from kinesis_test_spark import registry

    registry.load_all()
    approx = (
        registry.QUERIES["q_agg_approx_quantile"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    from kinesis_test_spark.sources import t as load_t

    ev = load_t(spark, sf_dir, "events")
    bounds = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.45)").alias("lo50"),
            F.expr("percentile(value, 0.55)").alias("hi50"),
            F.expr("percentile(value, 0.85)").alias("lo90"),
            F.expr("percentile(value, 0.95)").alias("hi90"),
        )
        .toPandas()
        .set_index("event_type")
    )
    for et, row in approx.iterrows():
        b = bounds.loc[et]
        assert b.lo50 <= row.p50_approx <= b.hi50, (et, row.p50_approx, b.lo50, b.hi50)
        assert b.lo90 <= row.p90_approx <= b.hi90, (et, row.p90_approx, b.lo90, b.hi90)


def test_hll_merge_matches_whole_and_exact(spark, sf_dir):
    """Sketch associativity: union of two half-sketches must estimate the
    same as one whole-table sketch, and land within 2% of the exact
    distinct count."""
    from kinesis_test_spark import registry

    registry.load_all()
    row = registry.QUERIES["q_agg_hll_merge"](spark, sf_dir).toPandas().iloc[0]
    assert row.est_merged == row.est_whole
    assert abs(row.est_merged - row.n_exact) / row.n_exact <= 0.02


def test_stream_join_left_matches_batch_left_outer(spark, sf_dir):
    """The streamed left-outer result, fully drained (sentinel phases), must
    equal the batch left-outer join exactly: every matched (click, purchase)
    pair present, every unmatched click present exactly once with NULL."""
    streamed = registry.QUERIES["s_stream_join_left"](spark, sf_dir).toPandas()

    from kinesis_test_spark.sources.tables import normalize_ts

    ev = normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("ts_a")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id_b"),
        F.col("ts").alias("ts_b"),
    )
    batch = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("user_id_b"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")),
            "leftOuter",
        )
        .select("click_id", "purchase_id", "user_id")
        .toPandas()
    )

    def canon(pdf):
        return sorted(
            (int(c), None if p != p or p is None else int(p), int(u))
            for c, p, u in pdf.itertuples(index=False)
        )

    s, b = canon(streamed), canon(batch)
    assert len(s) == len(b)
    assert s == b
    # unmatched clicks appear exactly once each
    unmatched = [row for row in s if row[1] is None]
    assert len(unmatched) == len({row[0] for row in unmatched})
    assert unmatched, "fixture should contain clicks with no purchase in-window"
