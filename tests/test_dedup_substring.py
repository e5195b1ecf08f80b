"""q_dedup_substring pins — planted exact-overlap spans (VERDICT r8 #4).

The fixture's word-soup corpus contains real cross-doc window repeats
(45/481 docs at sf0.01), but nothing with a KNOWN span geometry, so these
tests restage sf0.001 with documents sharing exactly-placed token runs and
pin the span arithmetic: a 40-token shared run under W=15 yields 26
consecutive duplicated windows that merge into ONE maximal span of 40
tokens; two disjoint runs yield dup_spans=2; a doc with no shared window
reports zeros; a doc shorter than W is out of the report by contract.
Parity (the driver's gate) is re-run on the planted corpus.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kinesis_test_spark.operators.dedup import SUBSTR_W
from kinesis_test_spark.oracle import check_query

SF_SRC = "/root/testdata/sf0.001"

# Planted tokens use a prefix absent from the fixture's vocabulary so no
# planted window collides with a fixture window.
def _toks(tag: str, n: int) -> list[str]:
    return [f"plantedtok_{tag}_{i}" for i in range(n)]


RUN40 = _toks("run40", 40)    # shared A<->B, one contiguous 40-token run
RUN20 = _toks("run20", 20)    # shared D<->E, first run
RUN18 = _toks("run18", 18)    # shared D<->E, second run

RUN30 = _toks("run30", 30)    # shared ONLY between the two NEW docs

DOC_A = 90000101  # 10 unique + RUN40 + 10 unique
DOC_B = 90000102  # 20 unique + RUN40 + 5 unique
DOC_C = 90000103  # 30 unique tokens, overlap-free
DOC_D = 90000104  # 5 unique + RUN20 + 4 unique + RUN18 + 3 unique
DOC_E = 90000105  # 8 unique + RUN20 + 6 unique + RUN18
DOC_SHORT = 90000106  # SUBSTR_W - 1 tokens — below the window width
# NEW-batch docs (doc_id % 10 == 0 — the incremental's batch predicate):
DOC_NEW_VS_STANDING = 90000110  # 10 unique + RUN40 + 10 unique (hits A/B)
DOC_NEW_X = 90000120  # 6 unique + RUN30 + 6 unique (hits only NEW_Y)
DOC_NEW_Y = 90000130  # 9 unique + RUN30 + 2 unique (hits only NEW_X)

TEXTS = {
    DOC_A: " ".join(_toks("a_pre", 10) + RUN40 + _toks("a_suf", 10)),
    DOC_B: " ".join(_toks("b_pre", 20) + RUN40 + _toks("b_suf", 5)),
    DOC_C: " ".join(_toks("c_only", 30)),
    DOC_D: " ".join(
        _toks("d1", 5) + RUN20 + _toks("d2", 4) + RUN18 + _toks("d3", 3)
    ),
    DOC_E: " ".join(_toks("e1", 8) + RUN20 + _toks("e2", 6) + RUN18),
    DOC_SHORT: " ".join(_toks("tiny", SUBSTR_W - 1)),
    DOC_NEW_VS_STANDING: " ".join(_toks("n1", 10) + RUN40 + _toks("n2", 10)),
    DOC_NEW_X: " ".join(_toks("nx", 6) + RUN30 + _toks("nx2", 6)),
    DOC_NEW_Y: " ".join(_toks("ny", 9) + RUN30 + _toks("ny2", 2)),
}


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("substr_sf")
    for f in Path(SF_SRC).glob("*.parquet"):
        shutil.copy(f, d / f.name)
    docs = pq.read_table(d / "documents.parquet")
    extra = pa.table(
        {
            "doc_id": list(TEXTS),
            "text": [TEXTS[k] for k in TEXTS],
            "lang": ["en"] * len(TEXTS),
            "source": ["planted"] * len(TEXTS),
            "n_chars": [len(TEXTS[k]) for k in TEXTS],
        },
        schema=docs.schema,
    )
    pq.write_table(pa.concat_tables([docs, extra]), d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def result(spark, planted_dir):
    from kinesis_test_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_dedup_substring"](spark, planted_dir)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_single_run_merges_into_one_maximal_span(result):
    # 40 shared tokens, W=15 -> 26 consecutive dup windows -> span of 40.
    for doc in (DOC_A, DOC_B):
        row = result[doc]
        assert row["dup_windows"] == 40 - SUBSTR_W + 1
        assert row["dup_spans"] == 1
        assert row["max_span_tokens"] == 40


def test_total_windows_arithmetic(result):
    # doc A has 10 + 40 + 10 = 60 tokens -> 60 - W + 1 windows.
    assert result[DOC_A]["total_windows"] == 60 - SUBSTR_W + 1


def test_disjoint_runs_stay_separate_spans(result):
    for doc in (DOC_D, DOC_E):
        row = result[doc]
        assert row["dup_spans"] == 2
        assert row["max_span_tokens"] == 20
        # 20-run gives 6 dup windows, 18-run gives 4.
        assert row["dup_windows"] == (20 - SUBSTR_W + 1) + (18 - SUBSTR_W + 1)


def test_overlap_free_doc_reports_zeros(result):
    row = result[DOC_C]
    assert row["dup_windows"] == 0
    assert row["dup_spans"] == 0
    assert row["max_span_tokens"] == 0
    assert row["dup_ratio"] == 0.0


def test_short_doc_is_out_of_report(result):
    assert DOC_SHORT not in result


def test_parity_on_planted_corpus(spark, planted_dir):
    assert check_query(spark, planted_dir, "q_dedup_substring") == []


def test_giant_doc_skew(spark, tmp_path_factory):
    """One 5000-token document among 55-token neighbors — the skewed-doc
    shape a web corpus always contains (a doc explodes into O(len)
    windows, so one giant doc is one hot partition slice). The operator
    must stay correct (parity vs the oracle) and the giant doc's
    self-repeats must NOT mark it duplicated: duplication is CROSS-doc
    (min!=max doc_id), and this doc repeats a 30-token block internally
    but shares nothing with any other doc."""
    d = tmp_path_factory.mktemp("substr_giant")
    for f in Path(SF_SRC).glob("*.parquet"):
        shutil.copy(f, d / f.name)
    block = _toks("giantblock", 30)
    # 5000 tokens: unique filler interleaved with the same 30-token block
    # repeated 20 times (within-doc repeats, zero cross-doc overlap)
    toks: list[str] = []
    for rep in range(20):
        toks += _toks(f"giantfill{rep}", 220) + block
    text = " ".join(toks)
    docs = pq.read_table(d / "documents.parquet")
    extra = pa.table(
        {
            "doc_id": [90000201],
            "text": [text],
            "lang": ["en"],
            "source": ["planted"],
            "n_chars": [len(text)],
        },
        schema=docs.schema,
    )
    pq.write_table(pa.concat_tables([docs, extra]), d / "documents.parquet")

    from kinesis_test_spark import registry

    registry.load_all()
    row = [
        r
        for r in registry.QUERIES["q_dedup_substring"](spark, str(d)).collect()
        if r["doc_id"] == 90000201
    ]
    assert len(row) == 1
    assert row[0]["total_windows"] == len(toks) - SUBSTR_W + 1
    assert row[0]["dup_windows"] == 0  # within-doc repeats are not dups
    assert check_query(spark, str(d), "q_dedup_substring") == []


# ---------------------------------------------------------------------------
# q_dedup_substring_clusters — the removal step over the same evidence
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cluster_result(spark, planted_dir):
    from kinesis_test_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_dedup_substring_clusters"](spark, planted_dir)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_sharing_docs_cluster_together(cluster_result):
    # A<->B share RUN40, D<->E share RUN20+RUN18; planted tokens are unique
    # to each pair, so each pair is its own component with min-id label.
    assert cluster_result[DOC_A]["cluster_id"] == DOC_A
    assert cluster_result[DOC_B]["cluster_id"] == DOC_A
    assert cluster_result[DOC_D]["cluster_id"] == DOC_D
    assert cluster_result[DOC_E]["cluster_id"] == DOC_D


def test_keep_decision_is_cluster_min(cluster_result):
    assert cluster_result[DOC_A]["is_kept"] is True
    assert cluster_result[DOC_B]["is_kept"] is False
    assert cluster_result[DOC_D]["is_kept"] is True
    assert cluster_result[DOC_E]["is_kept"] is False


def test_uninvolved_docs_out_of_roster(cluster_result):
    # overlap-free and below-W docs have no cross-doc window: no row.
    assert DOC_C not in cluster_result
    assert DOC_SHORT not in cluster_result


def test_dup_hash_evidence_counts(cluster_result):
    # a 40-token run under W=15 shares exactly its 26 fully-inside window
    # hashes; the boundary windows mix in each doc's unique context.
    assert cluster_result[DOC_A]["n_dup_hashes"] == 40 - SUBSTR_W + 1
    assert cluster_result[DOC_B]["n_dup_hashes"] == 40 - SUBSTR_W + 1
    # two disjoint runs: (20-W+1) + (18-W+1)
    expected = (20 - SUBSTR_W + 1) + (18 - SUBSTR_W + 1)
    assert cluster_result[DOC_D]["n_dup_hashes"] == expected
    assert cluster_result[DOC_E]["n_dup_hashes"] == expected


def test_cluster_parity_on_planted_corpus(spark, planted_dir):
    assert check_query(spark, planted_dir, "q_dedup_substring_clusters") == []


def test_star_edges_stay_linear_on_hot_window(spark, tmp_path_factory):
    """A boilerplate run shared by 30 docs: star-linking to the hash-min
    doc must produce O(m) edges per hash (never the m^2 clique) and one
    component containing all 30 — the minhash bucket_cap discipline
    carried over to the substring family."""
    d = tmp_path_factory.mktemp("substr_hot")
    for f in Path(SF_SRC).glob("*.parquet"):
        shutil.copy(f, d / f.name)
    boiler = _toks("hotboiler", 20)
    ids = list(range(90000301, 90000331))
    texts = [
        " ".join(_toks(f"hot{k}", 12) + boiler + _toks(f"hotsuf{k}", 3))
        for k in ids
    ]
    docs = pq.read_table(d / "documents.parquet")
    extra = pa.table(
        {
            "doc_id": ids,
            "text": texts,
            "lang": ["en"] * len(ids),
            "source": ["planted"] * len(ids),
            "n_chars": [len(t) for t in texts],
        },
        schema=docs.schema,
    )
    pq.write_table(pa.concat_tables([docs, extra]), d / "documents.parquet")

    from kinesis_test_spark import registry
    from kinesis_test_spark.operators.dedup import SUBSTR_W as W
    from kinesis_test_spark.operators.dedup import _substring_wins

    registry.load_all()
    # edge-count property: every duplicated hash h contributes exactly
    # (docs sharing h) - 1 star edges per direction
    wins = _substring_wins(spark, str(d)).select("doc_id", "h").distinct()
    import pyspark.sql.functions as F

    planted = wins.filter(F.col("doc_id").isin(ids))
    per_hash = planted.groupBy("h").count().collect()
    assert max(r["count"] for r in per_hash) == len(ids)  # the shared run
    out = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["q_dedup_substring_clusters"](
            spark, str(d)
        ).collect()
        if r["doc_id"] in ids
    }
    assert set(out) == set(ids)
    assert {r["cluster_id"] for r in out.values()} == {min(ids)}
    assert sum(1 for r in out.values() if r["is_kept"]) == 1
    # each doc shares exactly the boiler run's fully-inside windows
    assert all(
        r["n_dup_hashes"] == 20 - W + 1 for r in out.values()
    )
    assert check_query(spark, str(d), "q_dedup_substring_clusters") == []


@pytest.fixture(scope="module")
def inc_result(spark, planted_dir):
    from kinesis_test_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_dedup_substring_incremental"](spark, planted_dir)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_incremental_finds_new_vs_standing_overlap(inc_result):
    """A new doc sharing a 40-token run with a STANDING doc reports the
    same span geometry as the full operator would: 26 consecutive
    duplicated windows merging into one maximal 40-token span."""
    r = inc_result[DOC_NEW_VS_STANDING]
    assert r["total_windows"] == 46  # 60 tokens, W=15
    assert r["dup_windows"] == 26
    assert r["dup_spans"] == 1
    assert r["max_span_tokens"] == 40


def test_incremental_scopes_out_new_x_new_overlaps(spark, planted_dir, inc_result):
    """Two NEW docs sharing a run only with each other report ZERO dup in
    the incremental run (new×new verdicts in the batch's own full run —
    the family contract), while the FULL operator on the same corpus DOES
    see the overlap — the contrast that proves the scoping is real."""
    from kinesis_test_spark import registry

    for doc in (DOC_NEW_X, DOC_NEW_Y):
        assert inc_result[doc]["dup_windows"] == 0
        assert inc_result[doc]["dup_spans"] == 0
    full = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["q_dedup_substring"](spark, planted_dir)
        .filter(f"doc_id IN ({DOC_NEW_X}, {DOC_NEW_Y})")
        .collect()
    }
    assert full[DOC_NEW_X]["max_span_tokens"] == 30
    assert full[DOC_NEW_Y]["max_span_tokens"] == 30


def test_incremental_only_reports_the_new_batch(inc_result):
    """Standing docs are not re-verdicted: every doc in the incremental
    report satisfies the batch predicate."""
    assert inc_result  # non-empty
    assert all(doc % 10 == 0 for doc in inc_result)
    assert DOC_A not in inc_result and DOC_D not in inc_result


def test_incremental_parity_on_planted_corpus(spark, planted_dir):
    problems = check_query(spark, planted_dir, "q_dedup_substring_incremental")
    assert not problems, problems


def test_incremental_warm_run_reuses_standing_index(spark, sf_dir):
    """After the first run builds the session-persisted standing index,
    the warm run's standing side must come from the cache (InMemory scan),
    not a fresh documents scan — the amortized-O(new) property the
    operator exists for."""
    from kinesis_test_spark import plans, registry
    from kinesis_test_spark.operators.dedup import substring_standing_index

    registry.load_all()
    substring_standing_index(spark, sf_dir).count()  # build + persist
    df = registry.QUERIES["q_dedup_substring_incremental"](spark, sf_dir)
    plan = plans.formatted(df)
    assert "InMemoryTableScan" in plan
    # two distinct scan NODES at most: the new batch's live scan plus the
    # frozen one printed INSIDE the InMemoryRelation's cached subtree (the
    # formatted renderer repeats it); a re-scanned standing side would add
    # a third distinct id
    import re

    scan_ids = set(re.findall(r"Scan parquet\s*\((\d+)\)", plan))
    assert len(scan_ids) <= 2, plan


def test_cluster_build_reuses_materialized_windows(spark, sf_dir):
    """'One extra aggregate, no new scan' (VERDICT r9 #6): after the
    (doc, h) grain is localCheckpoint'd, the edge/evidence relations must
    derive from the materialized copy — zero parquet scans in their
    plans."""
    import pyspark.sql.functions as F

    from kinesis_test_spark import plans
    from kinesis_test_spark.iterate import truncate_lineage
    from kinesis_test_spark.operators.dedup import _substring_wins

    hd = truncate_lineage(
        _substring_wins(spark, sf_dir).select("doc_id", "h").distinct()
    )
    agg = (
        hd.groupBy("h")
        .agg(F.min("doc_id").alias("hmin"), F.max("doc_id").alias("hmax"))
        .filter(F.col("hmin") != F.col("hmax"))
        .select("h", "hmin")
    )
    linked = hd.join(agg, "h")
    plan = plans.formatted(linked)
    assert "Scan parquet" not in plan, plan
    assert "CartesianProduct" not in plan
