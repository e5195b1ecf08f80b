"""Property-style tests: cross-engine invariants over randomized inputs."""

from __future__ import annotations

import math
import random
import string

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_test_spark.functions.porthash import spark_hex16, sql_hex16
from kinesis_test_spark.oracle import NULL, canon_value


def test_portable_hash_cross_engine(spark):
    """spark_hex16 and sql_hex16 agree on randomized strings — the invariant
    every sketch operator (MinHash/SimHash/fingerprint) rests on."""
    rng = random.Random(42)
    words = [
        "".join(rng.choices(string.ascii_lowercase + string.digits + " |#", k=rng.randint(0, 24)))
        for _ in range(300)
    ]
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    spark_vals = [r[0] for r in sdf.select(spark_hex16(F.col("w"))).collect()]
    con = duckdb.connect()
    duck_vals = [
        con.execute(f"SELECT {sql_hex16(repr(w))}").fetchone()[0] for w in words
    ]
    assert spark_vals == duck_vals
    assert all(0 <= v <= 0xFFFF for v in spark_vals)


@given(st.integers(min_value=-(2**62), max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_canon_int_stable(x):
    import numpy as np

    assert canon_value(x) == canon_value(np.int64(x)) == str(x)


@given(st.floats(allow_nan=True, allow_infinity=False))
@settings(max_examples=200, deadline=None)
def test_canon_float_nan_is_null(x):
    import numpy as np

    if math.isnan(x):
        assert canon_value(x) == NULL
    else:
        assert canon_value(x) == canon_value(np.float64(x)) == repr(x)


@given(st.lists(st.one_of(st.integers(-100, 100), st.none()), max_size=8))
@settings(max_examples=100, deadline=None)
def test_canon_list_matches_ndarray(xs):
    import numpy as np

    arr = np.array(xs, dtype=object)
    assert canon_value(xs) == canon_value(arr)


def test_ngram_df_cap_bounds_hot_shingle(spark):
    """A planted stop-shingle shared by every document must NOT explode the
    inverted-index self-join: with the df cap the hot posting list is
    dropped before pairing, and genuine near-dup pairs (all shingles below
    the cap) keep their exact Jaccard."""
    from kinesis_test_spark.operators.dedup import _jaccard_pairs

    rows = []
    for i in range(60):
        rows.append((i, "the of and"))  # hot: df = 60
        rows.append((i, f"unique shingle {i}"))
    # one genuine near-dup pair sharing two sub-cap shingles
    rows += [(100, "dup a x"), (100, "dup b x"), (101, "dup a x"), (101, "dup b x")]
    sh = spark.createDataFrame(rows, "doc_id long, s string")

    uncapped = _jaccard_pairs(sh, df_cap=1_000_000)
    assert uncapped.count() == 60 * 59 // 2 + 1  # hot shingle pairs everything

    capped = _jaccard_pairs(sh, df_cap=10).collect()
    assert len(capped) == 1  # hot posting list gone; only the true pair remains
    (pair,) = capped
    assert (pair.doc_a, pair.doc_b) == (100, 101)
    assert pair.jaccard == 1.0


def test_reliable_checkpoint_variant_same_results(spark, sf_dir, tmp_path):
    """With a checkpoint dir configured, iterative operators switch from
    localCheckpoint to reliable checkpoint() (survives executor loss on a
    cluster) — and must produce byte-identical results."""
    from kinesis_test_spark import registry

    registry.load_all()
    run = lambda: (
        registry.QUERIES["q_dedup_clusters"](spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    base = run()
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        reliable = run()
        # checkpoint() actually wrote RDD blocks to the configured dir
        written = list((tmp_path / "ckpt").rglob("part-*"))
        assert written, "reliable checkpoint wrote nothing"
    finally:
        sc._jsc.sc().setCheckpointDir(None)
    assert sc.getCheckpointDir() is None
    assert base.equals(reliable)
