"""Planted decimal-halfway tie row for the diversity-score family
(r10 VERDICT #2).

The round-10 de-ROUND sweep removed the ROUND-over-exact-quotient tie
class from 10 keys but the diversity family (q_quality_gate /
q_pipeline_audit / q_dedup_keep_best) kept `ROUND(distinct²/len, 6)` —
a documented residual whose trigger (len = 2^a·5^b AND a 7th decimal
digit of exactly 5) no adversarial corpus could plant value-dependently.
Round 11 eliminated the rounding path entirely: the EMITTED score is the
raw IEEE quotient (bit-identical for in-range integers) and every
threshold runs in exact integer cross-multiplied form.

This corpus plants the tie on purpose: a 128-word document with 127
distinct words scores 127²/128 = 16129/128 = 126.0078125 — the exact
decimal-halfway case at 6 places (2^7 denominator, odd numerator). Under
the old code Spark's HALF_UP round gave 126.007813 while DuckDB's
round-via-double gave 126.007812; with no rounding path both engines
emit the identical double 126.0078125 and the integer gate compares
16129000000 div/vs thresholds exactly.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kinesis_test_spark.oracle import check_query

SF_SRC = "/root/testdata/sf0.001"

TIE_KEYS = ["q_quality_gate", "q_pipeline_audit", "q_dedup_keep_best"]


@pytest.fixture(scope="module")
def tie_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tie_sf")
    for f in Path(SF_SRC).glob("*.parquet"):
        shutil.copy(f, d / f.name)

    docs = pq.read_table(d / "documents.parquet")
    # 128 words, 127 distinct (one repeat): d²/len = 16129/128 =
    # 126.0078125 — 7th decimal digit exactly 5, denominator 2^7.
    words = [f"tie{i}" for i in range(127)] + ["tie0"]
    assert len(words) == 128 and len(set(words)) == 127
    text = " ".join(words)
    # A second tie shape with a factor-of-5 denominator: 160 = 2^5·5
    # words, 40 distinct → 1600/160 = 10.0 (integral — exercises the
    # exact-equality boundary of the ≥ gates rather than the halfway
    # digit; d² ≡ 0 mod len so micros division is exact).
    words2 = [f"t{i % 40}" for i in range(160)]
    text2 = " ".join(words2)
    extra = pa.table(
        {
            "doc_id": [91000001, 91000002],
            "text": [text, text2],
            "lang": ["en"] * 2,
            "source": ["tie"] * 2,
            "n_chars": [len(text), len(text2)],
        },
        schema=docs.schema,
    )
    pq.write_table(pa.concat_tables([docs, extra]), d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", TIE_KEYS)
def test_halfway_tie_parity(spark, tie_sf_dir, name):
    problems = check_query(spark, tie_sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_tie_doc_score_is_exact_halfway(spark, tie_sf_dir):
    """The planted doc's emitted score is the raw quotient 126.0078125
    (not a 6-place rounding of it) — the value the old ROUND path could
    never emit."""
    from kinesis_test_spark import registry

    registry.load_all()
    row = (
        registry.QUERIES["q_quality_gate"](spark, tie_sf_dir)
        .filter("doc_id = 91000001")
        .collect()
    )
    assert len(row) == 1  # score ~126 is far above 0.8×mean — kept
    assert row[0]["score"] == 16129 / 128
