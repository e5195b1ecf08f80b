"""Pins for q_dedup_phash (r12 VERDICT #2 — image perceptual-hash dedup).

The operator's oracle is already the brute-force n² Hamming check, so
every parity run proves the 4×16-bit pigeonhole band join lossless at
threshold ≤ PHASH_HAMMING. These pins add what parity can't state:

  * a PLANTED byte-identical image pairs at Hamming 0, and a planted
    one-word-changed near-dup image pairs at a small nonzero distance the
    test computes independently (pure-python reimplementation of the
    formula + aHash — a third engine against Spark and DuckDB);
  * the pair join is equi-keyed on (band, value) — no cartesian / nested
    loop anywhere in the executed plan;
  * the exact-integer hash path: aHash threshold via v·64 ≥ Σv
    cross-multiplication, never a mean division.
"""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kinesis_test_spark.operators.dedup import (
    PHASH_HAMMING,
    PHASH_SLOTS,
    PHASH_VOTES,
)
from kinesis_test_spark.oracle import check_query

SF_SRC = "/root/testdata/sf0.001"


def _hex16(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:4], 16)


def _ahash(text: str) -> int:
    """Independent pure-python recomputation of the operator's aHash."""
    slots = [0] * PHASH_SLOTS
    for w in text.split(" "):
        for j in range(PHASH_VOTES):
            slots[_hex16(f"{w}#{j}") % PHASH_SLOTS] += len(w)
    vals = [(ls * 13 + s) % 256 for s, ls in enumerate(slots)]
    total = sum(vals)
    bits = 0
    for s, v in enumerate(vals):
        if v * PHASH_SLOTS >= total:
            bits |= 1 << s
    return bits


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


@pytest.fixture(scope="module")
def phash_sf_dir(tmp_path_factory):
    """sf0.001 restaged with two planted images: an exact copy of doc 3's
    text under a new id (Hamming 0) and a one-word-changed variant whose
    aHash distance the fixture computes up front (picked to land in
    [1, PHASH_HAMMING] so the banded join must find a NONZERO-distance
    pair, not just the trivial identical one)."""
    d = tmp_path_factory.mktemp("phash_sf")
    for f in Path(SF_SRC).glob("*.parquet"):
        shutil.copy(f, d / f.name)
    docs = pq.read_table(d / "documents.parquet")
    head = docs.to_pydict()
    base_idx = head["doc_id"].index(3)
    base_text = head["text"][base_idx]
    words = base_text.split(" ")
    near_text = None
    near_h = None
    for cand in ("zq", "xj", "vv", "kk", "wy", "qqq", "zzz", "mxm", "p"):
        t2 = " ".join(words[:-1] + [cand])
        h = _hamming(_ahash(base_text), _ahash(t2))
        if 1 <= h <= PHASH_HAMMING:
            near_text, near_h = t2, h
            break
    assert near_text is not None, "no candidate produced a near-dup in band"
    extra = pa.table(
        {
            "doc_id": [97000001, 97000002],
            "text": [base_text, near_text],
            "lang": [head["lang"][base_idx]] * 2,
            "source": [head["source"][base_idx]] * 2,
            "n_chars": [len(base_text), len(near_text)],
        },
        schema=docs.schema,
    )
    pq.write_table(pa.concat_tables([docs, extra]), d / "documents.parquet")
    return str(d), near_h


def test_planted_image_dups_found_with_expected_distance(spark, phash_sf_dir):
    from kinesis_test_spark import registry

    registry.load_all()
    sf_dir, near_h = phash_sf_dir
    out = {
        (r.doc_a, r.doc_b): (r.hamming_a, r.hamming_d)
        for r in registry.QUERIES["q_dedup_phash"](spark, sf_dir).collect()
    }
    # byte-identical image: Hamming 0 on BOTH hashes
    assert out[(3, 97000001)] == (0, 0)
    # one-word change: the exact independently-computed nonzero distance
    assert out[(3, 97000002)][0] == near_h
    assert 1 <= near_h <= PHASH_HAMMING
    # the two planted docs also pair with each other (within band of doc 3)
    assert (97000001, 97000002) in out
    # and full oracle parity holds on the planted corpus
    problems = check_query(spark, sf_dir, "q_dedup_phash")
    assert not problems, problems


def test_phash_pair_join_is_band_equi_keyed(spark):
    """The executed pair-join plan must be equi-keyed on (band, bv) — a
    cartesian or nested-loop pair scan would be n² at 100 TB. The pixel
    subtree is checkpointed away (its 64-slot spine is a broadcast
    dimension grid), so the visible plan is exactly the band join."""
    from kinesis_test_spark import plans, registry

    registry.load_all()
    df = registry.QUERIES["q_dedup_phash"](spark, SF_SRC)
    plan = plans.formatted(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band" in plan and "bv" in plan
