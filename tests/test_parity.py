"""Oracle-parity tests — one per registered query, same gate as the driver."""

from __future__ import annotations

import pytest

from kinesis_test_spark import registry
from kinesis_test_spark.oracle import check_query

registry.load_all()
ALL_KEYS = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", ALL_KEYS)
def test_parity(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)
