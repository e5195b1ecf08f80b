"""Runtime observability: Dataset.observe metrics — the per-query counters
a production pipeline exports (rows seen, nulls, revenue totals) without a
second pass over the data."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from kinesis_test_spark.sources import t


def test_observe_metrics_single_pass(spark, sf_dir):
    obs = Observation("scan_metrics")
    li = t(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("price_total"),
        F.max("l_shipdate").alias("max_ship"),
    )
    out = li.filter(F.col("l_quantity") > 25).count()  # one action drives both
    m = obs.get
    exact = t(spark, sf_dir, "lineitem")
    assert m["rows_seen"] == exact.count()
    assert out < m["rows_seen"]
    expected = exact.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
    ).first()[0]
    assert m["price_total"] == expected
