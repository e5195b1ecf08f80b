"""The bucketing payoff, end-to-end: two tables written bucketed on the
join key must join WITHOUT either side shuffling — the layout decision
that turns the nightly fact-fact join at 100 TB from the dominant exchange
into a local merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_test_spark import plans
from kinesis_test_spark.sources import t
from kinesis_test_spark.streaming.pipeline import scratch_dir


def test_cobucketed_join_eliminates_shuffles(spark, sf_dir):
    d = scratch_dir("cobucket")
    li_t, o_t = f"li_b_{d.name}", f"o_b_{d.name}"
    (
        t(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(d / "li"))
        .saveAsTable(li_t)
    )
    (
        t(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(d / "o"))
        .saveAsTable(o_t)
    )
    li, o = spark.table(li_t), spark.table(o_t)
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    # the test tables are small enough to broadcast — disable that so the
    # plan shows what a fact-fact (non-broadcastable) join would do
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plans.formatted(joined)
        tree = plan.split("\n\n")[0]
        # co-bucketed: sort-merge join with ZERO shuffle exchanges
        assert "SortMergeJoin" in tree
        assert "Exchange" not in tree, tree
        # and the result is right
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    expected = (
        t(spark, sf_dir, "lineitem")
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n == expected
    spark.sql(f"DROP TABLE {li_t}")
    spark.sql(f"DROP TABLE {o_t}")
