"""Catalog / DDL surface — the reference's table-management ops
(create_table / table_exits / ensure-exists, consumer.py:11-89) as engine
catalog operations."""

from __future__ import annotations


def test_external_table_lifecycle(spark, sf_dir):
    name = "events_ext_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    assert not spark.catalog.tableExists(name)  # table_exits (consumer.py:43-59)
    # create_table (consumer.py:11-40) — external over existing parquet
    spark.sql(
        f"CREATE TABLE {name} USING parquet LOCATION '{sf_dir}/events.parquet'"
    )
    # idempotent ensure-exists (consumer.py:76-89)
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} USING parquet LOCATION '{sf_dir}/events.parquet'")
    assert spark.catalog.tableExists(name)
    cols = {f.name for f in spark.table(name).schema.fields}
    assert {"event_id", "user_id", "event_type"} <= cols
    n = spark.table(name).count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    described = {r["col_name"] for r in spark.sql(f"DESCRIBE TABLE {name}").collect()}
    assert "event_id" in described
    spark.sql(f"DROP TABLE {name}")
    assert not spark.catalog.tableExists(name)
