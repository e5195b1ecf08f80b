#!/usr/bin/env python
"""Isolate and time named queries with the noop sink (guide §1.4).

Usage: python tools/qtime.py [-n REPS] [--plan DIR] q_name [q_name ...]

One session, warmup sweep like bench.py, then each named query timed
REPS times (cold first — session caches make later reps warm for the
cached families). With --plan DIR, writes each query's
explain("formatted") to DIR/<name>.txt before timing. Prints one JSON
line per query: {"name": ..., "times": [...], "jvm_heap_mb": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_test_spark import registry  # noqa: E402
from kinesis_test_spark.session import get_spark  # noqa: E402
from kinesis_test_spark import plans  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    plan_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--plan":
            plan_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("kinesis_test_spark-qtime")
    from bench import BENCH_TABLES, force

    for table in BENCH_TABLES:
        spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
    spark.range(8).toDF("doc_id").mapInPandas(
        lambda it: it, "doc_id long"
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = registry.QUERIES[name]
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            try:
                df = fn(spark, sf_dir)
                with open(os.path.join(plan_dir, f"{name}.txt"), "w") as f:
                    f.write(plans.formatted(df))
            except Exception as e:  # streaming keys may not be plannable pre-run
                with open(os.path.join(plan_dir, f"{name}.txt"), "w") as f:
                    f.write(f"PLAN UNAVAILABLE: {e}\n")
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if name.startswith("s_"):
                df.count()
            else:
                force(df)
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"name": name, "times": times}), flush=True)


if __name__ == "__main__":
    main()
