#!/usr/bin/env python
"""Full-surface physical-plan audit (guide §7.2) — one row per batch key.

For every registered non-streaming query, prints a TSV line:
  key  n_exchange  joins  python_nodes  flags
where flags collects the classic anti-patterns: CartesianProduct,
BroadcastNestedLoopJoin (outside the sanctioned tiny-dim broadcasts),
BatchEvalPython (row-at-a-time UDF), missing WholeStageCodegen, and a
global Sort without a following Limit (TakeOrderedAndProject is fine).

Streaming keys (s_*) are skipped: building their DataFrame runs the
stream. Keys whose builder stages data still run their staging — run
against a small SF dir.
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_test_spark import registry  # noqa: E402
from kinesis_test_spark import plans  # noqa: E402
from kinesis_test_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:]
    registry.load_all()
    spark = get_spark("kinesis_test_spark-plan-audit")
    names = only or sorted(registry.QUERIES)
    for name in names:
        if name.startswith("s_"):
            continue
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = plans.formatted(df)
        except Exception as e:
            print(f"{name}\tERROR\t{type(e).__name__}: {e}")
            traceback.print_exc(file=sys.stderr)
            continue
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(\w*Join\w*)", plan))
            - {"Join"}
        )
        py = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInPandas|PythonMapInArrow|FlatMapGroupsInPandas)",
            plan)))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BatchEvalPython" in plan:
            flags.append("ROW_UDF")
        if re.search(r"\bSort\b(?!.*WindowGroupLimit)", plan) and \
           "TakeOrderedAndProject" not in plan and "GlobalLimit" not in plan \
           and plan.count("Sort [") > 2:
            flags.append("SORTS")
        print(
            f"{name}\t{n_ex}\t{','.join(joins) or '-'}\t"
            f"{','.join(py) or '-'}\t{','.join(flags) or '-'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
