#!/usr/bin/env python
"""Catalog-wide physical-plan audit: print per-query plan-quality stats
(cartesian products, nested-loop joins, Python/Arrow stages, exchanges)
for every registered catalog query, without executing anything.

Usage: python tools/plan_audit.py [--sf DIR]

The enforced invariants live in tests/test_plan_audit.py; this tool is
the exploratory view (run it after touching an operator to see where
the plan moved).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PY_STAGES = r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"


def audit(plan: str) -> dict:
    return {
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "python": len(re.findall(PY_STAGES, plan)),
        "exchanges": plan.count("Exchange "),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
    }


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf" and i + 1 < len(args):
            sf_dir = args[i + 1]

    from kafka_streams_task_spark.catalog import CATALOG
    from kafka_streams_task_spark.plans import get_spark

    spark = get_spark(app_name="plan_audit", shuffle_partitions=8)
    print(f"{'query':36} cart bnlj py xchg bhj smj")
    for name, spec in CATALOG.items():
        try:
            plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"{name:36} ERROR {str(ex)[:60]}")
            continue
        s = audit(plan)
        print(
            f"{name:36} {s['cartesian']:4} {s['bnlj']:4} {s['python']:2} "
            f"{s['exchanges']:4} {s['bhj']:3} {s['smj']:3}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


# NOTE (r16): the enforced column-pruning twin of this exploratory view
# lives in tests/test_plan_audit.py::
# test_column_pruning_reaches_every_parquet_scan — no catalog query may
# FileScan the full width of a multi-column driver table.
