#!/usr/bin/env python
"""Same-host A/B trial runner for the bench receipt protocol
(BENCH_BASELINE_r1.md): run N trials of named ops-bench workloads from a
given repo root (the current tree or a freeze-point worktree), using the
same session config and warm-up as bench.py, and print one JSON line with
the raw trials plus the calibration probes measured in the same session.

Usage:
  python tools/ab_trials.py --root /root/repo --trials 6 warc_parse cms_freq
  python tools/ab_trials.py --root /tmp/wt_r9 --trials 6 snapshot_diff

Run each root in a separate process (both roots define a `bench` module).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    root, trials, ops = None, 6, []
    i = 0
    while i < len(args):
        if args[i] in ("--root", "--trials"):
            if i + 1 >= len(args):
                print(f"{args[i]} requires a value\n{__doc__}", file=sys.stderr)
                return 2
            if args[i] == "--root":
                root = args[i + 1]
            else:
                try:
                    trials = int(args[i + 1])
                except ValueError:
                    print(f"--trials must be an int\n{__doc__}", file=sys.stderr)
                    return 2
            i += 2
        else:
            ops.append(args[i])
            i += 1
    if not root or not ops:
        print(__doc__, file=sys.stderr)
        return 2

    sys.path.insert(0, root)
    import bench  # the root's own bench module (freeze-point or current)

    from kafka_streams_task_spark.plans import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_trials")

    # bench.py's warm-up, verbatim: JVM codegen, parquet reader, shuffle,
    # and the per-core Python worker pool
    spark.range(1000).count()
    warm = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    warm.groupBy("l_returnflag").count().collect()
    warm.selectExpr("l_orderkey").distinct().count()
    n_part = spark.sparkContext.defaultParallelism
    spark.range(0, n_part * 10, 1, n_part).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # host-state probes (same workloads as bench.py's calib_sec/_io)
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.functions.geohash import geohash_expr

    def calib_once() -> float:
        t0 = time.time()
        frame = spark.range(0, 4_000_000, 1, n_part).select(
            ((F.col("id") % 1_800_000) / 10_000.0 - 90.0).alias("lat"),
            ((F.col("id") % 3_600_000) / 10_000.0 - 180.0).alias("lng"),
        )
        frame.select(geohash_expr("lat", "lng", 6).alias("g")).agg(
            F.max("g"), F.min("g"), F.count(F.lit(1))
        ).collect()
        return round(time.time() - t0, 3)

    calib = min(calib_once(), calib_once())

    workloads = bench._ops_workloads()
    raw = bench._raw_ops() if hasattr(bench, "_raw_ops") else {}
    # r17: fall back to catalog queries (bench.py's own resolution order),
    # so headline entries that are plain catalog functions can be trialed
    from kafka_streams_task_spark.catalog import CATALOG

    out: dict[str, list[float]] = {}
    for name in ops:
        fn = workloads.get(name) or raw.get(name)
        if fn is None and name in CATALOG:
            fn = CATALOG[name].fn
        if fn is None:
            print(f"# {name}: not in this root's bench", file=sys.stderr)
            continue
        runs = []
        for _ in range(trials):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
        print(f"# {name}: {runs} (min {min(runs)})", file=sys.stderr)

    print(json.dumps({"root": root, "calib_sec": calib, "trials": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
