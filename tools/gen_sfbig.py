#!/usr/bin/env python
"""Generate a scaled synthetic replica of the driver test tables for
SCALE EVALUATION receipts only (VERDICT r16 items 1/7/9/10: "evaluate at
sf1, not sf0.1"). /root/testdata is read-only and tops out at sf0.1;
this derives an sf1-shaped dataset by replicating each sf0.1 table with
deterministic key remapping and (for text) a per-replica nonce token so
near-dup structure does not collapse into exact-duplicate clusters.

NEVER read by any declared query, catalog entry, or bench workload —
experiment inputs only (the no-precomputation rule concerns outputs
keyed on /root/testdata; this writes new *inputs* elsewhere).

Usage: python tools/gen_sfbig.py [--mult 10] [--out /root/sfbig]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    mult, out, src = 10, "/root/sfbig", "/root/testdata/sf0.1"
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--mult":
            mult = int(args[i + 1])
            i += 1
        elif args[i] == "--out":
            out = args[i + 1]
            i += 1
        i += 1

    from kafka_streams_task_spark.plans import get_spark

    spark = get_spark(app_name="gen_sfbig")
    rep = spark.range(mult).select(F.col("id").alias("_rep"))

    # key spaces (sf0.1 row counts; replicas offset by block)
    # offset only primary keys (and the fact-side foreign keys that
    # reference an offset primary key: l_orderkey -> o_orderkey,
    # events.user_id -> a denser user population); dimension references
    # (l_partkey, l_suppkey, o_custkey) keep pointing at the original
    # dimension block — realistic fact-growth-over-shared-dimensions
    specs = {
        "documents": {"keys": {"doc_id": 5000}, "nonce_text": True},
        "embeddings": {"keys": {"vec_id": 2000}},
        "events": {"keys": {"event_id": 100000, "user_id": 1500}},
        "lineitem": {"keys": {"l_orderkey": 150000}},
        "orders": {"keys": {"o_orderkey": 150000}},
        "customer": {"keys": {"c_custkey": 15000}},
        "part": {"keys": {"p_partkey": 20000}},
        "supplier": {"keys": {"s_suppkey": 1000}},
        "nation": None,  # dimensions stay as-is
        "region": None,
    }
    os.makedirs(out, exist_ok=True)
    for name, spec in specs.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        if spec is None:
            big = df
        else:
            big = df.crossJoin(rep)
            for key, block in spec["keys"].items():
                if key in big.columns:
                    big = big.withColumn(
                        key, F.col(key) + F.col("_rep") * F.lit(block)
                    )
            if spec.get("nonce_text"):
                # nonce token per replica: keeps shingle/minhash structure
                # (each replica's near-dup pairs mirror the original's)
                # without creating exact-dup clusters of size `mult`
                big = big.withColumn(
                    "text",
                    F.concat(
                        F.col("text"),
                        F.lit(" nonce"),
                        F.col("_rep").cast("string"),
                    ),
                ).withColumn("n_chars", F.length("text"))
            big = big.drop("_rep")
        big.repartition(8).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"wrote {out}/{name}.parquet ({big.count()} rows)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
