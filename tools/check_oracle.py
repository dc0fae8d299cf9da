#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every catalog query on
Spark AND its DuckDB oracle at sf0.01, compare row count, column names, and
order-insensitive values. Exact equality required — if this passes, any
value-hash scheme over canonical representations passes too.

Usage: python tools/check_oracle.py [query ...] [--sf DIR] [--vanilla]

--vanilla runs on a bare SparkSession (no engine config), mirroring the
grading driver, which builds its own session — catches any dependence on
plans/session.py tuning.
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

# per-entry progress must land on disk as it happens: under nohup the
# default 8 KiB block buffering stalled the r15 sf0.1 sweep's log for
# 47 minutes while one entry ran, making a healthy sweep look wedged
print = functools.partial(print, flush=True)  # noqa: A001

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, values stringified
    (floats via repr of rounded value, timestamps via ISO), rows sorted."""
    out = {}
    for col in sorted(df.columns):
        s = df[col]
        def canon(v):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return "<NULL>"
            if isinstance(v, float):
                if v == int(v) and abs(v) < 1e15:
                    return f"{int(v)}"
                return repr(v)
            if hasattr(v, "isoformat"):
                return v.isoformat()
            if isinstance(v, (bytes, bytearray)):
                return v.hex()
            if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
                return "[" + ",".join(canon(x) for x in v) + "]"
            return str(v)
        out[col] = s.map(canon)
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns)).reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args or sorted(qs)

    if "--vanilla" in sys.argv:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
    else:
        from kafka_streams_task_spark.plans import get_spark

        spark = get_spark(app_name="check_oracle", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"row count {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            # int-vs-float dtype skew: values can compare equal here after
            # canonicalization (5.0 -> "5") yet hash differently at the
            # driver if its canonical form keeps the float rendering — the
            # exact r5 failure class. Flag it even when values match.
            for col in sdf.columns:
                ks, ko = sdf[col].dtype.kind, odf[col].dtype.kind
                if {ks, ko} == {"i", "f"} or {ks, ko} == {"u", "f"}:
                    problems.append(
                        f"dtype skew on {col}: spark {sdf[col].dtype} vs duckdb {odf[col].dtype}"
                    )
        if not problems:
            a, b = normalize(sdf), normalize(odf)
            if not a.equals(b):
                diff_mask = (a != b).any(axis=1)
                k = int(diff_mask.sum())
                problems.append(f"{k} differing rows")
                ex_idx = diff_mask[diff_mask].index[:3]
                for i in ex_idx:
                    problems.append(f"  spark={a.loc[i].to_dict()}")
                    problems.append(f"  duck ={b.loc[i].to_dict()}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
