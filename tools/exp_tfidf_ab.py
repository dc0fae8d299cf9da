#!/usr/bin/env python
"""A/B the tfidf_top_terms df-computation forms (VERDICT r16 item 2).

Forms:
  window   — df = count(1) over (partition by term) on the tf table
             (current tree, opt-r16)
  joinback — df = tf.groupBy(term).agg(count) joined back to tf, with
             count("tf") forcing identical pruning below the (id, term)
             exchange so ReuseExchange keeps the corpus pass shared
             (the r15 shape re-stated without its double corpus pass)

Alternating min-of-N wall trials on the bench session + result parity
check. Usage: python tools/exp_tfidf_ab.py [--trials 5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _scored(tf: DataFrame, docs: DataFrame, id_col: str):
    from kafka_streams_task_spark.functions.rounding import stable_round

    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            stable_round(
                F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
                + F.lit(1.0),
                6,
            ),
        )
        .withColumn(
            "score_micro",
            F.round(F.col("tf") * F.col("idf") * F.lit(1e6)).cast("long"),
        )
    )


def _topk(scored: DataFrame, id_col: str, k: int):
    w = Window.partitionBy(id_col).orderBy(F.col("score_micro").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score_micro", "rank")
    )


def _tf(docs: DataFrame, id_col: str, text_col: str):
    from kafka_streams_task_spark.functions.text import tokens
    from kafka_streams_task_spark.schemas import fan_out_scan

    tok = (
        fan_out_scan(docs.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col),
            F.explode_outer(tokens(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term").isNotNull())
    )
    return tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_window(docs, text_col="text", id_col="doc_id", k=3):
    tf = _tf(docs, id_col, text_col)
    tf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    return _topk(_scored(tf, docs, id_col), id_col, k)


def tfidf_joinback(docs, text_col="text", id_col="doc_id", k=3):
    tf = _tf(docs, id_col, text_col)
    dft = tf.groupBy("term").agg(F.count("tf").alias("df"))
    tf = tf.join(dft, "term")
    return _topk(_scored(tf, docs, id_col), id_col, k)


def main() -> int:
    trials = 5
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka_streams_task_spark.plans import get_spark
    from kafka_streams_task_spark.schemas import load_table

    spark = get_spark(app_name="exp_tfidf_ab")
    spark.range(1000).count()
    n_part = spark.sparkContext.defaultParallelism
    spark.range(0, n_part * 10, 1, n_part).mapInPandas(lambda it: it, "id long").count()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # parity first (cheap at sf0.01)
    small = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(map(tuple, tfidf_window(small).collect()))
    b = sorted(map(tuple, tfidf_joinback(small).collect()))
    print(f"# parity sf0.01: {'OK' if a == b else 'MISMATCH'} ({len(a)} rows)")

    forms = {"window": tfidf_window, "joinback": tfidf_joinback}
    times: dict[str, list[float]] = {n: [] for n in forms}
    for t in range(trials):
        for name in (list(forms) if t % 2 == 0 else list(forms)[::-1]):
            spark.catalog.clearCache()
            t0 = time.time()
            forms[name](docs).count()
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        print(f"{name}: min {min(ts)} of {ts}")
    for name, fn in forms.items():
        plan = fn(docs)._jdf.queryExecution().executedPlan().toString()
        print(
            f"# {name}: Exchange={plan.count('Exchange')} "
            f"Sort={plan.count('Sort ')} Window={plan.count('Window')} "
            f"Scans={plan.count('Scan parquet')} Reused={plan.count('ReusedExchange')}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
