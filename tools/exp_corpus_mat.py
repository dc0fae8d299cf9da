#!/usr/bin/env python
"""Materialized-intermediate evaluation for the multi-consumer corpus
operators (VERDICT r16 item 1): does pinning the shared dl / gram table
beat Catalyst's re-expanded per-consumer corpus passes once the corpus
is big enough?

Forms (bm25_top_docs shape, the bench workload's parameters):
  current — the r16 tree: tf chain + dl join + stats agg each re-expand
            the corpus projection (3 corpus passes in one job)
  ck      — dl := dl.localCheckpoint(eager); stats and the join read the
            pinned rows (2 corpus passes + a checkpoint barrier)
  parquet — dl written to local parquet and read back (2 corpus passes +
            a write/read round trip; the shape a 100 TB pipeline uses)

Usage: python tools/exp_corpus_mat.py [--sf DIR] [--trials 4]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bm25(docs, queries, dl_mode: str, tmpdir: str, k=10, k1=1.25, b=0.75):
    from kafka_streams_task_spark.functions.rounding import stable_round
    from kafka_streams_task_spark.functions.text import tokens
    from kafka_streams_task_spark.schemas import fan_out_scan

    id_col, qid_col = "doc_id", "query_id"
    qterms = queries.select(
        F.col(qid_col), F.explode(tokens(F.col("text"))).alias("term")
    ).distinct()
    qterm_set = qterms.select("term").distinct()
    corpus = fan_out_scan(docs.select(F.col(id_col), F.col("text")))
    tok = corpus.select(
        F.col(id_col), F.explode_outer(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isNotNull())
    tf = (
        tok.join(F.broadcast(qterm_set), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = corpus.select(F.col(id_col), F.size(tokens(F.col("text"))).alias("dl"))
    if dl_mode == "ck":
        dl = dl.localCheckpoint(eager=True)
    elif dl_mode == "parquet":
        p = f"{tmpdir}/dl"
        dl.write.mode("overwrite").parquet(p)
        dl = docs.sparkSession.read.parquet(p)
    tf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("double").alias("n_tokens"),
    ).select("n_docs", (F.col("n_tokens") / F.col("n_docs")).alias("avgdl"))
    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            stable_round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ),
                6,
            ),
        )
        .withColumn(
            "c_micro",
            F.round(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
                * F.lit(1e6)
                + F.lit(1e-9)
            ).cast("long"),
        )
    )
    scored = contrib.groupBy(qid_col, id_col).agg(F.sum("c_micro").alias("score_micro"))
    w = Window.partitionBy(qid_col).orderBy(F.col("score_micro").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "score_micro", "rank")
    )


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    trials = 4
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 1
        elif args[i] == "--trials":
            trials = int(args[i + 1])
            i += 1
        i += 1

    from kafka_streams_task_spark.functions.text import tokens
    from kafka_streams_task_spark.plans import get_spark

    spark = get_spark(app_name="exp_corpus_mat")
    spark.range(1000).count()
    n_part = spark.sparkContext.defaultParallelism
    spark.range(0, n_part * 10, 1, n_part).mapInPandas(lambda it: it, "id long").count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.col("text")), 1, 4), " ").alias("text"),
    )
    tmpdir = tempfile.mkdtemp(prefix="exp_corpus_mat_")
    try:
        # parity
        base = sorted(map(tuple, _bm25(docs, queries, "current", tmpdir).collect()))
        for mode in ("ck", "parquet"):
            got = sorted(map(tuple, _bm25(docs, queries, mode, tmpdir).collect()))
            print(f"# parity {mode}: {'OK' if got == base else 'MISMATCH'}")
        times = {m: [] for m in ("current", "ck", "parquet")}
        for t in range(trials):
            for mode in times:
                spark.catalog.clearCache()
                t0 = time.time()
                _bm25(docs, queries, mode, tmpdir).count()
                times[mode].append(round(time.time() - t0, 3))
        for mode, ts in times.items():
            print(f"{mode}: min {min(ts)} of {ts}")
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
