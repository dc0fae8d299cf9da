"""Hashed-feature linear text classifier (fastText-style quality filter).

The trainable half of the corpus quality story: pipelines like CCNet /
GPT-3 / LLaMA data prep score every crawled page with a lightweight
linear classifier (bag-of-words over hashed features) trained to separate
"looks like curated text" from "looks like crawl noise", then keep/weight
by the score. The engine's Gopher rules are the hand-written version of
this; this operator is the learned one. (Reference repo has no analogue —
north-star extension, SURVEY.md.)

Design for 100 TB:
  * features are TOKEN HASHES into a fixed-width space (the hashing
    trick, Weinberger et al. 2009) — no vocabulary object exists anywhere;
    the feature extractor is a pure column expression.
  * the feature index uses the engine's PORTABLE md5 hash (same
    arithmetic as ``hash_stratified_sample``'s membership check), so the
    DuckDB oracle can recompute scores bit-for-bit; a production deploy
    can swap xxhash64 for speed at the cost of oracle portability.
  * training is batch gradient descent expressed as joins + aggregates:
    the weight vector lives in a DataFrame of (idx, w) — never on the
    driver — and each iteration is two shuffles (margins by doc id,
    gradients by feature idx) + a broadcast-sized weight join. Indexes
    never observed in the training set keep weight 0 identically (their
    gradient is 0 with L2 on observed-only weights), so the weight table
    is bounded by DISTINCT OBSERVED features — min(n_features, corpus
    vocab), not n_features.
  * scoring joins exploded (id, idx, cnt) features against the weight
    table. With the default 2^18-feature space the weight side is a few
    MB and Catalyst broadcasts it: scoring a 100 TB corpus is one scan +
    one broadcast join + one re-aggregation by doc id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def feature_index(term: Column, n_features: int) -> Column:
    """Portable hashing-trick index in [0, n_features): the first 8 md5
    hex digits as an integer, mod the table width. DuckDB twin:
    ``CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % n``."""
    return F.pmod(
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long"),
        F.lit(n_features),
    )


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 18,
) -> DataFrame:
    """Bag-of-hashed-words features: ``(id_col, idx, cnt)``, one row per
    distinct feature per document. Colliding tokens pool their counts —
    the standard hashing-trick trade (collision noise vanishes as
    n_features grows past the active vocabulary)."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    return (
        tok.withColumn("idx", feature_index(F.col("term"), n_features))
        .groupBy(id_col, "idx")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )


def linear_margin(
    features: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    bias: float = 0.0,
) -> DataFrame:
    """``(id_col, margin)`` = Σ_idx cnt·w + bias over a document's
    features. Docs whose every feature is unweighted (or with no features)
    are absent — callers needing them use a left join against the id set
    and coalesce to ``bias`` (both the train and score paths below do)."""
    return (
        features.join(weights, "idx")
        .groupBy(id_col)
        .agg((F.sum(F.col("cnt") * F.col("w")) + F.lit(bias)).alias("margin"))
    )


def logreg_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    n_features: int = 1 << 18,
    n_iter: int = 10,
    lr: float = 1.0,
    l2: float = 0.0,
) -> DataFrame:
    """Distributed batch-GD logistic regression → weight table (idx, w).

    Full-batch gradient descent on the mean log-loss: per iteration,
    margins aggregate by doc, residuals (σ(m) − y) join back to features,
    and the gradient aggregates by feature idx — two partial+final
    shuffles, weights updated by a join (never collected). Lineage is cut
    per round with ``localCheckpoint`` (the bpe_train / connected-
    components iteration pattern). ``label_col`` is 0/1.

    Batch GD (not SGD) keeps the result layout-independent: every
    iteration's gradient is a commutative aggregate over all rows, so
    partitioning cannot change which model comes out (modulo float
    summation order, ~1e-15 relative).
    """
    feats = hashed_features(df, text_col, id_col, n_features).localCheckpoint(eager=True)
    # (id, y) is read every iteration — checkpoint it so training never
    # re-executes the (possibly expensive) upstream of ``df`` after the
    # first pass; freed with ``feats`` below
    labels = (
        df.select(F.col(id_col), F.col(label_col).cast("double").alias("_y"))
        .localCheckpoint(eager=True)
    )
    n = labels.count()
    weights = feats.select("idx").distinct().withColumn("w", F.lit(0.0)).localCheckpoint(eager=True)
    for _ in range(n_iter):
        margins = linear_margin(feats, weights, id_col)
        resid = (
            labels.join(margins, id_col, "left")
            .select(
                F.col(id_col),
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.coalesce(F.col("margin"), F.lit(0.0))))
                    - F.col("_y")
                ).alias("_r"),
            )
        )
        grads = (
            feats.join(resid, id_col)
            .groupBy("idx")
            .agg((F.sum(F.col("cnt") * F.col("_r")) / F.lit(float(n))).alias("_g"))
        )
        prev = weights
        weights = (
            weights.join(grads, "idx", "left")
            .select(
                "idx",
                (
                    F.col("w") * F.lit(1.0 - lr * l2)
                    - F.lit(lr) * F.coalesce(F.col("_g"), F.lit(0.0))
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
        # free the superseded round's blocks (bounded: one table of
        # observed-feature rows per round would otherwise accumulate)
        prev._jdf.queryExecution().analyzed().rdd().unpersist(False)
    # the feature and label tables die with training; only the weight
    # table (the result, one checkpointed block set) survives —
    # no-cached-blocks standard, see
    # test_classifier_train_leaves_one_checkpoint
    feats._jdf.queryExecution().analyzed().rdd().unpersist(False)
    labels._jdf.queryExecution().analyzed().rdd().unpersist(False)
    return weights


def logreg_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 18,
    bias: float = 0.0,
) -> DataFrame:
    """``(id_col, margin, prob)`` for every input document (docs with no
    weighted features score ``σ(bias)``). One scan + (broadcastable)
    weight join + one aggregate."""
    feats = hashed_features(df, text_col, id_col, n_features)
    m = linear_margin(feats, weights, id_col, bias)
    return (
        df.select(id_col)
        .join(m, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("margin"), F.lit(float(bias))).alias("margin"),
        )
        .withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))))
    )
