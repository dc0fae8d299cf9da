"""Binary-classifier evaluation at corpus scale — ROC-AUC, average
precision, KS statistic, thresholded confusion tables, calibration.

The engine trains quality classifiers (``classifier.logreg_train``) and
scores corpora with them (``logreg_score``, ``dsir_score_dense``,
``kn_bigram_score``); choosing and defending a FILTER THRESHOLD needs
the evaluation half: rank-based metrics over hundreds of millions of
scored documents. The textbook formulation sorts all scores through one
``Window.orderBy`` — the single-task scale killer this codebase bans
(``export_training_shards`` rationale). Instead everything here reduces
to ONE aggregation per DISTINCT score value followed by an exact
two-level distributed prefix sum over the distinct-score table:

1. ``groupBy(score)`` → (n rows, n positives) per distinct score — the
   only pass over the full corpus; output is bounded by |distinct
   scores|, not |rows|.
2. Range-repartition the distinct-score table by score; per-partition
   EXCLUSIVE running sums partitioned BY the physical partition id
   (parallel); per-partition totals (one row each) offset-scanned on
   the driver and broadcast back — the ``sampling._ranged_prefix``
   pattern, reapplied.
3. Every metric is then a closed-form per-row expression + one final
   aggregate:
   - Mann-Whitney ROC-AUC with exact tie correction: average rank of a
     tied block = (rows below) + (block + 1)/2;
     AUC = (Σ_pos avg_rank − n_pos(n_pos+1)/2) / (n_pos · n_neg).
   - Average precision (step-wise, threshold at every distinct score,
     the scikit-learn definition): AP = Σ_s (np(s)/n_pos) · P(s) with
     P(s) = TP(s) / (TP(s)+FP(s)) over thresholds descending.
   - Kolmogorov-Smirnov: max_s |CDF_pos(s) − CDF_neg(s)| over the same
     cumulative columns.

Reference parity: no analogue in idavkaev/kafka-streams-task; this is
the beyond-reference training-data mandate (the model-quality leg the
classifier/DSIR/KN-LM scoring family was missing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..schemas import local_table


def _label01(label_col: str):
    # boolean or numeric labels both normalize to 0/1
    return F.col(label_col).cast("boolean").cast("int")


def _valid(score_col: str, label_col: str):
    """Rows an evaluation can use: non-NULL score and label, and a
    non-NaN score — Spark orders NaN ABOVE every numeric, so a NaN
    score would silently count as predicted-positive at every
    threshold and as the top rank; like NULL, it cannot be
    thresholded and is excluded (count upstream if presence
    matters)."""
    sc = F.col(score_col).cast("double")
    return (
        F.col(score_col).isNotNull()
        & F.col(label_col).isNotNull()
        & ~F.isnan(sc)
    )


def score_rank_table(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    num_range_partitions: int | None = None,
) -> DataFrame:
    """The shared substrate: one row per DISTINCT score with
    ``(score, n, np, cum_n, cum_np)`` where cum_* are EXCLUSIVE prefix
    sums over scores ascending (rows/positives with strictly smaller
    score). NULL scores and NULL labels are excluded (a NULL score
    cannot be thresholded; a NULL label cannot supervise) — count them
    upstream if presence matters.

    Runs two actions (the exact-prefix-sum price, as in
    ``export_training_shards``): a localCheckpoint pinning the ranged
    layout and a per-partition totals collect — one tiny row per range
    partition, never data rows."""
    per_score = (
        scored.filter(_valid(score_col, label_col))
        .groupBy(F.col(score_col).alias("score"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(_label01(label_col)).cast("long").alias("np"),
        )
    )
    spark = scored.sparkSession
    n_parts = (
        num_range_partitions or spark.sparkContext.defaultParallelism
    )
    ranged = per_score.repartitionByRange(n_parts, F.col("score")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_pre = ranged.withColumn(
        "_pre_n", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    ).withColumn(
        "_pre_np", F.coalesce(F.sum("np").over(w), F.lit(0)).cast("long")
    )
    # pin the ranged layout: consumed by the totals pass AND the final
    # join — a re-executed range shuffle could re-sample boundaries
    # under AQE between the two (export_training_shards rationale)
    with_pre = with_pre.localCheckpoint(eager=True)
    totals = (
        with_pre.groupBy("_pid")
        .agg(
            F.sum("n").cast("long").alias("_tn"),
            F.sum("np").cast("long").alias("_tnp"),
        )
        .collect()
    )
    acc_n = acc_np = 0
    offsets = []
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc_n, acc_np))
        acc_n += row["_tn"] or 0
        acc_np += row["_tnp"] or 0
    off = local_table(spark, offsets, "_pid int, _on long, _onp long")
    return (
        with_pre.join(F.broadcast(off), on="_pid")
        .select(
            "score",
            "n",
            "np",
            (F.col("_pre_n") + F.col("_on")).alias("cum_n"),
            (F.col("_pre_np") + F.col("_onp")).alias("cum_np"),
        )
    )


def classifier_eval(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    num_range_partitions: int | None = None,
) -> DataFrame:
    """One-row summary: ``(n, n_pos, n_neg, auc, ap, ks)``.

    ``auc`` is the exact tie-corrected Mann-Whitney ROC-AUC, ``ap`` the
    step-wise average precision (thresholds at every distinct score,
    descending — the scikit-learn definition), ``ks`` the
    Kolmogorov-Smirnov max CDF gap. All three are NULL when either
    class is empty (they are undefined; a filter threshold chosen from
    a one-class evaluation would be meaningless). Degenerate
    single-score corpora get AUC 0.5, AP = prevalence, KS 0 — the
    formulas, not special cases."""
    t = score_rank_table(
        scored, label_col, score_col, num_range_partitions
    )
    tot = t.agg(
        F.sum("n").cast("long").alias("_tot_n"),
        F.sum("np").cast("long").alias("_tot_np"),
    )
    j = t.crossJoin(F.broadcast(tot))
    npos = F.col("_tot_np").cast("double")
    nneg = (F.col("_tot_n") - F.col("_tot_np")).cast("double")
    # try_divide: a one-class corpus zeroes npos/nneg INSIDE the
    # aggregate, before the undefined-metric guard below can apply —
    # under ANSI mode a bare `/` kills the job instead of yielding the
    # NULL the guard then states explicitly
    avg_rank = F.col("cum_n") + (F.col("n") + 1.0) / 2.0
    tp = npos - F.col("cum_np")  # predict positive at threshold = score
    pp = F.col("_tot_n") - F.col("cum_n")  # rows with score >= threshold: >= n >= 1
    cdf_pos = F.try_divide((F.col("cum_np") + F.col("np")).cast("double"), npos)
    cdf_neg = F.try_divide(
        ((F.col("cum_n") + F.col("n")) - (F.col("cum_np") + F.col("np"))).cast(
            "double"
        ),
        nneg,
    )
    out = j.agg(
        F.first("_tot_n").alias("n"),
        F.first("_tot_np").alias("n_pos"),
        (F.first("_tot_n") - F.first("_tot_np")).alias("n_neg"),
        F.try_divide(
            F.sum(F.col("np") * avg_rank) - F.first(npos * (npos + 1.0) / 2.0),
            F.first(npos * nneg),
        ).alias("auc"),
        F.sum(F.try_divide(F.col("np"), npos) * (tp / pp)).alias("ap"),
        F.max(F.abs(cdf_pos - cdf_neg)).alias("ks"),
    )
    undef = (F.col("n_pos") == 0) | (F.col("n_neg") == 0)
    return out.select(
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("n_pos"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).alias("n_neg"),
        *[
            F.when(undef, F.lit(None).cast("double"))
            .otherwise(F.col(c))
            .alias(c)
            for c in ("auc", "ap", "ks")
        ],
    )


def classifier_eval_by_group(
    scored: DataFrame,
    group_col: str = "source",
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Per-group :func:`classifier_eval`: one row per value of
    ``group_col`` with ``(group, n, n_pos, n_neg, auc, ap, ks)`` — the
    fairness/segmentation view (does the quality classifier rank as
    well on 'de' documents as on 'en'? on blog domains as on news?).
    NULL groups form their own row (unlabeled rows are a real
    category). Metrics are NULL for one-class groups.

    Scale shape: the corpus collapses to one row per (group, distinct
    score) — the only full pass — then cumulative counts come from
    windows PARTITIONED BY GROUP over that table: parallel across
    groups, and each group's task is bounded by its own distinct-score
    count. That is the right plan when groups are many and moderately
    sized (languages, sources, domains); a single group holding most
    of the corpus degenerates to one task over its distinct scores —
    for that shape run :func:`classifier_eval` on the group's slice,
    which prices the ranking as a distributed prefix sum instead."""
    per = (
        scored.filter(_valid(score_col, label_col))
        .groupBy(
            F.col(group_col).alias("grp"), F.col(score_col).alias("score")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(_label01(label_col)).cast("long").alias("np"),
        )
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wg = Window.partitionBy("grp")
    t = (
        per.withColumn(
            "cum_n", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
        )
        .withColumn(
            "cum_np", F.coalesce(F.sum("np").over(w), F.lit(0)).cast("long")
        )
        .withColumn("_tot_n", F.sum("n").over(wg).cast("long"))
        .withColumn("_tot_np", F.sum("np").over(wg).cast("long"))
    )
    npos = F.col("_tot_np").cast("double")
    nneg = (F.col("_tot_n") - F.col("_tot_np")).cast("double")
    avg_rank = F.col("cum_n") + (F.col("n") + 1.0) / 2.0
    tp = npos - F.col("cum_np")
    pp = F.col("_tot_n") - F.col("cum_n")
    cdf_pos = F.try_divide((F.col("cum_np") + F.col("np")).cast("double"), npos)
    cdf_neg = F.try_divide(
        ((F.col("cum_n") + F.col("n")) - (F.col("cum_np") + F.col("np"))).cast(
            "double"
        ),
        nneg,
    )
    out = t.groupBy("grp").agg(
        F.first("_tot_n").alias("n"),
        F.first("_tot_np").alias("n_pos"),
        (F.first("_tot_n") - F.first("_tot_np")).alias("n_neg"),
        F.try_divide(
            F.sum(F.col("np") * avg_rank) - F.first(npos * (npos + 1.0) / 2.0),
            F.first(npos * nneg),
        ).alias("auc"),
        F.sum(F.try_divide(F.col("np"), npos) * (tp / pp)).alias("ap"),
        F.max(F.abs(cdf_pos - cdf_neg)).alias("ks"),
    )
    undef = (F.col("n_pos") == 0) | (F.col("n_neg") == 0)
    return out.select(
        F.col("grp").alias(group_col),
        "n",
        "n_pos",
        "n_neg",
        *[
            F.when(undef, F.lit(None).cast("double"))
            .otherwise(F.col(c))
            .alias(c)
            for c in ("auc", "ap", "ks")
        ],
    )


def fit_platt(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    max_iter: int = 50,
    tol: float = 1e-10,
) -> tuple[float, float]:
    """Platt scaling (Platt 1999): fit ``P(y=1|s) = sigmoid(a·s + b)``
    by regularized maximum likelihood, returning ``(a, b)`` — the
    standard way to turn a raw classifier margin (logreg_train,
    dsir_logw, a KN NLL) into a calibrated probability before
    thresholding. Uses Platt's smoothed targets t⁺ = (N⁺+1)/(N⁺+2),
    t⁻ = 1/(N⁻+2) (the MAP correction that keeps the fit finite on
    separable data).

    Scale shape: the corpus collapses ONCE to the distinct-score count
    table (:func:`score_rank_table`'s first stage — (score, n, np)
    rows), which is localCheckpointed; every Newton iteration is then
    one aggregate over that SMALL table producing the 2-vector
    gradient and 2×2 Hessian, solved on the driver. Total corpus
    passes: one, regardless of iterations. Raises on one-class input
    (the sigmoid would saturate to a constant)."""
    per_score = (
        scored.filter(_valid(score_col, label_col))
        .groupBy(F.col(score_col).cast("double").alias("s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(_label01(label_col)).cast("long").alias("np"),
        )
        .localCheckpoint(eager=True)
    )
    tot = per_score.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("np").cast("long").alias("np"),
    ).collect()[0]
    n_pos = int(tot["np"] or 0)
    n_neg = int(tot["n"] or 0) - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"fit_platt needs both classes (got {n_pos} pos / {n_neg} neg)"
        )
    t_pos = (n_pos + 1.0) / (n_pos + 2.0)
    t_neg = 1.0 / (n_neg + 2.0)
    a, b = 0.0, 0.0
    for _ in range(max_iter):
        z = F.lit(a) * F.col("s") + F.lit(b)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        # per distinct score: np rows with target t_pos, n-np with t_neg
        resid = (p - F.lit(t_pos)) * F.col("np") + (p - F.lit(t_neg)) * (
            F.col("n") - F.col("np")
        )
        w = p * (F.lit(1.0) - p) * F.col("n")
        g = per_score.agg(
            F.sum(resid * F.col("s")).alias("ga"),
            F.sum(resid).alias("gb"),
            F.sum(w * F.col("s") * F.col("s")).alias("haa"),
            F.sum(w * F.col("s")).alias("hab"),
            F.sum(w).alias("hbb"),
        ).collect()[0]
        ga, gb = g["ga"], g["gb"]
        haa, hab, hbb = g["haa"] + 1e-12, g["hab"], g["hbb"] + 1e-12
        det = haa * hbb - hab * hab
        if det <= 0:
            break
        da = (hbb * ga - hab * gb) / det
        db = (haa * gb - hab * ga) / det
        a, b = a - da, b - db
        if abs(da) < tol and abs(db) < tol:
            break
    return float(a), float(b)


def apply_platt(
    df: DataFrame,
    a: float,
    b: float,
    score_col: str = "score",
    out_col: str = "prob",
) -> DataFrame:
    """Add ``out_col = sigmoid(a·score + b)`` — one codegen expression,
    the serve half of :func:`fit_platt`."""
    z = F.lit(float(a)) * F.col(score_col).cast("double") + F.lit(float(b))
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def confusion_at_thresholds(
    scored: DataFrame,
    thresholds: list[float],
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """``(threshold, tp, fp, fn, tn, precision, recall, fpr)`` for each
    given threshold (predict positive when ``score >= threshold``) —
    the operating-point table behind a threshold choice.

    One pass, one wide aggregate: two conditional sums per threshold
    (true positives and predicted positives) map-side combine into a
    single row; the remaining cells derive algebraically. Bounded at 64
    thresholds — beyond that the generated aggregate risks the janino
    64 KB method limit (the codegen lesson); sweep in chunks or use
    :func:`score_rank_table` directly, which prices EVERY distinct
    score as a threshold for two shuffles total."""
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if len(thresholds) > 64:
        raise ValueError(
            f"{len(thresholds)} thresholds; cap is 64 per pass "
            "(codegen size) — chunk the sweep or use score_rank_table"
        )
    lab = _label01(label_col)
    clean = scored.filter(_valid(score_col, label_col))
    aggs = [F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(lab).cast("long").alias("_np")]
    for i, t in enumerate(thresholds):
        ge = (F.col(score_col) >= F.lit(float(t))).cast("int")
        aggs.append(F.sum(ge * lab).cast("long").alias(f"_tp{i}"))
        aggs.append(F.sum(ge).cast("long").alias(f"_pp{i}"))
    row = clean.agg(*aggs)
    legs = []
    for i, t in enumerate(thresholds):
        tp, pp = F.col(f"_tp{i}"), F.col(f"_pp{i}")
        fp = pp - tp
        fn = F.col("_np") - tp
        tn = F.col("_n") - pp - fn
        legs.append(
            F.struct(
                F.lit(float(t)).alias("threshold"),
                tp.alias("tp"),
                fp.alias("fp"),
                fn.alias("fn"),
                tn.alias("tn"),
                F.when(pp > 0, tp.cast("double") / pp).alias("precision"),
                F.when(F.col("_np") > 0, tp.cast("double") / F.col("_np")).alias(
                    "recall"
                ),
                F.when(
                    (F.col("_n") - F.col("_np")) > 0,
                    fp.cast("double") / (F.col("_n") - F.col("_np")),
                ).alias("fpr"),
            )
        )
    return row.select(
        F.explode(F.array(*legs)).alias("c")
    ).select("c.*")


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    label_col: str = "label",
    score_col: str = "score",
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability table: scores bucketed into ``n_bins`` equal-width
    bins over [lo, hi) (scores at exactly ``hi`` join the top bin, the
    usual probability-calibration convention): ``(bin, n, mean_score,
    pos_rate)`` — plot mean_score against pos_rate to read calibration.
    One groupBy; scores outside [lo, hi] clamp into the edge bins (a
    margin score is still evidence, just saturated)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    span = float(hi) - float(lo)
    if span <= 0:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    raw = F.floor(
        (F.col(score_col) - F.lit(float(lo))) / F.lit(span) * n_bins
    ).cast("long")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        scored.filter(_valid(score_col, label_col))
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(F.col(score_col).cast("double")).alias("mean_score"),
            F.avg(_label01(label_col).cast("double")).alias("pos_rate"),
        )
    )
