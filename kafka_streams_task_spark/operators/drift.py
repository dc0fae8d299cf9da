"""Corpus drift — distribution-level comparison of two corpus versions.

``snapshots.snapshot_diff`` answers WHICH rows changed between two
committed versions; this module answers whether the corpus CHANGED
CHARACTER: did the token distribution move (a crawl source went
boilerplate-heavy, a dedup pass clipped a register of text), did the
source/language mix shift, how much of the new version's token mass is
vocabulary the old version had never seen. These are the checks a
training-data team runs before promoting a corpus version — a model
trained on v17 will behave differently from v16 in proportion to
exactly these quantities.

Measures:
- Jensen-Shannon divergence between the two unigram token
  distributions (natural log; bounded by ln 2; symmetric; defined
  without smoothing because the mixture M = (P+Q)/2 covers the union
  support — the 0·ln0 terms drop by convention). JS rather than KL:
  KL(new‖old) is infinite the moment one genuinely new token appears,
  which is every real crawl delta.
- New-mass / lost-mass: the fraction of the new version's token
  occurrences carried by tokens absent from the old version, and vice
  versa — the headline "how much of this corpus is new vocabulary".
- Mix shift: per-group (source, lang, registered domain, …) row-count
  fractions in each version with their delta and log-ratio.

Distributed shape: one ``groupBy(token-hash)`` count per side (the
only full-corpus passes), a full outer join of the two count tables on
the 8-byte hash (vocabulary-sized, never corpus-sized), one final
aggregate. Token text never shuffles; nothing is collected. Counts
keyed by xxhash64 are count-identical to text keys barring ~n²/2⁶⁴
collisions (the ``unigram_nll_scores`` budget).

Reference parity: no analogue in idavkaev/kafka-streams-task —
beyond-reference training-data mandate (corpus versioning family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WHITESPACE_RE


def _token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(th, cnt) — corpus-wide token-occurrence counts on xxhash64."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.filter(
                    F.split(F.trim(F.col(text_col)), WHITESPACE_RE),
                    lambda x: x != "",
                )
            ).alias("tok")
        )
        .groupBy(F.xxhash64("tok").alias("th"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def corpus_drift_report(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """One-row report: ``(old_tokens, new_tokens, old_vocab, new_vocab,
    shared_vocab, js_divergence, new_mass, lost_mass)``.

    ``js_divergence`` is NULL when either side has no tokens (there is
    no distribution to compare); ``new_mass`` is the fraction of NEW
    token occurrences whose token never occurs in OLD; ``lost_mass``
    the mirror. Identical corpora report JS 0.0 and zero masses.

    Plan: two token-count aggregations, one full outer hash join on
    the token hash (eqNullSafe is unnecessary — xxhash64 never yields
    NULL for a non-NULL token), one aggregate. The join is
    vocabulary-sized; at 100 TB the vocabularies are the only thing
    that shuffles twice."""
    oc = _token_counts(old, text_col).withColumnRenamed("cnt", "oc")
    nc = _token_counts(new, text_col).withColumnRenamed("cnt", "nc")
    j = oc.join(nc, on="th", how="full_outer").select(
        F.coalesce(F.col("oc"), F.lit(0)).alias("oc"),
        F.coalesce(F.col("nc"), F.lit(0)).alias("nc"),
    )
    tot = j.agg(
        F.sum("oc").cast("long").alias("_to"),
        F.sum("nc").cast("long").alias("_tn"),
    )
    g = j.crossJoin(F.broadcast(tot))
    p = F.try_divide(F.col("oc").cast("double"), F.col("_to").cast("double"))
    q = F.try_divide(F.col("nc").cast("double"), F.col("_tn").cast("double"))
    m = (F.coalesce(p, F.lit(0.0)) + F.coalesce(q, F.lit(0.0))) / 2.0
    kl_p = F.when(F.col("oc") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
    kl_q = F.when(F.col("nc") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    out = g.agg(
        F.first("_to").alias("old_tokens"),
        F.first("_tn").alias("new_tokens"),
        F.sum((F.col("oc") > 0).cast("long")).alias("old_vocab"),
        F.sum((F.col("nc") > 0).cast("long")).alias("new_vocab"),
        F.sum(((F.col("oc") > 0) & (F.col("nc") > 0)).cast("long")).alias(
            "shared_vocab"
        ),
        ((F.sum(kl_p) + F.sum(kl_q)) / 2.0).alias("js_divergence"),
        F.try_divide(
            F.sum(F.when(F.col("oc") == 0, F.col("nc")).otherwise(0)).cast(
                "double"
            ),
            F.first("_tn").cast("double"),
        ).alias("new_mass"),
        F.try_divide(
            F.sum(F.when(F.col("nc") == 0, F.col("oc")).otherwise(0)).cast(
                "double"
            ),
            F.first("_to").cast("double"),
        ).alias("lost_mass"),
    )
    undef = (F.col("old_tokens") == 0) | (F.col("new_tokens") == 0)
    return out.select(
        F.coalesce(F.col("old_tokens"), F.lit(0)).alias("old_tokens"),
        F.coalesce(F.col("new_tokens"), F.lit(0)).alias("new_tokens"),
        F.coalesce(F.col("old_vocab"), F.lit(0)).alias("old_vocab"),
        F.coalesce(F.col("new_vocab"), F.lit(0)).alias("new_vocab"),
        F.coalesce(F.col("shared_vocab"), F.lit(0)).alias("shared_vocab"),
        F.when(undef, F.lit(None).cast("double"))
        .otherwise(F.col("js_divergence"))
        .alias("js_divergence"),
        "new_mass",
        "lost_mass",
    )


def mix_shift_report(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Per-group composition shift: ``(group, old_n, new_n, old_frac,
    new_frac, delta, log_ratio)`` over row counts — run it on source,
    lang, or a registered-domain column to see WHERE a corpus version
    moved. Groups absent from one side report zero count/fraction
    there; ``log_ratio = ln(new_frac / old_frac)`` is NULL for those
    (±infinity compressed to "appeared"/"vanished" by the NULL, which
    a threshold alert should treat as maximal shift). NULL group
    values form their own group (a real category: unlabeled rows)."""
    o = (
        old.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).cast("long").alias("old_n"))
    )
    n = (
        new.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).cast("long").alias("new_n"))
    )
    # eqNullSafe join so NULL groups meet instead of cross-missing
    # (merge-protocol lesson: on=key never matches NULLs)
    j = o.alias("o").join(
        n.alias("n"),
        F.col("o.grp").eqNullSafe(F.col("n.grp")),
        "full_outer",
    ).select(
        F.coalesce(F.col("o.grp"), F.col("n.grp")).alias("grp"),
        F.coalesce(F.col("old_n"), F.lit(0)).alias("old_n"),
        F.coalesce(F.col("new_n"), F.lit(0)).alias("new_n"),
    )
    tot = j.agg(
        F.sum("old_n").cast("double").alias("_to"),
        F.sum("new_n").cast("double").alias("_tn"),
    )
    of = F.try_divide(F.col("old_n").cast("double"), F.col("_to"))
    nf = F.try_divide(F.col("new_n").cast("double"), F.col("_tn"))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias(group_col),
            "old_n",
            "new_n",
            F.coalesce(of, F.lit(0.0)).alias("old_frac"),
            F.coalesce(nf, F.lit(0.0)).alias("new_frac"),
            (F.coalesce(nf, F.lit(0.0)) - F.coalesce(of, F.lit(0.0))).alias(
                "delta"
            ),
            F.when((F.col("old_n") > 0) & (F.col("new_n") > 0), F.log(nf / of))
            .otherwise(F.lit(None).cast("double"))
            .alias("log_ratio"),
        )
    )


def snapshot_drift(
    spark,
    path: str,
    old_version: int,
    new_version: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """:func:`corpus_drift_report` between two committed versions of a
    snapshot table (``operators.snapshots``) — ``new_version`` defaults
    to the latest. The pre-promotion gate: diff the distribution, not
    just the rows."""
    from .snapshots import snapshot_read

    old = snapshot_read(spark, path, old_version)
    new = snapshot_read(spark, path, new_version)
    return corpus_drift_report(old, new, text_col)
