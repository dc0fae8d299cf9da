"""Edit-distance record linkage: exact Levenshtein-threshold self-join.

Entity resolution over short strings (titles, names, URLs, product ids)
— "find every pair within k edits" — with a LOSSLESS candidate
generator, the q-gram cousin of the Jaccard prefix join
(operators/dedup.py). Verification is Spark's built-in ``levenshtein``
(unit-cost, the same definition DuckDB implements, so the oracle can
restate results exactly).

Completeness argument (two candidate sources, union):
  * q-gram blocking: one edit operation destroys at most ``q`` of a
    string's ``len - q + 1`` q-grams, so if ``lev(a, b) <= k`` and BOTH
    strings are "long" (``len - q + 1 > k*q``), the pair shares at least
    ``len_max - q + 1 - k*q >= 1`` q-gram — indexing q-grams catches
    every long-long pair.
  * length-window blocking: any pair within k edits satisfies
    ``|len_a - len_b| <= k`` (each edit changes length by at most 1).
    Every SHORT string (``len <= k*q + q - 1`` — where the q-gram bound
    goes vacuous: "ab" vs "cd" shares nothing at k=2) emits its length
    window ``[len-k, len+k]`` as join keys against ALL strings' exact
    lengths — catching short-short and short-long pairs. Short strings
    are the tiny tail of a name corpus, and the window join is keyed (no
    cross join); a corpus that is MOSTLY short needs a different blocker
    (phonetic keys), which is out of scope.

Both sources only generate candidates; ``levenshtein() <= k`` verifies
exactly, so extra candidates cost time, never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "doc_id",
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs with ``levenshtein <= k``: ``(id_a, id_b, distance)``,
    ``id_a < id_b``. Null/empty-handling: null strings never pair; empty
    strings pair through the length-window path (lev('', s) = len(s)).

    Scale shape: grams explode map-side and candidates form inside
    per-gram posting lists (the engine's group-membership pattern, with
    the ``size(members)`` guard left to the caller's upstream dedup —
    names corpora do not have mega-hot grams the way crawl text does);
    the length-window path shuffles only the short tail, keyed by
    integer length. Verification is one codegen ``levenshtein`` per
    distinct candidate.
    """
    strings = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_s"))
        .filter(F.col("_s").isNotNull())
        .withColumn("_len", F.length("_s"))
    )
    short_bound = k * q + q - 1

    grams = (
        strings.filter(F.col("_len") > short_bound)
        .select(
            "_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_len") - F.lit(q - 1)),
                    lambda i: F.col("_s").substr(i, F.lit(q)),
                )
            ).alias("g"),
        )
        .distinct()
    )
    gram_pairs = (
        grams.groupBy("g")
        .agg(F.array_sort(F.collect_list("_id")).alias("members"))
        .filter(F.size("members") >= 2)
        .select(F.posexplode("members").alias("i", "a"), "members")
        .select(
            "a",
            F.explode(F.expr("slice(members, i + 2, size(members))")).alias("b"),
        )
    )

    shorts = strings.filter(F.col("_len") <= short_bound)
    windows = shorts.select(
        F.col("_id").alias("sid"),
        F.explode(
            F.sequence(
                F.greatest(F.col("_len") - F.lit(k), F.lit(0)),
                F.col("_len") + F.lit(k),
            )
        ).alias("wlen"),
    )
    win_pairs = (
        windows.join(
            strings.select(F.col("_id").alias("oid"), F.col("_len").alias("wlen")),
            "wlen",
        )
        .filter(F.col("sid") != F.col("oid"))
        .select(
            F.least("sid", "oid").alias("a"), F.greatest("sid", "oid").alias("b")
        )
    )

    cand = gram_pairs.unionByName(win_pairs).distinct()
    sa = strings.select(F.col("_id").alias("a"), F.col("_s").alias("_sa"), F.col("_len").alias("_la"))
    sb = strings.select(F.col("_id").alias("b"), F.col("_s").alias("_sb"), F.col("_len").alias("_lb"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .filter(F.abs(F.col("_la") - F.col("_lb")) <= k)
        .select(
            F.col("a").alias("id_a"),
            F.col("b").alias("id_b"),
            F.levenshtein("_sa", "_sb").alias("distance"),
        )
        .filter(F.col("distance") <= k)
    )
