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

import numpy as np
import pandas as pd  # noqa: F401 — pandas_udf resolves the string
# type hints of jaro_winkler_udf's inner function against THIS module's
# globals at decoration time (project trap list, r10)

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


def _jaro_winkler_py(
    a: str, b: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7
) -> float:
    """Scalar Jaro-Winkler reference (Winkler 1990, the RapidFuzz/DuckDB
    convention: empty strings score 0, boost only when jaro STRICTLY
    exceeds 0.7, prefix capped at 4). The catalog gate cross-validates
    this from-scratch implementation against DuckDB's independent
    native ``jaro_winkler_similarity`` — two codebases, one spec."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    matched_b = [False] * lb
    pairs: list[tuple[int, int]] = []
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not matched_b[j] and b[j] == ca:
                matched_b[j] = True
                pairs.append((i, j))
                break
    m = len(pairs)
    if m == 0:
        return 0.0
    aseq = [a[i] for i, _ in pairs]
    bseq = [b[j] for j in sorted(j for _, j in pairs)]
    # integer HALF of the mismatch count — the original strcmp95 does
    # this division in C ints (and DuckDB/RapidFuzz follow); keeping
    # the .5 fraction diverges on odd mismatch counts (random-parity
    # test caught the case)
    t = float(sum(x != y for x, y in zip(aseq, bseq)) // 2)
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro > boost_threshold:
        prefix = 0
        for x, y in zip(a, b):
            if x != y or prefix == 4:
                break
            prefix += 1
        jaro += prefix * prefix_weight * (1.0 - jaro)
    return jaro


def _jaro_winkler_np(
    a_list, b_list, prefix_weight: float = 0.1, boost_threshold: float = 0.7
):
    """Batch Jaro-Winkler over parallel string lists, vectorized with
    numpy ACROSS pairs (the only Python loop left runs over character
    POSITIONS — bounded by the longest string in the batch, ~tens for
    names — while every per-pair decision is a boolean-matrix op).
    Returns a float64 array; same spec as :func:`_jaro_winkler_py`,
    which stays as the scalar reference the parity tests pin this
    against (tests/test_jaro.py): empty -> 0.0, strcmp95 integer-half
    transposition count, boost strictly above 0.7, prefix capped at 4.

    The greedy match loop vectorizes because for a FIXED position i of
    string a, "first unmatched j inside the window with b[j]==a[i]" is
    an argmax over a boolean row — independent across pairs. The
    matched-subsequence compaction (aseq/bseq for transposition
    counting) is the stable argsort-on-~mask trick: matched positions
    first, original order preserved."""
    n = len(a_list)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    la = np.array([len(s) for s in a_list], dtype=np.int64)
    lb = np.array([len(s) for s in b_list], dtype=np.int64)
    ml_a, ml_b = int(la.max()), int(lb.max())
    if ml_a == 0 or ml_b == 0:
        return out  # every pair has an empty side -> 0.0
    # codepoint matrices, padded with sentinels that cannot collide
    # (two different sentinels, both above the Unicode range). ONE
    # encode of the whole batch, scattered row-major — boolean-mask
    # assignment fills rows in concatenation order, so no per-row loop
    def _mat(strs, lens, width, fill):
        M = np.full((n, width), fill, dtype=np.uint32)
        flat = np.frombuffer(
            "".join(strs).encode("utf-32-le"), dtype=np.uint32
        )
        M[np.arange(width, dtype=np.int64)[None, :] < lens[:, None]] = flat
        return M

    A = _mat(a_list, la, ml_a, 0x110000)
    B = _mat(b_list, lb, ml_b, 0x110001)
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    cols_b = np.arange(ml_b, dtype=np.int64)[None, :]
    matched_a = np.zeros((n, ml_a), dtype=bool)
    matched_b = np.zeros((n, ml_b), dtype=bool)
    live = np.arange(n)[la > 0]  # rows still inside string a
    for i in range(ml_a):
        live = live[la[live] > i]
        if live.size == 0:
            break
        lo = np.maximum(0, i - window[live])[:, None]
        hi = np.minimum(lb[live], i + window[live] + 1)[:, None]
        cand = (
            (B[live] == A[live, i][:, None])
            & ~matched_b[live]
            & (cols_b >= lo)
            & (cols_b < hi)
        )
        hit = cand.any(axis=1)
        j = cand.argmax(axis=1)  # first True per row (greedy leftmost)
        rows = live[hit]
        matched_b[rows, j[hit]] = True
        matched_a[rows, i] = True
    m = matched_a.sum(axis=1)
    # compact matched chars in original order: stable sort on ~mask
    # floats matched positions to the front without reordering them
    ord_a = np.argsort(~matched_a, axis=1, kind="stable")
    ord_b = np.argsort(~matched_b, axis=1, kind="stable")
    aseq = np.take_along_axis(A, ord_a, axis=1)
    bseq = np.take_along_axis(B, ord_b, axis=1)
    mm = min(ml_a, ml_b)
    in_m = np.arange(mm, dtype=np.int64)[None, :] < m[:, None]
    t = ((aseq[:, :mm] != bseq[:, :mm]) & in_m).sum(axis=1) // 2
    ok = m > 0
    ms = m[ok].astype(np.float64)
    jaro = (
        ms / la[ok] + ms / lb[ok] + (ms - t[ok]) / ms
    ) / 3.0
    # common prefix, capped at 4 and at both lengths
    p = min(4, mm)
    pref_eq = (A[ok, :p] == B[ok, :p]) & (
        np.arange(p, dtype=np.int64)[None, :]
        < np.minimum(la[ok], lb[ok])[:, None]
    )
    prefix = np.cumprod(pref_eq, axis=1).sum(axis=1)
    boost = jaro > boost_threshold
    jaro = np.where(
        boost, jaro + prefix * prefix_weight * (1.0 - jaro), jaro
    )
    out[ok] = jaro
    return out


def jaro_winkler_udf(
    prefix_weight: float = 0.1, boost_threshold: float = 0.7
):
    """Arrow-batched Jaro-Winkler similarity ``(name_a, name_b) ->
    double`` for the verify tier of a blocked linkage join (pair
    frames are candidate-sized, never corpus-sized — and stay an
    ArrowEvalPython stage, never row-at-a-time). The kernel is the
    numpy batch implementation (:func:`_jaro_winkler_np`, VERDICT r15
    item 9 — per-pair work is boolean-matrix ops, not a Python char
    loop), parity-pinned against the scalar reference and DuckDB's
    native ``jaro_winkler_similarity``. NULL in -> NULL out.

    Marked asNondeterministic (the function is factually deterministic)
    so a threshold filter on the OUTPUT evaluates on the one Arrow
    stage instead of Catalyst splitting-and-duplicating the stage
    around the filter — the dsir_score_dense lesson; plan-audit caught
    the duplicated stage in phonetic_jw_pairs."""
    from pyspark.sql.functions import pandas_udf

    # above this length a pair leaves the numpy batch: the kernel pads
    # every row to the BATCH max length (O(rows x maxlen) matrices), so
    # one mis-mapped multi-KB value would inflate memory for the whole
    # Arrow batch (review r16). Name-length strings stay vectorized;
    # rare outliers take the O(|s|) -per-pair scalar reference instead.
    _NP_MAX_LEN = 512

    @pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        null = a.isna() | b.isna()
        lengths = a.str.len().fillna(0).combine(
            b.str.len().fillna(0), max
        )
        long = ~null & (lengths > _NP_MAX_LEN)
        val = ~null & ~long
        out = pd.Series([None] * len(a), dtype="float64")
        if val.any():
            out[val] = _jaro_winkler_np(
                a[val].tolist(), b[val].tolist(),
                prefix_weight, boost_threshold,
            )
        if long.any():
            out[long] = [
                _jaro_winkler_py(x, y, prefix_weight, boost_threshold)
                for x, y in zip(a[long], b[long])
            ]
        return out

    return _jw.asNondeterministic()


def unicode_prefold():
    """Arrow-batched ``string -> string`` NFC + casefold: the unicode
    pre-fold for name matching (VERDICT r10 item 5). NFC collapses
    composed/decomposed accent encodings (macOS exports are NFD) and
    ``str.casefold`` is the Unicode full case fold (ß -> ss, not just
    lower()), so byte-distinct spellings of the same name block and
    score identically. NULL in -> NULL out.

    Marked asNondeterministic (factually deterministic): downstream
    codegen filters DERIVE from this output (soundex keys, null guards)
    and Catalyst would otherwise push them below the stage with the
    derivation substituted — splitting and DUPLICATING the Arrow stage
    (the dsir_score_dense lesson)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fold(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC").map(
            lambda x: x.casefold() if isinstance(x, str) else None
        )

    return _fold.asNondeterministic()


def phonetic_jw_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    min_sim: float = 0.85,
    prefold: bool = False,
) -> DataFrame:
    """Classic record-linkage stack: Soundex blocking
    (functions/phonetic.py) generates candidates, Jaro-Winkler >=
    ``min_sim`` verifies. Returns (id_a, id_b, name_a, name_b, jw).
    The block join shuffles on the 4-char phonetic key; names ride
    the candidate pairs only (never all-pairs).

    ``prefold=True`` NFC+casefolds names (one extra Arrow stage over
    the corpus, :func:`unicode_prefold`) BEFORE both blocking and
    scoring, so composed/decomposed accents and case/ß variants of the
    same name land in one block and score 1.0; ``name_a``/``name_b``
    stay the original spellings. Without it the scorer sees raw
    codepoints — parity with DuckDB's byte-based
    ``jaro_winkler_similarity`` holds on ASCII only (the catalog gate
    keeps its inputs ASCII; tests/test_jaro.py pins the non-ASCII
    divergence vectors)."""
    from ..functions.phonetic import soundex_expr

    match_src = (
        unicode_prefold()(F.col(name_col)) if prefold else F.col(name_col)
    )
    keyed = (
        df.select(
            F.col(id_col).alias("_lid"),
            F.col(name_col).alias("_lname"),
            match_src.alias("_lmatch"),
        )
        .select("*", soundex_expr("_lmatch").alias("_sdx"))
        .filter(F.col("_sdx").isNotNull())
    )
    a = keyed.select(
        F.col("_lid").alias("id_a"),
        F.col("_lname").alias("name_a"),
        F.col("_lmatch").alias("_ma"),
        "_sdx",
    )
    b = keyed.select(
        F.col("_lid").alias("id_b"),
        F.col("_lname").alias("name_b"),
        F.col("_lmatch").alias("_mb"),
        "_sdx",
    )
    jw = jaro_winkler_udf()
    return (
        a.join(b, "_sdx", "inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jw", jw(F.col("_ma"), F.col("_mb")))
        .filter(F.col("jw") >= F.lit(float(min_sim)))
        .select("id_a", "id_b", "name_a", "name_b", "jw")
    )
