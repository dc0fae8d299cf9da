"""Unicode normalization stage (r7, VERDICT r6 item 5).

``clean_text`` (functions/text.py) deliberately excludes Unicode
normalization to stay a pure codegen expression chain — but a corpus that
mixes normalization forms (NFC from one crawler, NFD from a macOS export)
then carries byte-distinct copies of the same document: ``dedup_exact``
sees different md5 digests, and URL/domain keys fork on composed vs
decomposed accents. This operator is the documented step BEFORE
``clean_text`` / ``dedup_exact`` for such corpora.

Spark has no builtin NFC/NFKC expression, so this is the engine's
standard Arrow seam (the multimodal-columns pattern,
``operators/multimodal.py``): a vectorized pandas transformation over
Arrow batches — a narrow per-partition map, no shuffle, no row-at-a-time
Python. pandas' ``Series.str.normalize`` wraps ``unicodedata.normalize``
over the whole batch and propagates nulls.

Reference provenance: no analogue in idavkaev/kafka-streams-task; part of
the 100 TB training-data-pipeline extension surface (SURVEY.md).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Column form: Unicode-normalize a string column (Arrow-batched
    pandas UDF — one vectorized Python stage, nulls propagate)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return _norm(F.col(col) if isinstance(col, str) else col)


def normalize_unicode(
    df: DataFrame, cols: tuple[str, ...] = ("text",), form: str = "NFC"
) -> DataFrame:
    """Replace each of ``cols`` with its ``form``-normalized value.

    Run this BEFORE ``clean_text`` and before any content-keyed stage
    (``dedup_exact``, MinHash shingles, URL/domain extraction over
    user-supplied strings) when the corpus may mix normalization forms;
    NFC is the web's canonical form. One Arrow stage regardless of
    column count; everything else in the plan stays JVM-side."""
    out = df
    for c in cols:
        out = out.withColumn(c, unicode_normalize(F.col(c), form))
    return out
