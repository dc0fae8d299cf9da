"""Compression-ratio quality signal (zlib) — the classic "is this text
mostly boilerplate/repetition" heuristic used by public web-corpus
pipelines (e.g. the RedPajama-v2/Dolma quality-signal sets): highly
compressible documents are template spam, keyword stuffing, or
degenerate repetition; incompressible ones are often encoded binary
mistaken for text. Complements the engine's codegen signals —
``char_entropy`` sees only the unigram byte distribution,
``gopher_repetition_columns`` only fixed n-gram windows, while LZ77+
Huffman capture long-range and variable-length structure.

Spark-first shape: zlib lives in CPython, so this is the engine's
standard Arrow seam (the unicode_norm/multimodal pattern): ONE
vectorized pandas stage, narrow map, no shuffle, NULL in -> NULL out.
The stage is ``asNondeterministic``-pinned (factually deterministic)
so downstream threshold filters evaluate on the one stage instead of
Catalyst splitting-and-duplicating it (the dsir_score_dense lesson).

Determinism note: the RATIO for a given input is fixed for a given
zlib build (level 6, default strategy); zlib versions have produced
byte-identical streams for these settings for decades, but the gates
still avoid freezing raw ratios cross-engine — the catalog leg states
ORDERING/BOUND invariants (repetitive < natural < random, ratio
bounds) plus exact NULL/empty contracts, and pytest pins reference
values computed with the SAME interpreter's zlib.

Reference provenance: no analogue in idavkaev/kafka-streams-task —
beyond-reference training-data mandate (text-quality family).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["compression_ratio", "compression_signals"]


def compression_ratio(col: Column | str, level: int = 6) -> Column:
    """``len(zlib.compress(utf8(text), level)) / len(utf8(text))`` as a
    double — LOW means repetitive/templated, HIGH means high-entropy.
    NULL text -> NULL; empty text -> NULL (no bytes to characterize;
    zlib's 8-byte header would otherwise report ratio 8.0)."""
    if not 1 <= int(level) <= 9:
        raise ValueError(f"zlib level must be 1..9, got {level}")
    lvl = int(level)

    @F.pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(x):
            if not isinstance(x, str) or len(x) == 0:
                return None
            raw = x.encode("utf-8")
            return len(zlib.compress(raw, lvl)) / len(raw)

        return s.map(one)

    c = F.col(col) if isinstance(col, str) else col
    return _ratio.asNondeterministic()(c)


def compression_signals(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Append ``compression_ratio`` to ``df`` — the quality-pipeline
    convenience form (filter afterwards with a plain ``.filter``; the
    nondeterministic pin keeps the stage single)."""
    return df.withColumn(
        "compression_ratio", compression_ratio(F.col(text_col), level)
    )
