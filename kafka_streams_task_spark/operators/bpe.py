"""Trained byte-pair-encoding tokenizer: distributed pair-merge training
and a memoized Arrow-batched encoder.

BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") trains by repeatedly merging the most frequent adjacent
symbol pair. The distributed formulation exploits the classic reduction:
training statistics depend only on the DISTINCT-WORD frequency table, not
the corpus — one aggregation collapses 100 TB of text to |vocabulary|
rows, and every merge round is then a cheap job over that table:

  1. corpus -> (word, count)            one explode + partial/final agg
  2. word   -> symbol array             chars + end-of-word marker, JVM split
  3. per round:
       pair counts = explode adjacent pairs weighted by count
                     -> groupBy(a, b) -> sum        (partial agg, one shuffle)
       top pair(s) -> driver            (k rows — the only driver traffic)
       apply merge to every word        JVM fold expression, map-only
       localCheckpoint                  truncates the per-round lineage
                                        (same pattern as cluster.py's CC)

Strict sequential BPE is one merge per round (``batch_k=1`` — matches the
reference algorithm exactly, pinned by tests against a pure-Python
implementation). ``batch_k > 1`` takes the top-k pairwise-DISJOINT pairs
per round (no shared symbols, so application order within the round cannot
matter) — the standard practical batching that cuts round count ~k× at the
cost of a slightly different (still valid, still lossless) merge sequence.

Encoding is genuinely procedural (rank-ordered merge loops per word), so
the encoder is the one deliberate Python stage: mapInPandas with a
per-batch word -> subwords memo — word types repeat heavily, so the
amortized cost per token is a dict hit, and only (id, subwords) Arrow
batches cross the boundary.

Reference parity: absent from the reference engine (beyond-reference
training-data mandate); replaces the regex approximation
``functions.text.bpe_ish_tokens`` for token-budget accounting.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokens

#: End-of-word marker symbol. A control character so it cannot collide with
#: real corpus characters; merges may absorb it (e.g. ('e', EOW) -> 'e\x03'),
#: which is how BPE learns suffixes.
EOW = "\x03"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the whitespace-tokenized corpus — the only stage
    that touches the full corpus.

    Zero-length words are filtered: ``tokens`` yields ``''`` for empty /
    whitespace-only documents, and the trainer's ``_initial_symbols``
    would map it to ``['', EOW]`` while the encoder's ``_encode_word``
    maps it to ``[EOW]`` — the trainer could then learn a ``('', EOW)``
    merge the encoder never applies. Dropping the empty word keeps both
    sides on identical symbol sequences for every trainable word."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(syms: array<string>, count): characters plus the EOW marker."""
    return words.select(
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("syms"),
        "count",
    )


def _apply_merge(syms, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) -> a+b inside a symbol
    array, as a single JVM fold (no Python): append each symbol unless it
    forms the pair with the accumulator's last element, in which case the
    last element is replaced by the merged symbol. Matches re.sub-style
    non-overlapping left-to-right replacement ([a,a,a] with (a,a) ->
    [aa, a])."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    batch_k: int = 1,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list (rank = list position).

    ``batch_k=1`` is exact sequential BPE with deterministic tie-breaks
    (count desc, then (a, b) lexicographically — the same order a
    single-machine implementation with sorted() produces). ``batch_k > 1``
    applies up to k mutually symbol-disjoint top pairs per round (see
    module docstring). Training stops early when no pair reaches
    ``min_pair_count``.

    Driver traffic per round is ``batch_k`` rows; the word table stays
    distributed and is localCheckpoint-ed each round to truncate lineage
    (blocks are reclaimed by the ContextCleaner when the loop's handle is
    dropped)."""
    if n_merges < 1:
        return []
    words = _initial_symbols(word_frequencies(df, text_col)).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        k = min(batch_k, n_merges - len(merges))
        pair_structs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("a"),
                    F.element_at(F.col("syms"), i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        top = (
            words.select(F.explode(pair_structs).alias("p"), "count")
            .groupBy("p.a", "p.b")
            .agg(F.sum("count").alias("n"))
            .filter(F.col("n") >= min_pair_count)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(k)
            .collect()
        )
        if not top:
            break
        # keep only mutually symbol-disjoint pairs so in-round application
        # order cannot matter (for batch_k=1 this is a no-op)
        used: set[str] = set()
        round_merges = []
        for r in top:
            if r["a"] in used or r["b"] in used:
                continue
            round_merges.append((r["a"], r["b"]))
            used.update((r["a"], r["b"], r["a"] + r["b"]))
        syms = F.col("syms")
        for a, b in round_merges:
            syms = _apply_merge(syms, a, b)
        words = words.select(syms.alias("syms"), "count").localCheckpoint(eager=True)
        merges.extend(round_merges)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard rank-ordered BPE encoding of one word (lowest-rank pair
    merged first, greedy left-to-right within a pass) — the same operator
    order the trainer used, so training-corpus words reproduce their
    trained segmentation."""
    syms = list(word) + [EOW]
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, subwords: array<string>, n_subwords) under a trained merge
    list. Tokenization to words happens JVM-side; the per-word merge loop
    runs in mapInPandas with a word -> subwords memo per batch (word types
    repeat, so each distinct word is encoded once per batch)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("words"))
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("subwords", T.ArrayType(T.StringType())),
            T.StructField("n_subwords", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = _encode_word(word, ranks)
            return got

        for pdf in it:
            subs = [
                [s for w in (ws if ws is not None else []) for s in enc(w)]
                for ws in pdf["words"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "subwords": subs,
                    "n_subwords": pd.Series([len(s) for s in subs], dtype="int32"),
                }
            )

    return toks.mapInPandas(batches, out_schema)
