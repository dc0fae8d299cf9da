"""Trained BPE: distributed trainer vs a pure-Python reference, encoder
round-trip/conservation properties, and the batched-merge mode."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    word_frequencies,
)


def ref_bpe_train(word_counts: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Reference sequential BPE (Sennrich et al. 2016 alg.): count adjacent
    pairs over the word-frequency table, merge the best pair (ties broken
    lexicographically), repeat."""
    words = [(list(w) + [EOW], c) for w, c in word_counts.items()]
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, c in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        eligible = [(n, p) for p, n in counts.items() if n >= min_pair_count]
        if not eligible:
            break
        best = min(eligible, key=lambda t: (-t[0], t[1]))[1]
        a, b = best
        new_words = []
        for syms, c in words:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_words.append((out, c))
        words = new_words
        merges.append(best)
    return merges


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest widest"),
]


def test_trainer_matches_reference_exactly(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    wc = Counter(w for _, t in CORPUS for w in t.split())
    for n_merges in (1, 5, 12):
        got = bpe_train(df, n_merges=n_merges)
        want = ref_bpe_train(dict(wc), n_merges)
        assert got == want, f"n_merges={n_merges}: {got} != {want}"


def test_trainer_learns_classic_subwords(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe_train(df, n_merges=10)
    built = {a + b for a, b in merges}
    # "est\x03" (the -est suffix) must emerge from the newest/widest mass
    assert any("est" in s for s in built)


def test_encoder_conservation_and_segmentation(spark):
    """concat(subwords) must reproduce each word + EOW exactly (lossless),
    and training-corpus words must encode to their trained segmentation."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe_train(df, n_merges=8)
    enc = {r.doc_id: r.subwords for r in bpe_encode(df, merges).collect()}
    for doc_id, text in CORPUS:
        joined = "".join(enc[doc_id])
        assert joined == "".join(w + EOW for w in text.split())
    # segmentation check: every EOW-terminated group is a valid merge result
    ranks = {p: i for i, p in enumerate(merges)}
    from kafka_streams_task_spark.operators.bpe import _encode_word

    for w in {"low", "lower", "newest", "widest"}:
        segs = _encode_word(w, ranks)
        assert "".join(segs) == w + EOW


def test_batched_training_is_lossless_and_bounded(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe_train(df, n_merges=12, batch_k=4)
    assert 0 < len(merges) <= 12
    # whatever merge sequence batching produced, encoding stays lossless
    enc = {r.doc_id: r.subwords for r in bpe_encode(df, merges).collect()}
    for doc_id, text in CORPUS:
        assert "".join(enc[doc_id]) == "".join(w + EOW for w in text.split())
    # disjointness within a round implies no merge's parts were built by a
    # LATER merge: each merge's a/b is either a char, EOW, or an earlier result
    seen = set()
    import string

    for a, b in merges:
        for part in (a, b):
            assert (
                len(part) == 1 or part == EOW or part in seen
            ), f"{part} used before being built"
        seen.add(a + b)


def test_word_frequencies_matches_counter(spark, sf_dir):
    from kafka_streams_task_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {r.word: r["count"] for r in word_frequencies(docs).collect()}
    want = Counter(
        w for r in docs.select("text").collect() for w in r.text.strip().split()
    )
    assert got == dict(want)


def test_empty_documents_dont_poison_training(spark):
    """ADVICE r4: empty / whitespace-only docs tokenize to '' — the trainer
    must not see it (it would learn a ('', EOW) merge the encoder never
    applies). Training on a corpus WITH empty docs must match the pure-
    Python reference over the non-empty words, and encoding stays
    conservation-consistent: an empty doc encodes to exactly one
    EOW-marked subword carrying zero characters (mirroring its single
    empty 'word')."""
    docs = CORPUS + [(90, ""), (91, "   "), (92, "\n\t ")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    wf = {r.word: r["count"] for r in word_frequencies(df).collect()}
    assert "" not in wf
    want = Counter(w for _, t in CORPUS for w in t.split())
    assert wf == dict(want)
    merges = bpe_train(df, n_merges=8, batch_k=1)
    assert merges == ref_bpe_train(dict(want), 8)
    assert not any(a == "" or b == "" for a, b in merges)
    enc = {r.doc_id: r.subwords for r in bpe_encode(df, merges).collect()}
    for d in (90, 91, 92):
        assert [s for s in enc[d] if EOW in s] == enc[d]  # every subword marked
        assert "".join(enc[d]).replace(EOW, "") == ""     # zero char mass


def test_empty_and_trivial_corpora(spark):
    df = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
    # single 1-char word: only pair is (char, EOW); with min_pair_count=2
    # and count 1 nothing merges
    assert bpe_train(df, n_merges=5) == []
    merges = bpe_train(df, n_merges=5, min_pair_count=1)
    assert merges  # now ('a', EOW) merges
    enc = bpe_encode(df, merges).collect()[0]
    assert enc.subwords == ["a" + EOW]
