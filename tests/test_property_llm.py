"""Hypothesis property tests: the distributed BPE trainer and the
group-membership Jaccard pairs against brute-force references on random
small corpora. Few examples, no deadline — each example runs Spark jobs."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_task_spark.operators.bpe import EOW, bpe_encode, bpe_train
from tests.test_bpe import ref_bpe_train

# words over a 3-letter alphabet: heavy pair collisions, adversarial ties
word = st.text(alphabet="abc", min_size=1, max_size=6)
corpus = st.lists(
    st.lists(word, min_size=1, max_size=8).map(" ".join), min_size=1, max_size=6
)


@settings(max_examples=5, deadline=None)
@given(docs=corpus, n_merges=st.integers(min_value=1, max_value=8))
def test_bpe_trainer_matches_reference_on_random_corpora(spark, docs, n_merges):
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    wc = Counter(w for t in docs for w in t.split())
    got = bpe_train(df, n_merges=n_merges)
    want = ref_bpe_train(dict(wc), n_merges)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(docs=corpus)
def test_bpe_encode_lossless_on_random_corpora(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    merges = bpe_train(df, n_merges=6)
    enc = {r.doc_id: r.subwords for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(docs):
        assert "".join(enc[i]) == "".join(w + EOW for w in t.split())


def _ref_jaccard_pairs(docs, n=3, threshold=0.2):
    def sh(text):
        t = text.strip().split()
        if len(t) < n:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    out = {}
    sets = {i: sh(t) for i, t in docs}
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        a, b = (ia, ib) if ia < ib else (ib, ia)
        inter = len(sets[ia] & sets[ib])
        union = len(sets[ia] | sets[ib])
        j = inter / union if union else 0.0
        if round(j + 1e-09, 6) >= threshold:
            out[(a, b)] = round(j + 1e-09, 6)
    return out


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["red", "blue", "green", "dog", "cat"]),
                 min_size=1, max_size=10).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
def test_ngram_jaccard_matches_bruteforce_on_random_corpora(spark, docs):
    """The single-pass posting-list formulation must agree with brute-force
    pairwise Jaccard over distinct 3-gram shingles (tiny vocab => heavy
    shingle collisions, the adversarial case for the inverted index)."""
    from kafka_streams_task_spark.operators.dedup import ngram_jaccard_pairs

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.2).collect()
    }
    want = _ref_jaccard_pairs(rows)
    assert got == want


def _ref_span_stats(docs: dict[int, str], n: int):
    """Brute-force exact-substring reference: returns per-doc covered
    position sets and the keeper-removal masks."""
    toks = {i: t.split() if t.split() else [""] for i, t in docs.items()}
    grams: dict[tuple, list] = {}
    for i in sorted(toks):
        t = toks[i]
        for p in range(len(t) - n + 1):
            grams.setdefault(tuple(t[p : p + n]), []).append((i, p))
    covered = {i: set() for i in toks}
    removed = {i: set() for i in toks}
    for occ in grams.values():
        if len(occ) < 2:
            continue
        for i, p in occ:
            covered[i].update(range(p, p + n))
        for i, p in occ[1:]:  # occ is in (doc, pos) order: first is keeper
            removed[i].update(range(p, p + n))
    return toks, covered, removed


@settings(max_examples=6, deadline=None)
@given(docs=corpus, n=st.integers(min_value=2, max_value=4))
def test_duplicate_spans_match_bruteforce(spark, docs, n):
    from kafka_streams_task_spark.operators.dedup import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    table = dict(enumerate(docs))
    df = spark.createDataFrame(list(table.items()), ["doc_id", "text"])
    toks, covered, removed = _ref_span_stats(table, n)

    got = {r["doc_id"]: r for r in duplicate_span_stats(df, span_n=n).collect()}
    for i in table:
        assert got[i]["n_tokens"] == len(toks[i])
        assert got[i]["n_dup_tokens"] == len(covered[i]), (table, n, i)

    cut = {r["doc_id"]: r for r in remove_duplicate_spans(df, span_n=n).collect()}
    for i in table:
        want = " ".join(
            w for p, w in enumerate(toks[i]) if p not in removed[i]
        )
        assert cut[i]["text"] == want, (table, n, i)
        assert cut[i]["n_removed_tokens"] == len(removed[i])


# ---------------------------------------------------------------------------
# DDSketch: the worst-case relative-error theorem on random positive data
# ---------------------------------------------------------------------------

_dd_values = st.lists(
    st.floats(
        min_value=1e-6,
        max_value=1e12,
        allow_nan=False,
        allow_infinity=False,
    ).filter(lambda v: v > 0),
    min_size=1,
    max_size=120,
)


@settings(max_examples=8, deadline=None)
@given(vals=_dd_values, q=st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]))
def test_dd_quantile_guarantee_on_random_data(spark, vals, q):
    """DDSketch's alpha bound is WORST-CASE, so hypothesis gets to throw
    arbitrary positive magnitudes (18 orders) at it: the estimate must
    sit within alpha of the true order statistic for every draw — a
    single violation is a real bug, not sketch noise."""
    from kafka_streams_task_spark.operators.sketch import (
        dd_alpha,
        dd_quantiles,
        dd_sketch_table,
    )

    gamma = 1.05
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    sk = dd_sketch_table(df, "v", gamma=gamma)
    est = dd_quantiles(sk, [q], gamma=gamma).collect()[0]["est"]
    true = sorted(vals)[int(q * (len(vals) - 1))]
    assert abs(est - true) <= dd_alpha(gamma) * true * (1 + 1e-9) + 1e-15, (
        est,
        true,
        vals,
    )


# ---------------------------------------------------------------------------
# r16: KMV theta sketch family against hashlib brute force on random sets
# ---------------------------------------------------------------------------

_theta_vals = st.lists(
    st.text(alphabet="abcdefgh", min_size=0, max_size=5), max_size=40
)


def _py_theta(values, k):
    import hashlib

    hs = sorted(
        {int(hashlib.md5(v.encode()).hexdigest()[:15], 16) for v in values}
    )
    return hs[:k]


@settings(max_examples=5, deadline=None)
@given(a=_theta_vals, b=_theta_vals, k=st.integers(min_value=2, max_value=12))
def test_theta_family_matches_reference_on_random_sets(spark, a, b, k):
    """Random-set property sweep: sketch == hashlib k-smallest-distinct,
    union-of-sketches == sketch-of-union, and the set-op estimates are
    EXACT whenever both sketches are unsaturated (n < k) — across
    random overlaps, empty sides, and duplicated values."""
    from kafka_streams_task_spark.operators.sketch import (
        theta_a_not_b,
        theta_intersect,
        theta_sketch_table,
        theta_union,
    )

    dfa = spark.createDataFrame(
        [(v,) for v in a] or [(None,)], "x string"
    )
    dfb = spark.createDataFrame(
        [(v,) for v in b] or [(None,)], "x string"
    )
    sa = theta_sketch_table(dfa, "x", k=k)
    sb = theta_sketch_table(dfb, "x", k=k)
    got_a = [r["h"] for r in sa.orderBy("h").collect()]
    got_b = [r["h"] for r in sb.orderBy("h").collect()]
    assert got_a == _py_theta(a, k)
    assert got_b == _py_theta(b, k)
    assert [
        r["h"] for r in theta_union(sa, sb, k=k).orderBy("h").collect()
    ] == _py_theta(list(a) + list(b), k)
    if len(set(a)) < k and len(set(b)) < k:
        assert (
            theta_intersect(sa, sb, k=k).collect()[0]["est"]
            == float(len(set(a) & set(b)))
        )
        assert (
            theta_a_not_b(sa, sb, k=k).collect()[0]["est"]
            == float(len(set(a) - set(b)))
        )
