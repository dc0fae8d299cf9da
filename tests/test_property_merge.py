"""Property-based laws for the CDC family (operators/merge.py): random
change sequences against a pure-Python interval machine.

Laws checked on arbitrary (key, op, version) streams with UNIQUE
versions per key (the CDC contract):
  * apply_changes == replay-in-version-order final state;
  * scd2_apply's current slice == apply_changes (view law);
  * scd2 intervals per key tile [first_version, ∞) with no overlap and
    at most one open interval (interval law).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from kafka_streams_task_spark.operators.merge import (
    OP_DELETE,
    OP_UPSERT,
    apply_changes,
    scd2_apply,
    scd2_init,
)

# a change stream: per key, a shuffled set of distinct versions with ops
changes_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),        # key (small: collisions!)
        st.booleans(),                                # is_delete
    ),
    min_size=1,
    max_size=24,
).map(
    # assign distinct versions per key in list order, then interleave
    lambda pairs: [
        (k, d, ver)
        for ver, (k, d) in enumerate(pairs)
    ]
)


def _replay(snapshot: dict, changes):
    """Pure-python final state: apply in version order per key."""
    state = dict(snapshot)
    for k, is_del, ver in sorted(changes, key=lambda t: t[2]):
        if is_del:
            state.pop(k, None)
        else:
            state[k] = f"v{ver}"
    return state


def _spark_changes(spark, changes):
    return spark.createDataFrame(
        [
            Row(k=k, v=(None if is_del else f"v{ver}"),
                op=(OP_DELETE if is_del else OP_UPSERT), version=ver)
            for k, is_del, ver in changes
        ],
        schema="k bigint, v string, op string, version bigint",
    )


SNAP = {1: "s1", 2: "s2", 3: "s3"}


def _snap_df(spark):
    return spark.createDataFrame(
        [Row(k=k, v=v) for k, v in SNAP.items()], schema="k bigint, v string"
    )


@settings(max_examples=12, deadline=None)
@given(changes=changes_strategy)
def test_apply_changes_equals_sequential_replay(spark, changes):
    got = {
        r.k: r.v
        for r in apply_changes(_snap_df(spark), _spark_changes(spark, changes), ["k"]).collect()
    }
    assert got == _replay(SNAP, changes)


@settings(max_examples=12, deadline=None)
@given(changes=changes_strategy)
def test_scd2_laws(spark, changes):
    hist = scd2_apply(
        scd2_init(_snap_df(spark), -1), _spark_changes(spark, changes), ["k"]
    )
    rows = hist.collect()

    # view law: current slice == latest-wins merge
    current = {r.k: r.v for r in rows if r.valid_to is None}
    assert current == _replay(SNAP, changes)

    # interval law: per key, intervals sort into a chain with no overlap
    # and at most one open interval; a seeded key's chain starts at -1
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append((r.valid_from, r.valid_to))
    for k, ivs in by_key.items():
        opens = [iv for iv in ivs if iv[1] is None]
        assert len(opens) <= 1, f"key {k}: multiple open intervals {ivs}"
        closed = sorted(iv for iv in ivs if iv[1] is not None)
        for (f1, t1), (f2, _t2) in zip(closed, closed[1:]):
            assert t1 <= f2, f"key {k}: overlapping intervals {ivs}"
        assert all(f < t for f, t in closed), f"key {k}: empty/negative interval"
        if k in SNAP:
            assert min(f for f, _ in ivs) == -1, f"key {k}: seed interval lost"


# ---------------------------------------------------- exact-join property

words = st.sampled_from([f"w{i}" for i in range(8)])
doc_strategy = st.lists(words, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(doc_strategy, min_size=2, max_size=12),
    thr=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
def test_jaccard_join_prefix_lossless_property(spark, texts, thr):
    """Random tiny-vocab corpora (maximally collision-prone shingles):
    the prefix-filtered join must equal brute force exactly at every
    threshold — completeness is the operator's entire claim."""
    import re

    from kafka_streams_task_spark.operators.dedup import jaccard_join_prefix

    docs = list(enumerate(texts))
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_join_prefix(
            df, threshold=thr, shingle_n=2, hash_shingles=False
        ).collect()
    }

    def shset(text):
        toks = re.split(r"[ \t\n\r\f]+", text.strip())
        if len(toks) < 2:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}

    ref = {}
    for x in range(len(docs)):
        for y in range(x + 1, len(docs)):
            a, b = docs[x][0], docs[y][0]
            sa, sb = shset(docs[x][1]), shset(docs[y][1])
            inter = len(sa & sb)
            if not inter:
                continue
            j = round(inter / (len(sa) + len(sb) - inter) + 1e-9, 6)
            if j >= thr:
                ref[(a, b)] = j
    assert got == ref, f"thr={thr}: {set(got) ^ set(ref)}"
