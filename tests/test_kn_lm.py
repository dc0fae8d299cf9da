"""Interpolated Kneser-Ney bigram LM (operators/kn_lm.py): engine vs an
independent dict-based reimplementation of the same published math
(Chen & Goodman 1998 eq. 4.16), probability-mass invariants, discount
estimation, OOV behavior, and plan shape."""

import math
import re
from collections import Counter

import pytest


def _tok(s):
    return [t for t in re.split(r"[ \t\n\r\f]+", s.strip()) if t] if s else []


def ref_kn(train_texts, score_docs, discount=None):
    """Pure-Python interpolated-KN reference (no Spark, no hashes)."""
    big = Counter()
    vocab = set()
    for s in train_texts:
        ts = _tok(s)
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] += 1
    ctx_cf, ctx_nf, cont = Counter(), Counter(), Counter()
    for (a, b), c in big.items():
        ctx_cf[a] += c
        ctx_nf[a] += 1
        cont[b] += 1
    t_types, v = len(big), len(vocab)
    n1 = sum(1 for c in big.values() if c == 1)
    n2 = sum(1 for c in big.values() if c == 2)
    d = discount if discount is not None else (
        n1 / (n1 + 2 * n2) if n1 + 2 * n2 else 0.75
    )
    d = min(max(d, 1e-9), 1 - 1e-9)
    denom = t_types + v + 1

    def pcont(w):
        return (cont.get(w, 0) + 1) / denom

    def p(prev, w):
        if prev in ctx_cf:
            c = big.get((prev, w), 0)
            return (
                max(c - d, 0) / ctx_cf[prev]
                + d * ctx_nf[prev] / ctx_cf[prev] * pcont(w)
            )
        return pcont(w)

    out = {}
    for i, s in score_docs:
        ts = _tok(s)
        if not ts:
            continue
        nlls = [-math.log(pcont(ts[0]))] + [
            -math.log(p(a, b)) for a, b in zip(ts, ts[1:])
        ]
        out[i] = (len(ts), sum(nlls) / len(nlls))
    return out, d, (big, ctx_cf, ctx_nf, cont, t_types, v)


TRAIN = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog and the cat",
    "fish swim and cats sit",
]
SCORE = [
    (1, "the cat sat on the mat"),        # in-distribution
    (2, "the dog ate the fish"),          # seen tokens, some unseen bigrams
    (3, "quantum flux capacitors hum"),   # fully OOV
    (4, "cat"),                           # single token
    (5, ""),                              # tokenless -> no row
    (6, None),                            # NULL -> no row
    (7, "  \t "),                         # whitespace-only -> no row
]


@pytest.fixture(scope="module")
def fitted(spark):
    from kafka_streams_task_spark.operators.kn_lm import kn_bigram_fit

    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    return kn_bigram_fit(train)


def test_kn_matches_independent_reference(spark, fitted):
    from kafka_streams_task_spark.operators.kn_lm import kn_bigram_score

    expected, d, _ = ref_kn(TRAIN, SCORE)
    assert abs(fitted.d - d) < 1e-12
    df = spark.createDataFrame(SCORE, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"], r["ppl"])
        for r in kn_bigram_score(df, fitted).collect()
    }
    assert set(got) == set(expected)  # 5/6/7 emit no row
    for i, (n, nll) in expected.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(nll, abs=1e-9)
        assert got[i][2] == pytest.approx(math.exp(nll), rel=1e-9)


def test_kn_model_scalars_and_discount(spark, fitted):
    _, d, (big, _, _, _, t_types, v) = ref_kn(TRAIN, [])
    assert fitted.t_types == t_types and fitted.v == v
    n1 = sum(1 for c in big.values() if c == 1)
    n2 = sum(1 for c in big.values() if c == 2)
    assert fitted.d == pytest.approx(n1 / (n1 + 2 * n2))
    # pinned discount overrides the estimate
    from kafka_streams_task_spark.operators.kn_lm import kn_bigram_fit

    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    assert kn_bigram_fit(train, discount=0.5).d == 0.5


def test_kn_probability_mass_reserves_oov(spark):
    """For every SEEN context v: sum over the training vocabulary of
    P(w|v) = 1 - D*N1+(v,.)/(c(v)*(T+V+1)) — all mass accounted for,
    with exactly the continuation-smoothing reserve left for OOV. For
    an UNSEEN context the sum is (T+V)/(T+V+1)."""
    _, d, (big, ctx_cf, ctx_nf, cont, t_types, v) = ref_kn(TRAIN, [])
    denom = t_types + v + 1
    vocab = {t for s in TRAIN for t in _tok(s)}

    def pcont(w):
        return (cont.get(w, 0) + 1) / denom

    for prev in ctx_cf:
        total = sum(
            max(big.get((prev, w), 0) - d, 0) / ctx_cf[prev]
            + d * ctx_nf[prev] / ctx_cf[prev] * pcont(w)
            for w in vocab
        )
        reserve = d * ctx_nf[prev] / (ctx_cf[prev] * denom)
        assert total == pytest.approx(1.0 - reserve, abs=1e-12)
        assert 0 < reserve < 1
    assert sum(pcont(w) for w in vocab) == pytest.approx(
        (t_types + v) / denom, abs=1e-12
    )


def test_kn_oov_doc_scores_uniform_reserve(spark, fitted):
    """A fully-OOV document: every position is Pcont with n_prec=0 =
    1/(T+V+1) — avg_nll = ln(T+V+1) exactly."""
    from kafka_streams_task_spark.operators.kn_lm import kn_bigram_score

    df = spark.createDataFrame(
        [(1, "zzz yyy xxx www")], "doc_id bigint, text string"
    )
    row = kn_bigram_score(df, fitted).collect()[0]
    assert row["avg_nll"] == pytest.approx(
        math.log(fitted.t_types + fitted.v + 1), abs=1e-9
    )


def test_kn_in_distribution_scores_lower(spark, fitted):
    from kafka_streams_task_spark.operators.kn_lm import kn_bigram_score

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (3, "quantum flux capacitors hum")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["ppl"] for r in kn_bigram_score(df, fitted).collect()}
    assert got[1] < got[3]


def test_kn_perplexity_filter_gate(spark, fitted):
    from kafka_streams_task_spark.operators.kn_lm import (
        kn_bigram_score,
        kn_perplexity_filter,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (3, "quantum flux capacitors hum"),
            (5, ""),
        ],
        "doc_id bigint, text string",
    )
    ppls = {
        r["doc_id"]: r["ppl"] for r in kn_bigram_score(df, fitted).collect()
    }
    cut = (ppls[1] + ppls[3]) / 2
    kept = kn_perplexity_filter(df, fitted, max_ppl=cut)
    rows = kept.collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert set(kept.columns) == {"doc_id", "text", "ppl"}


def test_kn_score_plan_is_jvm_only(spark, fitted):
    """No Python/Arrow stage, no cartesian product, and the three model
    joins resolve as hash joins (broadcast or shuffled — never nested
    loop) in the scoring plan."""
    from kafka_streams_task_spark.operators.kn_lm import kn_bigram_score

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id bigint, text string"
    )
    plan = (
        kn_bigram_score(df, fitted)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kn_model_write_read_roundtrip(spark, fitted, tmp_path):
    """A materialized model scores identically to the in-lineage one
    (the reuse path: fit the reference corpus once, read the counts
    back for every scoring run)."""
    from kafka_streams_task_spark.operators.kn_lm import (
        kn_bigram_score,
        kn_model_read,
        kn_model_write,
    )

    path = str(tmp_path / "kn_model")
    kn_model_write(fitted, path)
    back = kn_model_read(spark, path)
    assert (back.d, back.t_types, back.v) == (
        fitted.d,
        fitted.t_types,
        fitted.v,
    )
    df = spark.createDataFrame(
        [r for r in SCORE if r[1]], "doc_id bigint, text string"
    )
    a = {
        r["doc_id"]: r["avg_nll"] for r in kn_bigram_score(df, fitted).collect()
    }
    b = {
        r["doc_id"]: r["avg_nll"] for r in kn_bigram_score(df, back).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_kn_fit_refuses_tokenless_corpus(spark):
    """An empty/whitespace training corpus would yield a model that
    assigns probability 1 to everything — fit refuses loudly."""
    from kafka_streams_task_spark.operators.kn_lm import kn_bigram_fit

    empty = spark.createDataFrame([("",), ("  \t ",), (None,)], "text string")
    with pytest.raises(ValueError, match="no tokens"):
        kn_bigram_fit(empty)


class TestKNDenseTier:
    def test_dense_matches_relational_unpruned(self, spark, fitted):
        """kn_score_dense on the full (unpruned) model == the
        relational kn_bigram_score, to float-sum order."""
        from kafka_streams_task_spark.operators.kn_lm import (
            kn_bigram_score,
            kn_score_dense,
        )

        df = spark.createDataFrame(SCORE, "doc_id bigint, text string")
        rel = {
            r["doc_id"]: r["avg_nll"]
            for r in kn_bigram_score(df, fitted).collect()
        }
        dense = {
            r["doc_id"]: r["kn_avg_nll"]
            for r in kn_score_dense(df, fitted).collect()
        }
        # the dense scorer is a projection: every row survives, the
        # tokenless ones with NULL metrics
        assert set(dense) == {r[0] for r in SCORE}
        for k, v in rel.items():
            assert dense[k] == pytest.approx(v, abs=1e-9)
        for k in set(dense) - set(rel):
            assert dense[k] is None

    def test_pruned_model_backs_off_like_unseen(self, spark, fitted):
        """With max_bigrams=1 only the single most-frequent bigram
        survives; every other position scores through the model's own
        unseen-event formulas — verified against the dict reference
        run on the same pruned tables."""
        import math

        from kafka_streams_task_spark.operators.kn_lm import (
            kn_dense_model,
            kn_score_dense,
        )

        dense = kn_dense_model(fitted, max_bigrams=1)
        assert len(dense["big"]) == 1
        ((ph, th), bf) = next(iter(dense["big"].items()))
        df = spark.createDataFrame(
            [(1, "the cat sat on the mat")], "doc_id bigint, text string"
        )
        got = kn_score_dense(df, dense).collect()[0]["kn_avg_nll"]

        # reference walk over the pruned dicts
        toks = "the cat sat on the mat".split()
        import pyspark.sql.functions as F

        hs = [
            r[0]
            for r in spark.createDataFrame([(t,) for t in toks], "t string")
            .select(F.xxhash64("t"))
            .collect()
        ]
        d, denom = dense["d"], dense["denom"]
        pc = lambda h: (dense["cont"].get(h, 0) + 1.0) / denom  # noqa: E731
        total = -math.log(pc(hs[0]))
        for a, b_ in zip(hs, hs[1:]):
            c = dense["ctx"].get(a)
            if c is not None:
                cf, nf = c
                p = max(dense["big"].get((a, b_), 0) - d, 0) / cf \
                    + d * nf / cf * pc(b_)
            else:
                p = pc(b_)
            total += -math.log(p)
        assert got == pytest.approx(total / len(hs), abs=1e-9)

    def test_dense_plan_single_arrow_stage_filter_safe(self, spark, fitted):
        """Exactly ONE Arrow stage, and a downstream ppl filter must
        not duplicate it (the asNondeterministic pushdown guard)."""
        import re

        from kafka_streams_task_spark.operators.kn_lm import kn_score_dense

        df = spark.createDataFrame(
            [(1, "the cat sat")], "doc_id bigint, text string"
        )
        scored = kn_score_dense(df, fitted)
        filtered = scored.filter(F_col("kn_ppl") <= 50.0)
        for frame in (scored, filtered):
            plan = frame._jdf.queryExecution().executedPlan().toString()
            assert len(re.findall("ArrowEvalPython", plan)) == 1
            assert "BatchEvalPython" not in plan

    def test_broadcast_lifetime_one_retained(self, spark, fitted):
        from kafka_streams_task_spark.operators.kn_lm import (
            _LAST_KN_BROADCAST,
            kn_release_dense,
            kn_score_dense,
        )

        df = spark.createDataFrame(
            [(1, "the cat sat")], "doc_id bigint, text string"
        )
        kn_score_dense(df, fitted)
        kn_score_dense(df, fitted)
        assert len(_LAST_KN_BROADCAST) == 1
        assert kn_release_dense() is True
        assert kn_release_dense() is False

    def test_streaming_kn_filter_matches_batch(self, spark, fitted, tmp_path):
        """availableNow file stream through streaming_kn_filter lands
        exactly the documents the batch filter keeps."""
        import json
        import os

        from pyspark.sql import types as T

        from kafka_streams_task_spark.operators.kn_lm import (
            kn_bigram_score,
            kn_perplexity_filter,
        )
        from kafka_streams_task_spark.streaming.kn import streaming_kn_filter

        docs = [r for r in SCORE if r[1] is not None]
        batch_df = spark.createDataFrame(docs, "doc_id bigint, text string")
        ppls = {
            r["doc_id"]: r["ppl"]
            for r in kn_bigram_score(batch_df, fitted).collect()
        }
        cut = sorted(ppls.values())[1] * 1.001  # keep the two most fluent
        batch_kept = {
            r["doc_id"]
            for r in kn_perplexity_filter(batch_df, fitted, cut).collect()
        }
        src = str(tmp_path / "in")
        os.makedirs(src)
        with open(f"{src}/b0.json", "w") as f:
            f.write("\n".join(
                json.dumps({"doc_id": i, "text": t}) for i, t in docs
            ))
        schema = T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ])
        stream = spark.readStream.schema(schema).json(src)
        out = str(tmp_path / "out")
        q = (
            streaming_kn_filter(stream, fitted, cut)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        landed = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert landed == batch_kept and len(landed) == 2


from pyspark.sql.functions import col as F_col  # noqa: E402
