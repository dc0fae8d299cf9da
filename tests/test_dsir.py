"""DSIR importance resampling (operators/dsir.py): serial-reference
equality, feature-extraction goldens, smoothing/unseen-bucket semantics,
log-space resampling stability, and plan pins (no Python stages, the
weight join stays broadcast)."""

from __future__ import annotations

import collections
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.dsir import (
    dsir_fit,
    dsir_gram_indices,
    dsir_resample,
    dsir_score,
    dsir_select,
)

B = 4096
TARGET_IDS = (1, 6, 7)
DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog ran"),
    (3, "quantum flux capacitor array"),
    (4, ""),
    (5, None),
    (6, "cat"),
    (7, "the cat sat on the mat again and again"),
]


def _grams(t: str | None) -> list[str]:
    toks = [x for x in (t or "").lower().strip().split() if x]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _idx(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _serial_scores() -> dict[int, float]:
    ct: collections.Counter = collections.Counter()
    cr: collections.Counter = collections.Counter()
    for d, t in DOCS:
        for g in _grams(t):
            b = _idx(g)
            cr[b] += 1
            if d in TARGET_IDS:
                ct[b] += 1
    nt, nr, a = sum(ct.values()), sum(cr.values()), 1.0
    lam = {
        b: math.log((ct.get(b, 0) + a) / (nt + a * B))
        - math.log((cr.get(b, 0) + a) / (nr + a * B))
        for b in set(ct) | set(cr)
    }
    uns = math.log(a / (nt + a * B)) - math.log(a / (nr + a * B))
    return {d: sum(lam.get(_idx(g), uns) for g in _grams(t)) for d, t in DOCS}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def weights(spark, docs):
    target = docs.filter(F.col("doc_id").isin(*TARGET_IDS))
    return dsir_fit(target, docs, n_features=B).localCheckpoint(eager=True)


class TestGramIndices:
    def test_uni_and_bigram_buckets_golden(self, spark):
        out = spark.createDataFrame([("a bb ccc",)], "t string").select(
            dsir_gram_indices(F.col("t"), B).alias("ix")
        ).first()["ix"]
        expect = [_idx(g) for g in ["a", "bb", "ccc", "a bb", "bb ccc"]]
        assert list(out) == expect

    def test_single_token_has_no_bigram(self, spark):
        out = spark.createDataFrame([("solo",)], "t string").select(
            dsir_gram_indices(F.col("t"), B).alias("ix")
        ).first()["ix"]
        assert list(out) == [_idx("solo")]

    def test_empty_and_null(self, spark):
        rows = spark.createDataFrame(
            [("",), ("   ",), (None,)], "t string"
        ).select(dsir_gram_indices(F.col("t"), B).alias("ix")).collect()
        assert list(rows[0]["ix"]) == [] and list(rows[1]["ix"]) == []
        assert rows[2]["ix"] is None

    def test_lowercases_by_default(self, spark):
        a, b = spark.createDataFrame(
            [("The Cat",), ("the cat",)], "t string"
        ).select(dsir_gram_indices(F.col("t"), B).alias("ix")).collect()
        assert list(a["ix"]) == list(b["ix"])


class TestFitScore:
    def test_score_matches_serial_reference(self, docs, weights):
        got = {
            r["doc_id"]: r["dsir_logw"]
            for r in dsir_score(docs.repartition(7), weights, n_features=B).collect()
        }
        expect = _serial_scores()
        assert set(got) == set(expect)
        for d in expect:
            assert got[d] == pytest.approx(expect[d], abs=1e-9), d

    def test_empty_and_null_docs_score_zero_with_zero_grams(self, docs, weights):
        rows = {
            r["doc_id"]: r
            for r in dsir_score(docs, weights, n_features=B).collect()
        }
        for d in (4, 5):
            assert rows[d]["dsir_logw"] == 0.0 and rows[d]["n_grams"] == 0

    def test_target_like_docs_outscore_dissimilar(self, docs, weights):
        got = {
            r["doc_id"]: r["dsir_logw"]
            for r in dsir_score(docs, weights, n_features=B).collect()
        }
        # docs 1/7 share every gram with the target corpus; doc 3 shares none
        assert got[1] > got[3] and got[7] > got[3]

    def test_unseen_buckets_use_the_null_row_default(self, spark, docs, weights):
        oov = spark.createDataFrame(
            [(99, "zzzqx wvvk")], "doc_id bigint, text string"
        )
        got = dsir_score(oov, weights, n_features=B).first()
        default = weights.filter(F.col("idx").isNull()).first()["log_ratio"]
        # every gram of the OOV doc lands in an unobserved bucket (no
        # collision at B=4096 for these 3 grams — asserted via the model)
        observed = {r["idx"] for r in weights.filter(F.col("idx").isNotNull()).collect()}
        oov_idx = [_idx(g) for g in _grams("zzzqx wvvk")]
        assert not (set(oov_idx) & observed)
        assert got["dsir_logw"] == pytest.approx(3 * default, abs=1e-12)

    def test_width_stamp_default_and_mismatch(self, docs, weights):
        from kafka_streams_task_spark.operators.dsir import dsir_score_dense

        # no explicit width: the model's stamp is used
        a = {r["doc_id"]: r["dsir_logw"] for r in dsir_score(docs, weights).collect()}
        b = {
            r["doc_id"]: r["dsir_logw"]
            for r in dsir_score(docs, weights, n_features=B).collect()
        }
        assert a == b
        # a different width mis-hashes every gram — must refuse loudly
        with pytest.raises(ValueError, match="does not match"):
            dsir_score(docs, weights, n_features=B * 2)
        with pytest.raises(ValueError, match="does not match"):
            dsir_score_dense(docs, weights, n_features=B // 2)

    def test_unstamped_weights_require_explicit_width(self, spark, docs):
        hand = spark.createDataFrame(
            [(1, 0.5), (None, -0.1)], "idx bigint, log_ratio double"
        )
        with pytest.raises(ValueError, match="no n_features stamp"):
            dsir_score(docs, hand)
        assert dsir_score(docs, hand, n_features=B).count() == len(DOCS)

    def test_tagged_fit_matches_two_scan_fit(self, spark, docs):
        from kafka_streams_task_spark.operators.dsir import dsir_fit_tagged

        cond = F.col("doc_id").isin(*TARGET_IDS)
        two_scan = dsir_fit(docs.filter(cond), docs, n_features=B)
        tagged = dsir_fit_tagged(docs, cond, n_features=B)

        def canon(w):
            return sorted(
                ((r["idx"], r["log_ratio"], r["n_features"]) for r in w.collect()),
                key=lambda t: (t[0] is None, t[0]),
            )

        # bit-identical: same bucket row set (target buckets ⊆ raw
        # buckets) and the same double arithmetic — whole-number count
        # sums are order-exact, so even the totals agree exactly
        assert canon(tagged) == canon(two_scan)

    def test_tagged_fit_clash_guard_and_null_cond(self, spark, docs):
        from kafka_streams_task_spark.operators.dsir import (
            dsir_fit_tagged,
            dsir_score,
        )

        with pytest.raises(ValueError, match="_dsir_t"):
            dsir_fit_tagged(docs.withColumn("_dsir_t", F.lit(1)), F.lit(True))
        # a NULL condition row counts as raw-only (not target)
        cond = F.when(F.col("doc_id") == 1, F.lit(True))  # else NULL
        w = dsir_fit_tagged(docs, cond, n_features=B)
        ref = dsir_fit(docs.filter(F.col("doc_id") == 1), docs, n_features=B)
        got = {r["idx"]: r["log_ratio"] for r in w.collect()}
        expect = {r["idx"]: r["log_ratio"] for r in ref.collect()}
        assert got == expect
        assert dsir_score(docs, w).count() == len(DOCS)

    def test_fit_rejects_nonpositive_alpha(self, docs):
        with pytest.raises(ValueError, match="alpha"):
            dsir_fit(docs, docs, alpha=0.0)

    def test_weight_table_is_bounded_by_observed_buckets(self, weights):
        n = weights.count()
        distinct = len({_idx(g) for _, t in DOCS for g in _grams(t)})
        assert n == distinct + 1  # + the idx-NULL unseen default row


class TestResample:
    def test_deterministic_and_seed_sensitive(self, docs, weights):
        scored = dsir_score(docs, weights, n_features=B)
        a = [r["doc_id"] for r in dsir_resample(scored, 3, seed=7).collect()]
        b = [r["doc_id"] for r in dsir_resample(scored, 3, seed=7).collect()]
        assert a == b
        seen = {tuple(a)}
        for s in range(8):
            seen.add(
                tuple(r["doc_id"] for r in dsir_resample(scored, 3, seed=s).collect())
            )
        assert len(seen) > 1  # the seed actually moves the draw

    def test_keys_match_serial_gumbel(self, docs, weights):
        scored = dsir_score(docs, weights, n_features=B)
        logw = {r["doc_id"]: r["dsir_logw"] for r in scored.collect()}

        def key(d, seed):
            h = hashlib.md5(f"{d}:dsir:{seed}".encode()).hexdigest()[:8]
            u = (int(h, 16) + 0.5) / 2**32
            return logw[d] - math.log(-math.log(u))

        for seed in (0, 3, 42):
            expect = sorted(logw, key=lambda d: (-key(d, seed), d))[:3]
            got = [
                r["doc_id"]
                for r in dsir_resample(scored, 3, seed=seed)
                .orderBy("sample_rank")
                .collect()
            ]
            assert got == expect, seed

    def test_log_space_survives_extreme_weights(self, spark):
        # exp(logw) overflows double past ~709 — A-ES u^(1/w) dies there;
        # the Gumbel form must rank correctly at |logw| = 5000
        scored = spark.createDataFrame(
            [(1, -5000.0), (2, 5000.0), (3, 0.0)], "doc_id bigint, dsir_logw double"
        )
        top = dsir_resample(scored, 1).first()
        assert top["doc_id"] == 2

    def test_null_logw_never_samples(self, spark):
        scored = spark.createDataFrame(
            [(1, None), (2, 1.0)], "doc_id bigint, dsir_logw double"
        )
        out = dsir_resample(scored, 5).collect()
        assert [r["doc_id"] for r in out] == [2]

    def test_clash_guard(self, spark):
        scored = spark.createDataFrame(
            [(1, 1.0, 0.0)], "doc_id bigint, dsir_logw double, _g_key double"
        )
        with pytest.raises(ValueError, match="_g_key"):
            dsir_resample(scored, 1)

    def test_rejects_nonpositive_temperature(self, spark):
        scored = spark.createDataFrame([(1, 1.0)], "doc_id bigint, dsir_logw double")
        with pytest.raises(ValueError, match="temperature"):
            dsir_resample(scored, 1, temperature=0.0)


class TestSelect:
    def test_end_to_end_drops_gram_less_docs(self, spark, docs):
        target = docs.filter(F.col("doc_id").isin(*TARGET_IDS))
        out = dsir_select(
            docs.filter(F.col("doc_id") != 5), target, 3, n_features=B
        ).collect()
        ids = {r["doc_id"] for r in out}
        assert len(out) == 3 and 4 not in ids  # empty doc filtered by min_grams
        assert {"text", "dsir_logw", "n_grams", "sample_rank"} <= set(out[0].asDict())


class TestDenseScore:
    def test_dense_matches_relational_scores(self, docs, weights):
        from kafka_streams_task_spark.operators.dsir import dsir_score_dense

        rel = {
            r["doc_id"]: (r["dsir_logw"], r["n_grams"])
            for r in dsir_score(docs, weights, n_features=B).collect()
        }
        dense = {
            r["doc_id"]: (r["dsir_logw"], r["n_grams"])
            for r in dsir_score_dense(docs, weights, n_features=B).collect()
        }
        assert set(rel) == set(dense)
        for d in rel:
            assert dense[d][0] == pytest.approx(rel[d][0], abs=1e-9), d
            assert dense[d][1] == rel[d][1], d

    def test_dense_is_a_pure_projection(self, docs, weights):
        from kafka_streams_task_spark.operators.dsir import dsir_score_dense

        plan = (
            dsir_score_dense(docs, weights, n_features=B)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly one Arrow stage, zero joins, zero shuffles — the shape
        # that drops into a streaming pipeline statelessly
        assert plan.count("ArrowEvalPython") == 1
        for marker in ("Join", "Exchange", "BatchEvalPython", "Generate"):
            assert marker not in plan, marker

    def test_dense_filter_does_not_duplicate_the_arrow_stage(self, docs, weights):
        from kafka_streams_task_spark.operators.dsir import dsir_score_dense

        # a threshold filter on the UDF output must evaluate ON the one
        # Arrow stage — without the nondeterministic marker, pushdown
        # splits it into a second ArrowEvalPython (UDF runs twice/row)
        plan = (
            dsir_score_dense(docs, weights, n_features=B)
            .filter(F.col("dsir_logw") >= -1.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("ArrowEvalPython") == 1

    def test_dense_keeps_input_columns_and_clash_guards(self, docs, weights):
        from kafka_streams_task_spark.operators.dsir import dsir_score_dense

        out = dsir_score_dense(docs, weights, n_features=B)
        assert set(out.columns) == {"doc_id", "text", "dsir_logw", "n_grams"}
        with pytest.raises(ValueError, match="_dsir_idx"):
            dsir_score_dense(
                docs.withColumn("_dsir_idx", F.lit(1)), weights, n_features=B
            )

    def test_dense_model_vector_shape(self, weights):
        from kafka_streams_task_spark.operators.dsir import dsir_dense_model

        vec = dsir_dense_model(weights, B)
        default = weights.filter(F.col("idx").isNull()).first()["log_ratio"]
        observed = {
            int(r["idx"]): r["log_ratio"]
            for r in weights.filter(F.col("idx").isNotNull()).collect()
        }
        assert vec.shape == (B,)
        for i, lr in observed.items():
            assert vec[i] == pytest.approx(lr, abs=0)
        # every unobserved slot carries the unseen default
        unseen_slots = set(range(B)) - set(observed)
        some = sorted(unseen_slots)[:5]
        for i in some:
            assert vec[i] == pytest.approx(default, abs=0)


class TestStreamingFilter:
    def test_stream_filter_matches_batch_filter(self, spark, docs, weights, tmp_path):
        from kafka_streams_task_spark.operators.dsir import dsir_score_dense
        from kafka_streams_task_spark.streaming.dsir import streaming_dsir_filter

        src = str(tmp_path / "docs_in")
        docs.write.parquet(src)
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
        thr = -1.0
        out = streaming_dsir_filter(stream, weights, thr, n_features=B)
        q = (
            out.writeStream.format("memory")
            .queryName("dsir_stream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r["dsir_logw"]
            for r in spark.sql("select * from dsir_stream").collect()
        }
        expect = {
            r["doc_id"]: r["dsir_logw"]
            for r in dsir_score_dense(docs, weights, n_features=B)
            .filter(F.col("dsir_logw") >= thr)
            .collect()
        }
        assert set(got) == set(expect) and len(got) > 0
        for d in expect:
            assert got[d] == pytest.approx(expect[d], abs=1e-9)
        # the threshold actually cut something (docs 2/3 sit below -1)
        assert {2, 3}.isdisjoint(got)

    def test_keep_scores_false_lands_input_schema(self, spark, docs, weights, tmp_path):
        from kafka_streams_task_spark.streaming.dsir import streaming_dsir_filter

        src = str(tmp_path / "docs_in2")
        docs.write.parquet(src)
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
        out = streaming_dsir_filter(
            stream, weights, -1.0, n_features=B, keep_scores=False
        )
        assert out.columns == ["doc_id", "text"]
        assert out.isStreaming

    def test_rejects_streaming_weights(self, spark, docs, weights, tmp_path):
        from kafka_streams_task_spark.streaming.dsir import streaming_dsir_filter

        src = str(tmp_path / "w_in")
        weights.write.parquet(src)
        wstream = spark.readStream.schema("idx bigint, log_ratio double").parquet(src)
        with pytest.raises(ValueError, match="batch DataFrame"):
            streaming_dsir_filter(docs, wstream, 0.0, n_features=B)


def _serial_reference(corpus: dict[int, str | None], target_ids, b: int):
    """Pure-Python DSIR scores (hashlib md5, Laplace-1) — the
    independent implementation the Spark operators must match."""
    ct: collections.Counter = collections.Counter()
    cr: collections.Counter = collections.Counter()
    def bidx(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % b
    for d, t in corpus.items():
        for g in _grams(t):
            cr[bidx(g)] += 1
            if d in target_ids:
                ct[bidx(g)] += 1
    nt, nr, a = sum(ct.values()), sum(cr.values()), 1.0
    lam = {
        k: math.log((ct.get(k, 0) + a) / (nt + a * b))
        - math.log((cr.get(k, 0) + a) / (nr + a * b))
        for k in set(ct) | set(cr)
    }
    uns = math.log(a / (nt + a * b)) - math.log(a / (nr + a * b))
    return {
        d: sum(lam.get(bidx(g), uns) for g in _grams(t))
        for d, t in corpus.items()
    }


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _WORDS = ["a", "b", "c", "ab", "bc", "ca", "x"]

    @st.composite
    def _corpora(draw):
        texts = draw(
            st.lists(
                st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8),
                min_size=1,
                max_size=10,
            )
        )
        corpus = {i: " ".join(ws) for i, ws in enumerate(texts)}
        target = draw(st.sets(st.sampled_from(sorted(corpus)), max_size=len(corpus)))
        return corpus, target

    @settings(max_examples=5, deadline=None)
    @given(_corpora())
    def test_property_scores_match_serial_reference(spark, case):
        """Random corpora over a tiny alphabet at B=64 (bucket
        collisions guaranteed): both Spark scorers must agree with an
        independent pure-Python implementation — including empty
        targets, empty docs, and collision-pooled buckets."""
        corpus, target_ids = case
        b = 64
        docs = spark.createDataFrame(
            list(corpus.items()), "doc_id bigint, text string"
        )
        target = docs.filter(F.col("doc_id").isin(*target_ids)) if target_ids \
            else docs.filter(F.lit(False))
        weights = dsir_fit(target, docs, n_features=b)
        expect = _serial_reference(corpus, target_ids, b)
        from kafka_streams_task_spark.operators.dsir import dsir_score_dense

        for scorer in (dsir_score, dsir_score_dense):
            got = {
                r["doc_id"]: r["dsir_logw"]
                for r in scorer(docs, weights).collect()
            }
            assert set(got) == set(expect)
            for d in expect:
                assert got[d] == pytest.approx(expect[d], abs=1e-9), (
                    scorer.__name__, d, corpus[d],
                )

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_dsir_composes_into_training_pipeline(spark):
    """DSIR slots between the corpus and the governance stages: select
    an importance-weighted subset, split it leakage-free, shard the
    train split on a token budget — every stage composes and the
    invariants of each survive the chain."""
    from kafka_streams_task_spark.operators.dsir import dsir_select
    from kafka_streams_task_spark.operators.sampling import (
        assign_splits,
        export_training_shards,
        split_leakage_report,
    )
    from kafka_streams_task_spark.schemas import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    target = docs.filter(F.col("source") == "src1")
    picked = dsir_select(docs, target, 100, n_features=1 << 12)
    assert picked.count() == 100

    split = assign_splits(
        picked, {"train": 0.75, "val": 0.125, "test": 0.125}, group_col="source"
    )
    assert split_leakage_report(split, "source").count() == 0

    train = split.filter(F.col("split") == "train")
    sharded = export_training_shards(
        train, budget=500, token_col="n_chars", order_col="doc_id",
        num_range_partitions=3,
    )
    assert sharded.count() == train.count()
    # shards partition the budgeted order contiguously
    per = sharded.groupBy("shard_id").agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).orderBy("shard_id").collect()
    for a, b in zip(per, per[1:]):
        assert a["hi"] < b["lo"]


class TestPlanShape:
    def test_score_has_no_python_stages_and_broadcasts_weights(
        self, docs, weights
    ):
        plan = (
            dsir_score(docs, weights, n_features=B)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan  # weight join must never shuffle docs

    def test_score_tokenizes_once_per_row(self, docs, weights):
        # the token array is materialized as its own aliased column, so
        # the split+filter chain appears ONCE in the doc-side plan — not
        # 4x inlined into the gram expression (CollapseProject declines
        # multiply-referenced non-cheap aliases; registered_domain_of_host
        # precedent). weights is checkpointed, so the plan is doc-side only.
        plan = (
            dsir_score(docs, weights, n_features=B)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("split(trim(lower(text") == 1

    def test_fit_has_no_python_stages(self, docs):
        target = docs.filter(F.col("doc_id").isin(*TARGET_IDS))
        plan = (
            dsir_fit(target, docs, n_features=B)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


class TestDenseBroadcastLifetime:
    """r9 (VERDICT r8 item 5): dsir_score_dense retains exactly ONE
    broadcast handle — a new model's call unpersists the previous
    handle (executor copies released; driver copy survives so older
    plans re-fetch) — and dsir_release_dense drops the last one."""

    def test_replacement_retains_one_handle_and_old_plan_still_runs(
        self, spark, docs, weights
    ):
        from kafka_streams_task_spark.operators import dsir as dsir_mod
        from kafka_streams_task_spark.operators.dsir import (
            dsir_release_dense,
            dsir_score_dense,
        )

        dsir_release_dense()
        assert dsir_mod._LAST_DENSE_BROADCAST == []
        first = dsir_score_dense(docs, weights, n_features=B)
        assert len(dsir_mod._LAST_DENSE_BROADCAST) == 1
        h1 = dsir_mod._LAST_DENSE_BROADCAST[0]
        # second model (different default weight) replaces the handle
        w2 = weights.withColumn(
            "log_ratio", F.col("log_ratio") + F.lit(1.0)
        )
        second = dsir_score_dense(docs, w2, n_features=B)
        assert len(dsir_mod._LAST_DENSE_BROADCAST) == 1
        h2 = dsir_mod._LAST_DENSE_BROADCAST[0]
        assert h2 is not h1
        # the FIRST plan still executes after its broadcast was
        # unpersisted (driver copy re-fetches on demand) and the two
        # models genuinely differ
        s1 = {r["doc_id"]: r["dsir_logw"] for r in first.collect()}
        s2 = {r["doc_id"]: r["dsir_logw"] for r in second.collect()}
        changed = [d for d in s1 if abs(s1[d] - s2[d]) > 1e-9]
        assert changed  # docs with grams shift under the +1.0 model

    def test_release_dense_drops_the_handle(self, spark, docs, weights):
        from kafka_streams_task_spark.operators import dsir as dsir_mod
        from kafka_streams_task_spark.operators.dsir import (
            dsir_release_dense,
            dsir_score_dense,
        )

        dsir_score_dense(docs, weights, n_features=B).count()
        assert dsir_release_dense() is True
        assert dsir_mod._LAST_DENSE_BROADCAST == []
        assert dsir_release_dense() is False
