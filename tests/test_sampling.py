

class TestExportTrainingShards:
    """r8 export_training_shards: fixed-token-budget shard assignment via
    the two-level distributed prefix sum (never a single-partition
    global window)."""

    def _docs(self, spark, n=500):
        from pyspark.sql import functions as F

        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 37 + 5).cast("long").alias("n_tokens"),
        )

    def test_matches_serial_prefix_sum(self, spark):
        from kafka_streams_task_spark.operators.sampling import (
            export_training_shards,
        )

        docs = self._docs(spark).repartition(7)  # scrambled input layout
        out = export_training_shards(
            docs, budget=300, num_range_partitions=5
        ).collect()
        got = {r.doc_id: r.shard_id for r in out}
        # serial reference: exclusive prefix sum in doc_id order
        cum = 0
        for i in range(500):
            expect = cum // 300
            assert got[i] == expect, f"doc {i}: {got[i]} != {expect}"
            cum += i % 37 + 5

    def test_shards_are_contiguous_and_budgeted(self, spark):
        from kafka_streams_task_spark.operators.sampling import (
            export_training_shards,
            shard_report,
        )

        docs = self._docs(spark)
        out = export_training_shards(docs, budget=300, num_range_partitions=4)
        rep = shard_report(out).collect()
        max_doc = 41  # max n_tokens above
        for i, r in enumerate(rep):
            assert r.shard_id == i  # dense ids
            if i < len(rep) - 1:
                assert 300 - max_doc <= r.n_tokens < 300 + max_doc
        # contiguity: shard k's last doc precedes shard k+1's first
        for a, b in zip(rep, rep[1:]):
            assert a.last_doc < b.first_doc

    def test_no_single_partition_window(self, spark):
        from kafka_streams_task_spark.operators.sampling import _ranged_prefix

        docs = self._docs(spark)
        pre = _ranged_prefix(docs, "n_tokens", "doc_id", 4)
        plan = pre._jdf.queryExecution().executedPlan().toString()
        # the running-sum window must be partitioned (by the range
        # partition id); windowspecdefinition with no partition keys =
        # the all-rows-through-one-task shape this operator exists to avoid
        assert "windowspecdefinition(_pid" in plan
        assert "windowspecdefinition(doc_id" not in plan

    def test_clash_guard(self, spark):
        import pytest

        from kafka_streams_task_spark.operators.sampling import (
            export_training_shards,
        )

        from pyspark.sql import functions as F

        docs = self._docs(spark).withColumn("_pre", F.lit(1))
        with pytest.raises(ValueError, match="_pre"):
            export_training_shards(docs, budget=10)

    def test_write_roundtrip_partitioned(self, spark, tmp_path):
        from kafka_streams_task_spark.operators.sampling import (
            export_training_shards,
        )

        docs = self._docs(spark, n=100)
        out = export_training_shards(docs, budget=500, num_range_partitions=3)
        path = str(tmp_path / "shards")
        out.repartition("shard_id").write.partitionBy("shard_id").parquet(path)
        back = spark.read.parquet(path)
        assert back.count() == 100
        assert back.select("shard_id").distinct().count() == out.select(
            "shard_id"
        ).distinct().count()


def test_export_training_shards_property(spark):
    """Property (r8): the distributed two-level prefix sum equals the
    serial exclusive prefix sum for ANY token weights, budget, range
    partitioning, and input layout."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_streams_task_spark.operators.sampling import export_training_shards

    @settings(max_examples=10, deadline=None)
    @given(
        tokens=st.lists(st.integers(min_value=0, max_value=10_000),
                        min_size=1, max_size=120),
        budget=st.integers(min_value=1, max_value=5_000),
        n_range=st.integers(min_value=1, max_value=9),
        n_input=st.integers(min_value=1, max_value=7),
    )
    def run(tokens, budget, n_range, n_input):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(tokens)], "doc_id long, n_tokens long"
        ).repartition(n_input)
        got = {
            r.doc_id: r.shard_id
            for r in export_training_shards(
                df, budget=budget, num_range_partitions=n_range
            ).collect()
        }
        cum = 0
        for i, t in enumerate(tokens):
            assert got[i] == cum // budget, (i, tokens, budget, n_range)
            cum += t

    run()


def test_export_training_shards_rejects_nonpositive_budget(spark):
    """r9 (ADVICE r8): budget=0 would divide by zero into floor(inf)
    nonsense and negative budgets yield negative shard ids — refused
    loudly, like the sibling operators' scalar guards."""
    import pytest

    from kafka_streams_task_spark.operators.sampling import (
        export_training_shards,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 20)], "doc_id bigint, n_tokens bigint"
    )
    with pytest.raises(ValueError, match="budget"):
        export_training_shards(docs, budget=0)
    with pytest.raises(ValueError, match="budget"):
        export_training_shards(docs, budget=-5)


def test_export_training_shards_integer_division_plan(spark):
    """r9 (VERDICT r8 item 6): the shard id comes from integer `div`,
    never floor(double/double) — boundary placement is exact integer
    math with no 2^53 mantissa caveat. Pinned on the plan string AND on
    a boundary value a double division could round the wrong way."""
    from kafka_streams_task_spark.operators.sampling import (
        export_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, 1) for i in range(6)], "doc_id bigint, n_tokens bigint"
    )
    out = export_training_shards(docs, budget=3, num_range_partitions=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert " div " in plan and "floor" not in plan
    got = {r["doc_id"]: r["shard_id"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
