"""CCNet-style per-group score bucketing: goldens, tie-block
semantics, group independence, NULL handling, randomized reference."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.sampling import score_buckets_by_group


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, score double")


def test_even_split_golden(spark):
    rows = [(i, "en", float(i)) for i in range(9)]
    got = {
        r["doc_id"]: (r["bucket"], r["bucket_label"])
        for r in score_buckets_by_group(_mk(spark, rows)).collect()
    }
    for i in range(9):
        want = i // 3
        assert got[i] == (want, ("head", "middle", "tail")[want])


def test_tie_block_lands_in_one_bucket(spark):
    rows = [(i, "en", 1.0) for i in range(4)] + [(9, "en", 2.0), (10, "en", 2.0)]
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets_by_group(_mk(spark, rows)).collect()
    }
    assert {got[i] for i in range(4)} == {0}  # the 4-way tie stays whole
    assert got[9] == got[10] == 2  # floor(3*4/6) = 2 — middle is empty


def test_groups_are_independent(spark):
    rows = [(i, "en", float(i)) for i in range(6)] + [
        (100 + i, "de", float(1000 + i)) for i in range(6)
    ]
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets_by_group(_mk(spark, rows)).collect()
    }
    # de's absolute scores are all above en's, but each group gets its
    # own head — the CCNet point
    assert got[0] == 0 and got[100] == 0
    assert got[5] == 2 and got[105] == 2


def test_null_score_and_null_group(spark):
    rows = [(1, "en", 1.0), (2, "en", None), (3, None, 5.0), (4, None, 6.0)]
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets_by_group(
            _mk(spark, rows), n_buckets=2, labels=None
        ).collect()
    }
    assert got[2] is None
    assert got[3] == 0 and got[4] == 1  # NULL group ranks among itself
    assert got[1] == 0


def test_single_bucket_and_bad_args(spark):
    df = _mk(spark, [(1, "en", 1.0), (2, "en", 9.0)])
    got = score_buckets_by_group(df, n_buckets=1, labels=None).collect()
    assert {r["bucket"] for r in got} == {0}
    with pytest.raises(ValueError):
        score_buckets_by_group(df, n_buckets=0)


def test_randomized_against_reference(spark):
    rng = random.Random(3)
    rows = [
        (i, rng.choice(["en", "de", "fr"]), float(rng.randint(0, 20)))
        for i in range(300)
    ]
    nb = 4
    by_grp: dict[str, list[float]] = {}
    for _, g, s in rows:
        by_grp.setdefault(g, []).append(s)
    want = {}
    for i, g, s in rows:
        smaller = sum(1 for x in by_grp[g] if x < s)
        want[i] = min(nb * smaller // len(by_grp[g]), nb - 1)
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets_by_group(
            _mk(spark, rows), n_buckets=nb, labels=None
        ).collect()
    }
    assert got == want


def test_row_count_preserved(spark):
    rows = [(i, "en", float(i % 5)) for i in range(50)]
    assert score_buckets_by_group(_mk(spark, rows)).count() == 50


def test_working_column_clash_raises(spark):
    df = _mk(spark, [(1, "en", 1.0)]).withColumn("bucket", F.lit(9))
    with pytest.raises(ValueError, match="clash"):
        score_buckets_by_group(df)


def test_boundaries_reproduce_batch_assignment(spark):
    from kafka_streams_task_spark.operators.sampling import (
        apply_score_buckets,
        score_bucket_boundaries,
    )

    rng = random.Random(5)
    rows = [
        (i, rng.choice(["en", "de"]), float(rng.randint(0, 12)))
        for i in range(200)
    ]
    # an all-tie group (empty cuts) and a tie-straddle group
    rows += [(1000 + i, "zz", 7.0) for i in range(5)]
    rows += [(2000 + i, "ts", 1.0) for i in range(4)] + [
        (2100, "ts", 2.0),
        (2101, "ts", 2.0),
    ]
    df = _mk(spark, rows)
    batch = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets_by_group(df, labels=None).collect()
    }
    bounds = score_bucket_boundaries(df)
    served = {
        r["doc_id"]: r["bucket"]
        for r in apply_score_buckets(df, bounds, labels=None).collect()
    }
    assert served == batch


def test_apply_unfitted_group_and_nulls(spark):
    from kafka_streams_task_spark.operators.sampling import (
        apply_score_buckets,
        score_bucket_boundaries,
    )

    fit = _mk(spark, [(i, "en", float(i)) for i in range(9)])
    bounds = score_bucket_boundaries(fit)
    probe = _mk(spark, [(1, "xx", 1.0), (2, "en", None), (3, "en", 8.5)])
    got = {
        r["doc_id"]: (r["bucket"], r["bucket_label"])
        for r in apply_score_buckets(probe, bounds).collect()
    }
    assert got[1] == (None, None)  # group never fitted
    assert got[2] == (None, None)  # NULL score
    assert got[3] == (2, "tail")  # unseen score falls in its band


def test_apply_clash_guard(spark):
    from kafka_streams_task_spark.operators.sampling import (
        apply_score_buckets,
        score_bucket_boundaries,
    )

    fit = _mk(spark, [(1, "en", 1.0), (2, "en", 2.0)])
    bounds = score_bucket_boundaries(fit)
    bad = fit.withColumn("cuts", F.lit(1))
    with pytest.raises(ValueError, match="clash"):
        apply_score_buckets(bad, bounds)


def test_streaming_apply_matches_batch(spark, tmp_path):
    from kafka_streams_task_spark.operators.sampling import (
        apply_score_buckets,
        score_bucket_boundaries,
    )

    rows = [(i, "en", float(i % 7)) for i in range(40)] + [
        (100 + i, "de", float(i % 3)) for i in range(30)
    ]
    df = _mk(spark, rows)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df.write.parquet(src)
    bounds = score_bucket_boundaries(df)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        apply_score_buckets(stream, bounds, labels=None)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["bucket"] for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets_by_group(df, labels=None).collect()
    }
    assert got == want


def test_null_score_gets_null_label_not_last_band(spark):
    # element_at(arr, NULL) yields the LAST element on Spark 4 — the
    # guard must keep NULL buckets from silently labeling as 'tail'
    rows = [(1, "en", 1.0), (2, "en", 2.0), (3, "en", None)]
    got = {
        r["doc_id"]: r["bucket_label"]
        for r in score_buckets_by_group(_mk(spark, rows)).collect()
    }
    assert got[3] is None
