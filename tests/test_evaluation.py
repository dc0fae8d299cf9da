"""Classifier evaluation (operators/evaluation.py): AUC/AP/KS vs
brute-force pure-Python references (pair counting, threshold sweep, CDF
scan) on tie-heavy data; confusion and calibration contracts; the
distributed-prefix plan shape."""

import random
from collections import Counter

import pytest


def ref_metrics(pairs):
    """(auc, ap, ks) by brute force from [(score, label01), ...]."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None, None, None
    wins = sum(1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg)
    auc = wins / (len(pos) * len(neg))
    # step-wise AP: thresholds at every distinct score, descending
    by_score = Counter()
    pos_by_score = Counter()
    for s, y in pairs:
        by_score[s] += 1
        pos_by_score[s] += int(y)
    ap = tp = pp = 0.0
    for s in sorted(by_score, reverse=True):
        tp += pos_by_score[s]
        pp += by_score[s]
        ap += (pos_by_score[s] / len(pos)) * (tp / pp)
    # KS: max CDF gap over distinct scores (inclusive from below)
    ks = cp = cn = 0.0
    for s in sorted(by_score):
        cp += pos_by_score[s] / len(pos)
        cn += (by_score[s] - pos_by_score[s]) / len(neg)
        ks = max(ks, abs(cp - cn))
    return auc, ap, ks


def _mk(spark, pairs):
    return spark.createDataFrame(
        [(float(s), int(y)) for s, y in pairs], "score double, label int"
    )


CASES = {
    "separable": [(0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0)],
    "inverted": [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)],
    "heavy_ties": [(0.5, 1)] * 5 + [(0.5, 0)] * 5 + [(0.7, 1)] * 3 + [(0.2, 0)] * 4,
    "single_score": [(0.4, 1)] * 3 + [(0.4, 0)] * 7,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_eval_matches_bruteforce(spark, name):
    from kafka_streams_task_spark.operators.evaluation import classifier_eval

    pairs = CASES[name]
    auc, ap, ks = ref_metrics(pairs)
    row = classifier_eval(_mk(spark, pairs)).collect()[0]
    assert row["n"] == len(pairs)
    assert row["n_pos"] == sum(y for _, y in pairs)
    assert row["auc"] == pytest.approx(auc, abs=1e-12)
    assert row["ap"] == pytest.approx(ap, abs=1e-12)
    assert row["ks"] == pytest.approx(ks, abs=1e-12)


def test_eval_randomized_tie_heavy(spark):
    """200 rows, scores quantized to 10 levels (massive ties), random
    labels — the regime where naive rank implementations drift."""
    rng = random.Random(7)
    pairs = [
        (rng.randrange(10) / 10.0, rng.random() < 0.4) for _ in range(200)
    ]
    auc, ap, ks = ref_metrics(pairs)
    from kafka_streams_task_spark.operators.evaluation import classifier_eval

    row = classifier_eval(_mk(spark, pairs), num_range_partitions=7).collect()[0]
    assert row["auc"] == pytest.approx(auc, abs=1e-12)
    assert row["ap"] == pytest.approx(ap, abs=1e-12)
    assert row["ks"] == pytest.approx(ks, abs=1e-12)


def test_eval_one_class_is_null(spark):
    from kafka_streams_task_spark.operators.evaluation import classifier_eval

    row = classifier_eval(_mk(spark, [(0.5, 1), (0.7, 1)])).collect()[0]
    assert (row["auc"], row["ap"], row["ks"]) == (None, None, None)
    assert (row["n"], row["n_pos"], row["n_neg"]) == (2, 2, 0)


def test_eval_null_scores_and_labels_excluded(spark):
    from kafka_streams_task_spark.operators.evaluation import classifier_eval

    df = spark.createDataFrame(
        [(0.9, 1), (0.1, 0), (None, 1), (0.5, None)],
        "score double, label int",
    )
    row = classifier_eval(df).collect()[0]
    assert row["n"] == 2 and row["auc"] == 1.0


def test_rank_table_cumulatives(spark):
    from kafka_streams_task_spark.operators.evaluation import score_rank_table

    pairs = CASES["heavy_ties"]
    t = {
        r["score"]: (r["n"], r["np"], r["cum_n"], r["cum_np"])
        for r in score_rank_table(
            _mk(spark, pairs), num_range_partitions=3
        ).collect()
    }
    assert t[0.2] == (4, 0, 0, 0)
    assert t[0.5] == (10, 5, 4, 0)
    assert t[0.7] == (3, 3, 14, 5)


def test_confusion_at_thresholds(spark):
    from kafka_streams_task_spark.operators.evaluation import (
        confusion_at_thresholds,
    )

    pairs = CASES["heavy_ties"]
    rows = {
        r["threshold"]: r
        for r in confusion_at_thresholds(
            _mk(spark, pairs), [0.5, 0.6, 1.1]
        ).collect()
    }
    r = rows[0.5]  # >= 0.5: the 10 ties + 3 at 0.7
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (8, 5, 0, 4)
    assert r["precision"] == pytest.approx(8 / 13)
    assert r["recall"] == 1.0 and r["fpr"] == pytest.approx(5 / 9)
    r = rows[0.6]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (3, 0, 5, 9)
    r = rows[1.1]  # nothing predicted positive: precision undefined
    assert (r["tp"], r["pp"] if "pp" in r else r["fp"]) == (0, 0)
    assert r["precision"] is None and r["recall"] == 0.0

    with pytest.raises(ValueError):
        confusion_at_thresholds(_mk(spark, pairs), [])
    with pytest.raises(ValueError):
        confusion_at_thresholds(_mk(spark, pairs), [0.0] * 65)


def test_calibration_bins(spark):
    from kafka_streams_task_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame(
        [(0.05, 0), (0.08, 0), (0.95, 1), (0.97, 1), (0.92, 0), (1.0, 1),
         (-0.5, 0), (1.7, 1)],
        "score double, label int",
    )
    rows = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
    assert rows[0]["n"] == 3  # 0.05, 0.08, clamped -0.5
    assert rows[9]["n"] == 5  # 0.95, 0.97, 0.92, 1.0 (hi joins top), clamped 1.7
    assert rows[9]["pos_rate"] == pytest.approx(4 / 5)
    assert set(rows) == {0, 9}


def test_eval_plan_never_single_task_global_window(spark):
    """The ranking window partitions by the physical partition id — a
    bare global Window.orderBy (one task for all rows) must never
    appear; no Python stages, no cartesian."""
    from kafka_streams_task_spark.operators.evaluation import (
        score_rank_table,
    )

    pairs = CASES["heavy_ties"]
    # plan of the PRE-checkpoint prefix stage (localCheckpoint hides
    # upstream shape from the final frame — the r8 lesson): rebuild the
    # stage exactly as score_rank_table does, without the checkpoint
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    per_score = (
        _mk(spark, pairs)
        .groupBy(F.col("score"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranged = per_score.repartitionByRange(4, F.col("score")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    plan = (
        ranged.withColumn("_pre", F.sum("n").over(w))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan and "partitionBy" not in plan.lower().replace(
        "partition by", ""
    )
    # the window's partition spec must be the pid column, not empty
    assert "_pid" in plan
    final = score_rank_table(_mk(spark, pairs), num_range_partitions=4)
    fplan = final._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in fplan and "ArrowEvalPython" not in fplan
    assert "CartesianProduct" not in fplan


def test_nan_scores_excluded_everywhere(spark):
    """NaN sorts ABOVE every numeric in Spark — unfiltered it would be
    predicted-positive at every threshold and the top rank. All three
    surfaces exclude it like NULL."""
    from kafka_streams_task_spark.operators.evaluation import (
        calibration_bins,
        classifier_eval,
        confusion_at_thresholds,
    )

    df = spark.createDataFrame(
        [(0.9, 1), (0.1, 0), (float("nan"), 1)], "score double, label int"
    )
    row = classifier_eval(df).collect()[0]
    assert row["n"] == 2 and row["auc"] == 1.0
    conf = confusion_at_thresholds(df, [0.5]).collect()[0]
    assert (conf["tp"], conf["fp"], conf["fn"], conf["tn"]) == (1, 0, 0, 1)
    bins = calibration_bins(df, 10).collect()
    assert sum(r["n"] for r in bins) == 2


def ref_platt(pairs, max_iter=50, tol=1e-10):
    """Independent Newton on raw rows (no count-table reduction)."""
    import math

    n_pos = sum(1 for _, y in pairs if y)
    n_neg = len(pairs) - n_pos
    t_pos = (n_pos + 1.0) / (n_pos + 2.0)
    t_neg = 1.0 / (n_neg + 2.0)
    a = b = 0.0
    for _ in range(max_iter):
        ga = gb = haa = hab = hbb = 0.0
        for s, y in pairs:
            p = 1.0 / (1.0 + math.exp(-(a * s + b)))
            r = p - (t_pos if y else t_neg)
            w = p * (1 - p)
            ga += r * s
            gb += r
            haa += w * s * s
            hab += w * s
            hbb += w
        haa += 1e-12
        hbb += 1e-12
        det = haa * hbb - hab * hab
        if det <= 0:
            break
        da = (hbb * ga - hab * gb) / det
        db = (haa * gb - hab * ga) / det
        a, b = a - da, b - db
        if abs(da) < tol and abs(db) < tol:
            break
    return a, b


def test_platt_matches_reference_and_calibrates(spark):
    """fit_platt over the count table == the row-level Newton; the
    fitted sigmoid is a proper calibrator: monotone in the score and a
    near-zero-gradient stationary point of the Platt objective."""
    import math

    from kafka_streams_task_spark.operators.evaluation import (
        apply_platt,
        fit_platt,
    )

    rng = random.Random(11)
    # logistic ground truth: P(y|s) = sigmoid(3s - 1.5) over s ~ U[0,1]
    pairs = []
    for _ in range(400):
        s = rng.random()
        pairs.append((s, rng.random() < 1 / (1 + math.exp(-(3 * s - 1.5)))))
    a_ref, b_ref = ref_platt(pairs)
    a, b = fit_platt(_mk(spark, pairs))
    assert a == pytest.approx(a_ref, rel=1e-6, abs=1e-8)
    assert b == pytest.approx(b_ref, rel=1e-6, abs=1e-8)
    assert 1.0 < a < 6.0  # recovers the right slope regime
    # first-order optimality at the returned point (row-level gradient)
    n_pos = sum(1 for _, y in pairs if y)
    t_pos = (n_pos + 1.0) / (n_pos + 2.0)
    t_neg = 1.0 / (len(pairs) - n_pos + 2.0)
    ga = gb = 0.0
    for s, y in pairs:
        p = 1 / (1 + math.exp(-(a * s + b)))
        r = p - (t_pos if y else t_neg)
        ga += r * s
        gb += r
    assert abs(ga) < 1e-6 and abs(gb) < 1e-6
    probs = apply_platt(_mk(spark, pairs), a, b).collect()
    assert all(0.0 < r["prob"] < 1.0 for r in probs)


def test_platt_separable_stays_finite(spark):
    """Perfectly separable data: unregularized ML diverges (a -> inf);
    Platt's smoothed targets keep the fit finite."""
    from kafka_streams_task_spark.operators.evaluation import fit_platt

    pairs = [(0.9, 1)] * 20 + [(0.1, 0)] * 20
    a, b = fit_platt(_mk(spark, pairs))
    assert math_isfinite(a) and math_isfinite(b) and a > 0

    with pytest.raises(ValueError, match="both classes"):
        fit_platt(_mk(spark, [(0.5, 1), (0.6, 1)]))


def math_isfinite(x):
    import math

    return math.isfinite(x)


def test_eval_by_group_matches_per_group_bruteforce(spark):
    """Each group's metrics equal the brute-force references computed
    on that group alone; a one-class group reports NULL metrics; NULL
    group values form their own row."""
    from kafka_streams_task_spark.operators.evaluation import (
        classifier_eval_by_group,
    )

    rng = random.Random(13)
    rows = []
    groups = {
        "a": [(rng.randrange(8) / 8.0, rng.random() < 0.5) for _ in range(60)],
        "b": [(rng.randrange(5) / 5.0, rng.random() < 0.25) for _ in range(40)],
        None: [(rng.random(), rng.random() < 0.4) for _ in range(30)],
        "onecls": [(0.3, 1), (0.7, 1)],
    }
    for g, pairs in groups.items():
        rows += [(g, float(s), int(y)) for s, y in pairs]
    df = spark.createDataFrame(rows, "source string, score double, label int")
    got = {r["source"]: r for r in classifier_eval_by_group(df).collect()}
    assert set(got) == set(groups)
    for g, pairs in groups.items():
        auc, ap, ks = ref_metrics(pairs)
        r = got[g]
        assert r["n"] == len(pairs)
        if auc is None:
            assert r["auc"] is None and r["ap"] is None and r["ks"] is None
        else:
            assert r["auc"] == pytest.approx(auc, abs=1e-12)
            assert r["ap"] == pytest.approx(ap, abs=1e-12)
            assert r["ks"] == pytest.approx(ks, abs=1e-12)


def test_eval_by_group_window_is_group_partitioned(spark):
    """The ranking windows partition by the group column — never a
    global single-task window."""
    from kafka_streams_task_spark.operators.evaluation import (
        classifier_eval_by_group,
    )

    df = spark.createDataFrame(
        [("a", 0.5, 1), ("b", 0.7, 0)], "source string, score double, label int"
    )
    plan = (
        classifier_eval_by_group(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # every Window node's partition spec mentions grp
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "grp" in m.group(1)
