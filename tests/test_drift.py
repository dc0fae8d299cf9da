"""Corpus drift (operators/drift.py): JS divergence / new-lost mass vs
a pure-Python reference, mix-shift contracts incl. NULL groups, and the
snapshot-version wrapper."""

import math
import re
from collections import Counter

import pytest


def _tok(s):
    return [t for t in re.split(r"[ \t\n\r\f]+", s.strip()) if t] if s else []


def ref_drift(old_texts, new_texts):
    po = Counter(t for s in old_texts for t in _tok(s))
    pn = Counter(t for s in new_texts for t in _tok(s))
    to, tn = sum(po.values()), sum(pn.values())
    js = 0.0
    for t in set(po) | set(pn):
        p = po.get(t, 0) / to if to else 0.0
        q = pn.get(t, 0) / tn if tn else 0.0
        m = (p + q) / 2
        if p > 0:
            js += p * math.log(p / m) / 2
        if q > 0:
            js += q * math.log(q / m) / 2
    new_mass = sum(c for t, c in pn.items() if t not in po) / tn if tn else None
    lost_mass = sum(c for t, c in po.items() if t not in pn) / to if to else None
    return {
        "old_tokens": to, "new_tokens": tn,
        "old_vocab": len(po), "new_vocab": len(pn),
        "shared_vocab": len(set(po) & set(pn)),
        "js": js if to and tn else None,
        "new_mass": new_mass, "lost_mass": lost_mass,
    }


OLD = [
    "the cat sat on the mat",
    "a dog barked at the cat",
    "rivers run to the sea",
]
NEW = [
    "the cat sat on the mat",
    "quantum computing alters cryptography forever",
    "the sea was calm",
]


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_drift_matches_reference(spark):
    from kafka_streams_task_spark.operators.drift import corpus_drift_report

    exp = ref_drift(OLD, NEW)
    row = corpus_drift_report(_df(spark, OLD), _df(spark, NEW)).collect()[0]
    assert row["old_tokens"] == exp["old_tokens"]
    assert row["new_tokens"] == exp["new_tokens"]
    assert row["old_vocab"] == exp["old_vocab"]
    assert row["new_vocab"] == exp["new_vocab"]
    assert row["shared_vocab"] == exp["shared_vocab"]
    assert row["js_divergence"] == pytest.approx(exp["js"], abs=1e-12)
    assert row["new_mass"] == pytest.approx(exp["new_mass"], abs=1e-12)
    assert row["lost_mass"] == pytest.approx(exp["lost_mass"], abs=1e-12)
    assert 0 < row["js_divergence"] < math.log(2)


def test_drift_identical_and_disjoint(spark):
    from kafka_streams_task_spark.operators.drift import corpus_drift_report

    same = corpus_drift_report(_df(spark, OLD), _df(spark, OLD)).collect()[0]
    assert same["js_divergence"] == pytest.approx(0.0, abs=1e-15)
    assert same["new_mass"] == 0.0 and same["lost_mass"] == 0.0
    disj = corpus_drift_report(
        _df(spark, ["aa bb cc"]), _df(spark, ["xx yy zz"])
    ).collect()[0]
    assert disj["js_divergence"] == pytest.approx(math.log(2), abs=1e-12)
    assert disj["new_mass"] == 1.0 and disj["lost_mass"] == 1.0
    assert disj["shared_vocab"] == 0


def test_drift_empty_side_is_null(spark):
    from kafka_streams_task_spark.operators.drift import corpus_drift_report

    row = corpus_drift_report(
        _df(spark, []), _df(spark, ["some text here"])
    ).collect()[0]
    assert row["old_tokens"] == 0 and row["new_tokens"] == 3
    assert row["js_divergence"] is None and row["lost_mass"] is None
    assert row["new_mass"] == 1.0


def test_mix_shift_report(spark):
    from kafka_streams_task_spark.operators.drift import mix_shift_report

    old = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "source string"
    )
    new = spark.createDataFrame(
        [("a",), ("b",), ("b",), ("b",), ("c",), (None,), (None,)],
        "source string",
    )
    rows = {r["source"]: r for r in mix_shift_report(old, new).collect()}
    assert set(rows) == {"a", "b", "c", None}
    assert (rows["a"]["old_n"], rows["a"]["new_n"]) == (2, 1)
    assert rows["a"]["old_frac"] == pytest.approx(0.5)
    assert rows["a"]["new_frac"] == pytest.approx(1 / 7)
    assert rows["a"]["log_ratio"] == pytest.approx(math.log((1 / 7) / 0.5))
    assert rows["c"]["old_n"] == 0 and rows["c"]["log_ratio"] is None
    assert rows[None]["old_n"] == 1 and rows[None]["new_n"] == 2
    deltas = sum(r["delta"] for r in rows.values())
    assert deltas == pytest.approx(0.0, abs=1e-12)


def test_snapshot_drift_wrapper(spark, tmp_path):
    from kafka_streams_task_spark.operators.drift import snapshot_drift
    from kafka_streams_task_spark.operators.snapshots import snapshot_write

    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark,
        spark.createDataFrame([(i, t) for i, t in enumerate(OLD)],
                              "doc_id bigint, text string"),
        tbl,
    )
    snapshot_write(
        spark,
        spark.createDataFrame([(i, t) for i, t in enumerate(NEW)],
                              "doc_id bigint, text string"),
        tbl,
        mode="overwrite",  # v2 REPLACES the corpus (append would union)
    )
    exp = ref_drift(OLD, NEW)
    row = snapshot_drift(spark, tbl, 1).collect()[0]  # v1 -> latest
    assert row["js_divergence"] == pytest.approx(exp["js"], abs=1e-12)
    assert row["new_mass"] == pytest.approx(exp["new_mass"], abs=1e-12)


def test_drift_plan_is_jvm_only(spark):
    from kafka_streams_task_spark.operators.drift import (
        corpus_drift_report,
        mix_shift_report,
    )

    for df in (
        corpus_drift_report(_df(spark, OLD), _df(spark, NEW)),
        mix_shift_report(
            spark.createDataFrame([("a",)], "source string"),
            spark.createDataFrame([("b",)], "source string"),
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
