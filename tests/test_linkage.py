"""Edit-distance join (operators/linkage.py) vs brute-force DP
Levenshtein: exactness across k incl. empty/short strings (where q-gram
bounds go vacuous and the length-window path must carry completeness)."""

from __future__ import annotations

import random

from pyspark.sql import Row

from kafka_streams_task_spark.operators.linkage import edit_distance_join


def _lev(a, b):
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
    return d[lb]


def _corpus(seed=3, n=120, max_len=14):
    rng = random.Random(seed)
    alpha = "abcdef"  # tiny alphabet: maximally collision-prone
    return [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randrange(0, max_len))))
        for i in range(n)
    ]


def test_edit_distance_join_exact_vs_brute_force(spark):
    names = _corpus()
    df = spark.createDataFrame([Row(doc_id=i, name=s) for i, s in names])
    for k in (1, 2, 3):
        got = {(r.id_a, r.id_b): r.distance for r in edit_distance_join(df, k=k).collect()}
        ref = {}
        for x in range(len(names)):
            for y in range(x + 1, len(names)):
                d = _lev(names[x][1], names[y][1])
                if d <= k:
                    ref[(names[x][0], names[y][0])] = d
        assert got == ref, f"k={k}"


def test_edit_distance_join_short_strings_not_missed(spark):
    # "ab" vs "cd" at k=2 share NO bigram — only the length-window path
    # can find them; "" pairs with any string of length <= k
    df = spark.createDataFrame(
        [Row(doc_id=1, name="ab"), Row(doc_id=2, name="cd"),
         Row(doc_id=3, name=""), Row(doc_id=4, name="xy"),
         Row(doc_id=5, name=None)]
    )
    got = {(r.id_a, r.id_b): r.distance for r in edit_distance_join(df, k=2).collect()}
    assert got == {
        (1, 2): 2, (1, 3): 2, (1, 4): 2,
        (2, 3): 2, (2, 4): 2, (3, 4): 2,
    }


def test_edit_distance_join_no_cartesian(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 12).alias("name")
    )
    out = edit_distance_join(docs, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    rows = out.collect()
    assert all(0 <= r.distance <= 3 and r.id_a < r.id_b for r in rows)
