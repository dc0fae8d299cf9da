"""Catalog shapes kept outside the driver's 50-query correctness window.

q10_returned_items was deregistered in r2 (slot freed for the CC-clustering
query); the 4-way-join + agg + top-k shape stays executable and pinned here.
"""

from __future__ import annotations

from kafka_streams_task_spark.catalog.relational import q10_returned_items

SF_DIR = "/root/testdata/sf0.001"


def test_q10_shape_runs(spark):
    rows = q10_returned_items(spark, SF_DIR).collect()
    assert len(rows) <= 20
    if rows:
        assert rows[0].asDict().keys() == {"c_custkey", "c_name", "revenue", "n_name"}
        revs = [r["revenue"] for r in rows]
        assert revs == sorted(revs, reverse=True)
