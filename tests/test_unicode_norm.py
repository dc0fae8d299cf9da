"""Unicode normalization stage (operators/unicode_norm.py, r7): the step
before content-keyed dedup when a corpus mixes NFC/NFD forms."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.dedup import drop_exact_duplicates
from kafka_streams_task_spark.operators.unicode_norm import (
    normalize_unicode,
    unicode_normalize,
)

NFC_DOC = unicodedata.normalize("NFC", "café résumé naïve")
NFD_DOC = unicodedata.normalize("NFD", "café résumé naïve")


def test_nfd_copy_dedups_only_with_stage(spark):
    """The motivating defect: an NFD copy of an NFC doc is byte-distinct
    (different md5), so dedup_exact keeps both — unless the
    normalization stage runs first."""
    assert NFC_DOC != NFD_DOC  # truly byte-distinct inputs
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=NFC_DOC), Row(doc_id=2, text=NFD_DOC)]
    )
    assert drop_exact_duplicates(docs).count() == 2  # without the stage: both survive
    survivors = drop_exact_duplicates(normalize_unicode(docs)).collect()
    assert [r.doc_id for r in survivors] == [1], "one survivor, lowest id"
    assert survivors[0].text == NFC_DOC


def test_forms_and_nulls(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="ﬁve №5"), Row(doc_id=2, text=None)]
    )
    out = {r.doc_id: r.text for r in normalize_unicode(df, form="NFKC").collect()}
    assert out[1] == unicodedata.normalize("NFKC", "ﬁve №5")  # ligature + sign folded
    assert out[2] is None

    with pytest.raises(ValueError, match="form must be one of"):
        unicode_normalize("text", form="NFZ")


def test_single_arrow_stage_no_shuffle(spark):
    """One vectorized Arrow stage even over multiple columns; no
    row-at-a-time Python, no shuffle introduced."""
    df = spark.createDataFrame([Row(doc_id=1, a=NFD_DOC, b=NFD_DOC)])
    plan = (
        normalize_unicode(df, cols=("a", "b"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
