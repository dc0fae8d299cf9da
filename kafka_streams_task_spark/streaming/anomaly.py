"""Streaming rolling z-score anomaly detection — the stateful twin of
``operators/anomaly.py``.

The batch operator's strictly-trailing window is streamable by
construction (the baseline never includes the scored point); this
module makes that claim literal: one ``applyInPandasWithState`` keyed
by the series columns, whose state is the last ``window_n`` values —
a bounded ring per series, O(#series × window_n) total.

Semantics (identical to the batch operator, restated for streams):
- points score against the ``window_n`` values BEFORE them in
  ``order`` — across batch boundaries (the state carries the tail of
  the previous batch);
- z is NULL until ``min_periods`` of history exist, and on zero-scale
  (constant) baselines;
- the variance is the same explicit ``(ss − s·s/n)/(n−1)`` under a
  ``max(·, 0)`` guard — bit-parity with the batch operator is NOT
  promised (the batch windows re-sum per frame, the stream folds a
  running ring), but the equivalence test pins agreement to 1e-9,
  far below any alerting threshold;
- NULL values OCCUPY frame positions without contributing (the ring
  stores a hole, exactly like the batch ROWS frame where ``count(v)``
  skips NULLs), and the NULL-valued rows themselves are emitted with
  NULL z — row-for-row with the batch output; rows with a NULL order
  column are DROPPED (Spark sorts NULLs first, pandas last — their
  placement is engine-dependent, so the stream refuses the ambiguity
  the batch operator silently inherits). NaN values are holes here
  too, while the batch operator propagates NaN per IEEE through its
  window sums — filter NaN upstream when reconciling the two;
- ORDER WITHIN A BATCH comes from sorting the batch's rows by
  ``order_cols``; LATE rows — sorting before history already consumed
  — are NOT reordered into the past (the state only grows forward).
  Bound reordering upstream with a watermark if the source interleaves
  across batches.
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

_STATE = T.StructType(
    [T.StructField("ring", T.ArrayType(T.DoubleType()))]
)


def streaming_zscore(
    stream: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window_n: int = 24,
    min_periods: int = 12,
    threshold: float = 3.0,
) -> DataFrame:
    """Append-mode stream of
    ``(*series_cols, *order_cols, <value_col>, baseline_n, z,
    is_anomaly)`` — the batch scorer's columns, continuously.
    """
    if window_n < 2 or min_periods < 2:
        raise ValueError("window_n and min_periods must be >= 2")
    if min_periods > window_n:
        raise ValueError("min_periods cannot exceed window_n")

    fields = {f.name: f for f in stream.schema.fields}
    out_schema = T.StructType(
        [fields[c] for c in series_cols]
        + [fields[c] for c in order_cols]
        + [
            fields[value_col],
            T.StructField("baseline_n", T.LongType()),
            T.StructField("z", T.DoubleType()),
            T.StructField("is_anomaly", T.IntegerType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def fn(key: tuple[Any, ...], pdfs, state):
        ring: list[float] = list(state.get[0]) if state.exists else []
        batches = [p for p in pdfs if len(p)]
        if not batches:
            yield pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema}
            )
            return
        pdf = pd.concat(batches, ignore_index=True)
        for c in order_cols:
            pdf = pdf[pdf[c].notna()]
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        rows = []
        for _, r in pdf.iterrows():
            raw = r[value_col]
            v = None if pd.isna(raw) else float(raw)
            live = [x for x in ring if x is not None]
            n = len(live)
            z = None
            if v is not None and n >= min_periods:
                s = math.fsum(live)
                ss = math.fsum(x * x for x in live)
                var = (ss - s * s / n) / (n - 1)
                std = math.sqrt(max(var, 0.0))
                if std > 0:
                    z = (v - s / n) / std
            flag = 1 if z is not None and abs(z) > threshold else 0
            rows.append(
                [r[c] for c in series_cols]
                + [r[c] for c in order_cols]
                + [v, n, z, flag]
            )
            ring.append(v)
            if len(ring) > window_n:
                ring.pop(0)
        state.update((ring,))
        yield pd.DataFrame(rows, columns=out_cols)

    return stream.groupBy(*series_cols).applyInPandasWithState(
        fn,
        out_schema,
        _STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
