"""As-of join: for each left row, the latest right row with
right.on <= left.on (backward) within the same key group.

Absent from both the reference and Spark's builtins (SURVEY §2.4 'absent');
the Spark-idiomatic scalable formulation is a cogrouped ``applyInPandas``:
both sides co-partition (one shuffle each) on the key, and each group pair
runs ``pandas.merge_asof`` (sort-merge within group). No O(n*m) candidate
join is ever materialized, unlike the naive join-then-argmax formulation.

Skew note: a single hot key's groups must fit in executor memory — the same
bound as any cogrouped op; salt the key upstream if a key exceeds it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward/forward/nearest as-of join.

    Output: all left columns + each right column (except ``by``) renamed
    with ``right_prefix``. Unmatched left rows keep nulls on the right side
    (left-join semantics, like ``pd.merge_asof``).
    """
    from pyspark.sql import functions as F

    right_cols = [c for c in right.columns if c != by]
    out_fields = list(left.schema.fields)
    for c in right_cols:
        f = right.schema[c]
        out_fields.append(T.StructField(f"{right_prefix}{c}", f.dataType, True))
    out_schema = T.StructType(out_fields)
    out_names = [f.name for f in out_fields]
    left_cols = list(left.columns)

    # Prefix the right side BEFORE the cogroup: cogrouped applyInPandas
    # deduplicates attributes by name across the two children, and a right
    # column sharing a left column's name (typically the `on` column) gets
    # silently pruned from the right pdf.
    right_pre = right.select(
        F.col(by), *[F.col(c).alias(f"{right_prefix}{c}") for c in right_cols]
    )
    r_on = f"{right_prefix}{on}"

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(l_pdf) == 0:
            return pd.DataFrame(columns=out_names)
        l_sorted = l_pdf.sort_values(on, kind="mergesort")
        r_renamed = r_pdf.drop(columns=[by])
        if len(r_renamed) == 0:
            out = l_sorted.copy()
            for c in right_cols:
                out[f"{right_prefix}{c}"] = None
            return out[out_names]
        r_sorted = r_renamed.sort_values(r_on, kind="mergesort")
        merged = pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=on,
            right_on=r_on,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )
        # nullable integer columns come back float64 from merge_asof; Arrow
        # needs a nullable integer dtype to keep the declared long schema
        for f in out_fields:
            if f.name not in left_cols and isinstance(f.dataType, (T.LongType, T.IntegerType)):
                merged[f.name] = merged[f.name].astype("Int64")
        return merged[out_names]

    return (
        left.groupBy(by)
        .cogroup(right_pre.groupBy(by))
        .applyInPandas(merge, out_schema)
    )
