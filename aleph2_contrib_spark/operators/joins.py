"""Temporal join operators the reference platform lacks but a Spark-native
engine should offer (as-of joins are the standard way to align event streams
with slowly-changing reference data).

Scale design: the naive formulation (range join / correlated subquery)
explodes into O(n·m) comparisons per key. The union+window formulation used
here costs exactly ONE shuffle on the join key and a per-partition sort —
the same cost as a regular sort-merge join — and never materializes
candidate pairs. At 100 TB the only knob that matters is key cardinality
(salting applies if a single key dominates).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the value columns of
    the LATEST right row with ``right_ts <= left_ts`` for the same key
    (inclusive; nulls when no prior right row exists).

    Implementation: tag both sides, union, and forward-fill the right-side
    value columns with ``last(ignorenulls)`` over a (key, ts) window — one
    shuffle, no pair explosion. Right rows at an equal timestamp sort before
    left rows, making the match inclusive.

    ``tolerance``: optional max age (a Column interval/long in the ts
    unit-seconds domain); matches older than ``left_ts - tolerance`` are
    nulled out.
    """
    right_ts = right_ts or left_ts
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    on = list(on)

    fill_cols = [f"__v_{c}" for c in value_cols]
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(fc) for c, fc in zip(value_cols, fill_cols)],
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for fc in fill_cols:
        filled = filled.withColumn(fc, F.last(fc, ignorenulls=True).over(w))
    # the matched right timestamp (for tolerance checks / output)
    match_ts = F.last(
        F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
    ).over(w)
    filled = filled.withColumn("__match_ts", match_ts)

    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        stale = F.col("__match_ts") < (F.col("__ts") - tolerance)
        for fc in fill_cols:
            out = out.withColumn(fc, F.when(stale, F.lit(None)).otherwise(F.col(fc)))
        out = out.withColumn("__match_ts", F.when(stale, F.lit(None)).otherwise(F.col("__match_ts")))

    keep = [c for c in left.columns]
    renames = dict(zip(fill_cols, value_cols))
    return out.select(
        *keep,
        *[F.col(fc).alias(renames[fc]) for fc in fill_cols],
        F.col("__match_ts").alias("matched_ts"),
    )
