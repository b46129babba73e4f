"""Skew-aware aggregation: salted two-phase groupBy.

AQE's skew-join splitting handles joins; skewed AGGREGATION keys (one key
holding a large fraction of rows) still serialize into one reducer task.
The classic fix is salting: phase 1 groups on (key, salt) — spreading the
hot key over N tasks with map-side partial aggregation — phase 2 merges
the N partials per key. Worth it only for algebraic aggregates (sum/count/
min/max — re-aggregatable); averages decompose into sum+count.

At 100 TB this turns a stuck straggler task into N parallel tasks at the
cost of one extra (tiny, one-row-per-key-per-salt) shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": "sum", "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (agg_fn, input_col) with agg_fn in
    {sum, count, min, max}. Example::

        salted_agg(events, ["event_type"],
                   {"n": ("count", "*"), "total": ("sum", "value")})

    Phase 1 shuffles on (keys..., salt) — the hot key fans out over
    ``salt_buckets`` tasks; phase 2 shuffles one row per (key, salt).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))

    phase1_aggs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(out))
        elif fn in ("sum", "min", "max"):
            phase1_aggs.append(getattr(F, fn)(col).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)

    phase2_aggs = []
    for out, (fn, _col) in aggs.items():
        merge = F.sum if fn in ("count", "sum") else getattr(F, fn)
        phase2_aggs.append(merge(out).alias(out))
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join by salting: the (large, skewed) LEFT side gets a
    random salt; the (smaller, un-broadcastable) RIGHT side is replicated
    once per salt value, so a hot key's rows spread over ``salt_buckets``
    tasks instead of one straggler.

    Cost model: right side is scanned once and exploded x salt_buckets —
    use only when right is far smaller than left but too big to broadcast,
    and the left key distribution is skewed. AQE's skew-join split handles
    most cases at runtime; this operator is the explicit form for when AQE
    can't (e.g. a skewed key known in advance, or non-AQE engines).

    Supports inner / left joins (replication preserves left rows exactly
    once per matching right row).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_left = left.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, on + ["__salt"], how)
    return out.drop("__salt")
