"""Exact distributed top-k by frequency with candidate pruning (the
threshold / TPUT family: Fagin et al., Cao & Wang "Efficient top-K query
calculation in distributed networks", PODC'04).

Why not plain ``groupBy(key).count().orderBy(...).limit(k)``? That plan is
already partial-aggregated map-side, but the shuffle still moves EVERY
distinct key once. For heavy-tailed key spaces — n-gram counts over a
100 TB corpus have trillions of distinct keys — the long tail dominates
the shuffle while contributing nothing to the answer. The two-phase scheme
here shuffles O(budget × partitions) candidate rows instead, then proves
the answer exact:

1. **Local phase** (Arrow-batched ``mapInPandas``, zero shuffle): each
   partition counts its own keys (the same hash-table memory a JVM
   partial agg would use) and emits only its ``local_budget`` most
   frequent, plus the count of its first PRUNED key — that partition's
   contribution to any absent key is at most that threshold (0 if the
   partition emitted everything).
2. **Verify phase**: exact global counts for the candidate union via a
   broadcast semi-join (candidates are ≤ budget × partitions rows by
   construction), then the threshold bound: a key outside EVERY
   partition's emitted set has true count ≤ Σ_p threshold_p. If the k-th
   exact candidate count is strictly above that bound, no pruned key can
   reach the top k and the result is provably the exact top-k — for any
   input partitioning. Otherwise we raise with the budget that failed
   rather than return a silently-approximate answer.

Zipf-shaped data satisfies the bound at tiny budgets (the gate runs with
the default 4k+64). Uniform data defeats pruning — as it defeats every
member of this algorithm family — and fails fast with instructions to
raise the budget or fall back to the plain aggregate.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_topk(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int,
    local_budget: int | None = None,
) -> DataFrame:
    """Exact top-``k`` (key_cols..., cnt) rows by descending frequency,
    ties broken by ascending key columns. Raises ``ValueError`` when the
    pruning bound cannot certify exactness at this ``local_budget``.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    budget = int(local_budget) if local_budget is not None else 4 * k + 64
    if budget < k:
        raise ValueError(f"local_budget {budget} must be >= k {k}")

    # null keys would silently vanish at the verify semi-join (SQL null
    # equality); exclude them from the universe explicitly instead
    slim = df.select(*keys).na.drop(subset=keys)
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in slim.schema.fields
    )
    cand_schema = f"{out_fields}, __local_cnt long, __threshold long"

    def local_top(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        whole = pd.concat(parts, ignore_index=True)
        counts = (
            whole.groupby(keys, dropna=False, sort=False)
            .size()
            .reset_index(name="__local_cnt")
            .sort_values("__local_cnt", ascending=False, kind="stable")
        )
        kept = counts.head(budget).copy()
        # a key this partition pruned has local count <= the first pruned
        # count; if nothing was pruned the partition contributes 0 to any
        # key it did not emit
        threshold = (
            int(counts["__local_cnt"].iloc[budget]) if len(counts) > budget else 0
        )
        kept["__threshold"] = threshold
        yield kept

    local = slim.mapInPandas(local_top, schema=cand_schema)
    local = local.persist()
    try:
        # Σ_p threshold_p: O(partitions) rows — the per-partition constant
        # travels on every candidate row, so one distinct per threshold
        # value per partition would double-count; take one row per
        # partition via the (threshold, min-key) trick is overkill — each
        # partition emits ONE threshold value, so sum(distinct-per-
        # partition) = sum over first row of each partition. Aggregate
        # max per candidate key is wrong too; instead recompute from a
        # per-partition reduction:
        thresholds = (
            local.groupBy(F.spark_partition_id().alias("__pid"))
            .agg(F.first("__threshold").alias("__t"))
            .agg(F.coalesce(F.sum("__t"), F.lit(0)).alias("ub"))
            .collect()[0]["ub"]
        )
        cands = local.select(*keys).distinct()
        exact = (
            slim.join(F.broadcast(cands), keys, "left_semi")
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        order = [F.col("cnt").desc()] + [F.col(c).asc() for c in keys]
        top = exact.orderBy(*order).limit(k)
        rows = top.collect()
    finally:
        local.unpersist()

    # fewer than k candidates is only provably-complete when nothing was
    # pruned anywhere (bound 0); otherwise a pruned key could belong here
    kth = rows[-1]["cnt"] if len(rows) >= k else 0
    if kth <= thresholds and not (len(rows) < k and thresholds == 0):
        raise ValueError(
            f"exact_topk cannot certify exactness: k-th candidate count "
            f"{kth} <= pruned-key upper bound {thresholds}; raise "
            f"local_budget (was {budget}) or use the plain "
            f"groupBy/orderBy/limit aggregate for this key distribution"
        )
    spark = df.sparkSession
    return spark.createDataFrame(rows, top.schema) if rows else top
