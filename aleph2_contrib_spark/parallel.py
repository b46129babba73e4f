"""Input-parallelism guard for compute-heavy narrow passes.

A small parquet table arrives as one partition (one file split), which
serializes any expensive per-row computation (shingling, hashing,
signatures) onto a single core. At 100 TB inputs have thousands of splits
and this is a no-op; on small inputs one round-robin repartition buys full
core utilization for the narrow pass that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
