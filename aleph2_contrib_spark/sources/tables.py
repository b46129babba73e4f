"""Table catalog over the driver's parquet star schema.

The reference models a dataset as a *bucket* whose search-index service
exposes one DataFrame per input and registers it as a temp table
(reference: ElasticsearchSparkUtils.java:55-133, SparkTechnologyUtils
buildBatchSparkSqlInputs:515-540). Here a "bucket" is simply a parquet
path; Spark's catalog supplies the temp-view registration and Catalyst
supplies predicate/projection pushdown into the scan.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

# Analyzed-reader cache: spark.read.parquet() costs ~90 ms of driver-side
# footer/schema resolution per call, and a 300-query bench pass makes 350+
# such calls against the same handful of immutable paths. Caching the
# *DataFrame object* (an unexecuted plan) per (session, path) removes that
# fixed cost without persisting any data — every action still scans the
# parquet files. Keyed weakly on the session so stopped sessions release
# their entries; keyed on the absolute path so distinct SF dirs never mix.
_reader_cache: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def _read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    path = os.path.abspath(path)
    per_session = _reader_cache.setdefault(spark, {})
    df = per_session.get(path)
    if df is None:
        df = spark.read.parquet(path)
        per_session[path] = df
    return df


TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
        # version this reads natively as TIMESTAMP_NTZ (4.1+) or needs the
        # legacy nanos-as-long conf and a manual micros conversion. Handle
        # both so callers always see a timestamp-typed ts.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet_cached(spark, path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        return df
    return _read_parquet_cached(spark, path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = _read_parquet_cached(spark, path)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view (SQL passthrough
    inputs — reference SparkSqlTopology registers each input by name)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
