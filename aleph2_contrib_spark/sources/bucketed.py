"""Bucketed tables: pre-shuffled layout for co-located (shuffle-free) joins.

The reference pushes join work to its backing stores; Spark's equivalent of
a co-located join is hash-bucketed tables — both sides written with
``bucketBy(n, keys)`` on the join key join WITHOUT an Exchange: each task
reads matching bucket files from both sides. On repeatedly-joined 100 TB
facts this converts every join from a full shuffle into a local merge,
which is the single biggest join optimization available.

Notes that matter at scale:
- Both sides must agree on bucket count and key; a mismatch falls back to a
  shuffle on one side (still half the work).
- ``sortBy`` on the same keys lets SortMergeJoin skip its sort.
- Bucketed tables are catalog tables (``saveAsTable``); path-only parquet
  cannot carry bucket metadata.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def drop_table_and_managed_dir(spark: SparkSession, table_name: str) -> None:
    """DROP TABLE + scrub any surviving managed warehouse directory so a
    following ``saveAsTable`` cannot fail with LOCATION_ALREADY_EXISTS.

    If the catalog knows the table, resolve its REAL location and type
    (db-qualified names live under db.db/tbl; external tables own their
    location) instead of guessing {warehouse}/{name}; external data is
    deliberately left in place."""
    import shutil
    from urllib.parse import urlparse

    loc, is_managed = None, True
    if spark.catalog.tableExists(table_name):
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect():
            if r.col_name == "Location":
                loc = r.data_type
            elif r.col_name == "Type":
                is_managed = r.data_type.strip().upper() == "MANAGED"
    # DROP deletes a managed table's data through the catalog; external
    # data is deliberately left in place.
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if loc is None:
        # Catalog didn't know the table (fresh in-memory catalog after a
        # previous session) but its managed warehouse directory may
        # survive. Derive the default managed location, honoring db
        # qualification.
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        parts = table_name.lower().split(".")
        rel = f"{parts[-2]}.db/{parts[-1]}" if len(parts) > 1 else parts[0]
        loc, is_managed = f"{wh.scheme or 'file'}://{wh.path}/{rel}", True
    p = urlparse(loc)
    # only ever rm local filesystem paths; remote URIs (s3/hdfs) are the
    # catalog's job and DROP TABLE above already handled managed data
    if is_managed and p.scheme in ("", "file"):
        shutil.rmtree(p.path, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: Sequence[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    spark = df.sparkSession
    if mode == "overwrite":
        drop_table_and_managed_dir(spark, table_name)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_keys)
    if sort:
        writer = writer.sortBy(*bucket_keys)
    writer.format("parquet").saveAsTable(table_name)


def write_partitioned(
    df: DataFrame,
    table_name: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a value-partitioned catalog table (partition
    pruning on the partition columns — the layout for cell/bucket-probed
    reads, e.g. IVF cells: a probe touches only its cells' directories)."""
    spark = df.sparkSession
    if mode == "overwrite":
        drop_table_and_managed_dir(spark, table_name)
    df.write.mode(mode).partitionBy(*partition_cols).format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
