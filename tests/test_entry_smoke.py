"""Smoke: the driver contract — entry() and every queries() entry runs at
sf0.001 and returns a stable schema with ≥0 rows; every oracle_sql() runs
on DuckDB."""

import duckdb
import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = em.entry(spark)
    assert len(df.collect()) > 0


def test_all_queries_run(spark):
    for name, fn in em.queries().items():
        df = fn(spark, SF)
        assert df.columns, name
        df.limit(5).collect()


def test_oracles_parse_and_run():
    con = duckdb.connect()
    from aleph2_contrib_spark.sources.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in em.oracle_sql().items():
        con.execute(sql).fetchall()


def test_oracle_keys_subset_of_queries():
    assert set(em.oracle_sql()) <= set(em.queries())
