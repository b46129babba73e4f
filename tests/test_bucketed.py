"""Bucketed co-located join: both sides bucketed on the join key must join
with NO Exchange (the 100 TB join optimization the reference delegates to
its stores)."""

import pytest
from pyspark.sql import Row

from aleph2_contrib_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = spark.createDataFrame([Row(o_key=i, total=float(i * 10)) for i in range(200)])
    items = spark.createDataFrame(
        [Row(o_key=i % 200, qty=i % 7) for i in range(1000)]
    )
    write_bucketed(orders, "b_orders", ["o_key"], num_buckets=8)
    write_bucketed(items, "b_items", ["o_key"], num_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # disable broadcast so the (tiny) test tables take the sort-merge path a
    # 100 TB fact-fact join would take
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_table(spark, "b_orders")
        b = read_table(spark, "b_items")
        joined = a.join(b, "o_key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_correct_results(spark, bucketed):
    a = read_table(spark, "b_orders")
    b = read_table(spark, "b_items")
    got = (
        a.join(b, "o_key")
        .groupBy("o_key")
        .count()
        .filter("o_key < 3")
        .collect()
    )
    assert {r["o_key"]: r["count"] for r in got} == {0: 5, 1: 5, 2: 5}


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    # groupBy on the bucket key also avoids the shuffle
    b = read_table(spark, "b_items")
    agg = b.groupBy("o_key").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_overwrite_db_qualified(spark):
    # overwrite of a db-qualified bucketed table must resolve the real
    # location (db.db/tbl) — both when the catalog knows the table and when
    # only the warehouse directory survives from a previous session
    spark.sql("CREATE DATABASE IF NOT EXISTS bdb")
    df = spark.createDataFrame([Row(k=i, v=i * 2) for i in range(10)])
    try:
        write_bucketed(df, "bdb.b_tbl", ["k"], num_buckets=4)
        write_bucketed(df, "bdb.b_tbl", ["k"], num_buckets=4)  # overwrite, must not raise
        assert read_table(spark, "bdb.b_tbl").count() == 10

        # simulate a stale warehouse dir: drop from catalog but leave files
        import shutil
        from urllib.parse import urlparse

        loc = None
        for r in spark.sql("DESCRIBE TABLE EXTENDED bdb.b_tbl").collect():
            if r.col_name == "Location":
                loc = urlparse(r.data_type).path
        backup = loc + "_backup"
        shutil.copytree(loc, backup)
        spark.sql("DROP TABLE bdb.b_tbl")
        shutil.move(backup, loc)
        write_bucketed(df, "bdb.b_tbl", ["k"], num_buckets=4)  # must clear leftover
        assert read_table(spark, "bdb.b_tbl").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS bdb.b_tbl")
        spark.sql("DROP DATABASE IF EXISTS bdb")
