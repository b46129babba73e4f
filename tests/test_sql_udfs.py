"""SQL scalar-function surface: registration and parity with the Column
implementations they mirror (functions/sql_udfs.py)."""

from pyspark.sql import Row, functions as F

from aleph2_contrib_spark.functions.sql_udfs import register_sql_functions
from aleph2_contrib_spark.operators.corpus import md5_unit
from aleph2_contrib_spark.operators.dedup import fingerprint
from aleph2_contrib_spark.operators.text import token_count


def test_register_and_call(spark):
    names = register_sql_functions(spark)
    assert "a2_fingerprint" in names and "a2_keep" in names
    r = spark.sql(
        "SELECT a2_fingerprint('A  b') AS fp, a2_token_count('  x y  z ') AS tc, "
        "a2_keep('42', 1.0, 's') AS k_all, a2_keep('42', 0.0, 's') AS k_none"
    ).collect()[0]
    assert r.fp == spark.sql("SELECT md5('a b') AS m").collect()[0].m
    assert r.tc == 3
    assert r.k_all is True and r.k_none is False


def test_parity_with_column_functions(spark):
    register_sql_functions(spark)
    df = spark.createDataFrame(
        [
            Row(id="1", text="The  Quick   brown FOX"),
            Row(id="2", text=""),
            Row(id="3", text="a a a b"),
        ]
    )
    df.createOrReplaceTempView("sqlfn_parity")
    via_sql = spark.sql(
        """SELECT id, a2_fingerprint(text) AS fp, a2_token_count(text) AS tc,
                  a2_md5_unit(id, 'sd') AS u
           FROM sqlfn_parity"""
    ).collect()
    via_col = df.select(
        "id",
        fingerprint(F.col("text")).alias("fp"),
        token_count(F.col("text")).alias("tc"),
        md5_unit(F.col("id"), "sd").alias("u"),
    ).collect()
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_col))


def test_sql_function_inlines_into_codegen(spark):
    """The SQL function must inline — the plan shows plain expressions
    (no BatchEvalPython / pythonUDF nodes)."""
    register_sql_functions(spark)
    spark.range(5).selectExpr("CAST(id AS STRING) AS s").createOrReplaceTempView("sqlfn_plan")
    plan = (
        spark.sql("SELECT a2_fingerprint(s) FROM sqlfn_plan")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan, plan
