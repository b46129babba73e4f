"""Tests for the analytic job spec/runner (§3.2), Hive type system (§1.2),
text_match operator, and per-stage observed stats (P13)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aleph2_contrib_spark.functions.hive_types import (
    HiveTypeError,
    generate_create_table_ddl,
    parse_hive_schema,
    parse_hive_type,
)
from aleph2_contrib_spark.functions.query import Q, apply_query
from aleph2_contrib_spark.model.job import AnalyticJob, JobInput, JobOutput, passthrough_job, sql_job
from aleph2_contrib_spark.plans.pipeline import Pipeline, Stage

SF = "/root/testdata/sf0.001"


# -- Hive types -------------------------------------------------------------


def test_primitives():
    assert parse_hive_type("BIGINT") == T.LongType()
    assert parse_hive_type("string") == T.StringType()
    assert parse_hive_type("DECIMAL(12,2)") == T.DecimalType(12, 2)
    assert parse_hive_type("VARCHAR(10)") == T.StringType()


def test_complex_types():
    assert parse_hive_type("ARRAY<INT>") == T.ArrayType(T.IntegerType())
    assert parse_hive_type("MAP<STRING,DOUBLE>") == T.MapType(T.StringType(), T.DoubleType())
    st = parse_hive_type("STRUCT<a:INT,b:ARRAY<STRING>>")
    assert st["a"].dataType == T.IntegerType()
    assert st["b"].dataType == T.ArrayType(T.StringType())


def test_uniontype_struct_of_nullables():
    ut = parse_hive_type("UNIONTYPE<INT,STRING>")
    assert [f.name for f in ut.fields] == ["u0", "u1"]
    assert ut["u0"].dataType == T.IntegerType()
    assert ut["u1"].dataType == T.StringType()


def test_nested_and_errors():
    t = parse_hive_type("ARRAY<STRUCT<k:STRING,v:MAP<STRING,BIGINT>>>")
    assert isinstance(t.elementType["v"].dataType, T.MapType)
    with pytest.raises(HiveTypeError):
        parse_hive_type("BLOB")


def test_schema_and_ddl_roundtrip():
    schema = parse_hive_schema({"id": "BIGINT", "tags": "ARRAY<STRING>", "amt": "DECIMAL(12,2)"})
    ddl = generate_create_table_ddl("t", schema, location="/data/t", partition_cols=["id"])
    assert "`tags` ARRAY<STRING>" in ddl and "PARTITIONED BY (`id`)" in ddl
    assert "LOCATION '/data/t'" in ddl and "`id` BIGINT" not in ddl.split("PARTITIONED")[0]


def test_declared_schema_reads_json(spark, tmp_path):
    p = tmp_path / "j.json"
    p.write_text('{"id": 1, "tags": ["a"], "amt": 3.5}\n')
    schema = parse_hive_schema({"id": "BIGINT", "tags": "ARRAY<STRING>", "amt": "DOUBLE"})
    df = spark.read.schema(schema).json(str(p))
    r = df.head()
    assert r["id"] == 1 and r["tags"] == ["a"]


# -- analytic jobs ----------------------------------------------------------


def test_sql_job(spark):
    job = sql_job(
        "rev",
        "SELECT o_orderstatus, count(*) AS n FROM ord GROUP BY o_orderstatus",
        [JobInput(name="ord", path=f"{SF}/orders.parquet")],
        view="rev_out",
    )
    out = job.run(spark)["sql"]
    assert out.count() == 3
    assert spark.table("rev_out").count() == 3


def test_passthrough_job_union(spark):
    job = passthrough_job(
        "pt",
        [
            JobInput(name="a", path=f"{SF}/region.parquet"),
            JobInput(name="b", path=f"{SF}/region.parquet"),
        ],
    )
    out = job.run(spark)["passthrough"]
    assert out.count() == 10  # 5 + 5


def test_job_input_pruning_and_limit(spark):
    job = passthrough_job(
        "lim",
        [JobInput(name="o", path=f"{SF}/orders.parquet", time_field="o_orderdate",
                  time_min="1996-01-01", time_max="1997-01-01", test_record_limit=7)],
    )
    out = job.run(spark)["passthrough"]
    rows = out.collect()
    assert len(rows) == 7
    assert all("1996" in str(r["o_orderdate"]) for r in rows)


def test_job_with_module_stages_and_output_path(spark, tmp_path):
    job = AnalyticJob(
        name="multi",
        inputs=[JobInput(name="ev", path=f"{SF}/region.parquet")],
        stages=[
            Stage(name="f", transform=lambda df: df.filter(F.col("r_regionkey") < 3)),
            Stage(name="agg", dependencies=("f",), sql="SELECT count(*) AS n FROM f"),
        ],
        outputs=[JobOutput(stage="agg", path=str(tmp_path / "out"))],
    )
    out = job.run(spark)["agg"]
    assert out.head()["n"] == 3
    assert spark.read.parquet(str(tmp_path / "out")).head()["n"] == 3


# -- text_match + observed stats --------------------------------------------


def test_text_match_and_or(spark):
    df = spark.createDataFrame(
        [Row(_id="a", t="The Quick Brown fox"), Row(_id="b", t="slow red fox"), Row(_id="c", t="quick red dog")]
    )
    got = apply_query(df, Q.all_of().text_match("t", "QUICK fox"))
    assert sorted(r["_id"] for r in got.collect()) == ["a"]
    got_or = apply_query(df, Q.all_of().text_match("t", "quick fox", operator="or"))
    assert sorted(r["_id"] for r in got_or.collect()) == ["a", "b", "c"]


def test_stage_stats_observed(spark):
    df = spark.createDataFrame([Row(k="a", n=1), Row(k="b", n=2), Row(k="c", n=3)])
    pipe = Pipeline(
        [
            Stage(name="f", transform=lambda d: d.filter(F.col("n") > 1)),
            Stage(name="m", dependencies=("f",), transform=lambda d: d.withColumn("n2", F.col("n") * 2)),
        ]
    )
    out = pipe.run(spark, {"in": df}, observe_stats=True)["m"]
    out.collect()
    stats = pipe.stage_stats()
    assert stats["f"]["out_count"] == 2 and stats["m"]["out_count"] == 2
