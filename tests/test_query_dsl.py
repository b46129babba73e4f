"""Unit tests for the query DSL → Column compiler (SURVEY §2.1), modeled on
the reference's translator tests (TestMongoDbUtils.java — range queries,
nested queries, multi queries)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aleph2_contrib_spark.functions.query import (
    Q,
    apply_query,
    compile_query,
    extract_date_range,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        Row(_id="a", n=1, s="x", tags=["t1", "t2"], nested=Row(a=1, b="p"), ts=dt.datetime(2020, 1, 1)),
        Row(_id="b", n=5, s="y", tags=["t2", "t3"], nested=Row(a=2, b="q"), ts=dt.datetime(2020, 6, 1)),
        Row(_id="c", n=10, s="x", tags=[], nested=Row(a=3, b="r"), ts=dt.datetime(2021, 1, 1)),
        Row(_id="d", n=None, s=None, tags=None, nested=None, ts=dt.datetime(2021, 6, 1)),
    ]
    return spark.createDataFrame(rows)


def ids(df_out):
    return sorted(r["_id"] for r in df_out.select("_id").collect())


def test_equals(spark, df):
    assert ids(apply_query(df, Q.all_of().when("s", "x"))) == ["a", "c"]


def test_not_equals_matches_missing(spark, df):
    # Mongo $ne semantics: missing/null fields match not-equals
    assert ids(apply_query(df, Q.all_of().when_not("s", "x"))) == ["b", "d"]


def test_any_of_scalar_and_array(spark, df):
    assert ids(apply_query(df, Q.all_of().with_any_of("s", ["y", "z"]))) == ["b"]
    # any_of on array field: overlap semantics
    assert ids(apply_query(df, Q.all_of().with_any_of("tags", ["t3", "zz"]))) == ["b"]


def test_all_of_array_superset(spark, df):
    assert ids(apply_query(df, Q.all_of().with_all_of("tags", ["t1", "t2"]))) == ["a"]
    assert ids(apply_query(df, Q.all_of().with_all_of("tags", ["t2"]))) == ["a", "b"]


def test_all_of_scalar_semantics(spark, df):
    # $all on scalar: matches iff scalar equals every listed value
    assert ids(apply_query(df, Q.all_of().with_all_of("s", ["x"]))) == ["a", "c"]
    assert ids(apply_query(df, Q.all_of().with_all_of("s", ["x", "y"]))) == []


def test_exists(spark, df):
    assert ids(apply_query(df, Q.all_of().with_present("n"))) == ["a", "b", "c"]
    assert ids(apply_query(df, Q.all_of().with_not_present("n"))) == ["d"]


def test_ranges_all_four(spark, df):
    assert ids(apply_query(df, Q.all_of().range_open_open("n", 1, 10))) == ["b"]
    assert ids(apply_query(df, Q.all_of().range_open_closed("n", 1, 10))) == ["b", "c"]
    assert ids(apply_query(df, Q.all_of().range_closed_closed("n", 1, 10))) == ["a", "b", "c"]
    assert ids(apply_query(df, Q.all_of().range_closed_open("n", 1, 10))) == ["a", "b"]
    assert ids(apply_query(df, Q.all_of().range_above("n", 5))) == ["b", "c"]
    assert ids(apply_query(df, Q.all_of().range_below("n", 5))) == ["a"]


def test_repeated_field_clauses_conjoin(spark, df):
    # Q11: same field repeated = AND of the clauses
    spec = Q.all_of().range_above("n", 2).range_below("n", 10)
    assert ids(apply_query(df, spec)) == ["b"]


def test_or_composition(spark, df):
    assert ids(apply_query(df, Q.any_of().when("s", "y").when("n", 10))) == ["b", "c"]


def test_nested_multi_query(spark, df):
    spec = Q.any_of(
        Q.all_of().when("s", "x").range_above("n", 5),
        Q.all_of().when("s", "y"),
    )
    assert ids(apply_query(df, spec)) == ["b", "c"]


def test_nested_struct_path(spark, df):
    assert ids(apply_query(df, Q.all_of().when("nested.b", "q"))) == ["b"]
    assert ids(apply_query(df, Q.all_of().range_above("nested.a", 2))) == ["b", "c"]


def test_map_path(spark):
    mdf = spark.createDataFrame(
        [Row(_id="a", m={"k1": 1.0}), Row(_id="b", m={"k1": 5.0, "k2": 2.0})]
    )
    assert ids(apply_query(mdf, Q.all_of().range_above("m.k1", 2.0))) == ["b"]
    assert ids(apply_query(mdf, Q.all_of().with_not_present("m.k2"))) == ["a"]


def test_enum_normalization(spark, df):
    import enum

    class S(enum.Enum):
        x = "ignored"

    assert ids(apply_query(df, Q.all_of().when("s", S.x))) == ["a", "c"]


def test_limit_orderby_projection(spark, df):
    spec = Q.all_of().with_present("n").order_by(("n", -1)).limit(2).with_projection(include=["_id", "n"])
    out = apply_query(df, spec)
    assert out.columns == ["_id", "n"]
    assert [r["_id"] for r in out.collect()] == ["c", "b"]


def test_projection_exclude(spark, df):
    out = apply_query(df, Q.all_of().with_projection(exclude=["tags", "nested"]))
    assert "tags" not in out.columns and "nested" not in out.columns


def test_empty_query_matches_all(spark, df):
    assert apply_query(df, Q.all_of()).count() == 4


def test_extract_date_range():
    spec = Q.all_of().range_closed_open("ts", dt.datetime(2020, 1, 1), dt.datetime(2021, 1, 1))
    lo, hi = extract_date_range(spec, "ts")
    assert lo == dt.datetime(2020, 1, 1) and hi == dt.datetime(2021, 1, 1)
    # OR context must not narrow
    spec2 = Q.any_of(spec, Q.all_of().when("s", "x"))
    assert extract_date_range(spec2, "ts") == (None, None)


def test_id_is_ordinary_column(spark, df):
    # Q12: _id get / in / ranges all work (no ES-style restriction)
    assert ids(apply_query(df, Q.all_of().when("_id", "a"))) == ["a"]
    assert ids(apply_query(df, Q.all_of().with_any_of("_id", ["a", "d"]))) == ["a", "d"]
    assert ids(apply_query(df, Q.all_of().range_closed_open("_id", "a", "c"))) == ["a", "b"]
