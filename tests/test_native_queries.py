"""Mongo-JSON and ES-DSL query frontend tests, modeled on the reference's
translator tests (TestMongoDbUtils.java / TestElasticsearchUtils.java)."""

import datetime as dt

import pytest
from pyspark.sql import Row

from aleph2_contrib_spark.functions.native_queries import (
    apply_es_query,
    apply_v1_query,
    compile_es_query,
    compile_mongo_query,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        Row(_id="a", n=1, s="x", tags=["t1", "t2"], ts=dt.datetime(2020, 1, 1), txt="Quick Brown Fox"),
        Row(_id="b", n=5, s="y", tags=["t2", "t3"], ts=dt.datetime(2020, 6, 1), txt="slow red fox"),
        Row(_id="c", n=10, s="x", tags=[], ts=dt.datetime(2021, 1, 1), txt="quick dog"),
        Row(_id="d", n=None, s=None, tags=None, ts=dt.datetime(2021, 6, 1), txt=""),
    ]
    return spark.createDataFrame(rows)


def ids(df, pred):
    return sorted(r["_id"] for r in df.filter(pred).collect())


# -- Mongo ------------------------------------------------------------------


def test_mongo_implicit_and_eq(spark, df):
    assert ids(df, compile_mongo_query({"s": "x", "n": 1}, df.schema)) == ["a"]


def test_mongo_cmp_and_in(spark, df):
    assert ids(df, compile_mongo_query({"n": {"$gte": 5, "$lt": 10}}, df.schema)) == ["b"]
    assert ids(df, compile_mongo_query({"s": {"$in": ["y", "z"]}}, df.schema)) == ["b"]
    assert ids(df, compile_mongo_query({"n": {"$nin": [1, 5]}}, df.schema)) == ["c", "d"]


def test_mongo_ne_matches_missing(spark, df):
    assert ids(df, compile_mongo_query({"s": {"$ne": "x"}}, df.schema)) == ["b", "d"]


def test_mongo_array_semantics(spark, df):
    # equality on array field matches elements ($elemMatch-lite)
    assert ids(df, compile_mongo_query({"tags": "t2"}, df.schema)) == ["a", "b"]
    assert ids(df, compile_mongo_query({"tags": {"$all": ["t1", "t2"]}}, df.schema)) == ["a"]
    assert ids(df, compile_mongo_query({"tags": {"$in": ["t3", "zz"]}}, df.schema)) == ["b"]


def test_mongo_exists_not_bool_trees(spark, df):
    assert ids(df, compile_mongo_query({"n": {"$exists": True}}, df.schema)) == ["a", "b", "c"]
    # $not matches missing fields (Mongo semantics): d has n=null
    assert ids(df, compile_mongo_query({"n": {"$not": {"$gt": 4}}}, df.schema)) == ["a", "d"]
    q = {"$or": [{"s": "y"}, {"$and": [{"s": "x"}, {"n": {"$gt": 5}}]}]}
    assert ids(df, compile_mongo_query(q, df.schema)) == ["b", "c"]
    assert ids(df, compile_mongo_query({"$nor": [{"s": "x"}, {"s": "y"}]}, df.schema)) == ["d"]


def test_mongo_regex(spark, df):
    assert ids(df, compile_mongo_query({"txt": {"$regex": "^Quick"}}, df.schema)) == ["a"]


def test_v1_query_surface(spark, df):
    out = apply_v1_query(
        df,
        q={"s": {"$exists": True}},
        fields=["_id", "n"],
        limit=2,
        tmin=dt.datetime(2020, 3, 1),
        time_field="ts",
    )
    rows = out.collect()
    assert out.columns == ["_id", "n"] and len(rows) == 2


# -- Elasticsearch ----------------------------------------------------------


def test_es_term_terms_range(spark, df):
    assert ids(df, compile_es_query({"term": {"s": "x"}}, df.schema)) == ["a", "c"]
    assert ids(df, compile_es_query({"term": {"s": {"value": "y"}}}, df.schema)) == ["b"]
    assert ids(df, compile_es_query({"terms": {"s": ["x", "y"]}}, df.schema)) == ["a", "b", "c"]
    assert ids(df, compile_es_query({"range": {"n": {"gte": 5, "lt": 10}}}, df.schema)) == ["b"]


def test_es_term_on_array_and_exists_ids(spark, df):
    assert ids(df, compile_es_query({"term": {"tags": "t3"}}, df.schema)) == ["b"]
    assert ids(df, compile_es_query({"exists": {"field": "n"}}, df.schema)) == ["a", "b", "c"]
    assert ids(df, compile_es_query({"ids": {"values": ["a", "d"]}}, df.schema)) == ["a", "d"]


def test_es_match(spark, df):
    assert ids(df, compile_es_query({"match": {"txt": "quick fox"}}, df.schema)) == ["a", "b", "c"]
    assert ids(df, compile_es_query({"match": {"txt": {"query": "quick fox", "operator": "and"}}}, df.schema)) == ["a"]


def test_es_bool_tree(spark, df):
    q = {
        "bool": {
            "must": [{"range": {"n": {"gte": 1}}}],
            "should": [{"term": {"s": "x"}}, {"term": {"s": "y"}}],
            "must_not": [{"term": {"_id": "c"}}],
        }
    }
    assert ids(df, compile_es_query(q, df.schema)) == ["a", "b"]


def test_es_wrapped_query_and_match_all(spark, df):
    assert apply_es_query(df, {"query": {"match_all": {}}}).count() == 4


def test_es_unsupported_raises(spark, df):
    with pytest.raises(ValueError, match="unsupported"):
        compile_es_query({"fuzzy": {"s": "x"}}, df.schema)
