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


# -- V1 legacy envelope (LegacyV1HadoopUtils.parseQueryObject) --------------


NOW = int(dt.datetime(2024, 6, 15, 10, 30, tzinfo=dt.timezone.utc).timestamp() * 1000)
DAY = 86_400_000


def test_v1_relative_time_terms():
    from aleph2_contrib_spark.functions.native_queries import parse_min_max_dates

    assert parse_min_max_dates("now", None, NOW) == (NOW, None)
    assert parse_min_max_dates("now-2d", "now", NOW) == (NOW - 2 * DAY, NOW)
    midnight = NOW - NOW % DAY
    assert parse_min_max_dates("midnight", None, NOW) == (midnight, None)
    assert parse_min_max_dates("midnight-3h", None, NOW) == (midnight - 3 * 3_600_000, None)
    # default unit is days; 'month' special case = 30d
    assert parse_min_max_dates("now-2", None, NOW) == (NOW - 2 * DAY, None)
    assert parse_min_max_dates("now-month", None, NOW) == (NOW - 30 * DAY, None)


def test_v1_absolute_time_terms():
    from aleph2_contrib_spark.functions.native_queries import parse_min_max_dates

    feb1 = int(dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    # YYYYMMDD min is midnight; as max it extends to end-of-day
    assert parse_min_max_dates("20240201", None, NOW) == (feb1, None)
    assert parse_min_max_dates(None, "20240201", NOW) == (None, feb1 + DAY - 1)
    # day-only other formats also extend; full timestamps don't
    assert parse_min_max_dates(None, "02/01/2024", NOW)[1] == feb1 + DAY - 1
    assert parse_min_max_dates(None, "2024-02-01 06:00:00", NOW)[1] == feb1 + 6 * 3_600_000
    # epoch ms passthrough, $date wrapper, datetime, swap-if-inverted
    assert parse_min_max_dates(feb1, {"$date": feb1 + 1000}, NOW) == (feb1, feb1 + 1000)
    assert parse_min_max_dates("now", "now-2d", NOW) == (NOW - 2 * DAY, NOW)


def test_v1_objectid_bound():
    from aleph2_contrib_spark.functions.native_queries import objectid_bound

    oid = objectid_bound(1_700_000_000_000)
    assert len(oid) == 24 and oid == format(1_700_000_000, "08x") + "0" * 16
    # lexicographic order == time order
    assert objectid_bound(1_700_000_000_000) < objectid_bound(1_700_000_001_000)


def test_v1_parse_query_object_envelope():
    from aleph2_contrib_spark.functions.native_queries import (
        objectid_bound,
        parse_v1_query_object,
    )

    parsed = parse_v1_query_object(
        {
            "s": "x",
            ":limit": 7,
            ":splits": 4,
            ":docsPerSplit": 100,
            ":fields": {"n": 1},
            ":srctags": {"$in": ["tag1"]},
            ":tmin": "now-1d",
            ":tmax": "now",
            ":caches": "abc",
        },
        community_ids=["c1", "c2"],
        now_ms=NOW,
    )
    assert parsed["limit"] == 7 and parsed["fields"] == {"n": 1}
    assert parsed["srctags"] == {"$in": ["tag1"]}
    q = parsed["q"]
    # control keys stripped, server-side restrictions injected
    assert not any(k.startswith(":") for k in q)
    assert q["communityId"] == {"$in": ["c1", "c2"]}
    assert q["index"] == {"$ne": "?DEL?"}
    assert q["_id"] == {
        "$gte": objectid_bound(NOW - DAY),
        "$lte": objectid_bound(NOW),
    }
    assert q["s"] == "x"


def test_v1_apply_query_object_end_to_end(spark):
    from aleph2_contrib_spark.functions.native_queries import (
        apply_v1_query_object,
        objectid_bound,
    )

    t0 = NOW - 3 * DAY
    docs = spark.createDataFrame(
        [
            Row(_id=objectid_bound(t0 + i * DAY // 2), communityId=f"c{i % 3}",
                sourceKey=f"s{i % 4}", index="live" if i % 5 else "?DEL?", n=i)
            for i in range(20)
        ]
    )
    sources = spark.createDataFrame(
        [Row(key=f"s{i}", tags=["all", f"t{i % 2}"]) for i in range(4)]
    )
    out = apply_v1_query_object(
        docs,
        {"n": {"$gte": 2}, ":tmin": t0 + DAY, ":tmax": "now", ":srctags": "t1",
         ":fields": {"_id": 1, "n": 1}},
        community_ids=["c0", "c1"],
        sources=sources,
        now_ms=NOW,
    )
    rows = out.collect()
    assert out.columns == ["_id", "n"]
    got = sorted(r["n"] for r in rows)
    # manual expectation: n>=2, ts in [t0+DAY, NOW], community c0/c1,
    # not soft-deleted (n % 5 != 0), source tagged t1 (odd source index)
    exp = [
        i for i in range(20)
        if i >= 2 and t0 + DAY <= t0 + i * DAY // 2 <= NOW and i % 3 in (0, 1)
        and i % 5 != 0 and (i % 4) % 2 == 1
    ]
    assert exp == [3]  # ids past NOW are excluded by the :tmax oid bound
    assert got == exp


def test_v1_srctags_requires_sources(spark, df):
    from aleph2_contrib_spark.functions.native_queries import apply_v1_query_object

    with pytest.raises(ValueError, match="srctags"):
        apply_v1_query_object(df, {":srctags": "x"}, now_ms=NOW)
