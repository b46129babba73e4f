"""Update DSL tests (SURVEY §2.2 C6-C14) over the kv fixture shape
(FIXTURES.md §6)."""

import pytest
from pyspark.sql import Row

from aleph2_contrib_spark.functions.query import Q
from aleph2_contrib_spark.functions.update import (
    U,
    apply_update,
    delete_by_spec,
    upsert_by_spec,
)


@pytest.fixture()
def kv(spark):
    rows = [
        Row(_id="a", n=1, s="x", lst=["p", "q"], nested=Row(a=10, b="u")),
        Row(_id="b", n=2, s="y", lst=["q"], nested=Row(a=20, b="v")),
        Row(_id="c", n=None, s="z", lst=None, nested=Row(a=30, b="w")),
    ]
    return spark.createDataFrame(rows)


def by_id(df):
    return {r["_id"]: r.asDict(recursive=True) for r in df.collect()}


def test_increment(spark, kv):
    out = by_id(apply_update(kv, Q.all_of().when("_id", "a"), U.update().increment("n", 5)))
    assert out["a"]["n"] == 6 and out["b"]["n"] == 2


def test_increment_initializes_null(spark, kv):
    out = by_id(apply_update(kv, Q.all_of().when("_id", "c"), U.update().increment("n", 7)))
    assert out["c"]["n"] == 7


def test_set_unset(spark, kv):
    upd = U.update().set("s", "NEW").unset("n")
    out = by_id(apply_update(kv, Q.all_of().when("_id", "b"), upd))
    assert out["b"]["s"] == "NEW" and out["b"]["n"] is None
    assert out["a"]["s"] == "x" and out["a"]["n"] == 1


def test_nested_set_and_unset(spark, kv):
    upd = U.update().set("nested.a", 99).unset("nested.b")
    out = by_id(apply_update(kv, Q.all_of().when("_id", "a"), upd))
    assert out["a"]["nested"]["a"] == 99 and out["a"]["nested"]["b"] is None
    assert out["b"]["nested"]["a"] == 20 and out["b"]["nested"]["b"] == "v"


def test_add_and_add_dedup(spark, kv):
    out = by_id(apply_update(kv, Q.all_of().when("_id", "a"), U.update().add("lst", "q")))
    assert out["a"]["lst"] == ["p", "q", "q"]
    out2 = by_id(
        apply_update(kv, Q.all_of().when("_id", "a"), U.update().add("lst", ["q", "r"], deduplicate=True))
    )
    assert out2["a"]["lst"] == ["p", "q", "r"]


def test_add_to_null_list(spark, kv):
    out = by_id(apply_update(kv, Q.all_of().when("_id", "c"), U.update().add("lst", "z")))
    assert out["c"]["lst"] == ["z"]


def test_remove_value_and_collection(spark, kv):
    out = by_id(apply_update(kv, Q.all_of().when("_id", "a"), U.update().remove("lst", "p")))
    assert out["a"]["lst"] == ["q"]
    out2 = by_id(apply_update(kv, Q.all_of().when("_id", "a"), U.update().remove("lst", ["p", "q"])))
    assert out2["a"]["lst"] == []


def test_remove_by_subquery(spark, kv):
    # $pull with query: remove elements equal to any of p/q via element query
    spec_elem = Q.any_of().when("", "p").when("", "q")
    out = by_id(apply_update(kv, Q.all_of().when("_id", "a"), U.update().remove("lst", spec_elem)))
    assert out["a"]["lst"] == []


def test_map_column_set_increment_unset(spark):
    rows = [
        Row(_id="a", metrics={"clicks": 1.0, "views": 5.0}),
        Row(_id="b", metrics={"clicks": 3.0}),
        Row(_id="c", metrics=None),
    ]
    df = spark.createDataFrame(rows)
    upd = U.update().increment("metrics.clicks", 2.0).set("metrics.score", 9.5).unset("metrics.views")
    out = by_id(apply_update(df, Q.all_of().when("_id", "a"), upd))
    assert out["a"]["metrics"] == {"clicks": 3.0, "score": 9.5}
    assert out["b"]["metrics"] == {"clicks": 3.0}
    # set into a null map creates it
    out2 = by_id(apply_update(df, Q.all_of().when("_id", "c"), U.update().set("metrics.new", 1.0)))
    assert out2["c"]["metrics"] == {"new": 1.0}


def test_update_by_range_spec(spark, kv):
    out = by_id(apply_update(kv, Q.all_of().range_above("n", 2), U.update().set("s", "big")))
    assert out["b"]["s"] == "big" and out["a"]["s"] == "x" and out["c"]["s"] == "z"


def test_delete_by_spec(spark, kv):
    out = delete_by_spec(kv, Q.all_of().when("s", "y"))
    assert sorted(r["_id"] for r in out.collect()) == ["a", "c"]


def test_upsert_existing_updates(spark, kv):
    out = upsert_by_spec(kv, Q.all_of().when("_id", "a"), U.update().increment("n", 1))
    assert by_id(out)["a"]["n"] == 2 and out.count() == 3


def test_upsert_missing_inserts(spark, kv):
    out = upsert_by_spec(kv, Q.all_of().when("_id", "zz"), U.update().set("s", "new").increment("n", 5))
    d = by_id(out)
    assert out.count() == 4 and d["zz"]["s"] == "new" and d["zz"]["n"] == 5
