"""Skyline / Pareto-frontier operators (operators/skyline.py): both the
bucketed 2D path and the generic mapInPandas path against a brute-force
dominance check, plus direction handling, caps, and validation."""

import random

import pytest

from aleph2_contrib_spark.operators.skyline import skyline, skyline_2d


def _dominates(p, q, dirs):
    ge = all(
        (a <= b if d == "min" else a >= b) for a, b, d in zip(p, q, dirs)
    )
    strict = any(
        (a < b if d == "min" else a > b) for a, b, d in zip(p, q, dirs)
    )
    return ge and strict


def _brute_skyline(points, dirs):
    pts = set(points)
    return {
        q for q in pts if not any(_dominates(p, q, dirs) for p in pts if p != q)
    }


@pytest.fixture(scope="module")
def points2d():
    rnd = random.Random(7)
    pts = [(rnd.randint(0, 50), rnd.randint(0, 50)) for _ in range(400)]
    pts += [(0, 60), (60, 0), (0, 0)]  # corners; (0,0) dominates both axes' ties
    pts += pts[:10]  # duplicates must collapse
    return pts


@pytest.mark.parametrize(
    "mx,my", [(True, True), (True, False), (False, True), (False, False)]
)
def test_skyline_2d_matches_brute_force(spark, points2d, mx, my):
    df = spark.createDataFrame(points2d, "x int, y int")
    got = {(r["x"], r["y"]) for r in skyline_2d(df, "x", "y", mx, my).collect()}
    dirs = ("min" if mx else "max", "min" if my else "max")
    assert got == _brute_skyline(points2d, dirs)


def test_skyline_2d_single_bucket_and_empty(spark, points2d):
    df = spark.createDataFrame(points2d, "x int, y int")
    got = {(r["x"], r["y"]) for r in skyline_2d(df, "x", "y", n_buckets=1).collect()}
    assert got == _brute_skyline(points2d, ("min", "min"))
    empty = spark.createDataFrame([], "x int, y int")
    assert skyline_2d(empty, "x", "y").count() == 0


def test_skyline_generic_matches_brute_force_3d(spark):
    rnd = random.Random(11)
    pts = [
        (rnd.randint(0, 12), rnd.randint(0, 12), rnd.randint(0, 12))
        for _ in range(300)
    ]
    df = spark.createDataFrame(pts, "a int, b int, c int").repartition(8)
    got = {
        (r["a"], r["b"], r["c"])
        for r in skyline(df, [("a", "min"), ("b", "min"), ("c", "max")]).collect()
    }
    assert got == _brute_skyline(pts, ("min", "min", "max"))


def test_skyline_generic_agrees_with_2d(spark, points2d):
    df = spark.createDataFrame(points2d, "x int, y int").repartition(6)
    a = {(r["x"], r["y"]) for r in skyline(df, [("x", "min"), ("y", "min")]).collect()}
    b = {(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()}
    assert a == b


def test_skyline_cap_and_validation(spark):
    df = spark.createDataFrame([(i, -i) for i in range(100)], "x int, y int")
    # perfectly anti-correlated: every point is on the frontier
    with pytest.raises(ValueError, match="max_frontier"):
        skyline(df, [("x", "min"), ("y", "min")], max_frontier=10)
    with pytest.raises(ValueError, match="at least one"):
        skyline(df, [])
    with pytest.raises(ValueError, match="direction"):
        skyline(df, [("x", "down")])
    with pytest.raises(ValueError, match="not in DataFrame"):
        skyline(df, [("zz", "min")])
    with pytest.raises(ValueError, match="n_buckets"):
        skyline_2d(df, "x", "y", n_buckets=0)


def test_skyline_final_pass_spans_arrow_batches(spark):
    """The stage-2 exact pass must hold ONE dominance frontier across all
    Arrow batches of the single gathered partition. Regression: with
    maxRecordsPerBatch smaller than the candidate count, a per-batch
    frontier lets points survive whose dominator sits in another batch."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "50")
    try:
        # anti-correlated diagonal: every (i, N-i) survives any local
        # skyline; the single global dominator (0, 0) kills them all
        n = 400
        pts = [(i, n - i) for i in range(1, n)] + [(0, 0)]
        df = spark.createDataFrame(pts, "x int, y int").repartition(8)
        rows = skyline(df, [("x", "min"), ("y", "min")]).collect()
        assert {(r["x"], r["y"]) for r in rows} == {(0, 0)}
    finally:
        spark.conf.set(key, prev)


def test_skyline_oracle_sql_matches(spark, points2d):
    import duckdb

    from aleph2_contrib_spark.operators.skyline import skyline_oracle_sql

    df = spark.createDataFrame(points2d, "x int, y int")
    got = {
        (r["x"], r["y"])
        for r in skyline_2d(df, "x", "y", minimize_x=True, minimize_y=False).collect()
    }
    vals = ", ".join(f"({a}, {b})" for a, b in points2d)
    sql = skyline_oracle_sql(
        f"SELECT c1 AS x, c2 AS y FROM (VALUES {vals}) t(c1, c2)",
        [("x", "min"), ("y", "max")],
    )
    assert got == {tuple(r) for r in duckdb.sql(sql).fetchall()}
