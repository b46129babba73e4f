"""As-of join operator tests (union+window formulation)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aleph2_contrib_spark.operators.joins import asof_join


def ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", t=ts(0), px=10.0),
            Row(sym="A", t=ts(10), px=11.0),
            Row(sym="A", t=ts(20), px=12.0),
            Row(sym="B", t=ts(5), px=100.0),
        ]
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", t=ts(4), qty=1),    # matches px=10 @0
            Row(sym="A", t=ts(10), qty=2),   # inclusive: px=11 @10
            Row(sym="A", t=ts(99), qty=3),   # latest: px=12 @20
            Row(sym="B", t=ts(1), qty=4),    # before any quote -> null
            Row(sym="C", t=ts(1), qty=5),    # key never quoted -> null
        ]
    )


def test_asof_backward_inclusive(spark, trades, quotes):
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="t", value_cols=["px"])
    got = {(r["sym"], r["qty"]): r["px"] for r in out.collect()}
    assert got == {("A", 1): 10.0, ("A", 2): 11.0, ("A", 3): 12.0, ("B", 4): None, ("C", 5): None}
    assert out.count() == trades.count()  # left-preserving


def test_asof_tolerance(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        value_cols=["px"], tolerance=F.expr("INTERVAL 15 SECONDS"),
    )
    got = {(r["sym"], r["qty"]): r["px"] for r in out.collect()}
    # qty=3 trade at t=99 is 79s after the px=12 quote -> nulled by tolerance
    assert got[("A", 3)] is None
    assert got[("A", 1)] == 10.0


def test_asof_matched_ts_exposed(spark, trades, quotes):
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", value_cols=[])
    row = {r["qty"]: r["matched_ts"] for r in out.collect()}
    assert row[3] == ts(20)
    assert row[4] is None


def test_asof_collision_raises(spark, trades, quotes):
    # left already has 'px' -> ambiguous output name must fail fast
    tl = trades.withColumn("px", F.lit(0.0))
    with pytest.raises(ValueError, match="collision.*px"):
        asof_join(tl, quotes, on=["sym"], left_ts="t", right_ts="t", value_cols=["px"])
    # reserved internal/output names clash too
    tl2 = trades.withColumn("matched_ts", F.lit(None).cast("timestamp"))
    with pytest.raises(ValueError, match="collision.*matched_ts"):
        asof_join(tl2, quotes, on=["sym"], left_ts="t", right_ts="t", value_cols=["px"])


def test_range_join_and_band_expr_agree(spark):
    from aleph2_contrib_spark.operators.joins import band_expr, range_join

    bands = [("lo", 0.0, 10.0), ("mid", 10.0, 100.0), ("hi", 100.0, float("inf"))]
    vals = spark.range(0, 500).select((F.col("id") * 0.7).alias("v"))
    dim = spark.range(1).select(
        F.explode(
            F.array(*[
                F.struct(F.lit(n).alias("band"), F.lit(lo).alias("lo"),
                         F.lit(hi if hi != float("inf") else 1e18).alias("hi"))
                for n, lo, hi in bands
            ])
        ).alias("b")
    ).select("b.*")

    joined = (
        range_join(vals, dim, value_col="v")
        .groupBy("band").count().orderBy("band").collect()
    )
    cased = (
        vals.select(band_expr(bands, F.col("v")).alias("band"))
        .groupBy("band").count().orderBy("band").collect()
    )
    assert [(r["band"], r["count"]) for r in joined] == [
        (r["band"], r["count"]) for r in cased
    ]
    # the band_expr plan must contain no join node at all
    plan = vals.select(band_expr(bands, F.col("v")).alias("band"))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_scd2_pit_lookup_is_leakage_free(spark):
    """asof_join over scd2_intervals returns the interval in force AT the
    lookup date — never a later one (no feature leakage)."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.events import scd2_intervals
    from aleph2_contrib_spark.operators.joins import asof_join

    d = dt.date
    obs = spark.createDataFrame(
        [
            Row(k=1, a="LOW", ts=d(2024, 1, 1), id=1),
            Row(k=1, a="HIGH", ts=d(2024, 6, 1), id=2),
        ]
    )
    dim = scd2_intervals(obs, "k", "a", "ts", "id").select(
        F.col("key").alias("k"), "valid_from", F.col("attr").alias("a_asof")
    )
    facts = spark.createDataFrame(
        [
            Row(fid=1, k=1, when=d(2024, 3, 1)),   # mid first interval
            Row(fid=2, k=1, when=d(2024, 6, 1)),   # boundary: new value in force
            Row(fid=3, k=1, when=d(2023, 12, 1)),  # before history: null
        ]
    )
    out = {
        r.fid: r.a_asof
        for r in asof_join(
            facts, dim, on=["k"], left_ts="when", right_ts="valid_from",
            value_cols=["a_asof"],
        ).collect()
    }
    assert out == {1: "LOW", 2: "HIGH", 3: None}


# ---- grid-bucketed big-big interval joins ----


def _brute_pii(points, intervals):
    return sorted(
        (p, i)
        for p, *_ in points
        for i, lo, hi in intervals
        if lo <= p < hi
    )


def test_point_in_interval_matches_bruteforce(spark):
    import random

    from aleph2_contrib_spark.operators.joins import point_in_interval_join

    rng = random.Random(11)
    points = [(rng.randrange(-50, 200),) for _ in range(120)]
    intervals = [
        (i, lo, lo + rng.randrange(0, 40))
        for i, lo in enumerate(rng.randrange(-60, 190) for _ in range(40))
    ]
    pdf = spark.createDataFrame(points, ["p"])
    idf = spark.createDataFrame(intervals, ["iv_id", "lo", "hi"])
    for bucket in (1, 7, 64):
        got = sorted(
            (r.p, r.iv_id)
            for r in point_in_interval_join(pdf, idf, "p", bucket=bucket).collect()
        )
        assert got == _brute_pii(points, intervals)


def test_point_in_interval_half_open_and_empty(spark):
    from aleph2_contrib_spark.operators.joins import point_in_interval_join

    pdf = spark.createDataFrame([(5,), (9,), (10,)], ["p"])
    idf = spark.createDataFrame([(1, 5, 10), (2, 7, 7)], ["iv_id", "lo", "hi"])
    got = sorted(
        (r.p, r.iv_id) for r in point_in_interval_join(pdf, idf, "p", bucket=4).collect()
    )
    assert got == [(5, 1), (9, 1)]  # hi exclusive, empty interval matches nothing


def test_interval_overlap_matches_bruteforce_no_dups(spark):
    import random

    from aleph2_contrib_spark.operators.joins import interval_overlap_join

    rng = random.Random(13)
    a = [(i, lo, lo + rng.randrange(1, 30)) for i, lo in enumerate(rng.randrange(-40, 150) for _ in range(35))]
    b = [(j, lo, lo + rng.randrange(1, 30)) for j, lo in enumerate(rng.randrange(-40, 150) for _ in range(35))]
    want = sorted(
        (i, j)
        for i, alo, ahi in a
        for j, blo, bhi in b
        if max(alo, blo) < min(ahi, bhi)
    )
    adf = spark.createDataFrame(a, ["a_id", "a_lo", "a_hi"])
    bdf = spark.createDataFrame(b, ["b_id", "b_lo", "b_hi"])
    for bucket in (1, 8, 100):
        rows = interval_overlap_join(
            adf, bdf, ("a_lo", "a_hi"), ("b_lo", "b_hi"), bucket=bucket
        ).collect()
        got = sorted((r.a_id, r.b_id) for r in rows)
        assert got == want  # sorted-with-dups comparison: also proves exactly-once


def test_interval_overlap_rejects_column_clash(spark):
    import pytest as _pytest

    from aleph2_contrib_spark.operators.joins import interval_overlap_join

    adf = spark.createDataFrame([(1, 0, 5)], ["id", "lo", "hi"])
    with _pytest.raises(ValueError, match="disjoint column names"):
        interval_overlap_join(adf, adf, ("lo", "hi"), ("lo", "hi"))


def test_point_in_interval_rejects_column_clash(spark):
    import pytest as _pytest

    from aleph2_contrib_spark.operators.joins import point_in_interval_join

    pts = spark.createDataFrame([(3, 0, 5)], ["p", "lo", "hi"])
    ivs = spark.createDataFrame([(1, 0, 5)], ["iv_id", "lo", "hi"])
    with _pytest.raises(ValueError, match="disjoint column names"):
        point_in_interval_join(pts, ivs, "p")


def test_bitmap_prefilter_semi_join_exact(spark):
    from aleph2_contrib_spark.operators.joins import bitmap_prefilter_semi_join

    big = spark.createDataFrame([(i, i * 10) for i in range(500)], ["k", "v"])
    small = spark.createDataFrame(
        [(i,) for i in range(0, 500, 7)] * 3, ["k"]  # dup keys on build side
    )
    got = sorted(r.k for r in bitmap_prefilter_semi_join(big, small, ["k"]).collect())
    want = sorted(r.k for r in big.join(small.distinct(), "k", "left_semi").collect())
    assert got == want
    # schema passthrough: survivors keep ALL big columns, no helper columns
    assert bitmap_prefilter_semi_join(big, small, ["k"]).columns == ["k", "v"]


def test_bitmap_prefilter_tiny_bitmap_still_exact(spark):
    # m_bits=64 => single word, every key collides => the exact semi-join
    # backstop must remove all false positives
    from aleph2_contrib_spark.operators.joins import bitmap_prefilter_semi_join

    big = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    small = spark.createDataFrame([(3,), (77,)], ["k"])
    got = sorted(
        r.k for r in bitmap_prefilter_semi_join(big, small, ["k"], m_bits=64).collect()
    )
    assert got == [3, 77]


def test_bitmap_prefilter_composite_key_and_validation(spark):
    import pytest as _pytest

    from aleph2_contrib_spark.operators.joins import bitmap_prefilter_semi_join

    big = spark.createDataFrame(
        [(i % 5, i % 3, i) for i in range(60)], ["a", "b", "v"]
    )
    small = spark.createDataFrame([(1, 2), (4, 0)], ["a", "b"])
    got = sorted(
        (r.a, r.b, r.v)
        for r in bitmap_prefilter_semi_join(big, small, ["a", "b"]).collect()
    )
    want = sorted(
        (r.a, r.b, r.v) for r in big.join(small, ["a", "b"], "left_semi").collect()
    )
    assert got == want
    with _pytest.raises(ValueError, match="key required"):
        bitmap_prefilter_semi_join(big, small, [])
    with _pytest.raises(ValueError, match="must exist"):
        bitmap_prefilter_semi_join(big, small, ["nope"])
    with _pytest.raises(ValueError, match="multiple of 64"):
        bitmap_prefilter_semi_join(big, small, ["a", "b"], m_bits=65)


def test_bitmap_prefilter_broadcasts_bitmap_not_shuffle(spark):
    # the bitmap probe must be a broadcast hash join: the big side may not
    # hit an Exchange before the bitmap filter
    from aleph2_contrib_spark.operators.joins import bitmap_prefilter_semi_join

    big = spark.range(10000).withColumnRenamed("id", "k")
    small = spark.range(0, 10000, 13).withColumnRenamed("id", "k")
    plan = bitmap_prefilter_semi_join(big, small, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------- nearest-value join


def _brute_nearest(lrows, rrows):
    out = set()
    # dedupe right to min-id per value (the operator's documented tie rule)
    byval = {}
    for rid, rv in rrows:
        if rv is None:
            continue
        if rv not in byval or rid < byval[rv]:
            byval[rv] = rid
    reps = [(rid, rv) for rv, rid in byval.items()]
    for lid, lv in lrows:
        if lv is None or not reps:
            continue
        best = min(reps, key=lambda r: (abs(float(lv) - float(r[1])), r[1], r[0]))
        out.add((lid, lv, best[0], best[1], abs(float(lv) - float(best[1]))))
    return out


@pytest.fixture(scope="module")
def nn_data():
    import random

    rnd = random.Random(13)
    lrows = [(i, rnd.randint(-50, 1050)) for i in range(300)]
    lrows += [(1000, None), (1001, 500)]  # null value dropped; exact match
    rrows = [(j, rnd.randint(0, 1000)) for j in range(120)]
    rrows += [(2000, 500), (2001, 500), (2002, None)]  # value ties + null
    return lrows, rrows


@pytest.mark.parametrize("n_buckets", [1, 7, 64])
def test_nearest_value_join_matches_brute_force(spark, nn_data, n_buckets):
    from aleph2_contrib_spark.operators.joins import nearest_value_join

    lrows, rrows = nn_data
    l = spark.createDataFrame(lrows, "lid int, lv int").repartition(9)
    r = spark.createDataFrame(rrows, "rid int, rv int").repartition(5)
    got = {
        (x["lid"], x["lv"], x["rid"], x["rv"], x["dist"])
        for x in nearest_value_join(
            l, r, "lv", "rv", "lid", "rid", n_buckets=n_buckets
        ).collect()
    }
    assert got == _brute_nearest(lrows, rrows)


def test_nearest_value_join_empty_right_and_validation(spark):
    from aleph2_contrib_spark.operators.joins import nearest_value_join

    l = spark.createDataFrame([(1, 10)], "lid int, lv int")
    r = spark.createDataFrame([], "rid int, rv int")
    assert nearest_value_join(l, r, "lv", "rv", "lid", "rid").count() == 0
    with pytest.raises(ValueError, match="n_buckets"):
        nearest_value_join(l, r, "lv", "rv", "lid", "rid", n_buckets=0)


def test_nearest_value_join_oracle_matches(spark, nn_data):
    import duckdb

    from aleph2_contrib_spark.operators.joins import (
        nearest_value_join,
        nearest_value_join_oracle_sql,
    )

    lrows, rrows = nn_data
    l = spark.createDataFrame(lrows, "lid int, lv int")
    r = spark.createDataFrame(rrows, "rid int, rv int")
    got = {
        tuple(x)
        for x in nearest_value_join(l, r, "lv", "rv", "lid", "rid").collect()
    }
    lv = ", ".join(f"({a}, {'NULL' if b is None else b})" for a, b in lrows)
    rv = ", ".join(f"({a}, {'NULL' if b is None else b})" for a, b in rrows)
    sql = nearest_value_join_oracle_sql(
        f"SELECT c1 AS lid, c2 AS lv FROM (VALUES {lv}) t(c1, c2)",
        f"SELECT c1 AS rid, c2 AS rv FROM (VALUES {rv}) t(c1, c2)",
        "lv", "rv", "lid", "rid",
    )
    assert got == {tuple(x) for x in duckdb.sql(sql).fetchall()}


# -- epsilon_band_join --------------------------------------------------------


def test_epsilon_band_join_exact_membership(spark):
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.joins import epsilon_band_join

    l = spark.createDataFrame(
        [(1, 100), (2, 205), (3, None), (4, -3)], "lid int, lv long"
    )
    r = spark.createDataFrame(
        [(10, 95), (11, 110), (12, 206), (13, 300), (14, None), (15, 7)],
        "rid int, rv long",
    )
    got = {(x["lid"], x["rid"]): x["diff"]
           for x in epsilon_band_join(l, r, "lid", "lv", "rid", "rv", 10).collect()}
    # |100-95|=5, |100-110|=10 (inclusive), |205-206|=1, |-3-7|=10
    assert got == {(1, 10): -5, (1, 11): 10, (2, 12): 1, (4, 15): 10}
    # plan shape: equi-join on the bucket, never a nested-loop
    plan = epsilon_band_join(l, r, "lid", "lv", "rid", "rv", 10)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_epsilon_band_join_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.joins import (
        epsilon_band_join,
        epsilon_band_join_oracle_sql,
    )

    rnd = random.Random(13)
    lrows = [(i, rnd.randint(-500, 500)) for i in range(200)]
    rrows = [(i, rnd.randint(-500, 500)) for i in range(150)]
    l = spark.createDataFrame(lrows, "lid int, lv long")
    r = spark.createDataFrame(rrows, "rid int, rv long")
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    l.coalesce(1).write.parquet(lp)
    r.coalesce(1).write.parquet(rp)
    got = {tuple(x) for x in epsilon_band_join(l, r, "lid", "lv", "rid", "rv", 25).collect()}
    sql = epsilon_band_join_oracle_sql(
        f"SELECT lid, lv FROM '{lp}/*.parquet'",
        f"SELECT rid, rv FROM '{rp}/*.parquet'",
        "lid", "rid", 25,
    )
    want = {tuple(x) for x in duckdb.sql(sql).fetchall()}
    assert got == want


# -- grid_radius_join ---------------------------------------------------------


def test_grid_radius_join_matches_brute_force(spark):
    import random

    from aleph2_contrib_spark.operators.joins import grid_radius_join

    rnd = random.Random(7)
    # negative coords exercise the floor-toward--inf cell math
    lrows = [(i, rnd.randint(-300, 300), rnd.randint(-300, 300)) for i in range(120)]
    rrows = [(i, rnd.randint(-300, 300), rnd.randint(-300, 300)) for i in range(90)]
    radius = 60
    want = {
        (li, ri, (rx - lx) ** 2 + (ry - ly) ** 2)
        for (li, lx, ly) in lrows
        for (ri, rx, ry) in rrows
        if (rx - lx) ** 2 + (ry - ly) ** 2 <= radius * radius
    }
    l = spark.createDataFrame(lrows, "lid int, lx long, ly long")
    r = spark.createDataFrame(rrows, "rid int, rx long, ry long")
    out = grid_radius_join(l, r, "lid", "lx", "ly", "rid", "rx", "ry", radius)
    got = {(x["lid"], x["rid"], x["dist_sq"]) for x in out.collect()}
    assert got == want and len(got) > 0
    # plan shape: cell-keyed equi-join, never a nested-loop/cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_grid_radius_join_nulls_boundary_and_validation(spark):
    import pytest

    from aleph2_contrib_spark.operators.joins import grid_radius_join

    l = spark.createDataFrame(
        [(1, 0, 0), (2, None, 5), (3, 7, None)], "lid int, lx long, ly long"
    )
    r = spark.createDataFrame(
        [(10, 3, 4), (11, None, 0), (12, 5, 1)], "rid int, rx long, ry long"
    )
    got = {
        (x["lid"], x["rid"]): x["dist_sq"]
        for x in grid_radius_join(
            l, r, "lid", "lx", "ly", "rid", "rx", "ry", 5
        ).collect()
    }
    # (0,0)-(3,4) dist_sq 25 = r^2 inclusive boundary; NULL coords never match
    assert got == {(1, 10): 25}
    with pytest.raises(ValueError, match="radius"):
        grid_radius_join(l, r, "lid", "lx", "ly", "rid", "rx", "ry", 0)
    with pytest.raises(ValueError, match="2\\^30"):
        grid_radius_join(l, r, "lid", "lx", "ly", "rid", "rx", "ry", (1 << 30) + 1)


def test_grid_radius_join_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.joins import (
        grid_radius_join,
        grid_radius_join_oracle_sql,
    )

    rnd = random.Random(41)
    lrows = [(i, rnd.randint(-200, 200), rnd.randint(-200, 200)) for i in range(150)]
    rrows = [(i, rnd.randint(-200, 200), rnd.randint(-200, 200)) for i in range(150)]
    l = spark.createDataFrame(lrows, "lid int, lx long, ly long")
    r = spark.createDataFrame(rrows, "rid int, rx long, ry long")
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    l.coalesce(1).write.parquet(lp)
    r.coalesce(1).write.parquet(rp)
    out = grid_radius_join(l, r, "lid", "lx", "ly", "rid", "rx", "ry", 45)
    got = {tuple(x) for x in out.collect()}
    sql = grid_radius_join_oracle_sql(
        f"SELECT lid, lx, ly FROM '{lp}/*.parquet'",
        f"SELECT rid, rx, ry FROM '{rp}/*.parquet'",
        "lid", "rid", 45,
    )
    want = {tuple(x) for x in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) > 0


def test_asof_directional_semantics(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.joins import asof_join_directional

    def ts(s):
        return s  # epoch-seconds ints cast inside the operator

    left = spark.createDataFrame(
        [Row(k="a", i=1, t=100), Row(k="a", i=2, t=205), Row(k="a", i=3, t=300)]
    ).select("k", "i", F.col("t").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [Row(k="a", t=90), Row(k="a", t=110), Row(k="a", t=300)]
    ).select("k", F.col("t").cast("timestamp").alias("t"))

    def run(direction, tol=None):
        return {
            r.i: r.matched_epoch
            for r in asof_join_directional(
                left, right, ["k"], "t",
                direction=direction, tolerance_seconds=tol,
            ).collect()
        }

    # backward: latest right <= left (inclusive at 300)
    assert run("backward") == {1: 90, 2: 110, 3: 300}
    # forward: earliest right >= left (inclusive at 300)
    assert run("forward") == {1: 110, 2: 300, 3: 300}
    # nearest: i=1 gap back 10 == gap fwd 10 -> tie prefers backward;
    # i=2 back gap 95 < fwd gap 95 -> tie -> backward (110)
    assert run("nearest") == {1: 90, 2: 110, 3: 300}
    # tolerance 15: i=2's backward candidate (gap 95) dies both ways
    assert run("nearest", tol=15) == {1: 90, 2: None, 3: 300}
