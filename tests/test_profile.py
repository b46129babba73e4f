"""operators/profile.py: engine-portable column profiling."""

import pytest
from pyspark.sql import functions as F

from aleph2_contrib_spark.operators import profile as pf
from aleph2_contrib_spark.operators.profile import (
    numeric_histogram,
    numeric_summary,
    profile_column,
)


def test_histogram_bins_and_boundaries(spark):
    df = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
    out = {r.bin: r.cnt for r in numeric_histogram(df, "v", 0.0, 10.0, bins=5).collect()}
    # width 2: values {0..9} → bins 0..4, 20 each
    assert out == {0: 20, 1: 20, 2: 20, 3: 20, 4: 20}
    # value == hi lands in the LAST bin, outside excluded
    df2 = spark.createDataFrame([(0.0,), (10.0,), (11.0,), (-1.0,)], "v double")
    out2 = {r.bin: r.cnt for r in numeric_histogram(df2, "v", 0.0, 10.0, bins=5).collect()}
    assert out2 == {0: 1, 4: 1}
    with pytest.raises(ValueError):
        numeric_histogram(df, "v", 5.0, 5.0, bins=5)


def test_histogram_is_mergeable(spark):
    a = spark.range(0, 500).select((F.col("id") % 37).cast("double").alias("v"))
    b = spark.range(500, 900).select((F.col("id") % 37).cast("double").alias("v"))
    whole = {r.bin: r.cnt for r in numeric_histogram(a.unionByName(b), "v", 0.0, 40.0, 8).collect()}
    pa = {r.bin: r.cnt for r in numeric_histogram(a, "v", 0.0, 40.0, 8).collect()}
    pb = {r.bin: r.cnt for r in numeric_histogram(b, "v", 0.0, 40.0, 8).collect()}
    merged = {k: pa.get(k, 0) + pb.get(k, 0) for k in set(pa) | set(pb)}
    assert merged == whole


def test_summary_and_profile(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (None,)], "v double")
    s = numeric_summary(df, "v").collect()[0]
    assert (s.n, s.n_null, s.min_v, s.max_v, s.sum_v, s.mean_v) == (4, 1, 1.0, 3.0, 6.0, 2.0)
    p = profile_column(df, "v", bins=2)
    assert p["distinct_est"] == 3  # small-range HLL is exact here
    assert sum(h["cnt"] for h in p["histogram"]) == 3


def test_summary_survives_extreme_and_nan_values(spark):
    """QA profilers must report anomalies, not crash on them: values
    beyond DECIMAL range and NaN are excluded from the exact sum/mean
    and surfaced as counts; min/max ignore NaN so histograms still work."""
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (float("nan"),), (1e35,), (None,)], "v double"
    )
    s = numeric_summary(df, "v").collect()[0]
    assert s.n == 5 and s.n_null == 1 and s.n_nan == 1
    assert s.n_unsummable == 2  # the NaN + the beyond-DECIMAL(38,6) value
    assert (s.min_v, s.max_v) == (1.0, 1e35)
    assert s.sum_v == 3.0 and s.mean_v == 1.5  # exact over summable values
    p = profile_column(df, "v", bins=2)
    assert sum(h["cnt"] for h in p["histogram"]) == 3  # NaN/null excluded


def test_summary_empty_input(spark):
    df = spark.createDataFrame([], "v double")
    s = numeric_summary(df, "v").collect()[0]
    assert (s.n, s.n_null, s.n_nan, s.n_unsummable) == (0, 0, 0, 0)


def test_histogram_drift_tvd(spark):
    """TVD properties: 0 for identical histograms, 1 for disjoint ones,
    exact rational value for a hand-computed case, missing bins count 0."""
    from pyspark.sql import Row

    def h(rows):
        return spark.createDataFrame([Row(bin=b, cnt=c) for b, c in rows])

    same = pf.histogram_drift(h([(0, 5), (1, 5)]), h([(0, 5), (1, 5)])).collect()[0]
    assert same.tvd == 0.0 and same.n_ref == 10 and same.n_cur == 10

    disjoint = pf.histogram_drift(h([(0, 7)]), h([(1, 3)])).collect()[0]
    assert disjoint.tvd == 1.0 and disjoint.n_bins == 2

    # ref p = (0.75, 0.25), cur p = (0.25, 0.75) -> tvd = 0.5
    half = pf.histogram_drift(h([(0, 3), (1, 1)]), h([(0, 1), (1, 3)])).collect()[0]
    assert half.tvd == 0.5

    # a bin present on one side only contributes its whole mass
    onesided = pf.histogram_drift(h([(0, 4)]), h([(0, 2), (1, 2)])).collect()[0]
    assert onesided.tvd == 0.5


def test_expectations_report_kinds(spark):
    """Every rule kind counts its violations; NULL semantics per docstring."""
    from pyspark.sql import Row

    rows = [
        Row(id=1, v=5, tag="en", code="src1"),
        Row(id=1, v=50, tag="zz", code="src2"),     # dup id, out-of-set tag
        Row(id=None, v=None, tag="en", code="bad"),  # null id/v, bad code
        Row(id=3, v=-1, tag=None, code="src3"),      # v below range
    ]
    out = {
        r["rule"]: r.asDict()
        for r in pf.expectations_report(
            spark.createDataFrame(rows),
            [
                {"rule": "id_nn", "kind": "not_null", "column": "id"},
                {"rule": "id_uq", "kind": "unique", "column": "id"},
                {"rule": "v_rng", "kind": "range", "column": "v", "lo": 0, "hi": 10},
                {"rule": "tag_set", "kind": "in_set", "column": "tag", "values": ["en", "es"]},
                {"rule": "code_re", "kind": "regex", "column": "code", "pattern": "^src[0-9]$"},
            ],
        ).collect()
    }
    assert all(v["n_rows"] == 4 for v in out.values())
    assert out["id_nn"]["n_violations"] == 1 and out["id_nn"]["passed"] == 0
    assert out["id_uq"]["n_violations"] == 1          # id=1 twice; NULL not counted
    assert out["v_rng"]["n_violations"] == 2          # 50 and -1; NULL not counted
    assert out["tag_set"]["n_violations"] == 1        # zz; NULL not counted
    assert out["code_re"]["n_violations"] == 1        # bad
    assert set(out) == {"id_nn", "id_uq", "v_rng", "tag_set", "code_re"}


def test_expectations_single_scan_and_empty_input(spark):
    """All rules share ONE scan of the input; empty tables pass cleanly."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(id=1, v=2)])
    rules = [
        {"rule": "a", "kind": "not_null", "column": "id"},
        {"rule": "b", "kind": "range", "column": "v", "lo": 0, "hi": 10},
        {"rule": "c", "kind": "unique", "column": "id"},
    ]
    plan = (
        pf.expectations_report(df, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") == 1, plan
    empty = pf.expectations_report(df.filter(F.col("id") < 0), rules)
    got = {r["rule"]: r.asDict() for r in empty.collect()}
    assert all(v["n_rows"] == 0 and v["n_violations"] == 0 and v["passed"] == 1
               for v in got.values())
    import pytest as _pt

    with _pt.raises(ValueError):
        pf.expectations_report(df, [{"rule": "x", "kind": "nope", "column": "id"}])


def test_anomaly_zscore_flags_hand_case(spark):
    """99 values at 10.0 plus one at 1000.0: the spike flags, the rest
    don't; exact integer math is partition-order independent."""
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.profile import anomaly_zscore_flags

    rows = [("g", 10.0)] * 99 + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = anomaly_zscore_flags(df, "value", "grp", z=3)
    flagged = out.filter(F.col("is_anomaly")).select("value").collect()
    assert [r.value for r in flagged] == [1000.0]
    out2 = anomaly_zscore_flags(df.repartition(7), "value", "grp", z=3)
    assert out2.filter(F.col("is_anomaly")).count() == 1


def test_anomaly_zscore_constant_group_flags_nothing(spark):
    """Zero variance: rhs == lhs == 0, strict > flags no row."""
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.profile import anomaly_zscore_flags

    df = spark.createDataFrame([("g", 5.0)] * 10, "grp string, value double")
    assert (
        anomaly_zscore_flags(df, "value", "grp").filter(F.col("is_anomaly")).count() == 0
    )


def test_ks_statistic_hand_case(spark):
    from aleph2_contrib_spark.operators.profile import ks_statistic
    from pyspark.sql import Row, functions as F

    # a = {1,2,3,4}, b = {3,4,5,6}: the max CDF gap is 0.5 (at value 2)
    rows = [Row(g="a", v=float(x)) for x in (1, 2, 3, 4)] + [
        Row(g="b", v=float(x)) for x in (3, 4, 5, 6)
    ]
    out = ks_statistic(
        spark.createDataFrame(rows), "v", F.col("g") == "a", F.col("g") == "b"
    ).head()
    assert (out["n_a"], out["n_b"]) == (4, 4)
    assert out["ks_f6"] == 500000


def test_ks_statistic_identical_and_disjoint(spark):
    from aleph2_contrib_spark.operators.profile import ks_statistic
    from pyspark.sql import Row, functions as F

    same = [Row(g=g, v=float(x)) for g in ("a", "b") for x in range(10)]
    out = ks_statistic(
        spark.createDataFrame(same), "v", F.col("g") == "a", F.col("g") == "b"
    ).head()
    assert out["ks_f6"] == 0
    apart = [Row(g="a", v=float(x)) for x in range(5)] + [
        Row(g="b", v=float(x + 100)) for x in range(5)
    ]
    out2 = ks_statistic(
        spark.createDataFrame(apart), "v", F.col("g") == "a", F.col("g") == "b"
    ).head()
    assert out2["ks_f6"] == 1000000


def test_ks_statistic_partition_invariant(spark):
    from aleph2_contrib_spark.operators.profile import ks_statistic
    from pyspark.sql import Row, functions as F

    rows = [Row(g="a" if i % 3 else "b", v=float((i * 13) % 47) / 7.0) for i in range(300)]
    a = ks_statistic(spark.createDataFrame(rows).repartition(1), "v", F.col("g") == "a", F.col("g") == "b").head()
    b = ks_statistic(spark.createDataFrame(rows).repartition(16), "v", F.col("g") == "a", F.col("g") == "b", num_partitions=5).head()
    assert tuple(a) == tuple(b)


def test_table_summary_exact(spark):
    from aleph2_contrib_spark.operators.profile import table_summary

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (2, None, 7.0), (3, "c", None)],
        "k long, s string, v double",
    )
    got = {r.col_name: tuple(r)[1:] for r in table_summary(df).collect()}
    assert got["k"] == (4, 0, 3, "1", "3")
    assert got["s"] == (4, 1, 2, "a", "c")
    assert got["v"] == (4, 2, 2, "5.0", "7.0")


def test_table_summary_modes_and_validation(spark):
    import pytest as _pytest

    from aleph2_contrib_spark.operators.profile import table_summary

    df = spark.createDataFrame([(1, "x")], "k long, s string")
    none_mode = {r.col_name: r.n_distinct for r in table_summary(df, distinct="none").collect()}
    assert none_mode == {"k": None, "s": None}
    approx = {r.col_name: r.n_distinct for r in table_summary(df, distinct="approx").collect()}
    assert approx == {"k": 1, "s": 1}  # exact at trivial cardinality
    with _pytest.raises(ValueError, match="not in DataFrame"):
        table_summary(df, cols=["nope"])
    with _pytest.raises(ValueError, match="exact|approx|none"):
        table_summary(df, distinct="bogus")


def test_table_summary_all_null_column(spark):
    from aleph2_contrib_spark.operators.profile import table_summary

    df = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    got = {r.col_name: tuple(r)[1:] for r in table_summary(df).collect()}
    assert got["s"] == (2, 2, 0, None, None)


def test_fd_violations_holds_and_violated(spark):
    from aleph2_contrib_spark.operators.profile import fd_violations

    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "a", 11),  # x->y holds for x=1
            (2, "b", 10),
            (2, "c", 10),  # x->y violated for x=2 (2 distinct y)
            (3, None, 5),  # NULL rhs ignored
            (3, "d", 5),
        ],
        "x int, y string, z int",
    )
    got = {r.fd: r for r in fd_violations(df, [(["x"], "y"), (["y"], "x")]).collect()}
    r = got["x->y"]
    assert (r.n_groups, r.violating_groups, r.violating_rows, r.max_rhs_ndv) == (
        3,
        1,
        2,
        2,
    )
    # y->x holds: each y value (incl. the NULL group) maps to one x
    r2 = got["y->x"]
    assert (r2.n_groups, r2.violating_groups, r2.max_rhs_ndv) == (5, 0, 1)


def test_fd_violations_validation(spark):
    import pytest as _pytest

    from aleph2_contrib_spark.operators.profile import fd_violations

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with _pytest.raises(ValueError, match="no candidate"):
        fd_violations(df, [])
    with _pytest.raises(ValueError, match="not in DataFrame"):
        fd_violations(df, [(["a"], "nope")])


# -- key_skew --------------------------------------------------------------


def test_key_skew_exact_and_null_handling(spark):
    from aleph2_contrib_spark.operators.profile import key_skew

    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 4), (None, 5), (None, 6)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {r["col_name"]: r.asDict() for r in key_skew(df, ["k", "v"]).collect()}
    k = got["k"]
    # 3 keys (a, b, NULL), heaviest 'a' with 3 of 6 rows
    assert (k["n_rows"], k["n_keys"], k["max_cnt"]) == (6, 3, 3)
    assert k["max_share_ppm"] == 500_000
    assert k["skew_ratio_ppm"] == 1_500_000
    v = got["v"]
    assert (v["n_keys"], v["max_cnt"], v["skew_ratio_ppm"]) == (6, 1, 1_000_000)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in DataFrame"):
        key_skew(df, ["zz"])
    with _pytest.raises(ValueError, match="at least one"):
        key_skew(df, [])


def test_key_skew_oracle_matches(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        key_skew,
        key_skew_oracle_sql,
    )

    rows = [(i % 7, f"t{i % 3}") for i in range(200)] + [(None, None)]
    df = spark.createDataFrame(rows, "a int, b string")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in key_skew(df, ["a", "b"]).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    want = {tuple(r) for r in con.execute(key_skew_oracle_sql("t", ["a", "b"])).fetchall()}
    assert got == want


# -- chi2_independence -----------------------------------------------------


def test_chi2_independence_exact_and_independent_case(spark):
    from aleph2_contrib_spark.operators.profile import chi2_independence

    # perfectly independent 2x2: chi2 must be exactly 0
    rows = [("x", "p")] * 10 + [("x", "q")] * 10 + [("y", "p")] * 10 + [("y", "q")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert (r["n"], r["dof"], r["chi2_f6"]) == (40, 1, 0)

    # hand-computed dependent 2x2: O = [[30,10],[10,30]], n=80
    # chi2 = n(ad-bc)^2 / (r1 r2 c1 c2) = 80*(900-100)^2/40^4 = 20
    # per-cell: each of 4 cells contributes exactly 5 (symmetric)
    rows2 = (
        [("x", "p")] * 30 + [("x", "q")] * 10 + [("y", "p")] * 10 + [("y", "q")] * 30
    )
    df2 = spark.createDataFrame(rows2, "a string, b string")
    r2 = chi2_independence(df2, "a", "b").collect()[0]
    assert r2["chi2_f6"] == 20_000_000
    assert (r2["n_rows_cat"], r2["n_cols_cat"], r2["dof"]) == (2, 2, 1)


def test_chi2_independence_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        chi2_independence,
        chi2_independence_oracle_sql,
    )

    rnd = random.Random(37)
    rows = [
        (rnd.choice(["a", "b", "c", None]), rnd.choice(["u", "v", "w"]))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "s string, t string")
    p = str(tmp_path / "c.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in chi2_independence(df, "s", "t").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW c AS SELECT * FROM '{p}/*.parquet'")
    want = {
        tuple(r)
        for r in con.execute(chi2_independence_oracle_sql("c", "s", "t")).fetchall()
    }
    assert got == want


def test_chi2_independence_validation(spark):
    import pytest as _pytest

    from aleph2_contrib_spark.operators.profile import chi2_independence

    df = spark.createDataFrame([("a", "b")], "x string, y string")
    with _pytest.raises(ValueError, match="not in DataFrame"):
        chi2_independence(df, "x", "zz")


# -- join_size_profile -----------------------------------------------------


def test_join_size_profile_exact(spark):
    from aleph2_contrib_spark.operators.profile import join_size_profile

    l = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (None,)], "k int"
    )
    r = spark.createDataFrame([(1,), (1,), (2,), (4,), (None,)], "k int")
    row = join_size_profile(l, r, "k", "k").collect()[0]
    # pairs: key1 3*2=6, key2 1*1=1; keys 3/4/None never match
    assert row.asDict() == {
        "n_left": 6, "n_right": 5, "n_join_rows": 7, "n_matching_keys": 2,
        "max_key_pairs": 6, "max_pairs_share_ppm": 857_142,
    }
    # verify against the actual join
    assert l.join(r, "k").count() == row["n_join_rows"]


def test_join_size_profile_empty_overlap(spark):
    from aleph2_contrib_spark.operators.profile import join_size_profile

    l = spark.createDataFrame([(1,)], "k int")
    r = spark.createDataFrame([(2,)], "k int")
    row = join_size_profile(l, r, "k", "k").collect()[0]
    assert (row["n_join_rows"], row["n_matching_keys"], row["max_key_pairs"]) == (0, 0, 0)


def test_join_size_profile_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        join_size_profile,
        join_size_profile_oracle_sql,
    )

    rnd = random.Random(41)
    lrows = [(rnd.randint(0, 30),) for _ in range(300)]
    rrows = [(rnd.randint(20, 50),) for _ in range(200)]
    l = spark.createDataFrame(lrows, "k int")
    r = spark.createDataFrame(rrows, "k int")
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    l.coalesce(1).write.parquet(lp)
    r.coalesce(1).write.parquet(rp)
    got = {tuple(x) for x in join_size_profile(l, r, "k", "k").collect()}
    sql = join_size_profile_oracle_sql(
        f"SELECT k FROM '{lp}/*.parquet'",
        f"SELECT k FROM '{rp}/*.parquet'",
        "k", "k",
    )
    assert got == {tuple(x) for x in duckdb.sql(sql).fetchall()}


# -- benford_profile -------------------------------------------------------


def test_benford_profile_exact(spark):
    from aleph2_contrib_spark.operators.profile import benford_profile

    vals = [1.0, 12.5, 0.00019, -2e6, 250.0, 3.0, None, 0.0, float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["digit"]: (r["cnt"], r["benford_ppm"]) for r in benford_profile(df, "x").collect()}
    # digits: 1 (1.0), 1 (12.5), 1 (0.00019), 2 (-2e6), 2 (250), 3 (3.0)
    assert got == {1: (3, 301030), 2: (2, 176091), 3: (1, 124939)}
    row = {r["digit"]: r for r in benford_profile(df, "x").collect()}[1]
    assert row["share_ppm"] == 500_000 and row["dev_ppm"] == 198_970


def test_benford_profile_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        benford_profile,
        benford_profile_oracle_sql,
    )

    rnd = random.Random(47)
    rows = [(rnd.uniform(-1e6, 1e6),) for _ in range(400)] + [(None,), (0.0,)]
    df = spark.createDataFrame(rows, "x double")
    p = str(tmp_path / "b.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in benford_profile(df, "x").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW b AS SELECT * FROM '{p}/*.parquet'")
    want = {
        tuple(r)
        for r in con.execute(benford_profile_oracle_sql("b", "x")).fetchall()
    }
    assert got == want


def test_chi2_independence_overflow_guard_raises(spark):
    """Past the exact DECIMAL(38,0) bound the per-cell terms could
    silently NULL-drop; the operator must raise instead (ADVICE r7).
    max_exact_n is lowered so the guard fires without 1e8 rows."""
    import pytest as _pytest

    from aleph2_contrib_spark.operators.profile import chi2_independence

    rows = [(str(i % 3), str(i % 2)) for i in range(50)]
    df = spark.createDataFrame(rows, "a string, b string")
    # fine under the default bound
    assert chi2_independence(df, "a", "b").collect()[0]["n"] == 50
    with _pytest.raises(Exception, match="exceeds the exact DECIMAL"):
        chi2_independence(df, "a", "b", max_exact_n=49).collect()


# -- numeric_correlation -----------------------------------------------------


def test_numeric_correlation_exact_and_complete_case(spark):
    from aleph2_contrib_spark.operators.profile import numeric_correlation

    rows = [
        (1.0, 2.0, 10.0),
        (2.0, 4.0, 8.0),
        (3.0, 6.0, 6.0),
        (4.0, None, 4.0),   # complete-case: dropped everywhere
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r["col_a"], r["col_b"]): r for r in numeric_correlation(df, ["x", "y", "z"]).collect()}
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    r = got[("x", "y")]
    # y = 2x exactly: corr_num^2 == var_a*var_b (corr = +1), n = 3
    assert r["n"] == 3
    assert r["corr_num"] * r["corr_num"] == r["var_a_num"] * r["var_b_num"]
    assert r["corr_num"] > 0
    rz = got[("x", "z")]
    # z = -2x + 12: perfect negative
    assert rz["corr_num"] < 0
    assert rz["corr_num"] * rz["corr_num"] == rz["var_a_num"] * rz["var_b_num"]


def test_numeric_correlation_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        numeric_correlation,
        numeric_correlation_oracle_sql,
    )

    rnd = random.Random(11)
    rows = [
        (rnd.uniform(0, 50), rnd.uniform(-5, 5), rnd.uniform(0, 1))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in numeric_correlation(df, ["a", "b", "c"]).collect()}
    sql = numeric_correlation_oracle_sql(f"'{p}/*.parquet'", ["a", "b", "c"])
    want = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == want


def test_categorical_gini_exact(spark):
    from aleph2_contrib_spark.operators.profile import categorical_gini

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), (None, "x")],
        "u string, v string",
    )
    got = {r["col_name"]: r for r in categorical_gini(df, ["u", "v"]).collect()}
    # u: counts 2,2,1 over 5 -> 1 - 9/25 = 16/25 -> 640000 ppm
    assert (got["u"]["n"], got["u"]["n_categories"], got["u"]["gini_ppm"]) == (5, 3, 640_000)
    # v: 3,2 -> 1 - 13/25 = 12/25 -> 480000
    assert got["v"]["gini_ppm"] == 480_000
    # degenerate single value -> 0
    one = spark.createDataFrame([("k",)] * 4, "w string")
    assert categorical_gini(one, ["w"]).collect()[0]["gini_ppm"] == 0


def test_categorical_gini_oracle_matches(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        categorical_gini,
        categorical_gini_oracle_sql,
    )

    rows = [(f"s{i % 7}", i % 3) for i in range(100)] + [(None, None)]
    df = spark.createDataFrame(rows, "a string, b int")
    p = str(tmp_path / "g.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in categorical_gini(df, ["a", "b"]).collect()}
    want = {tuple(r) for r in duckdb.sql(
        categorical_gini_oracle_sql(f"'{p}/*.parquet'", ["a", "b"])
    ).fetchall()}
    assert got == want


# -- mad_outliers -------------------------------------------------------------


def test_mad_outliers_hand_worked(spark):
    from aleph2_contrib_spark.operators.profile import mad_outliers

    # group 'a': values 1..7 plus a spike 100 (n=8, lower median = 4th
    # element asc = 4.0); deviations |x-4|: 3,2,1,0,1,2,3,96 -> sorted
    # 0,1,1,2,2,3,3,96, lower median (4th) = 2.0 => MAD 2, k=3 flags
    # dev > 6: only the spike.
    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 100])]
    # group 'b': all-identical values -> MAD 0, nothing flagged
    rows += [(100 + i, "b", 5.0) for i in range(4)]
    # NULL value rows are dropped before ranking
    rows += [(200, "a", None)]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    got = mad_outliers(df, "g", "v", "id", k=3).collect()
    assert len(got) == 1
    (r,) = got
    assert (r["id"], r["g"], r["v"], r["med"], r["mad"], r["dev"]) == (
        7, "a", 100.0, 4.0, 2.0, 96.0,
    )


def test_mad_outliers_validation_and_partitioned_plan(spark):
    import pytest

    from aleph2_contrib_spark.operators.profile import mad_outliers

    df = spark.createDataFrame([(1, "a", 1.0)], "id int, g string, v double")
    with pytest.raises(ValueError, match="k must be"):
        mad_outliers(df, "g", "v", "id", k=0)
    # every window is partitioned by the group key — no global sort
    plan = (
        mad_outliers(df, "g", "v", "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "__g" in spec  # partition key present in every window spec


def test_mad_outliers_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        mad_outliers,
        mad_outliers_oracle_sql,
    )

    rnd = random.Random(97)
    rows = [
        (i, rnd.choice(["x", "y", "z"]), round(rnd.uniform(-50, 50), 3))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in mad_outliers(df, "g", "v", "id", k=1).collect()}
    sql = mad_outliers_oracle_sql(
        f"SELECT id, g, v FROM '{p}/*.parquet'", "g", "v", "id", k=1
    )
    want = {tuple(x) for x in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) > 0


# -- null_patterns ------------------------------------------------------------


def test_null_patterns_hand_worked(spark):
    import pytest

    from aleph2_contrib_spark.operators.profile import null_patterns

    rows = [
        (1, "a"), (2, "b"),          # 11 x2
        (None, "c"),                 # 01
        (3, None), (4, None),        # 10 x2
        (None, None),                # 00
    ]
    df = spark.createDataFrame(rows, "x long, y string")
    got = {r["pattern"]: (r["n"], r["share_ppm"]) for r in null_patterns(df, ["x", "y"]).collect()}
    assert got == {
        "11": (2, 333333),
        "01": (1, 166666),
        "10": (2, 333333),
        "00": (1, 166666),
    }
    with pytest.raises(ValueError):
        null_patterns(df, [])
    with pytest.raises(ValueError):
        null_patterns(df, ["x"] * 21)


# -- inclusion_deps -----------------------------------------------------------


def test_inclusion_deps_hand_worked(spark):
    import pytest

    from aleph2_contrib_spark.operators.profile import inclusion_deps

    l = spark.createDataFrame([(1,), (2,), (3,), (None,), (3,)], "v long")
    r = spark.createDataFrame([(2,), (3,), (4,), (None,)], "w long")
    got = {
        x["dep"]: (x["n_left_distinct"], x["n_contained"], x["containment_ppm"])
        for x in inclusion_deps(
            [("l<=r", l, "v", r, "w"), ("r<=l", r, "w", l, "v")]
        ).collect()
    }
    # l distinct {1,2,3}: 2,3 in r -> 2/3; r distinct {2,3,4}: 2,3 in l
    assert got == {"l<=r": (3, 2, 666666), "r<=l": (3, 2, 666666)}
    with pytest.raises(ValueError):
        inclusion_deps([])


# -- format_patterns ----------------------------------------------------------


def test_format_patterns_hand_worked(spark):
    import pytest

    from aleph2_contrib_spark.operators.profile import format_patterns

    rows = [("Customer#000000001",), ("Customer#000000002",), ("ACME-12b",), (None,)]
    df = spark.createDataFrame(rows, "v string")
    got = {r["pattern"]: r["n"] for r in format_patterns(df, ["v"]).collect()}
    assert got == {"A+a+#9+": 2, "A+-9+a+": 1, "∅": 1}
    with pytest.raises(ValueError):
        format_patterns(df, [])


def test_format_patterns_oracle_matches(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        format_patterns,
        format_patterns_oracle_sql,
    )

    rows = [("aB3",), ("x-1",), ("x-2",), ("HTTP2",), (None,), ("",)]
    df = spark.createDataFrame(rows, "v string")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in format_patterns(df, ["v"]).collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(format_patterns_oracle_sql(f"'{p}/*.parquet'", ["v"])).fetchall()
    }
    assert got == want


# -- ingestion_gaps -----------------------------------------------------------


def test_ingestion_gaps_hand_worked(spark):
    import datetime as dt

    from aleph2_contrib_spark.operators.profile import ingestion_gaps

    def t(day, hour=6):
        return dt.datetime(1970, 1, day, hour)

    rows = [
        ("a", t(1)), ("a", t(2)), ("a", t(5)), ("a", t(6)), ("a", t(9)),
        ("b", t(3)), ("b", t(4)),           # contiguous -> no gap
        (None, t(1)), ("c", None),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        (r["k"], r["gap_start_day"], r["gap_end_day"]): r["gap_days"]
        for r in ingestion_gaps(df, "k", "ts").collect()
    }
    # 'a' observed days 0,1,4,5,8 -> gaps [2,3] and [6,7]
    assert got == {("a", 2, 3): 2, ("a", 6, 7): 2}


def test_ingestion_gaps_oracle_matches(spark, tmp_path):
    import datetime as dt
    import random

    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        ingestion_gaps,
        ingestion_gaps_oracle_sql,
    )

    rnd = random.Random(7)
    rows = [
        (rnd.choice(["x", "y", "z"]),
         dt.datetime(2024, 5, 1) + dt.timedelta(days=rnd.randint(0, 30)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in ingestion_gaps(df, "k", "ts").collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            ingestion_gaps_oracle_sql(f"SELECT k, ts FROM '{p}/*.parquet'", "k")
        ).fetchall()
    }
    assert got == want and len(got) > 0


# -- table_diff ---------------------------------------------------------------


def test_table_diff_hand_worked(spark):
    import pytest

    from aleph2_contrib_spark.operators.profile import table_diff

    l = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    r = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "b", 21.0),        # changed (v)
         (3, None, 30.0),       # unchanged (NULL-safe equality on s)
         (5, "e", 50.0)],       # added; key 4 removed
        "k long, s string, v double",
    )
    got = {x["status"]: x["n"] for x in table_diff(l, r, ["k"], ["s", "v"]).collect()}
    assert got == {"unchanged": 2, "changed": 1, "added": 1, "removed": 1}
    with pytest.raises(ValueError):
        table_diff(l, r, [], ["s"])


def test_table_diff_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.profile import (
        table_diff,
        table_diff_oracle_sql,
    )

    rnd = random.Random(37)
    lrows = [(i, rnd.choice(["a", "b", None]), rnd.randint(0, 5)) for i in range(150)]
    rrows = [(i, rnd.choice(["a", "b", None]), rnd.randint(0, 5)) for i in range(30, 180)]
    l = spark.createDataFrame(lrows, "k long, s string, v long")
    r = spark.createDataFrame(rrows, "k long, s string, v long")
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    l.coalesce(1).write.parquet(lp)
    r.coalesce(1).write.parquet(rp)
    got = {tuple(x) for x in table_diff(l, r, ["k"], ["s", "v"]).collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            table_diff_oracle_sql(
                f"SELECT k, s, v FROM '{lp}/*.parquet'",
                f"SELECT k, s, v FROM '{rp}/*.parquet'",
                ["k"],
                ["s", "v"],
            )
        ).fetchall()
    }
    assert got == want


def test_key_discovery_verdicts(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.profile import key_discovery

    df = spark.createDataFrame(
        [
            Row(pk=1, dup="a", nullable=1),
            Row(pk=2, dup="a", nullable=None),
            Row(pk=3, dup="b", nullable=3),
        ]
    )
    out = {r.column: r for r in key_discovery(df, ["pk", "dup", "nullable"]).collect()}
    assert out["pk"].is_key and out["pk"].n_distinct == 3
    assert not out["dup"].is_key and out["dup"].n_distinct == 2
    # all-distinct among non-nulls but a NULL row: not a key
    assert not out["nullable"].is_key
    assert out["nullable"].n_nonnull == 2 and out["nullable"].n_rows == 3


def test_monotonicity_profile_verdicts(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.profile import monotonicity_profile

    rows = [
        Row(k="a", o=1, up=1, down=9, mixed=1, flat=7),
        Row(k="a", o=2, up=2, down=8, mixed=None, flat=7),
        Row(k="a", o=3, up=2, down=7, mixed=1, flat=7),
        Row(k="b", o=1, up=5, down=5, mixed=5, flat=7),
        Row(k="b", o=2, up=9, down=1, mixed=4, flat=7),
    ]
    out = {
        r.column: (r.n_pairs, r.n_rises, r.n_flat, r.n_drops, r.drop_ppm, r.verdict)
        for r in monotonicity_profile(
            spark.createDataFrame(rows), "k", ["o"], ["up", "down", "mixed", "flat"]
        ).collect()
    }
    assert out["up"] == (3, 2, 1, 0, 0, "non_decreasing")
    assert out["down"] == (3, 0, 0, 3, 1_000_000, "non_increasing")
    # NULL-adjacent pairs drop out entirely (only b's 5->4 pair survives)
    assert out["mixed"] == (1, 0, 0, 1, 1_000_000, "non_increasing")
    assert out["flat"] == (3, 0, 3, 0, 0, "constant")


def test_mann_whitney_u_scipy_worked_example(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.profile import mann_whitney_u

    # classic hand-computed example with ties:
    # a = [1, 2, 4], b = [2, 3]  combined sorted: 1,2,2,3,4
    # doubled avg ranks: 1->2, 2->5 (avg 2.5), 2->5, 3->8, 4->10
    # 2R_a = 2+5+10 = 17 ; 2U_a = 17 - 3*4 = 5 (U_a = 2.5)
    # 2U_b = 2*3*2 - 5 = 7 (U_b = 3.5); U_a + U_b = n_a*n_b = 6 ✓
    rows = [Row(lbl="a", v=float(x)) for x in (1, 2, 4)]
    rows += [Row(lbl="b", v=float(x)) for x in (2, 3)]
    r = mann_whitney_u(
        spark.createDataFrame(rows), "v", "lbl", "a", "b"
    ).collect()[0]
    assert (r.n_a, r.n_b, r.u2_a, r.u2_b) == (3, 2, 5, 7)
    assert r.cles_a_ppm == 5 * 1_000_000 // 12


def test_lorenz_gini_known_distributions(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.profile import lorenz_gini

    rows = [Row(g="equal", v=5.0) for _ in range(4)]
    rows += [Row(g="onehot", v=0.0) for _ in range(9)] + [Row(g="onehot", v=100.0)]
    rows += [Row(g="null", v=None)]
    out = {
        r.prio if hasattr(r, "prio") else r.g: (r.n, r.gini_f6)
        for r in lorenz_gini(
            spark.createDataFrame(rows), "v", "g"
        ).collect()
    }
    # perfectly equal -> G = 0
    assert out["equal"] == (4, 0)
    # one holder of everything among n=10 -> G = (n-1)/n = 0.9
    assert out["onehot"] == (10, 900_000)
    # all-NULL group vanishes (no non-null rows)
    assert "null" not in out


def test_null_rate_trend_per_day(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.profile import null_rate_trend

    rows = [
        Row(t=0, a=1, b=None),
        Row(t=3600, a=None, b=2),
        Row(t=90000, a=None, b=None),  # next day
        Row(t=90100, a=4, b=5),
    ]
    df = spark.createDataFrame(rows).select(
        F.col("t").cast("timestamp").alias("ts"), "a", "b"
    )
    out = {
        (str(r.bucket_day), r.column): (r.n_rows, r.n_null, r.null_ppm)
        for r in null_rate_trend(df, "ts", ["a", "b"]).collect()
    }
    assert out[("1970-01-01", "a")] == (2, 1, 500_000)
    assert out[("1970-01-01", "b")] == (2, 1, 500_000)
    assert out[("1970-01-02", "a")] == (2, 1, 500_000)
    assert out[("1970-01-02", "b")] == (2, 1, 500_000)
