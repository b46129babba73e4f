"""Engine-portable HyperLogLog tests (operators/sketch.py): accuracy,
determinism, mergeability, and parity with the DuckDB oracle replica."""

import duckdb
import pytest
from pyspark.sql import functions as F

from aleph2_contrib_spark.operators.sketch import (
    hll_estimate,
    hll_estimate_from_registers,
    hll_merge,
    hll_oracle_sql,
    hll_registers,
)


def test_hll_accuracy_large(spark):
    """Raw-estimate branch: 100k distinct ints within ~3% (HLL p=12 has
    ~1.6% standard error)."""
    df = spark.range(0, 100_000).withColumnRenamed("id", "v")
    est = hll_estimate(df, "v").collect()[0].est
    assert abs(est - 100_000) / 100_000 < 0.05, est


def test_hll_accuracy_small_linear_counting(spark):
    """Linear-counting branch: small cardinalities are near-exact."""
    df = spark.range(0, 500).withColumnRenamed("id", "v")
    row = hll_estimate(df, "v").collect()[0]
    assert row.zeros > 0
    assert abs(row.est - 500) <= 15, row


def test_hll_duplicates_ignored(spark):
    a = spark.range(0, 1000).withColumnRenamed("id", "v")
    b = a.unionAll(a).unionAll(a)
    assert hll_estimate(a, "v").collect()[0].est == hll_estimate(b, "v").collect()[0].est


def test_hll_merge_equals_union(spark):
    """The defining sketch property: merge(sketch(A), sketch(B)) gives the
    SAME estimate as sketch(A ∪ B)."""
    a = spark.range(0, 3000).withColumnRenamed("id", "v")
    b = spark.range(2000, 6000).withColumnRenamed("id", "v")
    direct = hll_estimate(a.unionAll(b), "v").collect()[0]
    merged = hll_estimate_from_registers(
        hll_merge(hll_registers(a, "v"), hll_registers(b, "v"))
    ).collect()[0]
    assert (direct.est, direct.n_buckets, direct.zeros) == (
        merged.est, merged.n_buckets, merged.zeros,
    )


def test_hll_matches_duckdb_bit_for_bit(spark, tmp_path):
    """Differential: the same rows sketched by DuckDB's SQL replica give
    the identical estimate and register stats."""
    p = str(tmp_path / "vals.parquet")
    spark.range(0, 20_000).select((F.col("id") * 7 % 9999).alias("v")).write.parquet(p)
    srow = hll_estimate(spark.read.parquet(p), "v").collect()[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT v FROM '{p}/*.parquet'")
    drow = con.execute(hll_oracle_sql("v", "t")).fetchone()
    assert (srow.est, srow.n_buckets, srow.zeros) == (drow[0], drow[1], drow[2])
    assert int(srow.sum_scaled) == int(drow[3])


def test_hll_empty_input_estimates_zero(spark):
    """SUM over zero register rows is NULL; the coalesce must degrade the
    empty table to est=0 via linear counting, not a NULL estimate."""
    df = spark.range(0).select(F.col("id").cast("string").alias("v"))
    row = hll_estimate(df, "v").collect()[0]
    assert row.est == 0
    assert row.zeros == row.n_buckets + row.zeros  # all buckets empty


def test_cms_exact_on_sparse_keys_and_overestimate_bound(spark):
    from aleph2_contrib_spark.operators.sketch import cms_estimate, cms_sketch

    df = spark.range(1000).select((F.col("id") % 7).cast("string").alias("v"))
    sk = cms_sketch(df, "v")
    cand = df.select("v").distinct()
    est = {r.v: r.est for r in cms_estimate(sk, cand, "v").collect()}
    exact = {r.v: r["count"] for r in df.groupBy("v").count().collect()}
    # 7 keys in 4x2048 cells: collisions are impossible to matter — exact
    assert est == exact
    # CMS never underestimates, on any key set
    many = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    sk2 = cms_sketch(many, "v")
    est2 = {r.v: r.est for r in cms_estimate(sk2, many.distinct(), "v").collect()}
    assert all(e >= 1 for e in est2.values())


def test_cms_merge_is_union_sketch(spark):
    from aleph2_contrib_spark.operators.sketch import cms_merge, cms_sketch

    a = spark.range(0, 400).select((F.col("id") % 11).cast("string").alias("v"))
    b = spark.range(400, 900).select((F.col("id") % 11).cast("string").alias("v"))
    merged = {
        (r["__cms_j"], r["__cms_k"]): r["__cms_n"]
        for r in cms_merge(cms_sketch(a, "v"), cms_sketch(b, "v")).collect()
    }
    whole = {
        (r["__cms_j"], r["__cms_k"]): r["__cms_n"]
        for r in cms_sketch(a.unionByName(b), "v").collect()
    }
    assert merged == whole


def test_hll_and_cms_ignore_nulls(spark):
    from aleph2_contrib_spark.operators.sketch import cms_estimate, cms_sketch

    df = spark.createDataFrame(
        [(str(i),) for i in range(200)] + [(None,)] * 5, "v string"
    )
    row = hll_estimate(df, "v").collect()[0]
    clean = hll_estimate(df.filter(F.col("v").isNotNull()), "v").collect()[0]
    assert (row.est, row.n_buckets, row.zeros) == (clean.est, clean.n_buckets, clean.zeros)
    sk = cms_sketch(df, "v")
    est = {r.v: r.est for r in cms_estimate(sk, df.distinct(), "v").collect()}
    assert None not in est
    assert est["7"] == 1


# ------------------------------------------------- histogram quantiles


def test_histogram_quantiles_hand_case(spark):
    """Uniform 0..99 (one value per int), 10 bins of width 10: p50 needs
    rank 50 → bin 4 (cum 50), est = 40 + floor(10 * (50-40)/10) = 50."""
    from aleph2_contrib_spark.operators.profile import numeric_histogram
    from aleph2_contrib_spark.operators.sketch import histogram_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(100)], "value double")
    hist = numeric_histogram(df, "value", 0.0, 100.0, bins=10)
    out = {r.q_permille: r.est_f6 for r in histogram_quantiles(hist).collect()}
    assert out[500] == 50_000_000
    assert out[250] == 25_000_000
    assert out[990] == 99_000_000


def test_histogram_quantiles_merge_then_estimate(spark):
    """Merging two shards' histograms (sum cnt) estimates quantiles of the
    union — the mergeability contract."""
    from aleph2_contrib_spark.operators.profile import numeric_histogram
    from aleph2_contrib_spark.operators.sketch import histogram_quantiles
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(float(i),) for i in range(50)], "value double")
    b = spark.createDataFrame([(float(i),) for i in range(50, 100)], "value double")
    ha = numeric_histogram(a, "value", 0.0, 100.0, bins=10)
    hb = numeric_histogram(b, "value", 0.0, 100.0, bins=10)
    merged = (
        ha.unionByName(hb)
        .groupBy("bin", "bin_lo", "bin_hi")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = numeric_histogram(a.unionByName(b), "value", 0.0, 100.0, bins=10)
    em = {r.q_permille: r.est_f6 for r in histogram_quantiles(merged).collect()}
    ew = {r.q_permille: r.est_f6 for r in histogram_quantiles(whole).collect()}
    assert em == ew


def test_histogram_quantiles_empty(spark):
    from aleph2_contrib_spark.operators.profile import numeric_histogram
    from aleph2_contrib_spark.operators.sketch import histogram_quantiles

    df = spark.createDataFrame([], "value double")
    hist = numeric_histogram(df, "value", 0.0, 100.0, bins=10)
    assert histogram_quantiles(hist).count() == 0


def test_hll_intersection_estimate(spark):
    """Disjoint sets → intersection ≈ 0 (clamped); identical sets →
    est_intersection == est_a == est_b."""
    from aleph2_contrib_spark.operators.sketch import hll_intersection_estimate

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "v string")
    row = hll_intersection_estimate(a, b, "v").collect()[0]
    assert row.est_intersection <= max(row.est_a, row.est_b) * 0.2
    same = hll_intersection_estimate(a, a, "v").collect()[0]
    assert same.est_a == same.est_b == same.est_union == same.est_intersection


def test_hll_by_group_matches_global_per_slice(spark):
    """Each group's estimate equals the GLOBAL estimate of that group's
    slice (same registers), and the plan uses one exchange."""
    from aleph2_contrib_spark.operators.sketch import (
        hll_estimate,
        hll_estimate_by_group,
    )

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"u{i % 200}") for i in range(1000)], "grp string, v string"
    )
    per = {r.grp: (r.est, r.n_buckets, r.zeros)
           for r in hll_estimate_by_group(df, "v", "grp").collect()}
    for g in ("g0", "g1", "g2"):
        row = hll_estimate(df.filter(F.col("grp") == g), "v").collect()[0]
        assert per[g] == (row.est, row.n_buckets, row.zeros)
    # two exchanges, both post-partial-agg (see docstring: one exchange
    # on the bare group key would concentrate skewed groups)
    plan = (
        hll_estimate_by_group(df, "v", "grp")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_histogram_quantiles_by_group_matches_global_per_slice(spark):
    """Each group's estimates equal the global estimator run on that
    group's slice alone."""
    from aleph2_contrib_spark.operators.profile import (
        numeric_histogram,
        numeric_histogram_by_group,
    )
    from aleph2_contrib_spark.operators.sketch import (
        histogram_quantiles,
        histogram_quantiles_by_group,
    )

    rows = [("a", float(i)) for i in range(100)] + [("b", float(i * 2)) for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, value double")
    hist = numeric_histogram_by_group(df, "value", "grp", 0.0, 100.0, bins=10)
    per = {
        (r.grp, r.q_permille): r.est_f6
        for r in histogram_quantiles_by_group(hist).collect()
    }
    for g in ("a", "b"):
        solo = numeric_histogram(df.filter(F.col("grp") == g), "value", 0.0, 100.0, bins=10)
        want = {r.q_permille: r.est_f6 for r in histogram_quantiles(solo).collect()}
        got = {q: v for (gg, q), v in per.items() if gg == g}
        assert got == want


def test_hll_group_registers_rollup_equals_direct(spark):
    """Registers built at fine grain and rolled up with a (coarse, bucket)
    max must finalize to the IDENTICAL estimate as sketching the coarse
    grain directly — the mergeable-hierarchy contract."""
    from aleph2_contrib_spark.operators.sketch import (
        hll_estimate_by_group,
        hll_estimate_from_group_registers,
        hll_registers_by_group,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 1300).alias("v"),          # dup keys across fine groups
        (F.col("id") % 6).alias("fine"),
        ((F.col("id") % 6) % 2).alias("coarse"),  # 3 fine groups per coarse
    )
    fine_regs = hll_registers_by_group(df, "v", "fine")
    rolled = (
        fine_regs.withColumn("coarse", F.col("fine") % 2)
        .groupBy("coarse", "__hll_b")
        .agg(F.max("__hll_m").alias("__hll_m"))
    )
    got = {
        r.coarse: (r.est, r.n_buckets, r.zeros)
        for r in hll_estimate_from_group_registers(rolled, "coarse").collect()
    }
    want = {
        r.coarse: (r.est, r.n_buckets, r.zeros)
        for r in hll_estimate_by_group(df, "v", "coarse").collect()
    }
    assert got == want and len(got) == 2


# -- portable bloom filter ---------------------------------------------------


def test_bloom_no_false_negatives_and_oracle(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.sketch import (
        bloom_build,
        bloom_oracle_sql,
        bloom_probe,
    )

    build_vals = [f"k{i}" for i in range(0, 400, 2)]  # even keys
    probe_vals = [f"k{i}" for i in range(0, 400)] + ["zz", None]
    b = spark.createDataFrame([(v,) for v in build_vals], "v string")
    p = spark.createDataFrame([(v,) for v in probe_vals], "v string")
    bloom = bloom_build(b, "v")
    got = {
        r["v"]: r["may_contain"] for r in bloom_probe(p, bloom, "v").collect()
    }
    # zero false negatives, always
    assert all(got[v] for v in build_vals)
    # the filter must actually reject most absent keys at this load
    absent = [f"k{i}" for i in range(1, 400, 2)]
    fp = sum(1 for v in absent if got[v])
    assert fp < len(absent) * 0.2

    # oracle replays the identical bit positions — INCLUDING false
    # positives — so the probe table matches exactly
    bp, pp = str(tmp_path / "b.parquet"), str(tmp_path / "p.parquet")
    b.coalesce(1).write.parquet(bp)
    p.coalesce(1).write.parquet(pp)
    con = duckdb.connect()
    sql = bloom_oracle_sql(
        f"SELECT v FROM '{bp}/*.parquet'",
        f"SELECT v FROM '{pp}/*.parquet'",
        "v",
    )
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want


def test_bloom_union_merge(spark):
    from aleph2_contrib_spark.operators.sketch import bloom_build, bloom_probe

    a = spark.createDataFrame([("a",)], "v string")
    b = spark.createDataFrame([("b",)], "v string")
    both = spark.createDataFrame([("a",), ("b",)], "v string")
    merged = bloom_build(a, "v").unionByName(bloom_build(b, "v")).distinct()
    direct = bloom_build(both, "v")
    assert {r["pos"] for r in merged.collect()} == {
        r["pos"] for r in direct.collect()
    }
    probe = bloom_probe(both, merged, "v")
    assert all(r["may_contain"] for r in probe.collect())


def test_bloom_validation(spark):
    import pytest as _pytest

    from aleph2_contrib_spark.operators.sketch import bloom_build, bloom_probe

    df = spark.createDataFrame([("a",)], "v string")
    with _pytest.raises(ValueError, match="m >= 2"):
        bloom_build(df, "v", m=1)
    with _pytest.raises(ValueError, match="m >= 2"):
        bloom_probe(df, df.select(F.lit(1).alias("pos")), "v", k=0)


def test_bloom_probe_null_key_always_false(spark):
    """A NULL probe key must report may_contain=false (build skips NULLs,
    so 'a NULL never probes true' holds on both sides — ADVICE r7): the
    positions use NULL-propagating concat, never the bare salt string."""
    from aleph2_contrib_spark.operators.sketch import bloom_build, bloom_probe

    # saturate the filter so EVERY position is set — the old concat_ws
    # bug (NULL hashes as md5("j")) would then report true for NULL
    b = spark.createDataFrame([(f"k{i}",) for i in range(20000)], "v string")
    bloom = bloom_build(b, "v", m=64)
    assert bloom.count() == 64  # fully saturated
    p = spark.createDataFrame([("k1",), (None,)], "v string")
    got = {r["v"]: r["may_contain"] for r in bloom_probe(p, bloom, "v", m=64).collect()}
    assert got["k1"] is True
    assert got[None] is False


def test_kmv_small_regime_exact_and_large_regime_close(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.sketch import kmv_estimate_by_group

    rows = [Row(g="small", v=f"s{i}") for i in range(40)]
    rows += [Row(g="big", v=f"b{i % 2000}") for i in range(6000)]
    rows += [Row(g="small", v=None)]
    out = {
        r.g: (r.n_hashes_kept, r.kth_min_hash, r.est_distinct)
        for r in kmv_estimate_by_group(
            spark.createDataFrame(rows), "v", "g", k=64
        ).collect()
    }
    # below k: sketch == the distinct set, estimate exact, no kth hash
    assert out["small"] == (40, None, 40)
    # at k: estimate within the ~1/sqrt(k-2) band of the true 2000
    n_kept, kth, est = out["big"]
    assert n_kept == 64 and kth is not None
    assert abs(est - 2000) < 2000 * 0.5


def test_kmv_jaccard_small_regime_exact(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.sketch import kmv_jaccard_estimate

    # A = {0..29}, B = {20..49}: union 50 < k=64 -> the merged sketch IS
    # the union, so every output is exact set arithmetic
    rows = [Row(lbl="a", v=f"x{i}") for i in range(30)]
    rows += [Row(lbl="b", v=f"x{i}") for i in range(20, 50)]
    r = kmv_jaccard_estimate(
        spark.createDataFrame(rows), "v", "lbl", "a", "b", k=64
    ).collect()[0]
    assert (r.n_a, r.n_b, r.n_union_kept, r.overlap) == (30, 30, 50, 10)
    assert r.jacc_ppm == 10 * 1_000_000 // 50  # exact 0.2
    assert r.union_est == 50 and r.inter_est == 10


def test_kmv_jaccard_large_regime_close(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.sketch import kmv_jaccard_estimate

    # A = {0..999}, B = {500..1499}: true J = 500/1500 = 1/3
    rows = [Row(lbl="a", v=f"y{i}") for i in range(1000)]
    rows += [Row(lbl="b", v=f"y{i}") for i in range(500, 1500)]
    r = kmv_jaccard_estimate(
        spark.createDataFrame(rows), "v", "lbl", "a", "b", k=64
    ).collect()[0]
    assert r.n_union_kept == 64
    assert abs(r.jacc_ppm - 333_333) < 250_000       # sketch-error band
    assert abs(r.union_est - 1500) < 1500 * 0.5
    assert abs(r.inter_est - 500) < 500  # loose: product of two estimates
