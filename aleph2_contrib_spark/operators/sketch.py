"""Distributed cardinality sketch: an ENGINE-PORTABLE HyperLogLog.

Spark's own approx_count_distinct is a fine HLL, but its hash and
register layout are implementation-private — no external system can
reproduce its estimate, so it can't be differential-tested and a corpus
sketched by Spark can't be merged with one sketched elsewhere. This HLL
fixes every bit: md5 is the hash, the first 3 hex chars are the bucket
(p=12, m=4096), the next 13 hex chars the 52-bit word, rho = leading
zeros + 1 via the trimmed binary-string length, and the harmonic sum is
kept as an EXACT integer (sum of 2^(53-rho) ≤ m·2^53 < 2^65, held in
DECIMAL(38,0)) so it is independent of aggregation order — the one
place a naive float HLL diverges between engines. Any engine with md5
and integer arithmetic computes the identical estimate.

Plan shape: narrow hash pass → groupBy(bucket) max(rho) — a ≤4096-group
aggregate with map-side partial max, so the shuffle is at most
m × num_partitions tiny rows regardless of input size — then a 1-row
final agg. Scale cost is one pass over the column.

Reference analog: the reference delegates cardinality to Elasticsearch's
HLL-based `cardinality` aggregation (search-index service); this is that
capability, Spark-first and reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 12
_M = 1 << _P  # 4096 buckets
_W_BITS = 52  # 13 hex chars
_SCALE = 1 << (_W_BITS + 1)  # 2^53: term for an empty register (rho = 0)
_ALPHA_NUM = 0.7213  # alpha_m = 0.7213 / (1 + 1.079/m) for m >= 128


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """The sketch itself: (__hll_b bucket, __hll_m register) — ≤4096 rows
    whatever the input size. Registers are MERGEABLE: the sketch of a
    union is the per-bucket max of the parts' registers (hll_merge), so
    per-partition/per-day sketches roll up without rescanning data.

    NULLs are ignored (approx_count_distinct semantics): md5(NULL) is
    NULL, which would otherwise create a phantom NULL-bucket register
    that inflates n_buckets and corrupts the exact harmonic sum."""
    df = df.filter(F.col(col).isNotNull())
    h = F.md5(F.col(col).cast("string"))
    prepared = df.select(
        F.conv(F.substring(h, 1, 3), 16, 10).cast("int").alias("__hll_b"),
        F.conv(F.substring(h, 4, 13), 16, 10).cast("long").alias("__hll_w"),
    ).withColumn(
        "__hll_rho",
        F.when(F.col("__hll_w") == 0, F.lit(_W_BITS + 1)).otherwise(
            F.lit(_W_BITS + 1)
            - F.length(F.expr("trim(LEADING '0' FROM bin(__hll_w))"))
        ),
    )
    return prepared.groupBy("__hll_b").agg(F.max("__hll_rho").alias("__hll_m"))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union sketches: per-bucket max over all parts."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("__hll_b").agg(F.max("__hll_m").alias("__hll_m"))


def hll_estimate(df: DataFrame, col: str) -> DataFrame:
    """One-row DataFrame (est bigint, n_buckets int, zeros int,
    sum_scaled decimal) — the HLL cardinality estimate of ``col`` plus
    the exact intermediates an auditor (or another engine) can verify.

    Small-range correction: linear counting m·ln(m/zeros) when the raw
    estimate ≤ 2.5m and empty buckets exist (the standard HLL paper
    rule); bias-corrected raw estimate otherwise."""
    return hll_estimate_from_registers(hll_registers(df, col))


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    # exact integer harmonic sum: present buckets contribute 2^(53-rho),
    # absent buckets 2^53 each
    agg = regs.agg(
        F.count(F.lit(1)).cast("int").alias("n_buckets"),
        # coalesce: SUM over zero rows is NULL — an EMPTY register table
        # must degenerate to present_sum=0 so zeros=m and the linear-
        # counting branch yields est = m*ln(m/m) = 0, not NULL
        F.coalesce(
            F.sum(
                F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {_W_BITS + 1} - __hll_m) AS DECIMAL(38,0))")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("present_sum"),
    ).select(
        "n_buckets",
        (F.lit(_M) - F.col("n_buckets")).cast("int").alias("zeros"),
        (
            F.col("present_sum")
            + (F.lit(_M) - F.col("n_buckets")).cast("decimal(38,0)") * F.lit(_SCALE).cast("decimal(38,0)")
        ).alias("sum_scaled"),
    )
    alpha_mm_scaled = F.lit(_ALPHA_NUM) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(_M))) * F.lit(
        float(_M)
    ) * F.lit(float(_M)) * F.lit(float(_SCALE))
    e_raw = alpha_mm_scaled / F.col("sum_scaled").cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * _M)) & (F.col("zeros") > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("zeros").cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        F.floor(est).cast("long").alias("est"),
        "n_buckets",
        "zeros",
        F.col("sum_scaled").cast("decimal(38,0)").alias("sum_scaled"),
    )


def hll_estimate_by_group(df: DataFrame, col: str, group_col: str) -> DataFrame:
    """Per-group HLL estimates in ONE pass — the per-day / per-source /
    per-partition distinct-count shape of a 100 TB pipeline (Spark's
    approx_count_distinct per group, but engine-portable and mergeable:
    the per-group register rows roll up across days with a max, exactly
    like the global sketch).

    Returns (group, est, n_buckets, zeros) — one row per group.

    Plan: narrow hash pass → groupBy(group, bucket) max(rho) — at most
    m=4096 rows per group per input partition survive the map-side
    partial max — then a per-group final agg. Two exchanges, both
    post-partial-agg and therefore tiny; deliberately NOT collapsed to
    one exchange on the group alone, which would route every raw row of
    a group through a single partition (skew) instead of spreading each
    group over its 4096 buckets.
    """
    regs = hll_registers_by_group(df, col, group_col).withColumnRenamed(
        group_col, "__g"
    )
    return hll_estimate_from_group_registers(regs, "__g").withColumnRenamed(
        "__g", group_col
    )


def hll_registers_by_group(df: DataFrame, col: str, group_col: str) -> DataFrame:
    """Per-group sketch rows (group, __hll_b, __hll_m), maxed per
    (group, bucket). These are the MERGEABLE unit of the hierarchy
    rollup: registers sketched at a fine grain (day, nation, shard)
    roll up to any coarser grain with a groupBy(coarse, bucket) max —
    no rescan of the raw data, which is the entire point at 100 TB."""
    d = df.filter(F.col(col).isNotNull())
    h = F.md5(F.col(col).cast("string"))
    prepared = d.select(
        F.col(group_col),
        F.conv(F.substring(h, 1, 3), 16, 10).cast("int").alias("__hll_b"),
        F.conv(F.substring(h, 4, 13), 16, 10).cast("long").alias("__hll_w"),
    ).withColumn(
        "__hll_rho",
        F.when(F.col("__hll_w") == 0, F.lit(_W_BITS + 1)).otherwise(
            F.lit(_W_BITS + 1)
            - F.length(F.expr("trim(LEADING '0' FROM bin(__hll_w))"))
        ),
    )
    return prepared.groupBy(group_col, "__hll_b").agg(
        F.max("__hll_rho").alias("__hll_m")
    )


def hll_estimate_from_group_registers(regs: DataFrame, group_col: str) -> DataFrame:
    """Finalize per-group register tables (group, __hll_b, __hll_m) into
    (group, est, n_buckets, zeros) — the merge-then-estimate step shared
    by the batch by-group path and the streaming windowed sketch (whose
    registers arrive from the state store already maxed per window)."""
    agg = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_buckets"),
        F.sum(
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), {_W_BITS + 1} - __hll_m) AS DECIMAL(38,0))"
            )
        ).alias("present_sum"),
    ).select(
        group_col,
        "n_buckets",
        (F.lit(_M) - F.col("n_buckets")).cast("int").alias("zeros"),
        (
            F.col("present_sum")
            + (F.lit(_M) - F.col("n_buckets")).cast("decimal(38,0)")
            * F.lit(_SCALE).cast("decimal(38,0)")
        ).alias("sum_scaled"),
    )
    alpha_mm_scaled = (
        F.lit(_ALPHA_NUM) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(_M)))
        * F.lit(float(_M)) * F.lit(float(_M)) * F.lit(float(_SCALE))
    )
    e_raw = alpha_mm_scaled / F.col("sum_scaled").cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * _M)) & (F.col("zeros") > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("zeros").cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        group_col,
        F.floor(est).cast("long").alias("est"),
        "n_buckets",
        "zeros",
    )


def hll_group_oracle_sql(source_expr: str, group_expr: str, table: str) -> str:
    """DuckDB replica of hll_estimate_by_group (same registers, exact
    sum, final arithmetic — grouped)."""
    return f"""
        WITH h AS (
            SELECT {group_expr} AS g, md5(CAST({source_expr} AS VARCHAR)) AS hx
            FROM {table} WHERE ({source_expr}) IS NOT NULL
        ), br AS (
            SELECT g, CAST('0x' || substr(hx, 1, 3) AS INT) AS b,
                   CAST('0x' || substr(hx, 4, 13) AS BIGINT) AS wv
            FROM h
        ), regs AS (
            SELECT g, b, max(CASE WHEN wv = 0 THEN {_W_BITS + 1}
                          ELSE {_W_BITS + 1} - length(trim(LEADING '0' FROM bin(wv))) END) AS m
            FROM br GROUP BY g, b
        ), agg AS (
            SELECT g, CAST(count(*) AS INT) AS n_buckets,
                   CAST({_M} - count(*) AS INT) AS zeros,
                   CAST(sum(CAST(1 AS BIGINT) << ({_W_BITS + 1} - m)) AS DECIMAL(38,0))
                   + CAST({_M} - count(*) AS DECIMAL(38,0)) * CAST({_SCALE} AS DECIMAL(38,0))
                   AS sum_scaled
            FROM regs GROUP BY g
        )
        SELECT g, CAST(floor(
                   CASE WHEN ({_ALPHA_NUM} / (1.0 + 1.079 / {float(_M)}) * {float(_M)} * {float(_M)} * {float(_SCALE)})
                             / CAST(sum_scaled AS DOUBLE) <= {2.5 * _M}
                        AND zeros > 0
                   THEN {float(_M)} * ln({float(_M)} / CAST(zeros AS DOUBLE))
                   ELSE ({_ALPHA_NUM} / (1.0 + 1.079 / {float(_M)}) * {float(_M)} * {float(_M)} * {float(_SCALE)})
                        / CAST(sum_scaled AS DOUBLE)
                   END) AS BIGINT) AS est,
               n_buckets, zeros
        FROM agg
    """


def hll_oracle_sql(source_expr: str, table: str, where: str = "") -> str:
    """The DuckDB replica of hll_estimate for differential testing —
    bit-identical buckets, registers, exact integer sum, and the same
    double-precision final arithmetic (NULLs excluded, like the Spark
    side)."""
    null_guard = f"({source_expr}) IS NOT NULL"
    w = f"WHERE ({where}) AND {null_guard}" if where else f"WHERE {null_guard}"
    return f"""
        WITH h AS (
            SELECT md5(CAST({source_expr} AS VARCHAR)) AS hx FROM {table} {w}
        ), br AS (
            SELECT CAST('0x' || substr(hx, 1, 3) AS INT) AS b,
                   CAST('0x' || substr(hx, 4, 13) AS BIGINT) AS wv
            FROM h
        ), regs AS (
            SELECT b, max(CASE WHEN wv = 0 THEN {_W_BITS + 1}
                          ELSE {_W_BITS + 1} - length(trim(LEADING '0' FROM bin(wv))) END) AS m
            FROM br GROUP BY b
        ), agg AS (
            SELECT CAST(count(*) AS INT) AS n_buckets,
                   CAST({_M} - count(*) AS INT) AS zeros,
                   CAST(sum(CAST(1 AS BIGINT) << ({_W_BITS + 1} - m)) AS DECIMAL(38,0))
                   + CAST({_M} - count(*) AS DECIMAL(38,0)) * CAST({_SCALE} AS DECIMAL(38,0))
                   AS sum_scaled
            FROM regs
        )
        SELECT CAST(floor(CASE WHEN ({_ALPHA_NUM} / (1.0 + 1.079 / {float(_M)}) * {float(_M)} * {float(_M)} * {float(_SCALE)})
                                    / CAST(sum_scaled AS DOUBLE) <= {2.5 * _M}
                               AND zeros > 0
                          THEN {float(_M)} * ln({float(_M)} / CAST(zeros AS DOUBLE))
                          ELSE ({_ALPHA_NUM} / (1.0 + 1.079 / {float(_M)}) * {float(_M)} * {float(_M)} * {float(_SCALE)})
                               / CAST(sum_scaled AS DOUBLE) END) AS BIGINT) AS est,
               n_buckets, zeros, CAST(sum_scaled AS DECIMAL(38,0)) AS sum_scaled
        FROM agg
    """


# ---------------------------------------------------------------------------
# Count-Min sketch: engine-portable frequency estimation / heavy hitters
# ---------------------------------------------------------------------------
# Same portability contract as the HLL above: md5 is the hash family
# (row j hashes value v as md5("j:" || v), first 8 hex chars mod width),
# counters are exact integers, and the estimate is the min over rows —
# any engine reproduces the identical sketch AND the identical estimates,
# so differential tests are exact and sketches built by different engines
# merge (cms_merge = per-cell sum; CMS is a linear sketch).
#
# Plan shape: one narrow pass exploding each value into `depth` (row,
# cell) pairs, then groupBy(row, cell) count — map-side partial
# aggregation caps the shuffle at depth x width tiny rows per partition
# whatever the input size. Estimation broadcasts the <= depth x width
# sketch and probes it map-side.

_CMS_DEPTH = 4
_CMS_WIDTH = 2048


def _cms_cell(col: Column, j: int, width: int) -> Column:
    h = F.md5(F.concat(F.lit(f"{j}:"), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(width)).cast("int")


def cms_sketch(df: DataFrame, col: str, depth: int = _CMS_DEPTH, width: int = _CMS_WIDTH) -> DataFrame:
    """Build the sketch: (__cms_j row, __cms_k cell, __cms_n count) —
    at most depth x width rows whatever the input size. NULLs are
    excluded (md5 of NULL is NULL; they would occupy phantom NULL cells
    that no equi-join probe can reach)."""
    df = df.filter(F.col(col).isNotNull())
    pairs = df.select(
        F.posexplode(
            F.array(*[_cms_cell(F.col(col), j, width) for j in range(depth)])
        ).alias("__cms_j", "__cms_k")
    )
    return pairs.groupBy("__cms_j", "__cms_k").agg(F.count(F.lit(1)).alias("__cms_n"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """CMS is linear: the sketch of a union is the per-cell SUM."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("__cms_j", "__cms_k").agg(F.sum("__cms_n").alias("__cms_n"))


def cms_estimate(
    sketch: DataFrame,
    values_df: DataFrame,
    col: str,
    depth: int = _CMS_DEPTH,
    width: int = _CMS_WIDTH,
) -> DataFrame:
    """Estimated occurrence count for each row of ``values_df[col]``:
    min over rows of the addressed counters (0 if a cell was never hit).
    Guaranteed >= the true count for NON-NULL values (NULLs are excluded
    from both the sketch and the probe — an equi-join cannot address
    them); overestimates only via collisions (eps ~ e/width). The sketch
    is broadcast — probing is map-side, no shuffle of the probe side."""
    values_df = values_df.filter(F.col(col).isNotNull())
    probes = values_df.select(
        F.col(col),
        F.posexplode(
            F.array(*[_cms_cell(F.col(col), j, width) for j in range(depth)])
        ).alias("__cms_j", "__cms_k"),
    )
    return (
        probes.join(F.broadcast(sketch), ["__cms_j", "__cms_k"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("__cms_n"), F.lit(0))).alias("est"))
    )


def histogram_quantiles(
    hist: DataFrame,
    total_col: str = "cnt",
    quantiles: tuple[int, ...] = (250, 500, 750, 900, 990),
) -> DataFrame:
    """Quantile estimates from a MERGEABLE fixed-boundary histogram
    (profile.numeric_histogram rows, or any (bin, bin_lo, bin_hi, cnt)
    table — sum cnt across shards/days first, the merge is just an
    addition). The mergeable-summary counterpart to percentile_approx:
    sketch once on ingest, answer quantile queries from the tiny
    histogram forever, never rescanning the data — the same
    state-not-scan philosophy as the HLL and CMS sketches in this
    module.

    ``quantiles`` are permille ranks (250 = p25). For rank q, find the
    first bin (by bin order) whose running count reaches
    need = ceil(q·n/1000), then interpolate inside it with pure integer
    arithmetic:

        est_f6 = bin_lo_f6 + floor((bin_hi_f6 - bin_lo_f6)
                 · (need - cum_before) / cnt_bin)

    where *_f6 are the boundaries floored to 1e6 fixed-point. Exact
    integer math end-to-end → engine-portable (differential-testable)
    and independent of partitioning.

    Returns (q_permille, est_f6). Empty histogram → empty result (no
    quantiles of nothing).

    Scale: the histogram is bins rows — the window runs on one
    partition, which is the POINT of a sketch (the heavy data was
    reduced at scan time by numeric_histogram's map-side-combined
    groupBy). The quantile list joins as a 1-row-per-q broadcast.
    """
    from pyspark.sql import Window

    spark = hist.sparkSession
    qdf = spark.createDataFrame([(int(q),) for q in quantiles], "q_permille int")
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        hist.select(
            "bin",
            F.floor(F.col("bin_lo") * 1_000_000).cast("long").alias("lo_f6"),
            F.floor(F.col("bin_hi") * 1_000_000).cast("long").alias("hi_f6"),
            F.col(total_col).cast("long").alias("cnt"),
        )
        .withColumn("cum", F.sum("cnt").over(w))
        .withColumn("cum_before", F.col("cum") - F.col("cnt"))
        .withColumn("n", F.max("cum").over(Window.partitionBy()))
    )
    # exact integer ceil-div: (a + 999) div 1000 == ceil(a/1000) for a >= 0,
    # lossless at any magnitude where ceil(double /) rounds past 2^53
    need = F.expr("(CAST(q_permille AS BIGINT) * n + 999) div 1000").cast("long")
    hit = (
        cum.join(F.broadcast(qdf))
        .withColumn("need", need)
        .filter((F.col("cum") >= F.col("need")) & (F.col("cum_before") < F.col("need")))
    )
    return hit.select(
        "q_permille",
        (
            F.col("lo_f6")
            # integer div (operands non-negative: bins ordered, cnt > 0),
            # exact at any magnitude unlike floor(double /)
            + F.expr("((hi_f6 - lo_f6) * (need - cum_before)) div cnt")
        ).cast("long").alias("est_f6"),
    )


def hll_intersection_estimate(
    df_a: DataFrame, df_b: DataFrame, col: str
) -> DataFrame:
    """Distinct-overlap estimate between two populations by
    inclusion–exclusion over three HLL estimates:
    |A∩B| ≈ est(A) + est(B) − est(A∪B). One row
    (est_a, est_b, est_union, est_intersection).

    This is the audience-overlap / cross-corpus-contamination question
    ("how many users/documents appear in BOTH sources?") answered from
    sketches: at steady state keep per-source REGISTER tables
    (hll_registers, mergeable by max) and this operator never rescans
    the data — est(A∪B) is the register-wise max of the two sketches,
    the same merge hll_merge implements. Here the three estimates are
    computed from the inputs directly so the result is differential-
    testable end-to-end.

    Inclusion–exclusion inherits HLL error from THREE estimates; for
    small overlaps the subtraction can go negative — clamped at 0, as
    any production sketch library does. The three 1-row estimates meet
    in a broadcast nested-loop join of 1×1 rows: constant cost.
    """
    est_a = hll_estimate(df_a, col).select(F.col("est").alias("est_a"))
    est_b = hll_estimate(df_b, col).select(F.col("est").alias("est_b"))
    est_u = hll_estimate(df_a.select(col).unionByName(df_b.select(col)), col).select(
        F.col("est").alias("est_union")
    )
    return (
        est_a.join(est_b)
        .join(est_u)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0).cast("long"),
                (F.col("est_a") + F.col("est_b") - F.col("est_union")).cast("long"),
            ).alias("est_intersection"),
        )
    )


def histogram_quantiles_by_group(
    hist: DataFrame,
    total_col: str = "cnt",
    quantiles: tuple[int, ...] = (250, 500, 750, 900, 990),
) -> DataFrame:
    """Per-group quantile estimates from per-group mergeable histograms
    (profile.numeric_histogram_by_group rows): same integer
    interpolation as histogram_quantiles, windows PARTITIONED on the
    group so every group's cumulative scan is independent — aggregate
    state is groups × bins rows, and the quantile list joins as a tiny
    broadcast. Returns (grp, q_permille, est_f6)."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    qdf = spark.createDataFrame([(int(q),) for q in quantiles], "q_permille int")
    w = Window.partitionBy("grp").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wg = Window.partitionBy("grp")
    cum = (
        hist.select(
            "grp",
            "bin",
            F.floor(F.col("bin_lo") * 1_000_000).cast("long").alias("lo_f6"),
            F.floor(F.col("bin_hi") * 1_000_000).cast("long").alias("hi_f6"),
            F.col(total_col).cast("long").alias("cnt"),
        )
        .withColumn("cum", F.sum("cnt").over(w))
        .withColumn("cum_before", F.col("cum") - F.col("cnt"))
        .withColumn("n", F.max("cum").over(wg))
    )
    # exact integer ceil-div: (a + 999) div 1000 == ceil(a/1000) for a >= 0,
    # lossless at any magnitude where ceil(double /) rounds past 2^53
    need = F.expr("(CAST(q_permille AS BIGINT) * n + 999) div 1000").cast("long")
    hit = (
        cum.join(F.broadcast(qdf))
        .withColumn("need", need)
        .filter((F.col("cum") >= F.col("need")) & (F.col("cum_before") < F.col("need")))
    )
    return hit.select(
        "grp",
        "q_permille",
        (
            F.col("lo_f6")
            # integer div (operands non-negative: bins ordered, cnt > 0),
            # exact at any magnitude unlike floor(double /)
            + F.expr("((hi_f6 - lo_f6) * (need - cum_before)) div cnt")
        ).cast("long").alias("est_f6"),
    )


# -- portable Bloom filter --------------------------------------------------

_BLOOM_M = 4096
_BLOOM_K = 4


def bloom_build(
    df: DataFrame, col: str, m: int = _BLOOM_M, k: int = _BLOOM_K
) -> DataFrame:
    """Build a PORTABLE Bloom filter over ``col`` as its set-bit position
    table: rows (pos int), ≤m of them — the reusable/persistable form of
    the runtime-filter pattern (txlog's per-file blooms and
    joins.bitmap_prefilter_semi_join build theirs inline; this one is an
    artifact another job, day, or ENGINE can load and probe).

    Hashing is the repo's engine-portable md5 family:
    ``pos_j = int(md5(j || ':' || value)[:8], 16) % m`` for j in 0..k-1 —
    any system reproduces the identical filter, which also makes probe
    results (INCLUDING false positives) deterministic and therefore
    differential-testable, unlike library blooms with private hashing.

    Plan shape at scale: explode k positions per row (narrow), one
    distinct on an integer domain ≤m — the output is bounded by m rows
    no matter the input size, the mergeable/broadcastable sweet spot
    (union two filters = UNION DISTINCT of their position tables).
    NULLs are skipped (a NULL never probes true).
    """
    if m < 2 or k < 1:
        raise ValueError(f"need m >= 2 and k >= 1, got m={m} k={k}")
    s = F.col(col).cast("string")
    positions = F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws(":", F.lit(str(j)), s)), 1, 8),
                    16,
                    10,
                ).cast("long")
                % m
            ).cast("int")
            for j in range(k)
        ]
    )
    return (
        df.filter(s.isNotNull())
        .select(F.explode(positions).alias("pos"))
        .distinct()
    )


def bloom_probe(
    keys: DataFrame,
    bloom: DataFrame,
    col: str,
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
) -> DataFrame:
    """Probe a :func:`bloom_build` position table: returns the key rows
    plus ``may_contain`` (true iff ALL k positions are set — no false
    negatives ever; false-positive rate ~(1-e^{-kn/m})^k).

    Plan shape at scale: the filter is ≤m integer rows → broadcast; the
    probe explodes k positions per key, left-joins the broadcast set,
    and groups back counting hits — probe side shuffles only its own
    (key, k) rows, and with m=4096 the broadcast is ~16 KB.

    NULL probe keys always report may_contain = false (the build side
    skips NULLs, so "a NULL never probes true" holds on BOTH sides):
    positions use NULL-propagating concat, so a NULL key hashes to NULL
    positions that can never join a set bit.
    """
    if m < 2 or k < 1:
        raise ValueError(f"need m >= 2 and k >= 1, got m={m} k={k}")
    s = F.col(col).cast("string")
    # F.concat (not concat_ws): concat_ws SKIPS a NULL key, hashing the
    # bare "j" prefix — a NULL would then probe the positions of the
    # j-th salt string and could spuriously report true. concat
    # propagates NULL, matching the DuckDB oracle's NULL arithmetic.
    positions = F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}:"), s)), 1, 8),
                    16,
                    10,
                ).cast("long")
                % m
            ).cast("int")
            for j in range(k)
        ]
    )
    probed = keys.select(
        F.col(col).alias("__key"), F.explode(positions).alias("pos")
    )
    hit = F.when(F.col("__hit").isNotNull(), 1).otherwise(0)
    return (
        probed.join(
            F.broadcast(bloom.select(F.col("pos"), F.lit(1).alias("__hit"))),
            "pos",
            "left",
        )
        .groupBy("__key")
        .agg((F.sum(hit) == F.lit(int(k))).alias("may_contain"))
        .select(F.col("__key").alias(col), "may_contain")
    )


def bloom_oracle_sql(
    build_sql: str, probe_sql: str, col: str, m: int = _BLOOM_M, k: int = _BLOOM_K
) -> str:
    """DuckDB replica of bloom_build + bloom_probe (same md5 positions,
    so false positives replay identically). ``build_sql``/``probe_sql``
    must each yield a single column named ``v``."""
    def pos_exprs(alias):
        return ", ".join(
            f"CAST(CAST('0x' || substr(md5('{j}:' || CAST({alias}.v AS VARCHAR)), 1, 8) AS UBIGINT) % {m} AS INT)"
            for j in range(k)
        )

    return f"""
WITH b AS MATERIALIZED ({build_sql}),
p AS MATERIALIZED ({probe_sql}),
bpos AS (
    SELECT DISTINCT unnest([{pos_exprs('b')}]) AS pos
    FROM b WHERE b.v IS NOT NULL
),
ppos AS (
    SELECT p.v AS key, unnest([{pos_exprs('p')}]) AS pos FROM p
)
SELECT key AS {col},
       (count(bpos.pos) = {k}) AS may_contain
FROM ppos LEFT JOIN bpos USING (pos)
GROUP BY key
"""


# ---------------------------------------------------------------------------
# KMV (K-minimum-values) distinct sketch — Bar-Yossef et al. 2002, the
# bottom-k form. Same portability contract as the HLL: md5 is the hash
# family, the first 12 hex chars (48 bits) are the value's position in
# [0, 2^48), and the estimator is pure integer arithmetic:
#
#     est = (k - 1) · 2^48  div  h_(k)          (h_(k) = k-th smallest)
#
# (k-1)·2^48 tops out at ~1.8e16 for k = 64 — inside BIGINT on both
# engines, which is WHY the domain is 48-bit here: the 128-bit-domain
# variant needs DECIMAL(38)/HUGEINT intermediates for zero benefit at
# gate scale. 48-bit collision odds are ~n²/2^49 per group — fine for a
# sketch whose own relative error is ~1/√(k−2); a 100 TB deployment
# counting billions per group widens the slice and the arithmetic
# together (documented, one constant).
# ---------------------------------------------------------------------------

_KMV_HEX = 12
_KMV_DOMAIN = 1 << (4 * _KMV_HEX)


def kmv_estimate_by_group(
    df: DataFrame,
    col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct estimate. Output one row per group:

        (group, n_hashes_kept, kth_min_hash, est_distinct)

    When a group holds fewer than k distinct hashes the sketch IS the
    distinct set and the estimate is exact (kth_min_hash NULL) — the
    standard small-regime behavior, mirrored by the oracle.

    Mergeability (the reason KMV exists next to HLL): union = merge the
    bottom-k lists and re-take the bottom k; intersection supports
    Jaccard via the k-min coincidence trick — both pure set ops on the
    kept hashes. HLL can only union; KMV buys intersections for k·8
    bytes per group.

    Plan shape: distinct (group, hash) — one shuffle — then a bounded
    per-group window (row_number ≤ k) and ONE groupBy: state per group
    is k longs, never the value set.
    """
    from pyspark.sql import Window

    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, _KMV_HEX), 16, 10).cast(
        "long"
    )
    d = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(group_col).alias("g"), h.alias("hv"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy(F.col("hv").asc())
    kept = d.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return (
        kept.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_hashes_kept"),
            F.max("hv").alias("__max_hv"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_hashes_kept",
            F.when(F.col("n_hashes_kept") == k, F.col("__max_hv"))
            .cast("long")
            .alias("kth_min_hash"),
            F.when(
                F.col("n_hashes_kept") < k, F.col("n_hashes_kept").cast("long")
            )
            .otherwise(
                F.expr(f"CAST(({k - 1} * CAST({_KMV_DOMAIN} AS BIGINT)) div __max_hv AS BIGINT)")
            )
            .alias("est_distinct"),
        )
    )


def kmv_group_oracle_sql(
    source_expr: str, group_expr: str, table: str, k: int = 64
) -> str:
    """DuckDB replica of :func:`kmv_estimate_by_group` — identical hash
    slice, identical integer estimator."""
    return f"""
WITH d AS (
    SELECT DISTINCT {group_expr} AS g,
           CAST('0x' || substr(md5(CAST({source_expr} AS VARCHAR)), 1, {_KMV_HEX})
                AS BIGINT) AS hv
    FROM {table} WHERE ({source_expr}) IS NOT NULL
), ranked AS (
    SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv ASC) AS rn
    FROM d
), kept AS (
    SELECT g, count(*) AS n_kept, max(hv) AS max_hv
    FROM ranked WHERE rn <= {k} GROUP BY g
)
SELECT g AS {group_expr},
       CAST(n_kept AS INT) AS n_hashes_kept,
       CAST(CASE WHEN n_kept = {k} THEN max_hv END AS BIGINT) AS kth_min_hash,
       CAST(CASE WHEN n_kept < {k} THEN n_kept
                 ELSE ({k - 1} * CAST({_KMV_DOMAIN} AS BIGINT)) // max_hv
            END AS BIGINT) AS est_distinct
FROM kept
"""


def kmv_jaccard_estimate(
    df: DataFrame,
    col: str,
    label_col: str,
    label_a: str,
    label_b: str,
    k: int = 64,
) -> DataFrame:
    """KMV set-operation estimate between two slices of one column —
    the capability HLL lacks and the reason a pipeline keeps KMV
    sketches next to it: from the bottom-k of A, the bottom-k of B,
    and the bottom-k of their MERGE, estimate Jaccard and the
    intersection size with pure integer arithmetic (Beyer et al. 2007,
    "On synopses for distinct-value estimation under multiset
    operations" — the k-min coincidence estimator):

        K        = bottom-k of (bottom-k(A) ∪ bottom-k(B))
        overlap  = |{h ∈ K : h ∈ bottom-k(A) ∧ h ∈ bottom-k(B)}|
        jacc_ppm = (overlap · 1e6)        div |K|
        inter_est= (overlap · union_est)  div |K|

    union_est is the KMV estimate on K itself (exact when |K| < k).
    ONE row out: (n_a, n_b, n_union_kept, overlap, jacc_ppm,
    union_est, inter_est) — every value an exact integer function of
    the kept hashes, so the gate is engine-exact even though the
    ESTIMATES carry sketch error vs ground truth.

    Plan shape: the two bottom-k's are one distinct + one bounded
    window each (shared scan via the label filter), the merge is a
    2k-row driver-free union — everything after the distinct is
    O(k) rows.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, _KMV_HEX), 16, 10
    ).cast("long")
    base = df.filter(
        F.col(col).isNotNull() & F.col(label_col).isin([label_a, label_b])
    ).select(F.col(label_col).alias("lbl"), h.alias("hv"))
    d = base.distinct()
    w = Window.partitionBy("lbl").orderBy(F.col("hv").asc())
    kept = (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("lbl", "hv")
    )
    # merge: distinct hashes of both sketches, re-ranked, bottom-k
    merged = (
        kept.groupBy("hv")
        .agg(
            F.max(F.when(F.col("lbl") == label_a, 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("lbl") == label_b, 1).otherwise(0)).alias("in_b"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(Window.orderBy(F.col("hv").asc())),
        )
        .filter(F.col("__rn") <= k)
    )
    return (
        merged.agg(
            F.count(F.lit(1)).cast("int").alias("n_union_kept"),
            F.sum((F.col("in_a") * F.col("in_b")).cast("long"))
            .cast("long")
            .alias("overlap"),
            F.max("hv").alias("__max_hv"),
        )
        .join(
            kept.filter(F.col("lbl") == label_a)
            .agg(F.count(F.lit(1)).cast("int").alias("n_a"))
        )
        .join(
            kept.filter(F.col("lbl") == label_b)
            .agg(F.count(F.lit(1)).cast("int").alias("n_b"))
        )
        .select(
            "n_a",
            "n_b",
            "n_union_kept",
            "overlap",
            F.expr("CAST((overlap * 1000000) div n_union_kept AS BIGINT)").alias(
                "jacc_ppm"
            ),
            F.when(
                F.col("n_union_kept") < k, F.col("n_union_kept").cast("long")
            )
            .otherwise(
                F.expr(
                    f"CAST(({k - 1} * CAST({_KMV_DOMAIN} AS BIGINT)) div __max_hv AS BIGINT)"
                )
            )
            .alias("union_est"),
        )
        .withColumn(
            "inter_est",
            F.expr("CAST((overlap * union_est) div n_union_kept AS BIGINT)"),
        )
    )


def kmv_jaccard_oracle_sql(
    source_expr: str,
    label_expr: str,
    label_a: str,
    label_b: str,
    table: str,
    k: int = 64,
) -> str:
    """DuckDB replica of :func:`kmv_jaccard_estimate`."""
    return f"""
WITH d AS (
    SELECT DISTINCT {label_expr} AS lbl,
           CAST('0x' || substr(md5(CAST({source_expr} AS VARCHAR)), 1, {_KMV_HEX})
                AS BIGINT) AS hv
    FROM {table}
    WHERE ({source_expr}) IS NOT NULL
      AND {label_expr} IN ('{label_a}', '{label_b}')
), kept AS (
    SELECT lbl, hv FROM (
        SELECT lbl, hv,
               row_number() OVER (PARTITION BY lbl ORDER BY hv ASC) AS rn
        FROM d
    ) WHERE rn <= {k}
), merged AS (
    SELECT hv, in_a, in_b FROM (
        SELECT hv,
               max(CASE WHEN lbl = '{label_a}' THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN lbl = '{label_b}' THEN 1 ELSE 0 END) AS in_b,
               row_number() OVER (ORDER BY hv ASC) AS rn
        FROM kept GROUP BY hv
    ) WHERE rn <= {k}
), agg AS (
    SELECT CAST(count(*) AS INT) AS n_union_kept,
           CAST(sum(in_a * in_b) AS BIGINT) AS overlap,
           max(hv) AS max_hv
    FROM merged
)
SELECT (SELECT CAST(count(*) AS INT) FROM kept WHERE lbl = '{label_a}') AS n_a,
       (SELECT CAST(count(*) AS INT) FROM kept WHERE lbl = '{label_b}') AS n_b,
       n_union_kept, overlap,
       CAST((overlap * 1000000) // n_union_kept AS BIGINT) AS jacc_ppm,
       CAST(CASE WHEN n_union_kept < {k} THEN n_union_kept
                 ELSE ({k - 1} * CAST({_KMV_DOMAIN} AS BIGINT)) // max_hv
            END AS BIGINT) AS union_est,
       CAST((overlap * CASE WHEN n_union_kept < {k} THEN n_union_kept
                 ELSE ({k - 1} * CAST({_KMV_DOMAIN} AS BIGINT)) // max_hv END)
            // n_union_kept AS BIGINT) AS inter_est
FROM agg
"""
