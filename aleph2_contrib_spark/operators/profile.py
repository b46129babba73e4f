"""Column profiling for ingest QA — the "what did we just load" pass a
100 TB pipeline runs before training jobs trust a table.

Everything is engine-portable by construction (the project's sketch
discipline): histogram bins are fixed-boundary integers, summary
aggregates are exact DECIMAL sums cast to double at the boundary, and
the distinct estimate is the repo's reproducible HLL — so a profile
computed by this engine equals one computed by DuckDB (or any engine)
bit-for-bit, and day-over-day profiles diff meaningfully.

Plan shape: each profile is ONE aggregation pass over the column
(map-side partial, ≤bins or 1 output rows); the distinct estimate adds
the HLL's bounded ≤4096-group pass. Nothing is collected beyond the
final tiny result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 20,
) -> DataFrame:
    """Fixed-boundary histogram of ``col`` over [lo, hi]: rows
    (bin, bin_lo, bin_hi, cnt), bin width (hi-lo)/bins, values == hi land
    in the last bin, values outside [lo, hi] are excluded (profile them
    via ``numeric_summary``'s min/max first). Fixed boundaries — unlike
    quantile-adaptive bins — make histograms MERGEABLE across partitions,
    days, and engines: same bins, add the counts."""
    if not bins > 0 or not hi > lo:
        raise ValueError("need bins > 0 and hi > lo")
    w = (hi - lo) / bins
    c = F.col(col).cast("double")
    b = F.least(F.floor((c - F.lit(lo)) / F.lit(w)), F.lit(bins - 1)).cast("int")
    return (
        df.filter((c >= lo) & (c <= hi))
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
            "cnt",
        )
    )


def numeric_summary(df: DataFrame, col: str) -> DataFrame:
    """One-row summary: n, n_null, n_nan, n_unsummable, min, max (NaN
    excluded — Spark sorts NaN above every double, which would poison
    max and silently disable histograms), sum (exact DECIMAL → double),
    mean (exact sum / summable count). Engine-stable: no float
    accumulation anywhere.

    A QA profiler must SURVIVE anomalous data and report it, not crash
    on it: values outside DECIMAL(38,6) range or NaN cannot join the
    exact sum — they are counted in ``n_unsummable`` (with NaN broken
    out as ``n_nan``) and excluded from sum/mean via try_cast, instead
    of throwing under ANSI mode or skewing the mean's divisor."""
    c = F.col(col)
    cd = c.cast("double")
    finite = F.when(~F.isnan(cd), c)
    dec = c.try_cast("decimal(38,6)")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_null"),
        F.count(F.when(F.isnan(cd), 1)).cast("long").alias("n_nan"),
        (F.count(c) - F.count(dec)).cast("long").alias("n_unsummable"),
        F.min(finite).cast("double").alias("min_v"),
        F.max(finite).cast("double").alias("max_v"),
        F.sum(dec).cast("double").alias("sum_v"),
        (F.sum(dec) / F.count(dec)).cast("double").alias("mean_v"),
    )


def profile_column(df: DataFrame, col: str, bins: int = 20) -> dict:
    """Full profile of a numeric column: summary + reproducible HLL
    distinct estimate + a histogram spanning the observed [min, max].
    Returns a plain dict (driver-side — the inputs are one-row/tiny
    aggregates, not data). Two passes: one for the summary bounds, one
    for the histogram over them."""
    from aleph2_contrib_spark.operators.sketch import hll_estimate

    s = numeric_summary(df, col).collect()[0].asDict()
    est = hll_estimate(df.filter(F.col(col).isNotNull()), col).collect()[0].est
    out = dict(s)
    out["distinct_est"] = est
    if s["min_v"] is not None and s["max_v"] is not None and s["max_v"] > s["min_v"]:
        out["histogram"] = [
            r.asDict()
            for r in numeric_histogram(df, col, s["min_v"], s["max_v"], bins)
            .orderBy("bin")
            .collect()
        ]
    else:
        out["histogram"] = []
    return out


def histogram_drift(h_ref: DataFrame, h_cur: DataFrame) -> DataFrame:
    """Distribution drift between two FIXED-BIN histograms (same
    boundaries — that is what makes day-over-day profiles comparable):
    one row (n_ref, n_cur, n_bins, tvd) where tvd is the total-variation
    distance Σ|p_cur − p_ref|/2 ∈ [0, 1] — the ingest-QA tripwire
    ("today's value distribution moved 0.4 from yesterday's — hold the
    training run").

    TVD instead of the PSI/KL family on purpose: it needs no logarithm,
    so the whole computation is EXACT integer arithmetic — per-bin
    |cnt_cur·n_ref − cnt_ref·n_cur| in DECIMAL(38,0) (safe to ~1e18-row
    histograms), one double division at the very end. Engine-portable
    bit-for-bit, per the module's sketch discipline; ln() would differ in
    final ulps across libms.

    Plan: full-outer join on bin (missing bins count 0 — a bin present
    only on one side is drift, not an error), 1-row broadcast of the
    totals, one aggregate. Histogram inputs are ≤bins rows, so every
    stage is trivially small regardless of the profiled table's size."""
    r = h_ref.select("bin", F.col("cnt").alias("cnt_ref"))
    c = h_cur.select("bin", F.col("cnt").alias("cnt_cur"))
    j = r.join(c, ["bin"], "full_outer").select(
        F.coalesce(F.col("cnt_ref"), F.lit(0)).cast("decimal(38,0)").alias("cnt_ref"),
        F.coalesce(F.col("cnt_cur"), F.lit(0)).cast("decimal(38,0)").alias("cnt_cur"),
    )
    tot = j.agg(
        F.sum("cnt_ref").cast("decimal(38,0)").alias("tr"),
        F.sum("cnt_cur").cast("decimal(38,0)").alias("tc"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    x = j.crossJoin(F.broadcast(tot))
    return (
        x.groupBy("tr", "tc", "n_bins")
        .agg(
            F.sum(
                F.abs(F.col("cnt_cur") * F.col("tr") - F.col("cnt_ref") * F.col("tc"))
            ).alias("num")
        )
        .select(
            F.col("tr").cast("long").alias("n_ref"),
            F.col("tc").cast("long").alias("n_cur"),
            F.col("n_bins").cast("int").alias("n_bins"),
            F.when(
                (F.col("tr") > 0) & (F.col("tc") > 0),
                F.col("num").cast("double")
                / (
                    (F.lit(2.0) * F.col("tr").cast("double"))
                    * F.col("tc").cast("double")
                ),
            ).alias("tvd"),
        )
    )


def expectations_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality expectations — the contract check an
    ingest pipeline runs before a table is released to training jobs
    (Great-Expectations-shaped, engine-portable by construction). Each
    rule is a dict: ``{"rule": name, "kind": k, "column": c, ...}`` with
    kinds:

    - ``not_null``                          — violations = NULL rows
    - ``unique``                            — violations = non-null rows
      beyond the first per value (count(col) − count(distinct col));
      NULLs are not duplicates of each other (pair with not_null)
    - ``range``   (``lo``/``hi`` inclusive) — violations = non-null rows
      outside [lo, hi]
    - ``in_set``  (``values``)              — violations = non-null rows
      not in the list
    - ``regex``   (``pattern``)             — violations = non-null rows
      not fully matching (the pattern is used as-is; anchor it yourself)

    Returns one row per rule: (rule, col_name, kind, n_rows,
    n_violations, passed∈{0,1}) — integers only, so any engine computing
    the same rules agrees bit-for-bit.

    Plan shape: ALL rules compile into ONE aggregation pass (conditional
    sums share the scan; ``unique`` rules add their distinct columns to
    the same aggregate via Spark's expand), then the 1-row wide result is
    exploded driver-free into the per-rule report. Adding a rule costs
    one more accumulator, not one more scan — the property that matters
    when the table is 100 TB.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        c = F.col(r["column"])
        kind = r["kind"]
        if kind == "not_null":
            v = F.sum(F.when(c.isNull(), 1).otherwise(0))
        elif kind == "unique":
            v = F.count(c) - F.count_distinct(c)
        elif kind == "range":
            v = F.sum(
                F.when(c.isNotNull() & ((c < r["lo"]) | (c > r["hi"])), 1).otherwise(0)
            )
        elif kind == "in_set":
            v = F.sum(
                F.when(c.isNotNull() & ~c.isin(list(r["values"])), 1).otherwise(0)
            )
        elif kind == "regex":
            v = F.sum(
                F.when(c.isNotNull() & ~c.rlike(r["pattern"]), 1).otherwise(0)
            )
        else:
            raise ValueError(f"unknown expectation kind: {kind!r}")
        aggs.append(v.cast("bigint").alias(f"__v{i}"))
    wide = df.agg(*aggs)
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r["rule"]).alias("rule"),
                    F.lit(r["column"]).alias("col_name"),
                    F.lit(r["kind"]).alias("kind"),
                    F.coalesce(F.col("__n"), F.lit(0)).alias("n_rows"),
                    F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("n_violations"),
                )
                for i, r in enumerate(rules)
            ]
        )
    ).alias("r")
    return wide.select(report).select(
        "r.rule",
        "r.col_name",
        "r.kind",
        "r.n_rows",
        "r.n_violations",
        (F.col("r.n_violations") == 0).cast("int").alias("passed"),
    )


def anomaly_zscore_flags(
    df: DataFrame,
    value_col: str,
    group_col: str,
    z: int = 3,
    scale: int = 1_000_000,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Per-group z-score outlier flags WITHOUT sqrt — ingest-QA anomaly
    detection whose arithmetic is exact end-to-end, so the flags are
    engine-portable (differential-testable) and independent of
    partitioning/summation order, unlike a float stddev.

    The test |x − μ| > z·σ is squared and cleared of divisions:

        (x_fx·n − S)²  >  z² · (n·Q − S²)

    where x_fx = floor(x·scale), S = Σx_fx, Q = Σx_fx² (population
    variance, no Bessel correction). Everything is integer/decimal(38,0)
    — products stay ≤ ~1e29 for x ≤ 1e8·scale⁻¹·…, far under the 1e38
    decimal ceiling; overflow-free for |x| ≤ 10⁵ at the default scale
    with up to ~10⁹ rows per group.

    Adds ``is_anomaly`` (boolean). Plan shape: one groupBy on the group
    key for (n, S, Q), broadcast the per-group stats back (groups ≪
    rows — the common QA case), then a narrow flag pass: the heavy side
    never shuffles. With ultra-high-cardinality groups (stats table too
    big for the driver) pass ``broadcast_stats=False`` to let the
    planner pick a shuffle hash join on the group key instead.
    """
    xf = F.floor(F.col(value_col).cast("double") * scale).cast("long")
    d = df.withColumn("__xf", xf)
    dec = "decimal(38,0)"
    stats = d.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__xf").cast("long").alias("__s"),
        F.sum(F.col("__xf").cast(dec) * F.col("__xf").cast(dec)).cast(dec).alias("__q"),
    )
    lhs_root = F.col("__xf").cast(dec) * F.col("__n").cast(dec) - F.col("__s").cast(dec)
    rhs = (
        F.lit(z * z).cast(dec)
        * (
            F.col("__n").cast(dec) * F.col("__q")
            - F.col("__s").cast(dec) * F.col("__s").cast(dec)
        )
    )
    stats_side = F.broadcast(stats) if broadcast_stats else stats
    return (
        d.join(stats_side, group_col)
        .withColumn("is_anomaly", (lhs_root * lhs_root) > rhs)
        .drop("__xf", "__n", "__s", "__q")
    )


def numeric_histogram_by_group(
    df: DataFrame,
    col: str,
    group_col: str,
    lo: float,
    hi: float,
    bins: int = 20,
) -> DataFrame:
    """Per-group fixed-boundary histogram: (group, bin, bin_lo, bin_hi,
    cnt) — same mergeable-bin contract as numeric_histogram, one
    groupBy(group, bin) pass with map-side partials (aggregate state is
    groups × bins, independent of row count)."""
    if not bins > 0 or not hi > lo:
        raise ValueError("need bins > 0 and hi > lo")
    w = (hi - lo) / bins
    c = F.col(col).cast("double")
    b = F.least(F.floor((c - F.lit(lo)) / F.lit(w)), F.lit(bins - 1)).cast("int")
    return (
        df.filter((c >= lo) & (c <= hi))
        .groupBy(F.col(group_col).alias("grp"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "grp",
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
            "cnt",
        )
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    cond_a,
    cond_b,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the ``value_col``
    distributions of two row subsets — the distribution-drift monitor
    (did this week's quality scores / token lengths / latencies shift
    from last week's?) that histogram comparisons blur: KS is the max
    CDF gap at ANY point, not bucketed.

    Exact integer arithmetic throughout (the module's portability
    discipline): values quantize to ``floor(v·10⁶)`` longs, and since

        |F_a(x) − F_b(x)| = |n_b·cum_a(x) − n_a·cum_b(x)| / (n_a·n_b)

    the supremum is a max over exact integer cross-products — no float
    CDFs, so any engine reproduces the statistic bit-for-bit. Returns
    one row (n_a, n_b, ks_f6) with ``ks_f6 = (10⁶·max_gap) div
    (n_a·n_b)`` (DECIMAL cross-products — no 2^63 overflow at any n).

    Plan shape at scale: one groupBy(value) collapses both samples to
    distinct observation points with per-sample counts (map-side
    partial), then the global cumulative sums use the two-phase scan
    (range partition by value, per-partition window cumsum, driver
    prefix over O(partitions) totals broadcast back — same pattern as
    pack_sequences; NEVER a single-partition window), and one tiny max
    aggregate finishes. Shuffle volume is distinct values, not rows.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    v = F.floor(F.col(value_col) * F.lit(1000000.0)).cast("long")
    obs = (
        df.select(
            v.alias("__v"),
            cond_a.cast("int").alias("__ia"),
            cond_b.cast("int").alias("__ib"),
        )
        .filter((F.col("__ia") == 1) | (F.col("__ib") == 1))
        .groupBy("__v")
        .agg(F.sum("__ia").alias("__ca"), F.sum("__ib").alias("__cb"))
    )
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    d = obs.repartitionByRange(nparts, F.col("__v").asc()).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("__la", F.sum("__ca").over(w)).withColumn(
        "__lb", F.sum("__cb").over(w)
    )
    # eager localCheckpoint: offsets below are keyed by __pid, so the
    # sampled range partitioning must never re-execute (a lost persist
    # block would silently recompute with re-sampled boundaries and
    # corrupt the prefix sums; the lineage cut fails instead)
    d = d.localCheckpoint(eager=True)
    totals = (
        d.groupBy("__pid")
        .agg(F.sum("__ca").alias("__pa"), F.sum("__cb").alias("__pb"))
        .collect()
    )
    run_a, run_b, offsets = 0, 0, {}
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = (run_a, run_b)
        run_a += row["__pa"] or 0
        run_b += row["__pb"] or 0
    off_df = spark.createDataFrame(
        [(int(p), int(a), int(b)) for p, (a, b) in offsets.items()],
        "__pid int, __offa long, __offb long",
    )
    gap = F.abs(
        F.lit(int(run_b)).cast("decimal(38,0)")
        * (F.col("__la") + F.col("__offa")).cast("decimal(38,0)")
        - F.lit(int(run_a)).cast("decimal(38,0)")
        * (F.col("__lb") + F.col("__offb")).cast("decimal(38,0)")
    )
    final = (
        d.join(F.broadcast(off_df), "__pid")
        .agg(F.max(gap).alias("__maxgap"))
        .select(
            F.lit(int(run_a)).cast("long").alias("n_a"),
            F.lit(int(run_b)).cast("long").alias("n_b"),
            F.expr(
                f"CAST((CAST(1000000 AS DECIMAL(38,0)) * __maxgap)"
                f" div (CAST({int(run_a)} AS DECIMAL(38,0)) * CAST({int(run_b)} AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("ks_f6"),
        )
    )
    # materialize the one-row answer so the checkpointed cumsum blocks
    # can be reclaimed as soon as `d` goes out of scope — otherwise every
    # call holds blocks for the life of the returned (lazy) DataFrame
    row = final.collect()
    return spark.createDataFrame(row, final.schema)


def table_summary(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct: str = "exact",
) -> DataFrame:
    """Whole-table profile in ONE aggregation pass: one output row per
    column with (col_name, n_rows, n_nulls, n_distinct, min_str, max_str).
    min/max are cast to string so heterogeneous column types share one
    result schema; NULL-only columns profile to NULL min/max.

    ``distinct``:
    - ``"exact"``  — COUNT(DISTINCT col) per column. Catalyst compiles
      multiple distinct aggregates into an Expand (input multiplied by
      n_cols+1 before the shuffle) — exact, still one pass over the
      scan, but the multiplier is real at 100 TB.
    - ``"approx"`` — approx_count_distinct (built-in HLL++, rsd 5%): no
      Expand, plain partial-aggregated single shuffle; the production
      default for wide tables.
    - ``"none"``   — skip distinct counting entirely (n_distinct NULL).

    The per-column stats travel as ONE row of struct-ish aggregates and
    are unpivoted driver-free with ``stack`` — no per-column jobs, no
    collect of data values.
    """
    if distinct not in ("exact", "approx", "none"):
        raise ValueError(f"distinct must be exact|approx|none, got {distinct!r}")
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        if distinct == "exact":
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{i}"))
        elif distinct == "approx":
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{i}"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"__nd_{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{i}"))
    one = df.agg(*aggs)

    # unpivot the single stats row into one row per column, all JVM-side
    parts = []
    for i, c in enumerate(cols):
        name = c.replace("'", "\\'")
        parts.append(
            f"'{name}', __nn_{i}, CAST(__nd_{i} AS BIGINT), __mn_{i}, __mx_{i}"
        )
    stacked = one.select(
        F.col("__n"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) "
            "AS (col_name, __nn, n_distinct, min_str, max_str)"
        ),
    )
    return stacked.select(
        "col_name",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_str",
        "max_str",
    )


def fd_violations(
    df: DataFrame,
    fds: list[tuple[list[str], str]],
) -> DataFrame:
    """Functional-dependency profiling: for each candidate FD ``lhs -> rhs``
    report how badly the data violates it — one output row per FD with
    (fd, n_groups, violating_groups, violating_rows, max_rhs_ndv). An FD
    HOLDS exactly when violating_groups = 0 (every lhs group maps to one
    distinct non-null rhs value; NULL rhs values are ignored, matching the
    SQL count(DISTINCT) convention).

    Scale design: each FD costs ONE partial-aggregated groupBy on its lhs
    (count + count-distinct-rhs per group) followed by an O(groups)
    reduction to a single row; the per-FD plans are unioned so Spark runs
    them as independent stages of one job. No self-joins, no row
    materialization of the violations themselves (use a groupBy-having
    query to fetch offenders once a violated FD is identified).
    """
    if not fds:
        raise ValueError("no candidate FDs given")
    parts = []
    for lhs, rhs in fds:
        lhs = list(lhs)
        missing = [c for c in lhs + [rhs] if c not in df.columns]
        if missing:
            raise ValueError(f"columns not in DataFrame: {missing}")
        name = f"{','.join(lhs)}->{rhs}"
        g = df.groupBy(*lhs).agg(
            F.count_distinct(F.col(rhs)).alias("__ndv"),
            F.count(F.lit(1)).alias("__rows"),
        )
        parts.append(
            g.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum(F.when(F.col("__ndv") > 1, 1).otherwise(0)).alias(
                    "violating_groups"
                ),
                F.sum(F.when(F.col("__ndv") > 1, F.col("__rows")).otherwise(0)).alias(
                    "violating_rows"
                ),
                F.max("__ndv").alias("max_rhs_ndv"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fd_violations_oracle_sql(table: str, fds: list[tuple[list[str], str]]) -> str:
    """DuckDB replica of :func:`fd_violations` over a registered view."""
    selects = []
    for lhs, rhs in fds:
        lhs_list = ", ".join(lhs)
        name = f"{','.join(lhs)}->{rhs}"
        selects.append(
            f"""
            SELECT '{name}' AS fd,
                   count(*) AS n_groups,
                   CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS violating_groups,
                   CAST(sum(CASE WHEN ndv > 1 THEN n_rows ELSE 0 END) AS BIGINT)
                       AS violating_rows,
                   max(ndv) AS max_rhs_ndv
            FROM (
                SELECT count(DISTINCT {rhs}) AS ndv, count(*) AS n_rows
                FROM {table} GROUP BY {lhs_list}
            )"""
        )
    return " UNION ALL ".join(selects)


def key_skew(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Shuffle-skew diagnostic: for each candidate key column, how
    concentrated is the row mass — the "will this join/groupBy key hot-spot
    an executor at 100 TB?" profile that drives salting / AQE-skew
    decisions before a job ships.

    One row per key column: (col_name, n_rows, n_keys, max_cnt,
    max_share_ppm, skew_ratio_ppm) with

    - ``max_share_ppm``  = 1e6·max_cnt div n_rows (heaviest key's share),
    - ``skew_ratio_ppm`` = 1e6·max_cnt·n_keys div n_rows (heaviest key
      vs the perfectly-uniform per-key average; 1e6 = no skew).

    All integer arithmetic (engine-portable). NULL keys count as a key
    value (NULL is precisely the classic skew culprit).

    Plan shape at scale: per column one map-side-combined
    groupBy(key).count() whose output is O(distinct keys), then a
    four-sum aggregate to ONE row — never a sort, never a driver-side
    key list; the per-column jobs are independent narrow scans (column
    pruning serves each).
    """
    if not key_cols:
        raise ValueError("at least one key column required")
    spark = df.sparkSession
    parts = []
    for c in key_cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
        cnts = (
            df.select(F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")).alias("__k"))
            .groupBy("__k")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        parts.append(
            cnts.agg(
                F.lit(c).alias("col_name"),
                F.sum("__c").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.max("__c").cast("long").alias("max_cnt"),
            ).select(
                "col_name",
                "n_rows",
                "n_keys",
                "max_cnt",
                F.expr("(1000000 * max_cnt) div n_rows").alias("max_share_ppm"),
                F.expr("(1000000 * max_cnt * n_keys) div n_rows").alias(
                    "skew_ratio_ppm"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def key_skew_oracle_sql(table: str, key_cols: list[str]) -> str:
    """DuckDB replica of :func:`key_skew`."""
    sels = []
    for c in key_cols:
        sels.append(f"""
SELECT '{c}' AS col_name, CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys, CAST(max(c) AS BIGINT) AS max_cnt,
       CAST((1000000 * max(c)) // sum(c) AS BIGINT) AS max_share_ppm,
       CAST((1000000 * max(c) * count(*)) // sum(c) AS BIGINT) AS skew_ratio_ppm
FROM (SELECT coalesce(CAST({c} AS VARCHAR), chr(0) || 'NULL') AS k, count(*) AS c
      FROM {table} GROUP BY 1)""")
    return " UNION ALL ".join(sels)


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str, max_exact_n: int = 99_999_999
) -> DataFrame:
    """Pearson chi-square independence statistic between two categorical
    columns — the dependency screen ("does source predict label? does
    shard correlate with quality bucket?") a feature-audit pass runs
    over a training table. Chosen over mutual information / G-test
    because chi-square is log-free: every term is rational, so the
    statistic is EXACT integer arithmetic end-to-end and engine-portable
    (the module's discipline; ln() differs in final ulps across libms).

    With O the observed cell count, r/c the row/col totals and n total:

        (O - rc/n)²/E  =  (O·n - r·c)² / (n·r·c)

    Emitted as ``chi2_f6 = Σ_cells (O·n - r·c)²·1e6 div (n·r·c)`` — the
    per-cell floor makes the sum bit-identical in any engine (documented
    as the contract; the true χ²·1e6 differs by < #cells). NULL
    categories count as a real category. Output one row:
    (col_a, col_b, n, n_rows_cat, n_cols_cat, dof, chi2_f6).

    Plan shape at scale: ONE groupBy(a, b) over the scan (map-side
    partial, output = distinct cell count); totals derive from the cell
    table itself (two tiny aggs, broadcast back) — the raw table is
    never rescanned, nothing driver-side.

    EXACTNESS BOUND: the per-cell numerator (O·n − r·c)²·10⁶ is carried
    in DECIMAL(38,0), which holds it exactly only while |O·n − r·c| <
    10¹⁶ — guaranteed by n ≤ 10⁸−1 (|O·n − r·c| ≤ n²). Beyond that,
    non-ANSI Spark would silently NULL the overflowed cells and F.sum
    would drop them, yielding a WRONG statistic with no error — so the
    operator raises at runtime when n exceeds the bound instead of
    returning a wrong answer. (A 10⁸-row contingency SCAN is fine at any
    scale; n here is the table row count, the one quantity that drives
    the term magnitude.) ``max_exact_n`` exists so tests can exercise the
    guard without 10⁸ rows — production callers should not raise it.
    """
    for c in (col_a, col_b):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    cells = (
        df.select(
            F.coalesce(F.col(col_a).cast("string"), F.lit("\x00NULL")).alias("__a"),
            F.coalesce(F.col(col_b).cast("string"), F.lit("\x00NULL")).alias("__b"),
        )
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    rt = cells.groupBy("__a").agg(F.sum("__o").alias("__r"))
    ct = cells.groupBy("__b").agg(F.sum("__o").alias("__c"))
    tot = cells.agg(
        F.sum("__o").alias("__n"), F.countDistinct("__a").alias("__nr"),
        F.countDistinct("__b").alias("__nc"),
    )
    x = (
        cells.join(F.broadcast(rt), "__a")
        .join(F.broadcast(ct), "__b")
        .crossJoin(F.broadcast(tot))
        .select(
            "__n", "__nr", "__nc",
            F.expr(
                "(CAST(__o AS DECIMAL(38,0)) * __n - CAST(__r AS DECIMAL(38,0)) * __c)"
            ).alias("__d"),
            F.expr(
                "CAST(__n AS DECIMAL(38,0)) * __r * __c"
            ).alias("__den"),
        )
        .select(
            "__n", "__nr", "__nc",
            F.expr("CAST((__d * __d * 1000000) div __den AS DECIMAL(38,0))").alias(
                "__t"
            ),
        )
    )
    # Fail-fast overflow guard (see EXACTNESS BOUND in the docstring):
    # past n = 1e8-1 the per-cell DECIMAL(38,0) term can overflow to
    # NULL and the sum would silently drop cells. raise_error sits in
    # the otherwise-branch of the kept `n` column so it survives
    # column pruning and fires during the final projection.
    n_guarded = F.when(
        F.col("__n") <= F.lit(int(max_exact_n)), F.col("__n")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("chi2_independence: n="),
                F.col("__n").cast("string"),
                F.lit(
                    " exceeds the exact DECIMAL(38,0) bound (n <= 99999999):"
                    " per-cell (O*n - r*c)^2 * 1e6 would overflow and cells"
                    " would be silently dropped. Pre-aggregate or shard the"
                    " input (the statistic is additive over disjoint strata"
                    " only if recomputed per stratum)."
                ),
            )
        )
    )
    return (
        x.groupBy("__n", "__nr", "__nc")
        .agg(F.sum("__t").alias("__chi"))
        .select(
            F.lit(col_a).alias("col_a"),
            F.lit(col_b).alias("col_b"),
            n_guarded.cast("long").alias("n"),
            F.col("__nr").cast("int").alias("n_rows_cat"),
            F.col("__nc").cast("int").alias("n_cols_cat"),
            ((F.col("__nr") - 1) * (F.col("__nc") - 1)).cast("int").alias("dof"),
            F.col("__chi").cast("long").alias("chi2_f6"),
        )
    )


def chi2_independence_oracle_sql(table: str, col_a: str, col_b: str) -> str:
    """DuckDB replica of :func:`chi2_independence` (HUGEINT carries the
    1e26-scale per-cell products; same floor-per-cell contract)."""
    return f"""
WITH cells AS (
    SELECT coalesce(CAST({col_a} AS VARCHAR), chr(0) || 'NULL') AS a,
           coalesce(CAST({col_b} AS VARCHAR), chr(0) || 'NULL') AS b,
           count(*) AS o
    FROM {table} GROUP BY 1, 2
), rt AS (SELECT a, sum(o) AS r FROM cells GROUP BY a),
   ct AS (SELECT b, sum(o) AS c FROM cells GROUP BY b),
   tot AS (SELECT sum(o) AS n, count(DISTINCT a) AS nr,
                  count(DISTINCT b) AS nc FROM cells),
   terms AS (
    SELECT tot.n, tot.nr, tot.nc,
           ((CAST(cells.o AS HUGEINT) * tot.n - CAST(rt.r AS HUGEINT) * ct.c)
            * (CAST(cells.o AS HUGEINT) * tot.n - CAST(rt.r AS HUGEINT) * ct.c)
            * 1000000)
           // (CAST(tot.n AS HUGEINT) * rt.r * ct.c) AS t
    FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot
)
SELECT '{col_a}' AS col_a, '{col_b}' AS col_b,
       CAST(n AS BIGINT) AS n, CAST(nr AS INT) AS n_rows_cat,
       CAST(nc AS INT) AS n_cols_cat,
       CAST((nr - 1) * (nc - 1) AS INT) AS dof,
       CAST(sum(t) AS BIGINT) AS chi2_f6
FROM terms GROUP BY n, nr, nc
"""


def join_size_profile(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Exact pre-flight join-size profile: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k)
    computed WITHOUT running the join — the "will this equi-join explode"
    check (duplicate-keyed fact-fact joins are the classic 100 TB
    incident) plus the skew decomposition planners act on.

    One row: (n_left, n_right, n_join_rows, n_matching_keys,
    max_key_pairs, max_pairs_share_ppm) — max_key_pairs is the heaviest
    single key's output contribution; its ppm share is the skew signal
    (a 1e6-share join is one hot key doing all the work).

    Plan shape at scale: ONE groupBy(key).count() scan per side (map-side
    partial, O(distinct) output — NULL keys kept as a group so the total
    row count folds into the same pass, no separate .count() job), an
    equi-join of the two COUNT tables on non-null keys (distinct keys,
    not rows), and a one-row aggregate. The join itself never runs.
    DECIMAL(38,0) products — exact at any count. NULL keys never match
    (SQL join semantics) and are excluded from the pair math.
    """
    a = left.groupBy(F.col(left_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__ca")
    )
    b = right.groupBy(F.col(right_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__cb")
    )
    ta = a.agg(F.sum("__ca").alias("__n")).select(
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_left")
    )
    tb = b.agg(F.sum("__cb").alias("__n")).select(
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_right")
    )
    joined = (
        a.filter(F.col("__k").isNotNull())
        .join(b.filter(F.col("__k").isNotNull()), "__k")
        .select(
            (F.col("__ca").cast("decimal(38,0)") * F.col("__cb")).alias("__p")
        )
    )
    # n_join_rows / max_key_pairs stay DECIMAL(38,0): the explosive case
    # (> 9.2e18 output rows) is exactly the incident this profiler
    # exists to catch, and a non-ANSI cast to long would report it as
    # NULL instead of the number.
    stats = joined.agg(
        F.coalesce(F.sum("__p"), F.lit(0))
        .cast("decimal(38,0)")
        .alias("n_join_rows"),
        F.count(F.lit(1)).cast("long").alias("n_matching_keys"),
        F.coalesce(F.max("__p"), F.lit(0))
        .cast("decimal(38,0)")
        .alias("max_key_pairs"),
        F.coalesce(
            F.expr("CAST((1000000 * max(__p)) div sum(__p) AS BIGINT)"), F.lit(0)
        ).alias("max_pairs_share_ppm"),
    )
    return (
        ta.crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(stats))
        .select(
            "n_left", "n_right", "n_join_rows", "n_matching_keys",
            "max_key_pairs", "max_pairs_share_ppm",
        )
    )


def join_size_profile_oracle_sql(
    left_sql: str, right_sql: str, left_key: str, right_key: str
) -> str:
    """DuckDB replica of :func:`join_size_profile`."""
    return f"""
WITH l AS MATERIALIZED ({left_sql}), r AS MATERIALIZED ({right_sql}),
a AS (SELECT {left_key} AS k, count(*) AS ca FROM l
      WHERE {left_key} IS NOT NULL GROUP BY 1),
b AS (SELECT {right_key} AS k, count(*) AS cb FROM r
      WHERE {right_key} IS NOT NULL GROUP BY 1),
j AS (SELECT CAST(ca AS HUGEINT) * cb AS p FROM a JOIN b USING (k))
SELECT (SELECT CAST(count(*) AS BIGINT) FROM l) AS n_left,
       (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_right,
       CAST(coalesce(sum(p), 0) AS DECIMAL(38,0)) AS n_join_rows,
       CAST(count(*) AS BIGINT) AS n_matching_keys,
       CAST(coalesce(max(p), 0) AS DECIMAL(38,0)) AS max_key_pairs,
       coalesce(CAST((1000000 * max(p)) // sum(p) AS BIGINT), 0) AS max_pairs_share_ppm
FROM j
"""


# Benford first-digit expectation, log10(1+1/d) in ppm — FIXED integer
# constants so both engines compare against bit-identical expectations
# (embedding the constants instead of computing log10 keeps the module
# log-free / engine-portable).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_profile(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    fabricated-data / unit-mix tripwire for numeric QA (price columns,
    transaction amounts, populations follow it; uniform or invented data
    does not).

    One row per digit 1-9: (digit, cnt, share_ppm, benford_ppm,
    dev_ppm = |share − benford|). Rows with NULL/zero/non-finite values
    are excluded (they have no first significant digit). The first
    digit is extracted lexically from the canonical float rendering —
    regexp on the absolute value's digits, engine-agnostic — and all
    shares are exact integer ppm.

    Plan shape at scale: one narrow projection + groupBy(digit) with
    map-side partials (9 output rows), one 1-row total broadcast back.
    """
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in DataFrame")
    c = F.col(col).cast("double")
    digit = F.regexp_extract(
        F.regexp_replace(F.abs(c).cast("string"), r"[^1-9]", ""), r"^([1-9])", 1
    )
    cnts = (
        df.filter(c.isNotNull() & ~F.isnan(c) & (c != 0))
        .select(digit.alias("__d"))
        .filter(F.col("__d") != "")
        .groupBy("__d")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = cnts.agg(F.sum("cnt").alias("__n"))
    bt = F.create_map(
        *[x for d, p in _BENFORD_PPM.items() for x in (F.lit(str(d)), F.lit(p))]
    )
    return (
        cnts.crossJoin(F.broadcast(tot))
        .select(
            F.col("__d").cast("int").alias("digit"),
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("(1000000 * cnt) div __n").alias("share_ppm"),
            bt[F.col("__d")].cast("long").alias("benford_ppm"),
        )
        .withColumn(
            "dev_ppm", F.abs(F.col("share_ppm") - F.col("benford_ppm"))
        )
    )


def benford_profile_oracle_sql(table: str, col: str) -> str:
    """DuckDB replica of :func:`benford_profile` (same lexical digit
    extraction, same embedded ppm constants)."""
    cases = " ".join(
        f"WHEN '{d}' THEN {p}" for d, p in _BENFORD_PPM.items()
    )
    return f"""
WITH v AS (
    SELECT regexp_extract(
               regexp_replace(CAST(abs(CAST({col} AS DOUBLE)) AS VARCHAR), '[^1-9]', '', 'g'),
               '^([1-9])', 1) AS d
    FROM {table}
    WHERE {col} IS NOT NULL AND NOT isnan(CAST({col} AS DOUBLE))
      AND CAST({col} AS DOUBLE) != 0
), c AS (
    SELECT d, count(*) AS cnt FROM v WHERE d != '' GROUP BY d
), n AS (SELECT sum(cnt) AS n FROM c)
SELECT CAST(d AS INT) AS digit, CAST(cnt AS BIGINT) AS cnt,
       CAST((1000000 * cnt) // (SELECT n FROM n) AS BIGINT) AS share_ppm,
       CAST(CASE d {cases} END AS BIGINT) AS benford_ppm,
       CAST(abs((1000000 * cnt) // (SELECT n FROM n)
                - (CASE d {cases} END)) AS BIGINT) AS dev_ppm
FROM c
"""


def numeric_correlation(
    df: DataFrame,
    cols: list[str],
    scale: int = 1000,
) -> DataFrame:
    """Exact Pearson correlation screen over a list of numeric columns —
    the multivariate companion of :func:`chi2_independence` for the
    feature-audit pass ("which numeric features are redundant / leak
    each other") over a training table.

    Engine-portable by the module's discipline: values are floored to
    ``scale`` fixed-point before any product, so everything emitted is an
    exact integer — the correlation NUMERATOR ``n·Σxy − Σx·Σy`` and the
    two variance terms ``n·Σx² − (Σx)²`` — never a float or a sqrt
    (sqrt's final ulp differs across libms). One row per pair i < j:

        (col_a, col_b, n, corr_num, var_a_num, var_b_num)

    with corr = corr_num / sqrt(var_a_num · var_b_num) computed by the
    caller at the boundary. Rows with a NULL in ANY listed column are
    excluded (complete-case, the standard correlation-matrix contract).

    Plan shape: delegates to similarity.embedding_covariance — the
    columns become one array, upper-triangle products are built JVM-side
    and partial-aggregated, shuffle O(partitions · k²) for k columns.
    """
    from aleph2_contrib_spark.operators.similarity import embedding_covariance

    if len(cols) < 2:
        raise ValueError("need at least 2 columns")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    vec = F.array(*[F.col(c).cast("double") for c in cols])
    complete = df.filter(
        ~F.exists(vec, lambda x: x.isNull())
    ).select(vec.alias("__v"))
    cov = embedding_covariance(complete, "__v", dim=len(cols), scale=scale)
    diag = cov.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("__d"),
        (
            F.col("n").cast("decimal(38,0)") * F.col("sum_xy_fx2")
            - F.col("sum_x_fx") * F.col("sum_x_fx")
        ).alias("__var"),
    )
    names = F.array(*[F.lit(c) for c in cols])
    off = cov.filter(F.col("i") < F.col("j"))
    return (
        off.join(F.broadcast(diag.withColumnRenamed("__d", "i")), "i")
        .withColumnRenamed("__var", "__var_a")
        .join(
            F.broadcast(
                diag.withColumnRenamed("__d", "j").withColumnRenamed("__var", "__var_b")
            ),
            "j",
        )
        .select(
            F.element_at(names, F.col("i") + 1).alias("col_a"),
            F.element_at(names, F.col("j") + 1).alias("col_b"),
            "n",
            F.col("cov_num_fx2").alias("corr_num"),
            F.col("__var_a").cast("decimal(38,0)").alias("var_a_num"),
            F.col("__var_b").cast("decimal(38,0)").alias("var_b_num"),
        )
    )


def numeric_correlation_oracle_sql(
    table: str, cols: list[str], scale: int = 1000
) -> str:
    """DuckDB replica of :func:`numeric_correlation` (HUGEINT sums, same
    fixed-point floors, complete-case filter)."""
    k = len(cols)
    fx = ", ".join(
        f"CAST(floor(CAST({c} AS DOUBLE) * {int(scale)}) AS BIGINT) AS x{i}"
        for i, c in enumerate(cols)
    )
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    sums = ", ".join(
        [f"CAST(count(*) AS BIGINT) AS n"]
        + [f"CAST(sum(x{i}) AS HUGEINT) AS s{i}" for i in range(k)]
        + [
            f"sum(CAST(x{i} AS HUGEINT) * x{j}) AS p{i}_{j}"
            for i in range(k)
            for j in range(i, k)
        ]
    )
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            rows.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b, n,"
                f" CAST(n * p{i}_{j} - s{i} * s{j} AS DECIMAL(38,0)) AS corr_num,"
                f" CAST(n * p{i}_{i} - s{i} * s{i} AS DECIMAL(38,0)) AS var_a_num,"
                f" CAST(n * p{j}_{j} - s{j} * s{j} AS DECIMAL(38,0)) AS var_b_num"
                f" FROM agg"
            )
    body = " UNION ALL ".join(rows)
    return f"""
WITH base AS (
    SELECT {fx} FROM {table} WHERE {notnull}
), agg AS MATERIALIZED (
    SELECT {sums} FROM base
)
{body}
"""


def categorical_gini(df: DataFrame, cols: list[str]) -> DataFrame:
    """Gini impurity per categorical column — the log-free diversity
    screen ("is this label column degenerate? how mixed is source?") a
    feature audit runs next to :func:`key_skew`. Chosen over Shannon
    entropy deliberately: gini = 1 − Σ(c/n)² is RATIONAL, so
    ``gini_ppm = (10⁶·(n² − Σc²)) div n²`` is exact integer arithmetic
    end-to-end and engine-portable (ln() differs in final ulps across
    libms — the same reasoning as chi2_independence). NULL counts as a
    real category (matching key_skew).

    One row per column: (col_name, n, n_categories, gini_ppm) — 0 for a
    single-value column, → 10⁶·(1−1/k) for k uniform categories.

    Plan shape at scale: one groupBy per column with map-side partials
    (output = distinct categories), then a 1-row aggregate; Σc² in
    DECIMAL(38,0) is exact to ~10¹⁹-row columns.
    """
    parts = []
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
        cnts = (
            df.select(
                F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")).alias("__k")
            )
            .groupBy("__k")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        agg = cnts.agg(
            F.sum("__c").cast("decimal(38,0)").alias("__n"),
            F.count(F.lit(1)).alias("__k_cnt"),
            F.sum(F.col("__c").cast("decimal(38,0)") * F.col("__c")).alias("__ss"),
        )
        parts.append(
            agg.select(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("long").alias("n"),
                F.col("__k_cnt").cast("long").alias("n_categories"),
                F.expr(
                    "CAST((1000000 * (__n * __n - __ss)) div (__n * __n) AS BIGINT)"
                ).alias("gini_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def categorical_gini_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB replica of :func:`categorical_gini` (HUGEINT squares)."""
    sels = []
    for c in cols:
        sels.append(f"""
SELECT '{c}' AS col_name, CAST(sum(cc) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_categories,
       CAST((1000000 * (CAST(sum(cc) AS HUGEINT) * sum(cc)
                        - sum(CAST(cc AS HUGEINT) * cc)))
            // (CAST(sum(cc) AS HUGEINT) * sum(cc)) AS BIGINT) AS gini_ppm
FROM (SELECT coalesce(CAST({c} AS VARCHAR), chr(0) || 'NULL') AS k, count(*) AS cc
      FROM {table} GROUP BY 1)""")
    return " UNION ALL ".join(sels)


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Robust per-group outlier screen: flag rows where
    |x − median| > k · MAD (median absolute deviation) — the standard
    robust alternative to z-scores when the groups themselves contain
    the outliers that would corrupt a mean/stddev
    (anomaly_zscore_flags' failure mode on heavy-tailed QA data).

    Exactness contract: LOWER-median convention — the median is the
    actual element at row_number ⌊(n+1)/2⌋ under the total order
    (value, id), never an interpolated average, and MAD is the lower
    median of |x − med| under (deviation, id). Every quantity is either
    a data element or an IEEE-754 double of two data elements
    (subtraction/abs/compare are bit-deterministic), so the flags are
    engine-portable with no summation-order sensitivity.

    Returns the flagged rows only: (id, group, value, med, mad, dev)
    with dev = |value − med| > k·mad.

    Plan shape at 100 TB: three window passes ALL partitioned by the
    group key — one exchange, per-partition sorts, no driver collect,
    no unpartitioned window (test_plan_quality-compatible). Groups are
    processed independently; a single monster group is the caller's
    salting problem, same as any per-group sort.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.col(value_col).cast("double")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        v.alias("__v"),
    ).filter(F.col("__v").isNotNull())

    wg = Window.partitionBy("__g")
    w1 = wg.orderBy(F.col("__v").asc(), F.col("__id").asc())
    pos = ((F.col("__n") + F.lit(1)) / F.lit(2)).cast("long")  # floor: n >= 1
    with_med = (
        base.withColumn("__rn", F.row_number().over(w1))
        .withColumn("__n", F.count(F.lit(1)).over(wg))
        .withColumn(
            "__med",
            F.max(F.when(F.col("__rn") == pos, F.col("__v"))).over(wg),
        )
        .withColumn("__dev", F.abs(F.col("__v") - F.col("__med")))
    )
    w2 = wg.orderBy(F.col("__dev").asc(), F.col("__id").asc())
    with_mad = with_med.withColumn("__rn2", F.row_number().over(w2)).withColumn(
        "__mad",
        F.max(F.when(F.col("__rn2") == pos, F.col("__dev"))).over(wg),
    )
    return with_mad.filter(
        F.col("__dev") > F.lit(int(k)) * F.col("__mad")
    ).select(
        F.col("__id").alias(id_col),
        F.col("__g").alias(group_col),
        F.col("__v").alias(value_col),
        F.col("__med").alias("med"),
        F.col("__mad").alias("mad"),
        F.col("__dev").alias("dev"),
    )


def mad_outliers_oracle_sql(
    rows_sql: str, group_col: str, value_col: str, id_col: str, k: int = 3
) -> str:
    """DuckDB replica of :func:`mad_outliers` — identical lower-median
    row_number windows and IEEE double deviation arithmetic.
    ``rows_sql`` yields (id, group, value) under those output names."""
    return f"""
WITH base AS (
    SELECT {id_col} AS id, {group_col} AS g, CAST({value_col} AS DOUBLE) AS v
    FROM ({rows_sql}) WHERE {value_col} IS NOT NULL
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
           count(*) OVER (PARTITION BY g) AS n
    FROM base
), med AS (
    SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN v END)
                  OVER (PARTITION BY g) AS med
    FROM ranked
), dev AS (
    SELECT *, abs(v - med) AS dev,
           row_number() OVER (PARTITION BY g ORDER BY abs(v - med), id) AS rn2
    FROM med
), mad AS (
    SELECT *, max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
                  OVER (PARTITION BY g) AS mad
    FROM dev
)
SELECT id AS {id_col}, g AS {group_col}, v AS {value_col}, med, mad, dev
FROM mad WHERE dev > {int(k)} * mad
"""


def null_patterns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Missing-data pattern matrix (R mice/VIM's md.pattern, distributed):
    one row per OBSERVED null-mask combination over ``cols`` — which
    column subsets go missing together — the completeness diagnostic
    that per-column null counts can't express (two columns 10% null each
    may be jointly missing or never co-missing).

    Returns (pattern, n, share_ppm): ``pattern`` is a '0'/'1' string
    aligned with ``cols`` ('1' = non-null), ``share_ppm`` the exact
    integer row share. Plan shape at 100 TB: the mask is a narrow
    projection, then ONE map-side-partial groupBy over at most 2^k tiny
    keys; the share is a window sum over that pattern table (tiny by
    construction — the documented tiny-table window pattern, not a data
    window).
    """
    from pyspark.sql import Window

    if not cols:
        raise ValueError("cols must be non-empty")
    if len(cols) > 20:
        raise ValueError(f"at most 20 pattern columns, got {len(cols)}")
    pattern = F.concat(
        *[F.when(F.col(c).isNotNull(), F.lit("1")).otherwise(F.lit("0")) for c in cols]
    )
    counts = (
        df.select(pattern.alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    return (
        counts.withColumn("__total", total)
        .withColumn(
            "share_ppm", F.expr("CAST((n * 1000000) div __total AS BIGINT)")
        )
        .drop("__total")
    )


def null_patterns_oracle_sql(rows_sql: str, cols: list[str]) -> str:
    """DuckDB replica of :func:`null_patterns`. ``rows_sql`` yields the
    profiled columns."""
    pattern = " || ".join(
        f"CASE WHEN {c} IS NOT NULL THEN '1' ELSE '0' END" for c in cols
    )
    return f"""
WITH counts AS (
    SELECT ({pattern}) AS pattern, CAST(count(*) AS BIGINT) AS n
    FROM ({rows_sql}) GROUP BY 1
)
SELECT pattern, n,
       CAST((n * 1000000) // (sum(n) OVER ()) AS BIGINT) AS share_ppm
FROM counts
"""


def inclusion_deps(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Inclusion-dependency / joinability discovery — the data-catalog
    question "is column A contained in column B, i.e. is this a join
    key?" — for each named (left_df.left_col ⊆ right_df.right_col)
    candidate: distinct left values, how many appear on the right, and
    the exact containment share in ppm (1e6 = a verified inclusion
    dependency / foreign-key candidate).

    NULLs are ignored on both sides (SQL FK semantics). Plan shape at
    100 TB: per pair, two column-pruned distinct aggregates and ONE
    left-semi equi-join on the value — broadcast when the right side's
    distinct set is small, shuffle otherwise (planner's choice); never
    a row-level join of the base tables.
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    parts = []
    for name, ldf, lcol, rdf, rcol in pairs:
        l = ldf.select(F.col(lcol).alias("__v")).filter(
            F.col("__v").isNotNull()
        ).distinct()
        r = rdf.select(F.col(rcol).alias("__v")).filter(
            F.col("__v").isNotNull()
        ).distinct()
        contained = l.join(r, "__v", "left_semi")
        stats = l.agg(F.count(F.lit(1)).cast("long").alias("n_left_distinct")).crossJoin(
            contained.agg(F.count(F.lit(1)).cast("long").alias("n_contained"))
        )
        parts.append(
            stats.select(
                F.lit(name).alias("dep"),
                "n_left_distinct",
                "n_contained",
                F.expr(
                    "CAST(CASE WHEN n_left_distinct > 0 THEN "
                    "(n_contained * 1000000) div n_left_distinct "
                    "ELSE NULL END AS BIGINT)"
                ).alias("containment_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def inclusion_deps_oracle_sql(
    pairs: list[tuple[str, str, str, str, str]],
) -> str:
    """DuckDB replica of :func:`inclusion_deps`. ``pairs`` entries are
    (name, left_table, left_col, right_table, right_col)."""
    from aleph2_contrib_spark.operators import sql_str

    sels = []
    for name, ltab, lcol, rtab, rcol in pairs:
        name = sql_str(name)
        sels.append(f"""
SELECT '{name}' AS dep,
       (SELECT count(DISTINCT {lcol}) FROM {ltab} WHERE {lcol} IS NOT NULL)
           AS n_left_distinct,
       (SELECT count(*) FROM
            (SELECT DISTINCT {lcol} AS v FROM {ltab} WHERE {lcol} IS NOT NULL) l
        WHERE EXISTS (SELECT 1 FROM {rtab} r WHERE r.{rcol} = l.v))
           AS n_contained,
       CAST(((SELECT count(*) FROM
            (SELECT DISTINCT {lcol} AS v FROM {ltab} WHERE {lcol} IS NOT NULL) l
        WHERE EXISTS (SELECT 1 FROM {rtab} r WHERE r.{rcol} = l.v)) * 1000000)
        // (SELECT count(DISTINCT {lcol}) FROM {ltab} WHERE {lcol} IS NOT NULL)
        AS BIGINT) AS containment_ppm""")
    return " UNION ALL ".join(sels)


def format_patterns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Format-pattern discovery — the DQ profiler that finds MIXED value
    formats in a column (three phone formats, two id schemes, stray
    whitespace): each value maps to its shape signature — uppercase
    runs → ``A+``, lowercase runs → ``a+``, digit runs → ``9+``, other
    characters kept verbatim — and shapes are counted per column.
    NULL appears as the '∅' pattern so missingness shows in the same
    report.

    Returns (col_name, pattern, n). The signature regexes are in the
    shared Java∩RE2 dialect with no backreference replacements. Plan
    shape: one narrow signature projection + ONE groupBy per column
    over the (tiny) distinct-shape space; unioned column reports.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    parts = []
    for c in cols:
        sig = F.col(c).cast("string")
        sig = F.regexp_replace(sig, "[A-Z]+", "A+")
        sig = F.regexp_replace(sig, "[a-z]+", "a+")
        sig = F.regexp_replace(sig, "[0-9]+", "9+")
        parts.append(
            df.select(F.coalesce(sig, F.lit("∅")).alias("pattern"))
            .groupBy("pattern")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.lit(c).alias("col_name"), "pattern", "n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def format_patterns_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB replica of :func:`format_patterns`."""
    sels = []
    for c in cols:
        sig = (
            f"regexp_replace(regexp_replace(regexp_replace("
            f"CAST({c} AS VARCHAR), '[A-Z]+', 'A+', 'g'), "
            f"'[a-z]+', 'a+', 'g'), '[0-9]+', '9+', 'g')"
        )
        sels.append(f"""
SELECT '{c}' AS col_name, coalesce({sig}, '∅') AS pattern,
       CAST(count(*) AS BIGINT) AS n
FROM {table} GROUP BY 2""")
    return " UNION ALL ".join(sels)


def ingestion_gaps(
    df: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Ingestion-continuity screen: per source/feed key, the missing
    calendar-day ranges inside its observed span — the "feed went dark
    Tuesday–Thursday" DQ check that per-day row counts bury. A gap is
    a maximal run of days with NO data strictly between two observed
    days.

    Returns (key, gap_start_day, gap_end_day, gap_days), day = days
    since 1970-01-01 UTC. Plan shape: distinct (key, day) — the only
    data-sized pass — then ONE key-partitioned lead() window; gaps
    fall out of consecutive observed days with lead > day + 1.
    """
    day = F.datediff(
        F.to_date(F.col(ts_col).cast("timestamp")), F.lit("1970-01-01").cast("date")
    ).cast("long")
    from pyspark.sql import Window

    ud = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("__k"), day.alias("__day"))
        .distinct()
    )
    w = Window.partitionBy("__k").orderBy(F.col("__day").asc())
    return (
        ud.withColumn("__next", F.lead("__day").over(w))
        .filter(F.col("__next") > F.col("__day") + 1)
        .select(
            F.col("__k").alias(key_col),
            (F.col("__day") + 1).cast("long").alias("gap_start_day"),
            (F.col("__next") - 1).cast("long").alias("gap_end_day"),
            (F.col("__next") - F.col("__day") - 1).cast("long").alias("gap_days"),
        )
    )


def ingestion_gaps_oracle_sql(rows_sql: str, key_col: str) -> str:
    """DuckDB replica of :func:`ingestion_gaps`. ``rows_sql`` yields
    (key, ts) under the output names (k, ts)."""
    return f"""
WITH ud AS (
    SELECT DISTINCT k,
           CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
    FROM ({rows_sql}) WHERE ts IS NOT NULL AND k IS NOT NULL
), nxt AS (
    SELECT k, day, lead(day) OVER (PARTITION BY k ORDER BY day) AS next_day
    FROM ud
)
SELECT k AS {key_col}, CAST(day + 1 AS BIGINT) AS gap_start_day,
       CAST(next_day - 1 AS BIGINT) AS gap_end_day,
       CAST(next_day - day - 1 AS BIGINT) AS gap_days
FROM nxt WHERE next_day > day + 1
"""


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff — the data-ops regression tool ("what changed
    between yesterday's build and today's"): keyed full-outer
    comparison of two table versions, summarized as one row per status:

      added     key in right only
      removed   key in left only
      changed   key in both, any compare column differs (NULL-safe)
      unchanged key in both, all compare columns equal

    Returns (status, n). Exactness: comparisons are NULL-safe equality
    (``<=>``) — no hashing, no float arithmetic, engine-portable for
    any column type.

    Plan shape at 100 TB: ONE full-outer sort-merge/hash join on the
    key (both sides column-pruned to key + compare cols) + a map-side-
    partial groupBy over 4 statuses. For repeated diffing, bucket both
    snapshots by the key to make the join co-located.
    """
    if not key_cols or not compare_cols:
        raise ValueError("key_cols and compare_cols must be non-empty")
    l = left.select(
        *[F.col(k).alias(f"__lk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__lv_{c}") for c in compare_cols],
        F.lit(1).alias("__l"),
    )
    r = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__rv_{c}") for c in compare_cols],
        F.lit(1).alias("__r"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__lk_{k}").eqNullSafe(F.col(f"__rk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = l.join(r, cond, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"__lv_{c}").eqNullSafe(F.col(f"__rv_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(F.col("__l").isNull(), F.lit("added"))
        .when(F.col("__r").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def table_diff_oracle_sql(
    left_sql: str,
    right_sql: str,
    key_cols: list[str],
    compare_cols: list[str],
) -> str:
    """DuckDB replica of :func:`table_diff` (IS NOT DISTINCT FROM =
    Spark's <=>)."""
    on = " AND ".join(
        f"l.{k} IS NOT DISTINCT FROM r.{k}" for k in key_cols
    )
    same = " AND ".join(
        f"l.{c} IS NOT DISTINCT FROM r.{c}" for c in compare_cols
    )
    return f"""
WITH j AS (
    SELECT CASE WHEN l.__l IS NULL THEN 'added'
                WHEN r.__r IS NULL THEN 'removed'
                WHEN {same} THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM (SELECT *, 1 AS __l FROM ({left_sql})) l
    FULL OUTER JOIN (SELECT *, 1 AS __r FROM ({right_sql})) r
      ON {on}
)
SELECT status, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY status
"""


def key_discovery(df: DataFrame, cols: list[str]) -> DataFrame:
    """Candidate-key discovery — the profiler step schema tooling runs
    before declaring primary keys or choosing partition/bucket columns:
    per column, exact row/non-null/distinct counts and whether the
    column is a unique key (every row non-null and distinct).

    Output (column, n_rows, n_nonnull, n_distinct, is_key), one row per
    profiled column, deterministic order by column name at the caller's
    discretion (the gate compares order-insensitively).

    Plan shape at 100 TB: ONE aggregation pass over the table — all
    count(distinct) measures share the scan via Spark's expand-based
    multi-distinct rewrite (k columns → k-way row expansion, shuffle
    keyed on the grouping-id; exact, no sketch). For very wide tables
    swap in HLL sketches (operators/sketch) and accept the ±2% — this
    operator is the exact form."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
        ]
    wide = df.agg(*aggs)
    longs = []
    for c in cols:
        longs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").cast("long").alias("n_rows"),
                F.col(f"__nn_{c}").cast("long").alias("n_nonnull"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                (
                    (F.col(f"__nd_{c}") == F.col(f"__n_{c}"))
                    & (F.col(f"__nn_{c}") == F.col(f"__n_{c}"))
                ).alias("is_key"),
            )
        )
    return wide.select(F.explode(F.array(*longs)).alias("p")).select("p.*")


def key_discovery_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB replica of :func:`key_discovery` (count(DISTINCT) exact)."""
    parts = [
        f"SELECT '{c}' AS column, CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(count({c}) AS BIGINT) AS n_nonnull,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
        f" count(DISTINCT {c}) = count(*) AND count({c}) = count(*) AS is_key"
        f" FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def monotonicity_profile(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Per-column sequence-direction census — the data-quality check a
    pipeline runs on columns EXPECTED to be monotone within a key
    (event timestamps per user, version counters per entity, running
    balances per account) before trusting incremental/as-of logic built
    on that assumption.

    Rows are ordered within each ``key_col`` group by ``order_cols``
    (pass a unique tiebreaker last — e.g. the event id — so the
    sequence, and therefore every adjacent pair, is identical on both
    engines). For each profiled column, over all ADJACENT pairs where
    both sides are non-null:

        (column, n_pairs, n_rises, n_flat, n_drops, drop_ppm, verdict)

    verdict ∈ non_decreasing | non_increasing | constant | mixed —
    decided purely from the exact pair counts (constant when all flat,
    non_decreasing when no drops, non_increasing when no rises).
    drop_ppm = (n_drops · 1e6) div n_pairs, truncating division.
    NULL-adjacent pairs are excluded from all counts (a NULL is a
    missing reading, not an inversion).

    Plan shape at 100 TB: ONE key shuffle (the lag window over
    key/order), then a 1-row-per-column global aggregate — partial
    aggregation makes the census map-side; no joins, no second shuffle.
    The k profiled columns ride the same window pass.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    lagged = df.select(
        *[
            x
            for c in value_cols
            for x in (
                F.col(c).alias(f"__v_{c}"),
                F.lag(F.col(c)).over(w).alias(f"__p_{c}"),
            )
        ]
    )
    aggs = []
    for c in value_cols:
        v, p = F.col(f"__v_{c}"), F.col(f"__p_{c}")
        ok = v.isNotNull() & p.isNotNull()
        aggs += [
            F.sum(ok.cast("long")).alias(f"__n_{c}"),
            F.sum((ok & (v > p)).cast("long")).alias(f"__r_{c}"),
            F.sum((ok & (v == p)).cast("long")).alias(f"__f_{c}"),
            F.sum((ok & (v < p)).cast("long")).alias(f"__d_{c}"),
        ]
    wide = lagged.agg(*aggs)
    longs = []
    for c in value_cols:
        n, r = F.col(f"__n_{c}"), F.col(f"__r_{c}")
        fl, d = F.col(f"__f_{c}"), F.col(f"__d_{c}")
        longs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(n, F.lit(0)).cast("long").alias("n_pairs"),
                F.coalesce(r, F.lit(0)).cast("long").alias("n_rises"),
                F.coalesce(fl, F.lit(0)).cast("long").alias("n_flat"),
                F.coalesce(d, F.lit(0)).cast("long").alias("n_drops"),
                F.when(n > 0, F.expr(f"CAST((__d_{c} * 1000000) div __n_{c} AS BIGINT)"))
                .otherwise(F.lit(0).cast("long"))
                .alias("drop_ppm"),
                F.when((n > 0) & (fl == n), F.lit("constant"))
                .when((n > 0) & (d == 0), F.lit("non_decreasing"))
                .when((n > 0) & (r == 0), F.lit("non_increasing"))
                .otherwise(F.lit("mixed"))
                .alias("verdict"),
            )
        )
    return wide.select(F.explode(F.array(*longs)).alias("m")).select("m.*")


def monotonicity_profile_oracle_sql(
    table_sql: str,
    key_col: str,
    order_cols: list[str],
    value_cols: list[str],
) -> str:
    """DuckDB replica of :func:`monotonicity_profile` — identical lag
    windows, identical truncating division and verdict ladder."""
    order_by = ", ".join(order_cols)
    lag_cols = ", ".join(
        f"lag({c}) OVER (PARTITION BY {key_col} ORDER BY {order_by}) AS p_{c}"
        for c in value_cols
    )
    arms = []
    for c in value_cols:
        arms.append(
            f"SELECT '{c}' AS \"column\","
            f" CAST(coalesce(sum(CASE WHEN {c} IS NOT NULL AND p_{c} IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_pairs,"
            f" CAST(coalesce(sum(CASE WHEN {c} > p_{c} THEN 1 END), 0) AS BIGINT) AS n_rises,"
            f" CAST(coalesce(sum(CASE WHEN {c} = p_{c} THEN 1 END), 0) AS BIGINT) AS n_flat,"
            f" CAST(coalesce(sum(CASE WHEN {c} < p_{c} THEN 1 END), 0) AS BIGINT) AS n_drops"
            f" FROM lagged"
        )
    unions = " UNION ALL ".join(arms)
    return f"""
WITH lagged AS (
    SELECT *, {lag_cols} FROM ({table_sql})
), census AS (
    {unions}
)
SELECT "column", n_pairs, n_rises, n_flat, n_drops,
       CASE WHEN n_pairs > 0
            THEN CAST((n_drops * 1000000) // n_pairs AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS drop_ppm,
       CASE WHEN n_pairs > 0 AND n_flat = n_pairs THEN 'constant'
            WHEN n_pairs > 0 AND n_drops = 0 THEN 'non_decreasing'
            WHEN n_pairs > 0 AND n_rises = 0 THEN 'non_increasing'
            ELSE 'mixed' END AS verdict
FROM census
"""


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    label_col: str,
    label_a: str,
    label_b: str,
) -> DataFrame:
    """Exact Mann–Whitney U (Wilcoxon rank-sum) statistic between two
    slices of one numeric column — the nonparametric "did the
    distribution shift" test a pipeline runs when means are ruled by
    outliers. Everything stays in INTEGER arithmetic by carrying ranks
    DOUBLED: a tie group occupying ranks r..r+c−1 has average rank
    r + (c−1)/2, so 2·avg = 2r + c − 1 is always integral, and

        2·R_a = Σ_{a} (2·rank),   2·U_a = 2·R_a − n_a(n_a+1)

    One row out: (n_a, n_b, u2_a, u2_b, cles_a_ppm) — u2_* are the
    DOUBLED U statistics (u2_a + u2_b = 2·n_a·n_b, asserted by the
    algebra), cles_a_ppm = (u2_a · 1e6) div (2·n_a·n_b) is the
    common-language effect size P(a > b) (+½P(=)) in exact ppm.
    NULL values drop. The caller brings the normal approximation if a
    p-value is wanted — the STATISTIC is the exact, engine-portable
    part.

    Plan shape: one global rank window over the combined slices (a
    single-partition sort — the standard cost of an exact global rank;
    at 100 TB use the two-phase range-partitioned rank of
    `corpus.rank_normalize`), then ONE aggregation.
    """
    base = df.filter(
        F.col(value_col).isNotNull()
        & F.col(label_col).isin([label_a, label_b])
    ).select(
        F.col(label_col).alias("lbl"), F.col(value_col).alias("v")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("v").asc())
    wt = Window.partitionBy("v")
    ranked = base.select(
        "lbl",
        (2 * F.rank().over(w) + F.count(F.lit(1)).over(wt) - 1).alias("r2"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("lbl") == label_a, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("lbl") == label_b, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("lbl") == label_a, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("r2_a"),
    )
    return agg.select(
        "n_a",
        "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long")
        .alias("u2_a"),
        (
            2 * F.col("n_a") * F.col("n_b")
            - (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        )
        .cast("long")
        .alias("u2_b"),
        F.expr(
            "CAST(((r2_a - n_a * (n_a + 1)) * 1000000)"
            " div (2 * n_a * n_b) AS BIGINT)"
        ).alias("cles_a_ppm"),
    )


def mann_whitney_u_oracle_sql(
    rows_sql: str, label_a: str, label_b: str
) -> str:
    """DuckDB replica of :func:`mann_whitney_u`. ``rows_sql`` yields
    (lbl, v); identical doubled-rank arithmetic."""
    return f"""
WITH base AS (
    SELECT lbl, v FROM ({rows_sql})
    WHERE v IS NOT NULL AND lbl IN ('{label_a}', '{label_b}')
), ranked AS (
    SELECT lbl,
           2 * rank() OVER (ORDER BY v ASC)
           + count(*) OVER (PARTITION BY v) - 1 AS r2
    FROM base
), agg AS (
    SELECT CAST(sum(CASE WHEN lbl = '{label_a}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN lbl = '{label_b}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN lbl = '{label_a}' THEN r2 ELSE 0 END) AS BIGINT) AS r2_a
    FROM ranked
)
SELECT n_a, n_b,
       CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       CAST(2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS BIGINT) AS u2_b,
       CAST(((r2_a - n_a * (n_a + 1)) * 1000000) // (2 * n_a * n_b)
            AS BIGINT) AS cles_a_ppm
FROM agg
"""


def lorenz_gini(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Exact Gini concentration coefficient of a non-negative numeric
    column per group — "how concentrated is revenue across orders /
    spend across users", the inequality screen behind skew decisions
    (a group with gini → 1 is one hot entity wearing a group key).
    Uses the rank form (equivalent to the Lorenz-curve area):

        G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x)      x sorted ASC

    carried in exact integers: values enter as CENTS
    (floor(value·100)), ranks come from one per-group window, and the
    output is gini_f6 = floor-division of the 1e6-scaled numerator —
    bit-identical on both engines. Σ i·x is tie-order independent
    (swapping equal values leaves the sum unchanged), so no tiebreak
    column is needed. Groups with Σx = 0 or n = 0 yield NULL.

    At gate scale the Σ i·x product tops out well inside BIGINT
    (n·max_cents·n ≈ 1e14 at sf0.1); a 100 TB deployment with
    billions of rows per group moves the two sums to DECIMAL(38,0)
    and ships the result through the digit-string boundary
    (functions/gate_types) — same arithmetic, wider registers.

    Plan shape: ONE per-group rank window (key shuffle) + ONE groupBy.
    """
    from pyspark.sql import Window

    cents = F.floor(F.col(value_col).cast("decimal(38,6)") * 100).cast("long")
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), cents.alias("__c"))
        .withColumn(
            "__i",
            F.row_number().over(
                Window.partitionBy("g").orderBy(F.col("__c").asc())
            ),
        )
    )
    agg = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__c").cast("long").alias("sum_c"),
        F.sum(F.col("__i") * F.col("__c")).cast("long").alias("sum_ic"),
    )
    # the 1e6-scaled numerator exceeds BIGINT at realistic group sizes
    # (n²·cents·1e6) — widen to DECIMAL(38,0) for the division only;
    # the quotient (≤ 1e6) comes back as BIGINT
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        "sum_c",
        F.when(
            (F.col("n") > 0) & (F.col("sum_c") > 0),
            F.expr(
                "CAST((CAST(2 * sum_ic - (n + 1) * sum_c AS DECIMAL(38,0))"
                " * 1000000) div (CAST(n AS DECIMAL(38,0)) * sum_c)"
                " AS BIGINT)"
            ),
        ).alias("gini_f6"),
    )


def lorenz_gini_oracle_sql(rows_sql: str, group_out: str) -> str:
    """DuckDB replica of :func:`lorenz_gini`. ``rows_sql`` yields
    (g, value)."""
    return f"""
WITH base AS (
    SELECT g, CAST(floor(CAST(value AS DECIMAL(38,6)) * 100) AS BIGINT) AS c
    FROM ({rows_sql}) WHERE value IS NOT NULL
), ranked AS (
    SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c ASC) AS i
    FROM base
), agg AS (
    SELECT g, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(c) AS BIGINT) AS sum_c,
           CAST(sum(i * c) AS BIGINT) AS sum_ic
    FROM ranked GROUP BY g
)
SELECT g AS {group_out}, n, sum_c,
       CASE WHEN n > 0 AND sum_c > 0 THEN
            CAST((CAST(2 * sum_ic - (n + 1) * sum_c AS HUGEINT) * 1000000)
                 // (CAST(n AS HUGEINT) * sum_c) AS BIGINT)
       END AS gini_f6
FROM agg
"""


def null_rate_trend(
    df: DataFrame,
    time_col: str,
    cols: list[str],
    bucket: str = "day",
) -> DataFrame:
    """Completeness drift — null-rate per column per time bucket, the
    trend view a data-quality monitor alarms on (a column that was 1 %
    null forever and is 40 % null today is an upstream break, invisible
    to the GLOBAL census of ``null_patterns``). One long-format row per
    (bucket, column):

        (bucket_day, column, n_rows, n_null, null_ppm)

    with null_ppm = (n_null · 1e6) div n_rows, truncating. Bucketing
    is calendar DATE truncation (identical in both engines); the k
    profiled columns ride one conditional-aggregation pass.

    Plan shape: ONE groupBy(bucket) with 2k partial-agged measures,
    then a k-way literal explode of the wide row — no second shuffle.
    """
    d = F.to_date(F.col(time_col).cast("timestamp"))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"))
    wide = df.groupBy(d.alias("bucket_day")).agg(*aggs)
    longs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__nn_{c}").cast("long").alias("n_null"),
            F.expr(f"CAST((__nn_{c} * 1000000) div __n AS BIGINT)").alias(
                "null_ppm"
            ),
        )
        for c in cols
    ]
    return wide.select(
        "bucket_day", F.explode(F.array(*longs)).alias("m")
    ).select("bucket_day", "m.*")


def null_rate_trend_oracle_sql(rows_sql: str, cols: list[str]) -> str:
    """DuckDB replica of :func:`null_rate_trend`. ``rows_sql`` yields
    (ts, *cols)."""
    arms = []
    for c in cols:
        arms.append(
            f"SELECT CAST(ts AS TIMESTAMP)::DATE AS bucket_day,"
            f" '{c}' AS \"column\","
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_null,"
            f" CAST((sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) * 1000000)"
            f" // count(*) AS BIGINT) AS null_ppm"
            f" FROM ({rows_sql}) GROUP BY 1"
        )
    return " UNION ALL ".join(arms)
