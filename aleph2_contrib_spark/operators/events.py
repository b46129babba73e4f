"""Event-sequence analytics: ordered funnels over per-user event streams.

The reference's analytics surface delegates event aggregation to its
backing stores; funnel analysis (how many users performed step A, then B
at-or-after A, then C at-or-after B, ...) is the canonical ordered-
sequence aggregate of that family, re-expressed Spark-first.

Plan shape at scale: ONE shuffle on the user key; every funnel step is a
windowed min over that same partitioning (no orderBy in the window spec,
so no per-partition sort), and Catalyst reuses the single exchange
across the chained window nodes. Nothing is ever joined per-event —
shuffle volume is the event stream once.

Semantics: step i's timestamp is the EARLIEST event of that step type
at-or-after step i-1's timestamp (inclusive ``>=`` — simultaneous events
of DIFFERENT types count as ordered); a user whose chain breaks has
nulls from that step on. When two CONSECUTIVE steps share the same event
type (view → view), the second requires a strictly later timestamp —
otherwise the single event that produced step i-1 would satisfy step i
too, and a one-view user would count as having viewed twice.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Per-user step-completion times: (user, t_0 .. t_{k-1})."""
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    # only funnel-relevant event types can satisfy any condition — filter
    # BEFORE the shuffle (on a real event stream the steps are a few
    # percent of traffic, so this shrinks the one shuffle by that factor)
    out = df.filter(F.col(type_col).isin(list(steps))).select(user_col, ts_col, type_col)
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if i > 0:
            prev = F.col(f"__t{i - 1}")
            # strict > for a repeated step type: the event that produced
            # step i-1 must not also satisfy step i
            later = (
                (F.col(ts_col) > prev)
                if step == steps[i - 1]
                else (F.col(ts_col) >= prev)
            )
            cond = cond & prev.isNotNull() & later
        out = out.withColumn(f"__t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
    return out.groupBy(user_col).agg(
        *[F.min(f"__t{i}").alias(f"t_{i}") for i in range(len(steps))]
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel summary: one row per step — (step_idx, step, n_users) where
    n_users = users who completed steps 0..i in order. A single 1-row
    aggregate pivoted to rows (the per-step counts travel as one tiny
    row; no per-step jobs)."""
    times = funnel_times(df, user_col, ts_col, type_col, steps)
    agg = times.agg(
        *[
            F.count(F.when(F.col(f"t_{i}").isNotNull(), 1)).alias(f"n_{i}")
            for i in range(len(steps))
        ]
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step_idx"),
                        F.lit(step).alias("step"),
                        F.col(f"n_{i}").alias("n_users"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.step_idx", "s.step", "s.n_users")


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from an event/snapshot
    stream: per key, collapse consecutive runs of the same attribute
    value into validity intervals — the change-tracking companion to the
    commit-log change feed (sources/txlog.py), and the classic
    gaps-and-islands problem re-expressed as two chained windows over
    ONE exchange.

    Returns (key, attr, valid_from, valid_to, n_obs, version) where
    ``valid_from`` is the first observation of a run, ``valid_to`` the
    first observation of the NEXT run (NULL while current — half-open
    intervals chain exactly), ``n_obs`` the observations inside the run,
    and ``version`` the 1-based run ordinal per key.

    Determinism: rows are ordered by (ts, tiebreak); with same-timestamp
    observations of different attrs, the tiebreak decides run membership
    — pass a unique column (an id) or the result would depend on
    partition order.

    Plan shape at scale: one shuffle on key; both windows (lag to mark
    run starts, running sum to number runs) and the final groupBy all
    share that exchange. Shuffled bytes = the observation stream once;
    no joins, no all-pairs, no driver state.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    # lag(attr) is NULL both for "no previous row" and "previous attr is
    # NULL" — eqNullSafe alone would let a key whose FIRST attr is NULL
    # merge with the nonexistent predecessor and start runs at 0. Lag a
    # constant marker to detect the true first row.
    runs = (
        df.withColumn(
            "__new_run",
            F.when(F.lag(F.lit(1)).over(w).isNull(), 1)
            .when(F.lag(F.col(attr_col)).over(w).eqNullSafe(F.col(attr_col)), 0)
            .otherwise(1),
        )
        .withColumn("__run", F.sum("__new_run").over(w))
    )
    grouped = runs.groupBy(F.col(key_col).alias("key"), F.col("__run")).agg(
        F.first(F.col(attr_col)).alias("attr"),
        F.min(F.col(ts_col)).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w2 = Window.partitionBy("key").orderBy(F.col("valid_from").asc(), F.col("__run").asc())
    return grouped.select(
        "key",
        "attr",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_obs",
        F.col("__run").cast("int").alias("version"),
    )


def basket_pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_n: int = 20,
    min_pair_support: int = 2,
) -> DataFrame:
    """Association mining over transactions: top item pairs by LIFT
    (observed co-occurrence over the independence expectation) — the
    frequent-itemset analytic behind "bought together" and feature
    co-occurrence audits.

        lift(a,b) = P(a,b) / (P(a)·P(b))
                  = c(a,b) · n_baskets / (c(a) · c(b))

    reported as floor(lift · 10⁶) — an exact integer expression over
    exact counts, so the ranking is engine-portable bit-for-bit.
    Returns (item_a, item_b, pair_cnt, lift_f6) with item_a < item_b,
    top-N by (lift desc, item_a, item_b) — a deterministic cut.

    Plan shape at scale: one groupBy(basket) collecting the DISTINCT
    item set (map-side partial; baskets are small), a narrow local pair
    expansion (quadratic only in basket size, never corpus size), one
    groupBy(pair) with partial counts, and two slim joins against the
    per-item count table (broadcast when stats allow). The final top-N
    compiles to TakeOrderedAndProject. No all-pairs of the catalog.
    """
    bi = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).dropDuplicates(["b", "i"])
    n_baskets = bi.select("b").distinct().count()
    item_cnt = bi.groupBy("i").agg(F.count(F.lit(1)).alias("ci"))
    sets = bi.groupBy("b").agg(F.sort_array(F.collect_set("i")).alias("items"))
    items = F.col("items")
    n = F.size(items)
    pairs = (
        sets.filter(n >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.transform(
                            F.sequence(i + 1, n),
                            lambda j: F.struct(
                                F.element_at(items, i).alias("item_a"),
                                F.element_at(items, j).alias("item_b"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_pair_support)
    )
    ca = item_cnt.select(F.col("i").alias("item_a"), F.col("ci").alias("ca"))
    cb = item_cnt.select(F.col("i").alias("item_b"), F.col("ci").alias("cb"))
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .withColumn(
            "__num",
            F.lit(1000000).cast("decimal(38,0)")
            * F.col("pair_cnt").cast("decimal(38,0)")
            * F.lit(int(n_baskets)).cast("decimal(38,0)"),
        )
        .withColumn(
            "__den",
            F.col("ca").cast("decimal(38,0)") * F.col("cb").cast("decimal(38,0)"),
        )
        # integral `div`, not float /: the numerator can exceed 2^53, where
        # a double division would round before the floor — div stays exact
        # in any engine (DuckDB mirrors it with HUGEINT //)
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            F.expr("CAST(__num div __den AS BIGINT)").alias("lift_f6"),
        )
        .orderBy(F.col("lift_f6").desc(), F.col("item_a").asc(), F.col("item_b").asc())
        .limit(top_n)
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix — the standard product-analytics
    rollup: users are grouped into the week of their FIRST event (their
    cohort); for every (cohort_week, offset) cell, the number of cohort
    users active ``offset`` weeks later. Generalizes the reference's
    temporal bucketing (grouping_time_period index routing,
    ElasticsearchContext.java:532-546) from storage layout to an
    analytic rollup over it.

    Returns (cohort, offset_weeks, n_users), offset 0 = the cohort week
    itself (n_users there = cohort size).

    Plan shape at scale: one shuffle keyed on the user (window-min for
    the cohort anchor), one distinct over (user, cohort, week) that
    reuses the same hash partitioning, then a tiny cohort×offset
    aggregate — no self-joins, no per-week passes. Offsets use integral
    ``div`` on day counts (both sides are week-truncated, so the
    division is exact in any engine)."""
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    base = df.select(F.col(user_col).alias("u"), wk.alias("wk"))
    anch = base.withColumn("cohort", F.min("wk").over(Window.partitionBy("u")))
    active = anch.select("u", "cohort", "wk").distinct()
    return (
        active.groupBy(
            "cohort",
            F.expr("CAST(datediff(wk, cohort) div 7 AS INT)").alias("offset_weeks"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def path_ngrams(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    id_col: str,
    n: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Top event-type n-grams over per-user ordered streams — the
    path-mining analytic behind "what do users do next" and UI-flow
    audits: every length-``n`` run of consecutive events by one user is
    an n-gram; report the ``top_k`` most frequent.

    Returns (path, cnt) with path = types joined by ``>``, ordered by
    (cnt desc, path asc) — a deterministic cut. Ordering within a user
    is (time, id) so simultaneous events are stable.

    Plan shape at scale: ONE shuffle on the user key; the n−1 ``lead``
    columns share the same window spec (one sort, one exchange —
    Catalyst collapses the chained window nodes), the n-gram concat is
    narrow, and the count groupBy is map-side partial over short
    strings. The final cut compiles to TakeOrderedAndProject. No
    self-joins, no per-user collect.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    return (
        df.select(F.concat_ws(">", *steps).alias("path"), steps[-1].alias("__last"))
        .filter(F.col("__last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("path").asc())
        .limit(top_k)
    )


def touch_attribution(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    id_col: str,
    conversion_type: str,
    touch_types: Sequence[str],
    model: str = "last",
) -> DataFrame:
    """First/last-touch conversion attribution: each conversion event is
    credited to the latest (``model="last"``) or earliest
    (``model="first"``) STRICTLY-PRECEDING event of an allowed touch
    type by the same user; conversions with no preceding touch are
    reported under ``(none)``.

    Returns (touch, conversions) — one row per touch type that received
    credit (plus ``(none)``), ordered by (conversions desc, touch asc).

    Plan shape at scale: ONE shuffle on the user key; the credited touch
    is an IGNORE-NULLS last/first over the running frame (UNBOUNDED
    PRECEDING .. 1 PRECEDING) of the conditional touch column — the
    standard no-self-join attribution shape; the final rollup is a tiny
    groupBy over touch types.
    """
    if model not in ("last", "first"):
        raise ValueError("model must be 'last' or 'first'")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(time_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col).isin(*[str(t) for t in touch_types]), F.col(type_col)
    )
    pick = F.last(touch, ignorenulls=True) if model == "last" else F.first(
        touch, ignorenulls=True
    )
    return (
        df.withColumn("__touch", pick.over(w))
        .filter(F.col(type_col) == conversion_type)
        .select(F.coalesce(F.col("__touch"), F.lit("(none)")).alias("touch"))
        .groupBy("touch")
        .agg(F.count(F.lit(1)).alias("conversions"))
        .orderBy(F.col("conversions").desc(), F.col("touch").asc())
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    value_col: str,
    window: int = 8,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (α = 1/2) over each
    event stream — the streaming-metrics smoother (latency trends,
    per-user spend drift) — truncated at ``window`` lags and computed in
    EXACT INTEGER arithmetic so it is engine-portable: with α = 1/2
    every weight is a power of two, so

        ewma_f6(t) = (Σ_k v_f6(t−k) · 2^(window−1−k))
                     div (Σ_k 2^(window−1−k))        over available lags

    where ``v_f6 = floor(value·10⁶)``. Missing lags at the head of a
    stream drop out of BOTH sums (the usual renormalized truncated
    EWMA), so early events average over what exists rather than decaying
    toward zero. Exact integer mult/sum/div — no float-summation or
    pow() drift anywhere.

    Returns every input row's (id, key, ewma_f6). Ordering within a key
    is (time, id) — deterministic under ties.

    Plan shape at scale: ONE shuffle on the key; all ``window`` lag
    columns share the same window spec, so Catalyst keeps a single sort
    and exchange; everything after is narrow integer arithmetic.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    v_f6 = F.floor(F.col(value_col) * F.lit(1000000.0)).cast("long")
    base = df.select(
        F.col(id_col),
        F.col(key_col),
        v_f6.alias("__v0"),
        *[F.lag(v_f6, k).over(w).alias(f"__v{k}") for k in range(1, window)],
    )
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for k in range(window):
        wt = F.lit(1 << (window - 1 - k)).cast("long")
        have = F.col(f"__v{k}").isNotNull()
        num = num + F.when(have, F.col(f"__v{k}") * wt).otherwise(F.lit(0))
        den = den + F.when(have, wt).otherwise(F.lit(0))
    return (
        base.withColumn("__num", num)
        .withColumn("__den", den)
        .select(
            F.col(id_col),
            F.col(key_col),
            # integral div over exact longs, not floor(float /): the
            # weighted sum can exceed 2^53 where double division rounds
            F.expr("__num div __den").cast("long").alias("ewma_f6"),
        )
    )


def autocorrelation(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Lag-k autocorrelation of integer-valued regular series, EXACT: one
    output row per (series key, lag 1..``max_lag``) with

        acf_ppm = floor(1e6 * n²·num / n²·den)

    where num/den are the standard sample-ACF numerator and variance
    denominator and the division FLOORS (a floor is a better-behaved
    quantizer than truncation for a symmetric statistic: uniform bucket
    widths across zero). Both engines' integer division truncates toward
    zero, so the floor is built by shifting: ``(1e6·(num + den)) div den -
    1e6`` — |num| ≤ den by Cauchy-Schwarz, the shifted numerator is
    non-negative, and floor == truncate there. Multiplying
    num and den by n² clears the rational mean x̄ = S/n, so the entire
    computation stays in int64 and is bit-identical across engines (the
    same fixed-point discipline as ewma_smooth / pagerank):

        n²·num(k) = n²·Σ x_t·x_{t+k}  -  n·S·(A_k + B_k)  +  (n-k)·S²
        n²·den    = n²·Σ x_t²         -  n·S²

    with S = Σ x_t, A_k = Σ_{t≤n-k} x_t (heads), B_k = Σ_{t>k} x_t (tails).
    Rows where den = 0 (constant series) or n ≤ k are dropped.

    Overflow note: int64 holds n²·Σx·x′ for n·max|x| up to ~3e9 — series of
    daily counts are safely inside; the caller owns rescaling beyond that.

    Scale design: ONE shuffle — the window partitioned by series key and
    ordered by time computes every lead column; the per-(key, lag) sums are
    then one partial-aggregated groupBy on the same key, so AQE coalesces
    the exchange. Lags are unpivoted with ``stack`` (no per-lag rescan).
    ``time_col`` must be unique per key (pre-aggregate to one row per tick,
    e.g. per day) — ties would make lead() order-dependent.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    from pyspark.sql import Window

    x = F.col("__x")
    df = series.select(
        F.col(key_col).alias("__k"),
        F.col(time_col).alias("__t"),
        F.col(value_col).cast("long").alias("__x"),
    )
    leads = df.select(
        "__k",
        "__x",
        *[
            F.lead("__x", k).over(
                Window.partitionBy("__k").orderBy("__t")
            ).alias(f"__x{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    per_key = leads.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("sxx"),
        *[
            agg
            for k in range(1, max_lag + 1)
            for agg in (
                F.sum(x * F.col(f"__x{k}")).alias(f"sprod{k}"),
                F.sum(F.when(F.col(f"__x{k}").isNotNull(), x)).alias(f"head{k}"),
                F.sum(F.col(f"__x{k}")).alias(f"tail{k}"),
            )
        ],
    )
    stack_args = ", ".join(
        f"{k}, sprod{k}, head{k}, tail{k}" for k in range(1, max_lag + 1)
    )
    unpivoted = per_key.select(
        F.col("__k"),
        "n",
        "s",
        "sxx",
        F.expr(
            f"stack({max_lag}, {stack_args}) AS (lag, sprod, head_sum, tail_sum)"
        ),
    )
    num = (
        F.col("n") * F.col("n") * F.col("sprod")
        - F.col("n") * F.col("s") * (F.col("head_sum") + F.col("tail_sum"))
        + (F.col("n") - F.col("lag")) * F.col("s") * F.col("s")
    )
    den = F.col("n") * F.col("n") * F.col("sxx") - F.col("n") * F.col("s") * F.col("s")
    return (
        unpivoted.filter((F.col("n") > F.col("lag")) & (den != 0))
        .select(
            F.col("__k").alias(key_col),
            F.col("lag").cast("int").alias("lag"),
            F.col("n").cast("long").alias("n"),
            (F.lit(1_000_000) * (num + den)).alias("__num_shifted"),
            den.alias("__den"),
        )
        .select(
            key_col,
            "lag",
            "n",
            (F.expr("__num_shifted div __den") - F.lit(1_000_000)).alias(
                "acf_ppm"
            ),
        )
    )


def autocorrelation_oracle_sql(
    series_sql: str, key_col: str, max_lag: int = 3
) -> str:
    """DuckDB replica of :func:`autocorrelation`. ``series_sql`` must yield
    (key, t, x) with x integral and t unique per key."""
    lead_cols = ", ".join(
        f"lead(x, {k}) OVER (PARTITION BY k ORDER BY t) AS x{k}"
        for k in range(1, max_lag + 1)
    )
    per_lag = " UNION ALL ".join(
        f"SELECT k, n, s, sxx, {k} AS lag, sprod{k} AS sprod,"
        f" head{k} AS head_sum, tail{k} AS tail_sum FROM agg"
        for k in range(1, max_lag + 1)
    )
    aggs = ", ".join(
        f"sum(x * x{k}) AS sprod{k},"
        f" sum(CASE WHEN x{k} IS NOT NULL THEN x END) AS head{k},"
        f" sum(x{k}) AS tail{k}"
        for k in range(1, max_lag + 1)
    )
    return f"""
WITH base AS MATERIALIZED (SELECT * FROM ({series_sql})),
led AS (SELECT k, x, {lead_cols} FROM base),
agg AS MATERIALIZED (
    SELECT k, count(*) AS n, sum(x) AS s, sum(x * x) AS sxx, {aggs}
    FROM led GROUP BY k
),
unp AS ({per_lag})
SELECT k AS {key_col}, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
       CAST((1000000 * ((n*n*sprod - n*s*(head_sum + tail_sum) + (n - lag)*s*s)
                        + (n*n*sxx - n*s*s)))
            // (n*n*sxx - n*s*s) - 1000000 AS BIGINT) AS acf_ppm
FROM unp
WHERE n > lag AND (n*n*sxx - n*s*s) != 0
"""


def cusum_alarms(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    threshold: int,
    slack: int = 0,
) -> DataFrame:
    """One-sided CUSUM change detection over integer series, EXACT: flags
    the ticks where the cumulative positive deviation from the series mean
    exceeds ``threshold``. The textbook recursion S_t = max(0, S_{t-1} +
    (x_t - x̄ - slack)) looks inherently sequential, but has the classic
    closed form

        S_t = P_t - min(0, min_{j≤t} P_j),   P_t = Σ_{i≤t} (x_i - x̄ - slack)

    so it is TWO window functions over one (key, time) ordering — a prefix
    sum and a running min — one shuffle, no recursion, no UDF. Everything
    is scaled by n (the per-key length) to clear the rational mean:
    D_t = n·x_t - S - n·slack keeps the whole computation in int64 and
    bit-identical across engines. Emits the alarm rows
    (key, time, x, cusum_num, n) where cusum_num = n·S_t > n·threshold;
    cusum_num / n is the CUSUM statistic in original units.

    ``time_col`` must be unique per key (pre-aggregate to one row per
    tick). Detecting downward shifts = negate the values.
    """
    from pyspark.sql import Window

    df = series.select(
        F.col(key_col).alias("__k"),
        F.col(time_col).alias("__t"),
        F.col(value_col).cast("long").alias("__x"),
    )
    totals = df.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__x").alias("__s")
    )
    wrun = Window.partitionBy("__k").orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = F.col("__n") * F.col("__x") - F.col("__s") - F.col("__n") * F.lit(int(slack))
    with_p = df.join(totals, "__k").withColumn("__p", F.sum(d).over(wrun))
    cusum = F.col("__p") - F.least(F.lit(0).cast("long"), F.min("__p").over(wrun))
    return (
        with_p.withColumn("__cusum", cusum)
        .filter(F.col("__cusum") > F.col("__n") * F.lit(int(threshold)))
        .select(
            F.col("__k").alias(key_col),
            F.col("__t").alias(time_col),
            F.col("__x").alias("x"),
            F.col("__cusum").alias("cusum_num"),
            F.col("__n").alias("n"),
        )
    )


def cusum_oracle_sql(
    series_sql: str,
    key_col: str,
    time_col: str,
    threshold: int,
    slack: int = 0,
) -> str:
    """DuckDB replica of :func:`cusum_alarms`. ``series_sql`` must yield
    (k, t, x) with x integral and t unique per key."""
    return f"""
WITH base AS MATERIALIZED (SELECT * FROM ({series_sql})),
tot AS MATERIALIZED (SELECT k, count(*) AS n, sum(x) AS s FROM base GROUP BY k),
p AS (
    SELECT b.k, b.t, b.x, tot.n, tot.s,
           sum(tot.n * b.x - tot.s - tot.n * {int(slack)})
               OVER (PARTITION BY b.k ORDER BY b.t
                     ROWS UNBOUNDED PRECEDING) AS pp
    FROM base b JOIN tot ON b.k = tot.k
),
c AS (
    SELECT k, t, x, n,
           pp - least(0, min(pp) OVER (PARTITION BY k ORDER BY t
                                       ROWS UNBOUNDED PRECEDING)) AS cusum_num
    FROM p
)
SELECT k AS {key_col}, t AS {time_col}, CAST(x AS BIGINT) AS x,
       CAST(cusum_num AS BIGINT) AS cusum_num, CAST(n AS BIGINT) AS n
FROM c WHERE cusum_num > n * {int(threshold)}
"""


def trend_slope(
    series: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key ordinary-least-squares trend over integer series, EXACT:
    one row per key with

        slope_ppm     = trunc(1e6 * N / D)        N = n·Σxy − Σx·Σy
        intercept_num = Σy·D − N·Σx               D = n·Σx² − (Σx)²
        intercept_den = n·D

    (intercept = intercept_num / intercept_den — emitted as the exact
    integer rational instead of a float so the result hashes identically
    in every engine; callers divide at the edge). The slope quotient
    truncates toward zero: Spark ``div`` and DuckDB ``//`` both truncate
    integer division (verified on negatives), so the raw operator is
    engine-exact with no correction term.

    Complements ``cusum_alarms``: CUSUM says WHEN a series shifted, the
    trend says how fast it drifts. Keys with fewer than 2 distinct x
    values (D = 0) are dropped.

    Overflow: int64 holds 1e6·N for n·max|x|·max|y| up to ~9e12 — day
    indexes against daily counts are far inside; rescale x/y beyond that.

    Scale: ONE partial-aggregated groupBy on the key — five sums, no
    window, no join; the narrowest possible trend pass at 100 TB.
    """
    x = F.col("__x")
    y = F.col("__y")
    df = series.select(
        F.col(key_col).alias("__k"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    )
    agg = df.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    N = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    D = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    a = (F.lit(1_000_000) * N).alias("__a")
    out = agg.select(
        F.col("__k").alias(key_col),
        F.col("n").cast("long").alias("n"),
        a,
        D.alias("__d"),
        (F.col("sy") * D - N * F.col("sx")).alias("intercept_num"),
        (F.col("n") * D).alias("intercept_den"),
    ).filter(F.col("__d") != 0)
    return out.select(
        key_col,
        "n",
        F.expr("__a div __d").alias("slope_ppm"),
        "intercept_num",
        "intercept_den",
    )


def trend_slope_oracle_sql(series_sql: str, key_col: str) -> str:
    """DuckDB replica of :func:`trend_slope` (``//`` already floors).
    ``series_sql`` must yield (k, x, y) with x/y integral."""
    return f"""
WITH agg AS (
    SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(x * y) AS sxy
    FROM ({series_sql}) GROUP BY k
),
c AS (
    SELECT k, n, n * sxy - sx * sy AS nn, n * sxx - sx * sx AS d, sx, sy
    FROM agg
)
SELECT k AS {key_col}, CAST(n AS BIGINT) AS n,
       CAST((1000000 * nn) // d AS BIGINT) AS slope_ppm,
       CAST(sy * d - nn * sx AS BIGINT) AS intercept_num,
       CAST(n * d AS BIGINT) AS intercept_den
FROM c WHERE d != 0
"""


def sequential_patterns(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    id_col: str,
    min_support: int = 2,
    max_len: int = 3,
) -> DataFrame:
    """GSP/PrefixSpan-family sequential pattern mining over per-user event
    streams: a pattern ``<a,b,c>`` is supported by a user when their
    stream contains events of those types in that order — NOT necessarily
    consecutive (the non-contiguous complement of :func:`path_ngrams`).
    Support counts DISTINCT users, the standard market-basket-over-time
    semantics (reference surface: the enrichment/grouping pipeline mines
    per-entity behavior; this is the canonical sequence analytic on it).

    Returns (pattern, length, support) for lengths 1..max_len (max 3)
    with support >= min_support; pattern is types joined by ``>``.

    Scale design — no per-user subsequence explosion, ever: a length-2
    pattern <a,b> exists in a stream iff first_pos(a) < last_pos(b), and
    a length-3 <a,b,c> iff some b-position sits strictly between
    first_pos(a) and last_pos(c) — so support counting reduces to
    equi-joins over the O(users x |types|) first/last-position table
    (one groupBy of the positioned stream) plus, for length 3, ONE join
    of the positioned events against that table to find the earliest b
    after each first_pos(a) (O(events x |types|) rows, linear in events
    for a bounded type alphabet — event taxonomies are dozens of types,
    not open vocabularies; that assumption is this operator's contract).
    Every stage is a Catalyst equi-join + partial agg; nothing is
    collected, no window wider than the per-user position sort.
    """
    if max_len < 1 or max_len > 3:
        raise ValueError(f"max_len must be 1..3, got {max_len}")
    w = Window.partitionBy(user_col).orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    pos = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.row_number().over(w).alias("p"),
    )
    # first/last position of each type per user: O(users x |types|)
    fl = pos.groupBy("u", "t").agg(
        F.min("p").alias("f"), F.max("p").alias("l")
    )
    parts = []
    l1 = (
        fl.groupBy("t")
        .agg(F.countDistinct("u").alias("support"))
        .select(F.col("t").alias("pattern"), F.lit(1).alias("length"), "support")
    )
    parts.append(l1)
    if max_len >= 2:
        a = fl.select(F.col("u"), F.col("t").alias("ta"), F.col("f"))
        b = fl.select(F.col("u"), F.col("t").alias("tb"), F.col("l"))
        l2 = (
            a.join(b, "u")
            .filter(F.col("f") < F.col("l"))
            .groupBy("ta", "tb")
            .agg(F.countDistinct("u").alias("support"))
            .select(
                F.concat_ws(">", "ta", "tb").alias("pattern"),
                F.lit(2).alias("length"),
                "support",
            )
        )
        parts.append(l2)
    if max_len >= 3:
        a = fl.select(F.col("u"), F.col("t").alias("ta"), F.col("f"))
        # earliest b-position strictly after first_pos(a), per (u, a, b)
        mid = (
            pos.withColumnRenamed("t", "tb")
            .join(a, "u")
            .filter(F.col("p") > F.col("f"))
            .groupBy("u", "ta", "tb")
            .agg(F.min("p").alias("j"))
        )
        c = fl.select(F.col("u"), F.col("t").alias("tc"), F.col("l"))
        l3 = (
            mid.join(c, "u")
            .filter(F.col("l") > F.col("j"))
            .groupBy("ta", "tb", "tc")
            .agg(F.countDistinct("u").alias("support"))
            .select(
                F.concat_ws(">", "ta", "tb", "tc").alias("pattern"),
                F.lit(3).alias("length"),
                "support",
            )
        )
        parts.append(l3)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("support") >= F.lit(int(min_support)))


def sequential_patterns_oracle_sql(
    events_sql: str, min_support: int = 2, max_len: int = 3
) -> str:
    """DuckDB replica of :func:`sequential_patterns`. ``events_sql`` must
    yield (u, t, ts, eid); positions replay the same (ts, eid) order."""
    return f"""
WITH pos AS (
    SELECT u, t, row_number() OVER (PARTITION BY u ORDER BY ts, eid) AS p
    FROM ({events_sql})
), fl AS (
    SELECT u, t, min(p) AS f, max(p) AS l FROM pos GROUP BY u, t
), l1 AS (
    SELECT t AS pattern, 1 AS length, count(DISTINCT u) AS support
    FROM fl GROUP BY t
), l2 AS (
    SELECT a.t || '>' || b.t AS pattern, 2 AS length,
           count(DISTINCT a.u) AS support
    FROM fl a JOIN fl b ON a.u = b.u AND a.f < b.l
    GROUP BY a.t, b.t
), mid AS (
    SELECT pos.u, a.t AS ta, pos.t AS tb, min(pos.p) AS j
    FROM pos JOIN fl a ON pos.u = a.u AND pos.p > a.f
    GROUP BY pos.u, a.t, pos.t
), l3 AS (
    SELECT mid.ta || '>' || mid.tb || '>' || c.t AS pattern, 3 AS length,
           count(DISTINCT mid.u) AS support
    FROM mid JOIN fl c ON mid.u = c.u AND c.l > mid.j
    GROUP BY mid.ta, mid.tb, c.t
), unioned AS (
    SELECT * FROM l1
    {"UNION ALL SELECT * FROM l2" if max_len >= 2 else ""}
    {"UNION ALL SELECT * FROM l3" if max_len >= 3 else ""}
)
SELECT pattern, CAST(length AS INT) AS length,
       CAST(support AS BIGINT) AS support
FROM unioned WHERE support >= {int(min_support)}
"""


def markov_transitions(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    id_col: str,
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each consecutive (from → to) step, the transition count and the
    exact rational probability ``p_ppm = 1e6·cnt div from_total`` — the
    behavioral-model primitive behind next-action prediction and anomaly
    scoring (a path_ngrams(n=2) normalized into a stochastic matrix).

    Integer-exact output (from_type, to_type, cnt, p_ppm); rows with
    cnt < min_count are dropped AFTER the denominator is computed, so
    probabilities still sum (up to floor loss) per from_type.

    Plan shape at scale: ONE shuffle on the user key (lead window),
    groupBy(from, to) with partial aggregation, then a broadcast-sized
    per-from_type total joined back — the matrix is |types|² rows, so
    everything after the first agg is effectively free.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    steps = (
        df.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = steps.groupBy("from_type").agg(F.sum("cnt").alias("__tot"))
    return (
        steps.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("(1000000 * cnt) div __tot").alias("p_ppm"),
        )
        .filter(F.col("cnt") >= F.lit(int(min_count)))
    )


def markov_transitions_oracle_sql(
    events_sql: str, min_count: int = 1
) -> str:
    """DuckDB replica of :func:`markov_transitions`. ``events_sql`` must
    yield (u, t, ts, eid)."""
    return f"""
WITH s AS (
    SELECT t AS from_type,
           lead(t) OVER (PARTITION BY u ORDER BY ts, eid) AS to_type
    FROM ({events_sql})
), c AS (
    SELECT from_type, to_type, count(*) AS cnt FROM s
    WHERE to_type IS NOT NULL GROUP BY 1, 2
), tot AS (
    SELECT from_type, sum(cnt) AS tt FROM c GROUP BY 1
)
SELECT c.from_type, c.to_type, CAST(c.cnt AS BIGINT) AS cnt,
       CAST((1000000 * c.cnt) // t.tt AS BIGINT) AS p_ppm
FROM c JOIN tot t USING (from_type)
WHERE c.cnt >= {int(min_count)}
"""


def funnel_counts_windowed(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    window_seconds: int,
) -> DataFrame:
    """Conversion-window funnel: a user completes step i when SOME
    ordered chain t_0 < t_1 < ... < t_i of the step events exists with
    the whole chain inside ``window_seconds`` of its own anchor t_0 —
    the product-analytics semantics ("signup → activate → purchase
    within 7 days of THAT signup") that :func:`funnel_counts`'s
    unbounded earliest-chain cannot express. Any step-0 occurrence may
    anchor the chain.

    Returns (step_idx, step, n_users) like funnel_counts.

    Exactness: for a FIXED anchor, if any in-window chain exists then
    the greedy earliest-next-step chain exists (only ``t > prev`` and
    ``t <= anchor + W`` constrain a step, so an earlier choice never
    blocks a later step). So the operator tracks, per (user, anchor),
    just the greedy min next-step time — candidate state is
    O(users x step0 occurrences), never a cross product of step events.

    Plan shape at scale: the stream is filtered to funnel-relevant types
    BEFORE its one user-key shuffle; each subsequent step is one
    equi-join on user + a (user, anchor) groupBy-min, all map-side
    partialed. ``steps`` is capped at 5 — funnels are short by nature
    and each step adds a join round.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(steps) > 5:
        raise ValueError("windowed funnels support at most 5 steps")
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    sec = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = (
        df.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("__u"),
            F.col(type_col).alias("__t"),
            sec.alias("__s"),
        )
        .distinct()
    )
    w_us = int(window_seconds) * 1_000_000
    chains = (
        ev.filter(F.col("__t") == steps[0])
        .select("__u", F.col("__s").alias("__anchor"), F.col("__s").alias("__prev"))
    )
    counts = [
        chains.select("__u").distinct().count()
    ]
    for step in steps[1:]:
        nxt = ev.filter(F.col("__t") == F.lit(step)).select(
            "__u", F.col("__s").alias("__n")
        )
        chains = (
            chains.join(nxt, "__u")
            .filter(
                (F.col("__n") > F.col("__prev"))
                & (F.col("__n") <= F.col("__anchor") + F.lit(w_us))
            )
            .groupBy("__u", "__anchor")
            .agg(F.min("__n").alias("__prev"))
        )
        counts.append(chains.select("__u").distinct().count())
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, s, int(n)) for i, (s, n) in enumerate(zip(steps, counts))],
        "step_idx int, step string, n_users long",
    )


def funnel_windowed_oracle_sql(
    events_sql: str, steps: Sequence[str], window_seconds: int
) -> str:
    """DuckDB replica of :func:`funnel_counts_windowed` via direct
    EXISTS-chain joins (the quadratic formulation the operator avoids).
    ``events_sql`` must yield (u, t, s) with s in epoch MICROseconds."""
    from aleph2_contrib_spark.operators import sql_str

    w_us = int(window_seconds) * 1_000_000
    q = [sql_str(s) for s in steps]
    selects = []
    for i, step in enumerate(q):
        joins = ["FROM e e0"]
        conds = [f"e0.t = '{q[0]}'"]
        for j in range(1, i + 1):
            joins.append(f"JOIN e e{j} ON e{j}.u = e0.u")
            conds.append(f"e{j}.t = '{q[j]}'")
            conds.append(f"e{j}.s > e{j-1}.s")
            conds.append(f"e{j}.s <= e0.s + {w_us}")
        selects.append(
            f"SELECT {i} AS step_idx, '{step}' AS step,"
            f" CAST(count(DISTINCT e0.u) AS BIGINT) AS n_users"
            f" {' '.join(joins)} WHERE {' AND '.join(conds)}"
        )
    body = " UNION ALL ".join(selects)
    return f"""
WITH e AS MATERIALIZED (
    SELECT DISTINCT u, t, CAST(s AS BIGINT) AS s FROM ({events_sql})
)
SELECT CAST(step_idx AS INT) AS step_idx, step, n_users FROM ({body})
"""


def _exact_ntile_from_idx(idx_name: str, total: int, n_tiles: int):
    """SQL ``ntile(n)`` reconstructed from a 0-based global rank column
    named ``idx_name``: over ``total`` rows the first ``total mod n``
    tiles get ``total div n + 1`` rows, the rest ``total div n`` —
    identical to Spark/DuckDB ntile, but computable from a distributed
    two-phase rank with NO single-task sort. Pure integer ``div``
    arithmetic, exact at any count."""
    base, rem = divmod(int(total), int(n_tiles))
    if base == 0:
        # fewer rows than tiles: each row is its own tile (SQL semantics)
        return F.expr(f"CAST({idx_name} + 1 AS INT)")
    hi = rem * (base + 1)
    return F.expr(
        f"CAST(CASE WHEN {idx_name} < {hi}"
        f" THEN 1 + ({idx_name} div {base + 1})"
        f" ELSE {1 + rem} + (({idx_name} - {hi}) div {base})"
        f" END AS INT)"
    )


def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic behavioral-cohort labeling: each user scored 1..n_tiles on
    how recently they acted, how often, and how much value they carried,
    then labeled "RFM" (e.g. "111" = best on all three).

    Determinism contract (the module's discipline): "now" is the table's
    max timestamp (no wall clock), recency is exact integer
    microseconds, monetary is the exact DECIMAL sum floored to integer
    cents, and every tile ordering carries ``user_col`` as the final
    tie-break — so tiles are bit-identical in any engine. Tile 1 is
    best (most recent / most frequent / highest value).

    Returns (user, recency_us, frequency, monetary_c, r, f, m, segment).

    Plan shape at scale: one groupBy(user) over the scan (map-side
    partial), a 1-row max-ts broadcast, then THREE two-phase global
    ranks over the per-user table (corpus.global_order_index: range
    partition on the ordering, per-partition row_number, O(partitions)
    driver prefix broadcast back) with each tile derived from the exact
    rank via integer arithmetic (_exact_ntile_from_idx). NEVER an
    unpartitioned ntile window — at hundreds of millions of users a
    single-task sort is the operator that falls over; this shape
    shuffles the per-user aggregate three times and sorts only within
    partitions.
    """
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    from aleph2_contrib_spark.operators.corpus import global_order_index

    sec = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = df.groupBy(F.col(user_col).alias("user")).agg(
        F.max(sec).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.floor(
            F.sum(F.col(value_col).cast("decimal(38,6)")) * 100
        ).cast("long").alias("monetary_c"),
    )
    now = per_user.agg(F.max("__last").alias("__now"))
    scored = (
        per_user.crossJoin(F.broadcast(now))
        .withColumn("recency_us", (F.col("__now") - F.col("__last")).cast("long"))
        .select("user", "recency_us", "frequency", "monetary_c")
        # checkpoint once so the three rank passes (and the count) read
        # materialized blocks instead of re-running the event aggregate
        .localCheckpoint(eager=True)
    )
    total = scored.count()
    # Size the rank passes to the per-USER table, not the session default:
    # ~100k users per range partition keeps each per-partition sort small
    # at scale, while a tiny segment table (the common local/test case)
    # collapses to one partition instead of paying 32-task sampling +
    # shuffle overhead three times. Still never an unpartitioned window —
    # the rank window is always keyed on __pid.
    if num_partitions is None:
        num_partitions = max(
            1,
            min(
                df.sparkSession.sparkContext.defaultParallelism,
                (total + 99_999) // 100_000,
            ),
        )
    orderings = [
        ("r", [F.col("recency_us").asc(), F.col("user").asc()]),
        ("f", [F.col("frequency").desc(), F.col("user").asc()]),
        ("m", [F.col("monetary_c").desc(), F.col("user").asc()]),
    ]
    out = scored
    for tile_col, cols in orderings:
        out = global_order_index(out, cols, num_partitions).withColumn(
            tile_col, _exact_ntile_from_idx("idx", total, n_tiles)
        ).drop("idx")
    out = out.withColumn(
        "segment",
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ),
    )
    return out.select(
        "user", "recency_us", "frequency", "monetary_c", "r", "f", "m", "segment"
    )


def rfm_segments_oracle_sql(
    events_sql: str, n_tiles: int = 4
) -> str:
    """DuckDB replica of :func:`rfm_segments`. ``events_sql`` must yield
    (u, s, v) with s in epoch microseconds."""
    n = int(n_tiles)
    return f"""
WITH per_user AS (
    SELECT u AS "user", max(s) AS last_s,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(floor(sum(CAST(v AS DECIMAL(38,6))) * 100) AS BIGINT) AS monetary_c
    FROM ({events_sql}) GROUP BY u
), now_t AS (SELECT max(last_s) AS now_s FROM per_user),
scored AS (
    SELECT "user", CAST((SELECT now_s FROM now_t) - last_s AS BIGINT) AS recency_us,
           frequency, monetary_c
    FROM per_user
), tiled AS (
    SELECT *,
        ntile({n}) OVER (ORDER BY recency_us ASC, "user" ASC) AS r,
        ntile({n}) OVER (ORDER BY frequency DESC, "user" ASC) AS f,
        ntile({n}) OVER (ORDER BY monetary_c DESC, "user" ASC) AS m
    FROM scored
)
SELECT "user", recency_us, frequency, monetary_c, r, f, m,
       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS segment
FROM tiled
"""


def concurrency_timeline(
    df: DataFrame,
    lo_col: str,
    hi_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concurrency profile of half-open integer intervals [lo, hi): for
    every concurrency level, how much total time the timeline spends at
    it — peak simultaneous sessions / connections / active jobs plus the
    full distribution, the capacity-planning sweep ("how many concurrent
    users must we size for, and for how long").

    Classic +1/−1 boundary sweep, exact: boundaries collapse by
    timestamp FIRST (groupBy(time) sum(delta) — this also removes any
    same-instant ordering ambiguity: a [5,5) interval nets to zero), the
    running sum over time order is the two-phase distributed scan
    (range-partition by time, per-partition window cumsum, driver prefix
    over O(partitions) totals broadcast back — never a single global
    window; same pattern as profile.ks_statistic), and each level's
    duration is the gap to the next boundary, with the cross-partition
    gap closed by an O(partitions) next-first-time carry table.

    Returns (concurrency, total_duration, n_segments) for concurrency >
    0 segments; empty intervals (hi <= lo) contribute nothing. Exact
    integers end to end.
    """
    spark = df.sparkSession
    lo, hi = F.col(lo_col).cast("long"), F.col(hi_col).cast("long")
    iv = df.filter(hi > lo)
    bounds = (
        iv.select(lo.alias("__t"), F.lit(1).alias("__d"))
        .unionByName(iv.select(hi.alias("__t"), F.lit(-1).alias("__d")))
        .groupBy("__t")
        .agg(F.sum("__d").alias("__d"))
    )
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    d = bounds.repartitionByRange(nparts, F.col("__t").asc()).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wl = Window.partitionBy("__pid").orderBy("__t")
    # Eager localCheckpoint, NOT persist: the offsets collected below are
    # keyed by spark_partition_id(), which is only stable if the range
    # partitioning is never re-executed. A plain persist() can lose
    # blocks and silently recompute with RE-SAMPLED range boundaries,
    # corrupting the prefix sums; localCheckpoint cuts lineage so a lost
    # block fails the job instead (same barrier as profile.ks_statistic).
    d = (
        d.withColumn("__local", F.sum("__d").over(w))
        .withColumn("__next_local", F.lead("__t").over(wl))
        .localCheckpoint(eager=True)
    )
    parts = (
        d.groupBy("__pid")
        .agg(F.sum("__d").alias("__tot"), F.min("__t").alias("__first"))
        .collect()
    )
    run, offsets = 0, {}
    ordered = sorted(parts, key=lambda r: r["__pid"])
    for i, row in enumerate(ordered):
        nxt = next(
            (ordered[j]["__first"] for j in range(i + 1, len(ordered))
             if ordered[j]["__first"] is not None),
            None,
        )
        offsets[row["__pid"]] = (run, nxt)
        run += row["__tot"] or 0
    off_df = spark.createDataFrame(
        [(int(p), int(o), nf) for p, (o, nf) in offsets.items()],
        "__pid int, __off long, __next_first long",
    )
    seg = (
        d.join(F.broadcast(off_df), "__pid")
        .select(
            (F.col("__local") + F.col("__off")).alias("concurrency"),
            (
                F.coalesce(F.col("__next_local"), F.col("__next_first"))
                - F.col("__t")
            ).alias("__dur"),
        )
        .filter(F.col("__dur").isNotNull() & (F.col("concurrency") > 0))
    )
    out = seg.groupBy("concurrency").agg(
        F.sum("__dur").cast("long").alias("total_duration"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
    )
    return out.select(
        F.col("concurrency").cast("long").alias("concurrency"),
        "total_duration",
        "n_segments",
    )


def concurrency_timeline_oracle_sql(intervals_sql: str) -> str:
    """DuckDB replica of :func:`concurrency_timeline`. ``intervals_sql``
    must yield (lo, hi) integers."""
    return """
WITH iv AS MATERIALIZED (SELECT lo, hi FROM (%s) WHERE hi > lo),
b AS (
    SELECT t, sum(d) AS d FROM (
        SELECT lo AS t, 1 AS d FROM iv
        UNION ALL
        SELECT hi AS t, -1 AS d FROM iv
    ) GROUP BY t
), c AS (
    SELECT t, sum(d) OVER (ORDER BY t) AS concurrency,
           lead(t) OVER (ORDER BY t) AS nxt
    FROM b
)
SELECT CAST(concurrency AS BIGINT) AS concurrency,
       CAST(sum(nxt - t) AS BIGINT) AS total_duration,
       CAST(count(*) AS BIGINT) AS n_segments
FROM c WHERE nxt IS NOT NULL AND concurrency > 0
GROUP BY concurrency
""" % intervals_sql


def hopping_window_agg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    slide_seconds: int,
) -> DataFrame:
    """Overlapping (hopping/sliding) event-time window aggregation in
    batch form — the moving-average / rolling-rate shape ("events and
    value per 1-hour window, advancing every 15 minutes") that pairs
    with the tumbling gate and the streaming windowed aggregations.
    Each event lands in ``ceil(window/slide)`` epoch-aligned windows.

    Determinism contract: window starts are exact epoch-aligned integer
    microseconds (Spark's F.window alignment), counts are exact, and the
    value sum is the exact DECIMAL sum floored to integer cents — so
    rows are bit-identical in any engine. Returns
    (window_start_us, n, sum_v_c) for non-empty windows.

    Plan shape at scale: F.window explodes each row into its
    window-count copies JVM-side, then ONE groupBy(window) with map-side
    partial aggregation — shuffle volume is distinct windows x
    partitions, not events. The window/slide ratio is the explicit
    amplification dial (x4 at 1h/15m).
    """
    if window_seconds < 1 or slide_seconds < 1:
        raise ValueError("window_seconds and slide_seconds must be >= 1")
    ts = F.col(ts_col).cast("timestamp")
    win = F.window(ts, f"{int(window_seconds)} seconds", f"{int(slide_seconds)} seconds")
    return (
        df.groupBy(win.alias("__w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.floor(
                F.sum(F.col(value_col).cast("decimal(38,6)")) * 100
            ).cast("long").alias("sum_v_c"),
        )
        .select(
            F.unix_micros(F.col("__w.start")).alias("window_start_us"),
            "n",
            "sum_v_c",
        )
    )


def hopping_window_oracle_sql(
    events_sql: str, window_seconds: int, slide_seconds: int
) -> str:
    """DuckDB replica of :func:`hopping_window_agg`. ``events_sql`` must
    yield (t, v) with t in epoch MICROseconds. Window membership
    start <= t < start + w over epoch-aligned starts k·slide unrolls to
    k in [ (t-w) div slide + 1, t div slide ] — integer division is
    truncation in BOTH engines, identical for the positive epochs the
    tables carry (pre-1970 timestamps would need floor-div care)."""
    w_us = int(window_seconds) * 1_000_000
    s_us = int(slide_seconds) * 1_000_000
    return f"""
WITH e AS (
    SELECT CAST(t AS BIGINT) AS t, v FROM ({events_sql})
), x AS (
    SELECT t, v,
           unnest(range((t - {w_us}) // {s_us} + 1, t // {s_us} + 1)) AS k
    FROM e
)
SELECT CAST(k * {s_us} AS BIGINT) AS window_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(floor(sum(CAST(v AS DECIMAL(38,6))) * 100) AS BIGINT) AS sum_v_c
FROM x GROUP BY 1
"""


def survival_table(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival/life table from per-subject (duration,
    observed) rows — churn / time-to-conversion / session-lifetime
    analysis. ``event_col`` is 1 when the terminal event was OBSERVED at
    ``duration``, 0 when the subject was censored there (still alive at
    last sight).

    Returns one row per distinct observed-event time t:
    (t, n_at_risk, n_events, n_censored) — everything the KM estimator
    needs, all exact integers: S(t) = Π_{u<=t} (1 − d_u / r_u) is a
    product of rationals the caller folds at the boundary (emitting the
    float product would smuggle engine-specific rounding into the gate;
    the table IS the portable artifact). ``n_at_risk`` counts subjects
    with duration >= t; per KM convention subjects censored exactly at t
    are still at risk at t. Rows with NULL duration are excluded.

    Plan shape at scale: one groupBy(duration) over the subject table
    (map-side partial, output = distinct durations), then a reverse
    prefix sum over the DISTINCT-duration table — O(distinct) rows, the
    same deliberately-tiny single-partition window as
    sketch.quantile_hist (the heavy reduction already happened in the
    groupBy; shard upstream if durations are near-unique at 10⁹+
    subjects)."""
    d = F.col(duration_col).cast("long")
    ev = F.col(event_col).cast("int")
    per_t = (
        df.filter(d.isNotNull())
        .groupBy(d.alias("t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n_all"),
            F.sum(ev).cast("long").alias("n_events"),
            F.sum(1 - ev).cast("long").alias("n_censored"),
        )
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = per_t.withColumn("n_at_risk", F.sum("__n_all").over(w))
    return out.filter(F.col("n_events") > 0).select(
        "t", "n_at_risk", "n_events", "n_censored"
    )


def survival_table_oracle_sql(subjects_sql: str) -> str:
    """DuckDB replica of :func:`survival_table`. ``subjects_sql`` must
    yield (dur, ev) with ev in {0, 1}."""
    return f"""
WITH per_t AS (
    SELECT CAST(dur AS BIGINT) AS t,
           count(*) AS n_all,
           CAST(sum(ev) AS BIGINT) AS n_events,
           CAST(sum(1 - ev) AS BIGINT) AS n_censored
    FROM ({subjects_sql}) WHERE dur IS NOT NULL GROUP BY 1
)
SELECT t,
       CAST(sum(n_all) OVER (ORDER BY t DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_at_risk,
       n_events, n_censored
FROM per_t QUALIFY n_events > 0
"""


def activity_streaks(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Gaps-and-islands consecutive-day activity streaks — the retention
    primitive behind "7-day streak" product metrics and engagement
    cohorts: per user, each maximal run of consecutive calendar days
    with at least one event becomes one row (user, streak_start_day,
    streak_days), day = days since 1970-01-01 of the event's UTC date.

    Exactness contract: day numbers are integer datediffs (session is
    UTC-pinned; no float, no tz arithmetic), and the island id is the
    classic day − row_number() constant, so results are engine-exact.

    Plan shape at 100 TB: distinct (user, day) first — the ONLY pass
    over the raw events, map-side partial — then a user-partitioned
    row_number window and a (user, island) groupBy. All three shuffles
    are user-keyed and distinct-day-sized (≪ events); no unpartitioned
    window, no driver state.
    """
    day = F.datediff(
        F.to_date(F.col(ts_col).cast("timestamp")), F.lit("1970-01-01").cast("date")
    ).cast("long")
    ud = (
        df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("__u"), day.alias("__day"))
        .distinct()
    )
    w = Window.partitionBy("__u").orderBy(F.col("__day").asc())
    islands = ud.withColumn(
        "__grp", F.col("__day") - F.row_number().over(w)
    )
    return islands.groupBy("__u", "__grp").agg(
        F.min("__day").cast("long").alias("streak_start_day"),
        F.count(F.lit(1)).cast("long").alias("streak_days"),
    ).select(
        F.col("__u").alias(user_col), "streak_start_day", "streak_days"
    )


def activity_streaks_oracle_sql(rows_sql: str, user_col: str) -> str:
    """DuckDB replica of :func:`activity_streaks` — identical datediff
    day numbers, row_number island constant, and island groupBy.
    ``rows_sql`` yields (user, ts) under those output names."""
    return f"""
WITH ud AS (
    SELECT DISTINCT "user" AS u,
           CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
    FROM ({rows_sql}) WHERE ts IS NOT NULL AND "user" IS NOT NULL
), islands AS (
    SELECT u, day,
           day - row_number() OVER (PARTITION BY u ORDER BY day) AS grp
    FROM ud
)
SELECT u AS {user_col},
       CAST(min(day) AS BIGINT) AS streak_start_day,
       CAST(count(*) AS BIGINT) AS streak_days
FROM islands GROUP BY u, grp
"""


def peak_detection(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Local-maximum detection per series — the alerting primitive
    ("usage spiked") that CUSUM's cumulative drift test does not cover:
    a peak is a point STRICTLY greater than both its neighbors in
    (ts, id-free) series order; series boundaries are never peaks
    (one-sided evidence is not a spike).

    Exactness contract: comparisons only — no arithmetic at all, so any
    ordered type works unchanged. Ordering is (ts, value) to stay total
    when timestamps tie. Returns the peak rows
    (key, ts, value, prev_value, next_value).

    Plan shape: ONE key-partitioned window pass (lag + lead in the same
    frame) — the cheapest possible shape; at 100 TB the key shuffle is
    the only data movement.
    """
    w = Window.partitionBy("__k").orderBy(F.col("__ts").asc(), F.col("__v").asc())
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__v"),
    ).filter(F.col("__ts").isNotNull() & F.col("__v").isNotNull())
    return (
        base.withColumn("__prev", F.lag("__v").over(w))
        .withColumn("__next", F.lead("__v").over(w))
        .filter(
            F.col("__prev").isNotNull()
            & F.col("__next").isNotNull()
            & (F.col("__v") > F.col("__prev"))
            & (F.col("__v") > F.col("__next"))
        )
        .select(
            F.col("__k").alias(key_col),
            F.col("__ts").alias(ts_col),
            F.col("__v").alias(value_col),
            F.col("__prev").alias("prev_value"),
            F.col("__next").alias("next_value"),
        )
    )


def peak_detection_oracle_sql(
    rows_sql: str, key_col: str, ts_col: str, value_col: str
) -> str:
    """DuckDB replica of :func:`peak_detection`. ``rows_sql`` yields
    (key, ts, value) under those output names."""
    return f"""
WITH base AS (
    SELECT {key_col}, {ts_col}, {value_col},
           lag({value_col}) OVER w AS prev_value,
           lead({value_col}) OVER w AS next_value
    FROM ({rows_sql})
    WHERE {ts_col} IS NOT NULL AND {value_col} IS NOT NULL
    WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {value_col})
)
SELECT * FROM base
WHERE prev_value IS NOT NULL AND next_value IS NOT NULL
  AND {value_col} > prev_value AND {value_col} > next_value
"""


def rolling_active_users(
    df: DataFrame, user_col: str, ts_col: str, window_days: int = 7
) -> DataFrame:
    """Exact rolling active users — the WAU/MAU metric: for each day,
    how many DISTINCT users were active in the trailing ``window_days``
    window. A RANGE window frame cannot express this (Spark has no
    count-distinct-over-window); the scalable exact form is explode-
    to-covered-days:

      distinct (user, day) → each activity day contributes the user to
      the ``window_days`` target days it covers (a JVM-side sequence
      explode) → distinct (user, target) → ONE groupBy(target) count.

    Target days past the last activity day are cut (a trailing window
    that ends after the data is not a reporting day) via a 1-row
    broadcast of max(day). Returns (day, n_active) with day = days
    since 1970-01-01 UTC.

    Plan shape at 100 TB: shuffle volume is distinct activity pairs ×
    window_days skinny rows — the explicit amplification dial (×7 WAU,
    ×30 MAU); counts are map-side-partial after the second distinct.
    For sketch-precision-is-enough cases the HLL window family is the
    cheaper path; this is the exact one.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    day = F.datediff(
        F.to_date(F.col(ts_col).cast("timestamp")), F.lit("1970-01-01").cast("date")
    ).cast("long")
    ud = (
        df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("__u"), day.alias("__day"))
        .distinct()
    )
    covered = ud.select(
        "__u",
        F.explode(
            F.sequence(
                F.col("__day"), F.col("__day") + F.lit(int(window_days) - 1)
            )
        ).alias("__target"),
    ).distinct()
    max_day = ud.agg(F.max("__day").alias("__max_day"))
    return (
        covered.join(F.broadcast(max_day), F.col("__target") <= F.col("__max_day"))
        .groupBy("__target")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .select(F.col("__target").alias("day"), "n_active")
    )


def rolling_active_users_oracle_sql(
    rows_sql: str, window_days: int = 7
) -> str:
    """DuckDB replica of :func:`rolling_active_users`. ``rows_sql``
    yields ("user", ts)."""
    return f"""
WITH ud AS (
    SELECT DISTINCT "user" AS u,
           CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
    FROM ({rows_sql}) WHERE ts IS NOT NULL AND "user" IS NOT NULL
), covered AS (
    SELECT DISTINCT u, day + g AS target
    FROM ud, unnest(range(0, {int(window_days)})) AS t(g)
)
SELECT target AS day, CAST(count(*) AS BIGINT) AS n_active
FROM covered
WHERE target <= (SELECT max(day) FROM ud)
GROUP BY target
"""


def merge_intervals(
    df: DataFrame, key_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Union of overlapping-or-touching intervals per key — the coverage
    primitive (machine uptime windows, user presence, validity spans)
    behind "total covered time" questions; the batch complement of
    concurrency_timeline (which counts overlap depth, not coverage).

    Classic running-max islands: intervals ordered by (start, end); a
    new island starts where start > max(end) over all PRIOR intervals
    of the key (touching endpoints merge). Emits one row per merged
    island: (key, start, end, n_merged). Invalid rows (NULLs,
    end < start) are dropped.

    Bounds contract: start/end are integer positions (ticks, epoch
    seconds/µs). Float-typed bounds are FLOORED to integers on both
    engines — floor() explicitly, never an engine cast, because
    engines disagree on fractional casts (Spark's cast truncates
    toward zero, DuckDB's rounds half-even) and that divergence would
    silently change which intervals touch.

    Plan shape at 100 TB: two key-partitioned window passes (prior-max
    + island id via running sum of flags) and one (key, island)
    groupBy — all on the key shuffle, no self-join, no unpartitioned
    window.
    """
    w_prev = (
        Window.partitionBy("__k")
        .orderBy(F.col("__s").asc(), F.col("__e").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("__k").orderBy(F.col("__s").asc(), F.col("__e").asc())
    base = df.select(
        F.col(key_col).alias("__k"),
        F.floor(F.col(start_col)).cast("long").alias("__s"),
        F.floor(F.col(end_col)).cast("long").alias("__e"),
    ).filter(
        F.col("__s").isNotNull()
        & F.col("__e").isNotNull()
        & (F.col("__e") >= F.col("__s"))
    )
    flagged = base.withColumn("__prev_max", F.max("__e").over(w_prev)).withColumn(
        "__new",
        F.when(
            F.col("__prev_max").isNull() | (F.col("__s") > F.col("__prev_max")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn("__isl", F.sum("__new").over(w_run))
    return islands.groupBy("__k", "__isl").agg(
        F.min("__s").cast("long").alias("start"),
        F.max("__e").cast("long").alias("end"),
        F.count(F.lit(1)).cast("long").alias("n_merged"),
    ).select(F.col("__k").alias(key_col), "start", "end", "n_merged")


def merge_intervals_oracle_sql(rows_sql: str, key_col: str) -> str:
    """DuckDB replica of :func:`merge_intervals`. ``rows_sql`` yields
    (key, s, e)."""
    return f"""
WITH base AS (
    SELECT {key_col} AS k,
           CAST(floor(s) AS BIGINT) AS s, CAST(floor(e) AS BIGINT) AS e
    FROM ({rows_sql})
    WHERE s IS NOT NULL AND e IS NOT NULL AND floor(e) >= floor(s)
), flagged AS (
    SELECT *, CASE WHEN max(e) OVER (PARTITION BY k ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                     OR s > max(e) OVER (PARTITION BY k ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_island
    FROM base
), islands AS (
    SELECT *, sum(new_island) OVER (PARTITION BY k ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
    FROM flagged
)
SELECT k AS {key_col}, CAST(min(s) AS BIGINT) AS start,
       CAST(max(e) AS BIGINT) AS "end",
       CAST(count(*) AS BIGINT) AS n_merged
FROM islands GROUP BY k, isl
"""


def time_weighted_avg(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Time-weighted average per key — the monitoring/finance mean
    (TWAP, average gauge value, mean queue depth) where a plain AVG is
    wrong because samples are irregular: each observation holds until
    the next one, so it weighs by its holding duration.

    Exactness contract: values fix to v_fx = floor(v·1e6); the
    numerator Σ v_fx·Δt accumulates in DECIMAL(38,0) (µs durations ×
    f6 values overflow a long within hours); twa_f6 = num div duration
    — exact integer division, engine-portable. Observations at the
    same timestamp contribute 0 weight except the run's last (lead()
    within the tie is the same ts), so ties are deterministic without
    a tie-break contract. Keys with zero observed duration emit NULL
    (nothing to weight). Returns (key, n_points, dur_us, twa_f6).

    Plan shape at 100 TB: one key-partitioned lead() window + one
    groupBy on the same key — single shuffle.
    """
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).cast("long").alias("__t"),
        F.floor(F.col(value_col).cast("double") * 1e6).cast("long").alias("__v"),
    ).filter(F.col("__t").isNotNull() & F.col("__v").isNotNull())
    w = Window.partitionBy("__k").orderBy(F.col("__t").asc(), F.col("__v").asc())
    stepped = base.withColumn("__next", F.lead("__t").over(w))
    return (
        stepped.groupBy("__k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            (F.max("__t") - F.min("__t")).cast("long").alias("dur_us"),
            F.sum(
                F.col("__v").cast("decimal(38,0)")
                * (F.coalesce(F.col("__next"), F.col("__t")) - F.col("__t")).cast(
                    "decimal(38,0)"
                )
            ).cast("decimal(38,0)").alias("__num"),
        )
        .select(
            F.col("__k").alias(key_col),
            "n_points",
            "dur_us",
            F.expr(
                "CAST(CASE WHEN dur_us > 0 THEN __num div dur_us "
                "ELSE NULL END AS BIGINT)"
            ).alias("twa_f6"),
        )
    )


def time_weighted_avg_oracle_sql(rows_sql: str, key_col: str) -> str:
    """DuckDB replica of :func:`time_weighted_avg`. ``rows_sql`` yields
    (k, t, v) with t integer micros."""
    return f"""
WITH base AS (
    SELECT k, CAST(t AS BIGINT) AS t,
           CAST(floor(CAST(v AS DOUBLE) * 1e6) AS BIGINT) AS vfx
    FROM ({rows_sql}) WHERE t IS NOT NULL AND v IS NOT NULL
), stepped AS (
    SELECT *, lead(t) OVER (PARTITION BY k ORDER BY t, vfx) AS nxt
    FROM base
)
SELECT k AS {key_col},
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(max(t) - min(t) AS BIGINT) AS dur_us,
       CAST(CASE WHEN max(t) - min(t) > 0 THEN
            sum(CAST(vfx AS HUGEINT) * (coalesce(nxt, t) - t))
            // (max(t) - min(t))
            ELSE NULL END AS BIGINT) AS twa_f6
FROM stepped GROUP BY k
"""


def changepoint_single(
    series: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Best single changepoint per series by exact integer squared-error
    cost — binary-segmentation's inner step (Scott & Knott 1974; the
    building block PELT/BinSeg iterate), the "did this metric shift, and
    where" primitive that complements ``cusum_alarms`` (CUSUM needs a
    tuned drift k; this is parameter-free).

    For each key with points (x, y), x strictly ordered: every boundary
    t in [1, n-1] splits the series into left = first t points and
    right = the rest. Segment SSE with count m, sum s, sumsq q is
    q − s²/m; the candidate cost is SSE_L + SSE_R, a rational with
    denominator m_L·m_R. Both engines score it as exact f3 fixed-point

        cost_f3(t) = ((q_L·m_L − s_L²)·m_R + (q_R·m_R − s_R²)·m_L) · 1000
                     div (m_L · m_R)

    (numerator and cost are ≥ 0 by Cauchy-Schwarz, so truncating div ==
    floor on both engines) and pick the smallest t among minimal costs —
    a deterministic contract both engines replay exactly. Output per key:
    n, split_x (first x of the right segment), total_sse_f3 (no-split
    cost), best_sse_f3, gain_f3 = total − best. Keys with n < 2 have no
    admissible split and are dropped; callers threshold gain_f3 (or
    gain/total) to decide whether the changepoint is real.

    Overflow: everything stays in int64 — the scored numerator is
    ≤ 2·n²·Σy²·1000, so series with n²·Σy² ≤ 4.6e15 are safe (daily
    counts for years of data); rescale y beyond that.

    Scale: ONE shuffle on the key; prefix sums and totals are window
    passes over the same partitioning (a single exchange, two sorts),
    and the argmin is a row_number pick — no joins, no second shuffle,
    no driver collection. Skewed keys are bounded by the longest single
    series, the same bound every per-key window in this module carries.
    """
    pt = Window.partitionBy("__k")
    po = pt.orderBy("__x")
    df = series.select(
        F.col(key_col).alias("__k"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    )
    cum = df.select(
        "__k",
        "__x",
        F.row_number().over(po).alias("__t"),
        F.count(F.lit(1)).over(pt).alias("n"),
        F.sum("__y").over(po).alias("__sl"),
        F.sum(F.col("__y") * F.col("__y")).over(po).alias("__ql"),
        F.sum("__y").over(pt).alias("__s"),
        F.sum(F.col("__y") * F.col("__y")).over(pt).alias("__q"),
        F.lead("__x").over(po).alias("__next_x"),
    )
    ml = F.col("__t")
    mr = F.col("n") - ml
    sl, ql = F.col("__sl"), F.col("__ql")
    sr, qr = F.col("__s") - sl, F.col("__q") - ql
    num = (ql * ml - sl * sl) * mr + (qr * mr - sr * sr) * ml
    total_num = F.col("__q") * F.col("n") - F.col("__s") * F.col("__s")
    scored = cum.filter(mr > 0).select(
        "__k",
        "n",
        F.col("__next_x").alias("split_x"),
        (num * F.lit(1000)).alias("__num"),
        (ml * mr).alias("__den"),
        (total_num * F.lit(1000)).alias("__tnum"),
    )
    scored = scored.select(
        "__k",
        "n",
        "split_x",
        F.expr("__num div __den").alias("best_sse_f3"),
        F.expr("__tnum div n").alias("total_sse_f3"),
    )
    pick = F.row_number().over(
        Window.partitionBy("__k").orderBy("best_sse_f3", "split_x")
    )
    return (
        scored.withColumn("__r", pick)
        .filter((F.col("__r") == 1) & (F.col("n") >= 2))
        .select(
            F.col("__k").alias(key_col),
            F.col("n").cast("long").alias("n"),
            F.col("split_x").cast("long").alias("split_x"),
            F.col("total_sse_f3").cast("long").alias("total_sse_f3"),
            F.col("best_sse_f3").cast("long").alias("best_sse_f3"),
            (F.col("total_sse_f3") - F.col("best_sse_f3"))
            .cast("long")
            .alias("gain_f3"),
        )
    )


def changepoint_single_oracle_sql(series_sql: str, key_col: str) -> str:
    """DuckDB replica of :func:`changepoint_single`. ``series_sql``
    yields (k, x, y) with x strictly ordered per k and y integral."""
    return f"""
WITH base AS (
    SELECT k, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
    FROM ({series_sql})
), cum AS (
    SELECT k, x,
           row_number() OVER w AS t,
           count(*) OVER (PARTITION BY k) AS n,
           sum(y) OVER w AS sl,
           sum(y * y) OVER w AS ql,
           sum(y) OVER (PARTITION BY k) AS s,
           sum(y * y) OVER (PARTITION BY k) AS q,
           lead(x) OVER w AS next_x
    FROM base
    WINDOW w AS (PARTITION BY k ORDER BY x)
), scored AS (
    SELECT k, n, next_x AS split_x,
           (((ql * t - sl * sl) * (n - t)
             + ((q - ql) * (n - t) - (s - sl) * (s - sl)) * t) * 1000)
           // (t * (n - t)) AS best_sse_f3,
           ((q * n - s * s) * 1000) // n AS total_sse_f3
    FROM cum WHERE n - t > 0
), picked AS (
    SELECT *, row_number() OVER (
        PARTITION BY k ORDER BY best_sse_f3, split_x) AS r
    FROM scored
)
SELECT k AS {key_col}, CAST(n AS BIGINT) AS n,
       CAST(split_x AS BIGINT) AS split_x,
       CAST(total_sse_f3 AS BIGINT) AS total_sse_f3,
       CAST(best_sse_f3 AS BIGINT) AS best_sse_f3,
       CAST(total_sse_f3 - best_sse_f3 AS BIGINT) AS gain_f3
FROM picked WHERE r = 1 AND n >= 2
"""


def seasonal_index(
    series: DataFrame,
    key_col: str,
    ts_col: str,
    n_buckets: int = 7,
) -> DataFrame:
    """Day-of-week seasonal profile per key, exact: for each
    (key, weekday) bucket, the event count, its share of the key's
    total in ppm, and the seasonal index — the ratio of observed share
    to the uniform 1/7 expectation, in ppm:

        share_ppm = (cnt · 1e6)   div total
        index_ppm = (cnt · 7e6)   div total     (1e6 = flat profile)

    Both truncating integer divisions over non-negative counts, so
    floor == trunc on both engines. The calendar-seasonality screen
    that complements :func:`changepoint_single` (a weekly rhythm is not
    a level shift) and :func:`cusum_alarms`. Weekday numbering follows
    Spark's ``dayofweek`` (1 = Sunday … 7 = Saturday); the oracle maps
    DuckDB's 0-based ``dayofweek`` onto it explicitly.

    Plan shape: ONE partial-aggregated groupBy(key, dow) plus a
    broadcast-sized per-key totals join — O(keys·7) state, no windows.
    """
    d = series.select(
        F.col(key_col).alias("__k"),
        F.dayofweek(F.col(ts_col).cast("timestamp")).alias("dow"),
    )
    cnt = d.groupBy("__k", "dow").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.groupBy("__k").agg(F.sum("cnt").alias("__tot"))
    return (
        cnt.join(F.broadcast(tot), "__k")
        .select(
            F.col("__k").alias(key_col),
            F.col("dow").cast("int").alias("dow"),
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("CAST((cnt * 1000000) div __tot AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr(
                f"CAST((cnt * {n_buckets} * 1000000) div __tot AS BIGINT)"
            ).alias("index_ppm"),
        )
    )


def seasonal_index_oracle_sql(rows_sql: str, key_col: str) -> str:
    """DuckDB replica of :func:`seasonal_index`. ``rows_sql`` yields
    (k, ts). DuckDB dayofweek is 0=Sunday; +1 matches Spark's 1=Sunday."""
    return f"""
WITH d AS (
    SELECT k, dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow
    FROM ({rows_sql})
), c AS (
    SELECT k, dow, count(*) AS cnt FROM d GROUP BY k, dow
), t AS (
    SELECT k, sum(cnt) AS tot FROM c GROUP BY k
)
SELECT c.k AS {key_col}, CAST(c.dow AS INT) AS dow,
       CAST(c.cnt AS BIGINT) AS cnt,
       CAST((c.cnt * 1000000) // t.tot AS BIGINT) AS share_ppm,
       CAST((c.cnt * 7 * 1000000) // t.tot AS BIGINT) AS index_ppm
FROM c JOIN t ON c.k = t.k
"""


def sequential_rules(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    id_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Sequential association rules a→b from the length-2 patterns of
    :func:`sequential_patterns`: confidence = users(a then b) /
    users(a), the ordered counterpart of basket rules
    (:mod:`operators.itemsets` mines unordered co-occurrence; this is
    "after viewing, how often do they eventually purchase").

    Exact integers: (antecedent, consequent, support, support_ante,
    conf_ppm = (support · 1e6) div support_ante) — truncating division
    over non-negative counts, engine-identical. Rules with pattern
    support < min_support are dropped AFTER confidence is computed from
    corpus-true counts.

    Plan shape: inherits the pattern miner's no-explosion design (first/
    last-position equi-joins), plus one broadcast-sized join of the
    O(|types|²) rule table against the O(|types|) unigram table.
    """
    pats = sequential_patterns(
        df, user_col, time_col, type_col, id_col, min_support=1, max_len=2
    )
    l1 = pats.filter(F.col("length") == 1).select(
        F.col("pattern").alias("antecedent"),
        F.col("support").alias("support_ante"),
    )
    l2 = pats.filter(F.col("length") == 2).select(
        F.element_at(F.split("pattern", ">"), 1).alias("antecedent"),
        F.element_at(F.split("pattern", ">"), 2).alias("consequent"),
        "support",
    )
    return (
        l2.join(F.broadcast(l1), "antecedent")
        .filter(F.col("support") >= F.lit(int(min_support)))
        .select(
            "antecedent",
            "consequent",
            F.col("support").cast("long").alias("support"),
            F.col("support_ante").cast("long").alias("support_ante"),
            F.expr(
                "CAST((support * 1000000) div support_ante AS BIGINT)"
            ).alias("conf_ppm"),
        )
    )


def sequential_rules_oracle_sql(events_sql: str, min_support: int = 2) -> str:
    """DuckDB replica of :func:`sequential_rules` — wraps the pattern
    miner's oracle and derives the same rule table."""
    pats = sequential_patterns_oracle_sql(events_sql, min_support=1, max_len=2)
    return f"""
WITH pats AS ({pats}),
l1 AS (
    SELECT pattern AS antecedent, support AS support_ante
    FROM pats WHERE length = 1
), l2 AS (
    SELECT string_split(pattern, '>')[1] AS antecedent,
           string_split(pattern, '>')[2] AS consequent,
           support
    FROM pats WHERE length = 2
)
SELECT l2.antecedent, l2.consequent,
       CAST(l2.support AS BIGINT) AS support,
       CAST(l1.support_ante AS BIGINT) AS support_ante,
       CAST((l2.support * 1000000) // l1.support_ante AS BIGINT) AS conf_ppm
FROM l2 JOIN l1 ON l2.antecedent = l1.antecedent
WHERE l2.support >= {int(min_support)}
"""


_ALLEN_LADDER = (
    # (name, predicate template over xs/xe/ys/ye) — evaluated IN ORDER,
    # first match wins; the ladder is exhaustive for xs<=xe, ys<=ye
    ("precedes", "{xe} < {ys}"),
    ("meets", "{xe} = {ys}"),
    ("overlaps", "{xs} < {ys} AND {ys} < {xe} AND {xe} < {ye}"),
    ("finished_by", "{xs} < {ys} AND {xe} = {ye}"),
    ("contains", "{xs} < {ys} AND {xe} > {ye}"),
    ("starts", "{xs} = {ys} AND {xe} < {ye}"),
    ("equals", "{xs} = {ys} AND {xe} = {ye}"),
    ("started_by", "{xs} = {ys} AND {xe} > {ye}"),
    ("during", "{xs} > {ys} AND {xe} < {ye}"),
    ("finishes", "{xs} > {ys} AND {xe} = {ye}"),
    ("overlapped_by", "{ys} < {xs} AND {xs} < {ye} AND {ye} < {xe}"),
    ("met_by", "{xs} = {ye}"),
    ("preceded_by", "{xs} > {ye}"),
)


def _allen_case(xs: str, xe: str, ys: str, ye: str) -> str:
    arms = " ".join(
        f"WHEN {pred.format(xs=xs, xe=xe, ys=ys, ye=ye)} THEN '{name}'"
        for name, pred in _ALLEN_LADDER
    )
    return f"CASE {arms} END"


def allen_relation_census(
    pairs: DataFrame,
    xs: str,
    xe: str,
    ys: str,
    ye: str,
) -> DataFrame:
    """Census of Allen's 13 interval relations (Allen 1983,
    "Maintaining knowledge about temporal intervals", CACM 26(11))
    over an ALREADY-PAIRED interval table — each input row carries one
    X interval [xs, xe] and one Y interval [ys, ye], normally produced
    by a key-scoped equi-join (never an all-pairs product; the caller
    owns the pairing and its scale story).

    Returns one row per observed relation:

        (relation, n, share_ppm)

    share_ppm = (n · 1e6) div total — truncating integer division, so
    the shares are engine-exact. The relation is decided by a fixed
    CASE ladder (first match wins) that is mutually exclusive and
    exhaustive for well-formed intervals (start ≤ end on both sides);
    degenerate point intervals (start = end) classify deterministically
    through the same ladder order on both engines. Rows where any bound
    is NULL fall out (CASE yields NULL → dropped).

    The interval-algebra QA complement to ``merge_intervals`` /
    ``interval joins``: instead of producing the overlap set it
    characterizes HOW two interval families relate (did shipments fall
    inside their order windows, straddle them, or miss them entirely)
    — the census a pipeline checks before trusting a point-in-interval
    enrichment.

    Plan shape: one pure-Column classification pass, ONE 13-bucket
    groupBy, plus a 1-row total broadcast — O(13) output regardless of
    input size.
    """
    rel = F.expr(_allen_case(xs, xe, ys, ye)).alias("relation")
    c = (
        pairs.select(rel)
        .filter(F.col("relation").isNotNull())
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.agg(F.sum("n").alias("__tot"))
    return (
        c.join(F.broadcast(tot))
        .select(
            "relation",
            F.col("n").cast("long").alias("n"),
            F.expr("CAST((n * 1000000) div __tot AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


def allen_relation_census_oracle_sql(
    pairs_sql: str, xs: str, xe: str, ys: str, ye: str
) -> str:
    """DuckDB replica of :func:`allen_relation_census` — the IDENTICAL
    CASE ladder (generated from the same table), identical truncating
    division. ``pairs_sql`` yields one row per (X, Y) interval pair."""
    case = _allen_case(xs, xe, ys, ye)
    return f"""
WITH p AS (
    SELECT {case} AS relation FROM ({pairs_sql})
), c AS (
    SELECT relation, count(*) AS n FROM p
    WHERE relation IS NOT NULL GROUP BY relation
), t AS (
    SELECT sum(n) AS tot FROM c
)
SELECT c.relation, CAST(c.n AS BIGINT) AS n,
       CAST((c.n * 1000000) // t.tot AS BIGINT) AS share_ppm
FROM c, t
"""


def cep_strict_sequence(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    pattern: Sequence[str],
    within_seconds: int,
) -> DataFrame:
    """Strict-contiguity CEP pattern matching — the batch replay of the
    Storm/Flink-style complex-event-processing contract the reference's
    streaming topologies serve (enrichment topology consuming typed
    event streams; reference SparkScalaInterpreterTopology /
    OutputBolt ack flow): count, per key, the positions where the next
    ``len(pattern)`` events in the key's (ts, id) total order are
    EXACTLY the pattern types, in order, with no other event between
    them (strict contiguity — Flink's ``next()``, not
    ``followedBy()``), and the whole match fits inside
    ``within_seconds`` (first event to last event).

    Returns (key, n_matches) for keys with ≥ 1 match, n_matches exact.

    Strictness matters: relaxed (skip-till-next-match) semantics are
    :func:`sequential_patterns`'s territory and explode combinatorially;
    strict contiguity is a pure window expression — no joins, no state
    machine, ONE key shuffle for the ordered window, then lead()
    comparisons fold the pattern test into each row. At 100 TB this is
    a single window pass over the event log regardless of pattern
    length.
    """
    if len(pattern) < 2:
        raise ValueError("pattern needs >= 2 steps")
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    t = F.col(type_col)
    conds = t == pattern[0]
    for i, step in enumerate(pattern[1:], start=1):
        conds = conds & (F.lead(t, i).over(w) == step)
    last_ts = F.lead(F.col(ts_col), len(pattern) - 1).over(w)
    span_ok = (
        last_ts.cast("timestamp").cast("long")
        - F.col(ts_col).cast("timestamp").cast("long")
    ) <= int(within_seconds)
    return (
        df.select(F.col(key_col).alias("key"), (conds & span_ok).alias("__m"))
        .filter(F.col("__m"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
    )


def cep_strict_sequence_oracle_sql(
    rows_sql: str,
    pattern: Sequence[str],
    within_seconds: int,
    key_out: str = "key",
) -> str:
    """DuckDB replica of :func:`cep_strict_sequence`. ``rows_sql``
    yields (key, ts, typ, id); identical lead() windows and epoch
    arithmetic."""
    leads = ", ".join(
        f"lead(typ, {i}) OVER w AS t{i}" for i in range(1, len(pattern))
    )
    conds = " AND ".join(
        [f"typ = '{pattern[0]}'"]
        + [f"t{i} = '{p}'" for i, p in enumerate(pattern[1:], start=1)]
    )
    k = len(pattern) - 1
    return f"""
WITH o AS (
    SELECT key, ts, typ,
           {leads},
           lead(ts, {k}) OVER w AS ts_last
    FROM ({rows_sql})
    WINDOW w AS (PARTITION BY key ORDER BY ts, id)
)
SELECT key AS {key_out}, CAST(count(*) AS BIGINT) AS n_matches
FROM o
WHERE {conds}
  AND floor(epoch(CAST(ts_last AS TIMESTAMP)))
      - floor(epoch(CAST(ts AS TIMESTAMP))) <= {int(within_seconds)}
GROUP BY key
"""


def diff_in_diff(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences table — the standard quasi-experimental
    readout (Card & Krueger 1994 form) for "did the rollout move the
    metric": exact per-cell counts and mean values for the four
    (treatment × period) cells, and the DiD estimate

        (mean_T_post − mean_T_pre) − (mean_C_post − mean_C_pre)

    All money-domain arithmetic is exact: per-cell sums accumulate in
    DECIMAL(38,6), means are floor(sum·100 div n) integer CENTS
    (truncating division — documented, engine-identical), and the DiD
    is plain integer subtraction of those means. One row out:

        (n_treat_pre, mean_treat_pre_c, n_treat_post, mean_treat_post_c,
         n_ctrl_pre, mean_ctrl_pre_c, n_ctrl_post, mean_ctrl_post_c,
         did_cents)

    NULL values are excluded from their cell (count and sum together,
    so the mean stays consistent). An empty cell yields NULL mean and
    NULL did_cents — a DiD over a missing cell is meaningless and
    should look broken, not zero.

    Plan shape: ONE full-scan conditional aggregation (8 partial-agged
    measures, map-side combined), no joins, no shuffle beyond the final
    1-row gather.
    """
    t, p = F.col(treat_col), F.col(post_col)
    v = F.col(value_col).cast("decimal(38,6)")
    cells = {
        "treat_pre": t & ~p,
        "treat_post": t & p,
        "ctrl_pre": ~t & ~p,
        "ctrl_post": ~t & p,
    }
    aggs = []
    for name, cond in cells.items():
        ok = cond & v.isNotNull()
        aggs += [
            F.sum(ok.cast("long")).alias(f"n_{name}"),
            F.sum(F.when(ok, v)).alias(f"__s_{name}"),
        ]
    wide = df.agg(*aggs)
    means = {
        name: F.when(
            F.col(f"n_{name}") > 0,
            F.expr(
                f"CAST(floor(__s_{name} * 100) div n_{name} AS BIGINT)"
            ),
        )
        for name in cells
    }
    out = wide.select(
        *[
            x
            for name in cells
            for x in (
                F.col(f"n_{name}").cast("long").alias(f"n_{name}"),
                means[name].alias(f"mean_{name}_c"),
            )
        ]
    )
    return out.withColumn(
        "did_cents",
        (F.col("mean_treat_post_c") - F.col("mean_treat_pre_c"))
        - (F.col("mean_ctrl_post_c") - F.col("mean_ctrl_pre_c")),
    )


def diff_in_diff_oracle_sql(rows_sql: str) -> str:
    """DuckDB replica of :func:`diff_in_diff`. ``rows_sql`` yields
    (treat BOOLEAN, post BOOLEAN, value)."""
    cells = {
        "treat_pre": "treat AND NOT post",
        "treat_post": "treat AND post",
        "ctrl_pre": "NOT treat AND NOT post",
        "ctrl_post": "NOT treat AND post",
    }
    parts = []
    for name, cond in cells.items():
        parts.append(
            f"CAST(coalesce(sum(CASE WHEN {cond} AND value IS NOT NULL"
            f" THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_{name}"
        )
        parts.append(
            f"sum(CASE WHEN {cond} THEN CAST(value AS DECIMAL(38,6)) END)"
            f" AS s_{name}"
        )
    sel = ",\n           ".join(parts)
    # numerator cast to BIGINT BEFORE //: DuckDB's // on a DECIMAL
    # operand degrades to double division (no floor), and the outer
    # BIGINT cast would then ROUND — integer // integer truncates
    mean = {
        n: f"CASE WHEN n_{n} > 0 THEN"
        f" CAST(CAST(floor(s_{n} * 100) AS BIGINT) // n_{n} AS BIGINT) END"
        for n in cells
    }
    mcols = ",\n       ".join(
        f"{mean[n]} AS mean_{n}_c" for n in cells
    )
    return f"""
WITH w AS (
    SELECT {sel}
    FROM ({rows_sql})
)
SELECT n_treat_pre, mean_treat_pre_c, n_treat_post, mean_treat_post_c,
       n_ctrl_pre, mean_ctrl_pre_c, n_ctrl_post, mean_ctrl_post_c,
       (mean_treat_post_c - mean_treat_pre_c)
       - (mean_ctrl_post_c - mean_ctrl_pre_c) AS did_cents
FROM (
    SELECT n_treat_pre, n_treat_post, n_ctrl_pre, n_ctrl_post,
       {mcols}
    FROM w
)
"""


def shapley_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    channels: Sequence[str],
) -> DataFrame:
    """Exact Shapley-value conversion attribution over channel
    coalitions (Shapley 1953 applied to the marketing coalition game —
    the model Google Analytics ran as "data-driven attribution";
    simplified-Shapley form of Zhao et al. 2018): each converting
    user's credit is split among the channels that touched them BEFORE
    their first conversion, weighted by each channel's marginal
    contribution across every coalition.

    Game: players = channels; for a coalition S,
    v(S) = #converters whose touch-set ⊆ S (their journey survives if
    only S existed). Then

        φ_i = Σ_{S ∌ i} |S|!·(n−1−|S|)! · (v(S∪i) − v(S)) / n!

    Everything is EXACT: counts are integers and φ is emitted
    multiplied by n! (``phi_nf``), which the weight formula makes
    integral; share_ppm = (phi_nf · 1e6) div (n!·v(full)). Efficiency
    (Σ φ_i = v(full)) holds by construction and is asserted in tests.
    "Before" is strict at truncated epoch-SECOND granularity (the
    repo's floor(epoch) discipline — sub-second precision differs
    between engines). Converters with NO prior touch leave the game
    (they are unattributable).

    Plan shape: the DATA-scale work is two keyed aggregations (first
    conversion per user, then one bit_or mask per user) and an 8-row
    mask census for n=3; the Shapley combination runs over literal
    2^n-row coalition frames — tiny broadcast nested-loop joins,
    deliberately in-plan (no driver collect) so the whole thing is one
    lazy DataFrame. n is bounded by the 2^n census (n ≤ ~10 in
    practice; marketing attribution rarely exceeds 5 channels).
    """
    import math

    n = len(channels)
    if not (1 <= n <= 10):
        raise ValueError("channels must have 1..10 entries")
    spark = df.sparkSession
    nf = math.factorial(n)
    ep = F.col(ts_col).cast("timestamp").cast("long")
    conv = (
        df.filter(F.col(type_col) == conversion_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ep).alias("fp"))
    )
    masks = (
        df.select(F.col(user_col).alias("u"), ep.alias("ep"), F.col(type_col).alias("ty"))
        .join(conv, "u")
        .filter(F.col("ep") < F.col("fp"))
        .select(
            "u",
            sum(
                (F.when(F.col("ty") == ch, F.lit(1 << i)).otherwise(0))
                for i, ch in enumerate(channels)
            ).alias("b"),
        )
        .groupBy("u")
        .agg(F.bit_or("b").alias("mask"))
        .filter(F.col("mask") > 0)
    )
    counts = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("c"))
    coal = spark.range(1 << n).select(F.col("id").cast("int").alias("s"))
    v = (
        coal.join(
            F.broadcast(counts),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("v"))
    )
    # |S|!(n-1-|S|)! for each coalition size, premultiplied into n!·φ
    w_by_size = {
        k: math.factorial(k) * math.factorial(n - 1 - k) for k in range(n)
    }
    w_expr = F.element_at(
        F.array(*[F.lit(w_by_size[k]) for k in range(n)]),
        F.col("size_s") + 1,
    )
    ch_rows = spark.createDataFrame(
        [(ch, 1 << i) for i, ch in enumerate(channels)], "channel string, bit int"
    )
    vs = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    v2 = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    pairs = (
        ch_rows.join(
            F.broadcast(vs), F.col("s0").bitwiseAND(F.col("bit")) == 0
        )
        .withColumn("s1", F.col("s0") + F.col("bit"))
        .join(F.broadcast(v2), "s1")
        .withColumn("size_s", F.bit_count(F.col("s0").cast("long")).cast("int"))
    )
    phi = pairs.groupBy("channel").agg(
        F.sum(w_expr * (F.col("v1") - F.col("v0"))).cast("long").alias("phi_nf")
    )
    total = v.filter(F.col("s") == (1 << n) - 1).select(
        F.col("v").alias("__vt")
    )
    return (
        phi.join(F.broadcast(total))
        .select(
            "channel",
            "phi_nf",
            F.lit(nf).cast("int").alias("n_factorial"),
            F.col("__vt").cast("long").alias("v_full"),
            F.expr(f"CAST((phi_nf * 1000000) div ({nf} * __vt) AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


def shapley_attribution_oracle_sql(
    rows_sql: str,
    conversion_type: str,
    channels: Sequence[str],
) -> str:
    """DuckDB replica of :func:`shapley_attribution`. ``rows_sql``
    yields (u, ep BIGINT epoch-seconds, ty)."""
    import math

    n = len(channels)
    nf = math.factorial(n)
    bit_case = " + ".join(
        f"max(CASE WHEN ty = '{ch}' THEN {1 << i} ELSE 0 END)"
        for i, ch in enumerate(channels)
    )
    w_arr = ", ".join(
        str(math.factorial(k) * math.factorial(n - 1 - k)) for k in range(n)
    )
    ch_vals = ", ".join(
        f"('{ch}', {1 << i})" for i, ch in enumerate(channels)
    )
    return f"""
WITH ev AS ({rows_sql}),
conv AS (
    SELECT u, min(ep) AS fp FROM ev WHERE ty = '{conversion_type}' GROUP BY u
), masks AS (
    SELECT e.u, {bit_case} AS mask
    FROM ev e JOIN conv c ON e.u = c.u AND e.ep < c.fp
    GROUP BY e.u
), counts AS (
    SELECT mask, count(*) AS c FROM masks WHERE mask > 0 GROUP BY mask
), coal AS (
    SELECT CAST(s AS INT) AS s FROM range(0, {1 << n}) t(s)
), v AS (
    SELECT coal.s, CAST(coalesce(sum(counts.c), 0) AS BIGINT) AS v
    FROM coal LEFT JOIN counts ON (counts.mask & coal.s) = counts.mask
    GROUP BY coal.s
), ch AS (
    SELECT * FROM (VALUES {ch_vals}) AS t(channel, bit)
), pairs AS (
    SELECT ch.channel,
           ([{w_arr}])[bit_count(v0.s) + 1] * (v1.v - v0.v) AS term
    FROM ch
    JOIN v v0 ON (v0.s & ch.bit) = 0
    JOIN v v1 ON v1.s = v0.s + ch.bit
), phi AS (
    SELECT channel, CAST(sum(term) AS BIGINT) AS phi_nf FROM pairs GROUP BY channel
)
SELECT phi.channel, phi.phi_nf,
       CAST({nf} AS INT) AS n_factorial,
       (SELECT v FROM v WHERE s = {(1 << n) - 1}) AS v_full,
       CAST((phi.phi_nf * 1000000)
            // ({nf} * (SELECT v FROM v WHERE s = {(1 << n) - 1}))
            AS BIGINT) AS share_ppm
FROM phi
"""


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """OHLC downsampling — the candlestick/bar aggregation every
    timeseries store exposes (open/high/low/close/volume per time
    bucket), which a plain groupBy can't produce because OPEN and CLOSE
    are ORDER-dependent (first/last value in the bucket), not
    commutative aggregates.

    Determinism: rows are ordered by (floor-epoch seconds, id) — the
    repo's floor(epoch) discipline plus a unique tiebreaker, because
    raw sub-second timestamps order differently across engines (Spark
    micros vs parquet nanos). Values are exact CENTS
    (floor(value·100)); NULL values are excluded from the bar entirely
    (all five measures together, so open/close/extremes stay
    consistent). Output per (key, bucket):

        (key, bucket_start, n, open_c, high_c, low_c, close_c, vol_c)

    Plan shape: ONE (key, bucket) window pass (two row_numbers over
    the same sort) + ONE groupBy with map-side partials — no joins,
    no second shuffle.
    """
    ep = F.col(ts_col).cast("timestamp").cast("long")
    cents = F.floor(F.col(value_col).cast("decimal(38,6)") * 100).cast("long")
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("k"),
            (ep - (ep % F.lit(int(bucket_seconds)))).alias("bucket_start"),
            ep.alias("__ep"),
            F.col(id_col).alias("__id"),
            cents.alias("__c"),
        )
    )
    wa = Window.partitionBy("k", "bucket_start").orderBy(
        F.col("__ep").asc(), F.col("__id").asc()
    )
    wd = Window.partitionBy("k", "bucket_start").orderBy(
        F.col("__ep").desc(), F.col("__id").desc()
    )
    ranked = base.select(
        "k",
        "bucket_start",
        "__c",
        F.row_number().over(wa).alias("__ra"),
        F.row_number().over(wd).alias("__rd"),
    )
    return (
        ranked.groupBy("k", "bucket_start")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max(F.when(F.col("__ra") == 1, F.col("__c"))).alias("open_c"),
            F.max("__c").alias("high_c"),
            F.min("__c").alias("low_c"),
            F.max(F.when(F.col("__rd") == 1, F.col("__c"))).alias("close_c"),
            F.sum("__c").cast("long").alias("vol_c"),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("bucket_start").cast("long").alias("bucket_start"),
            "n",
            "open_c",
            "high_c",
            "low_c",
            "close_c",
            "vol_c",
        )
    )


def ohlc_bars_oracle_sql(
    rows_sql: str, key_out: str, bucket_seconds: int = 3600
) -> str:
    """DuckDB replica of :func:`ohlc_bars`. ``rows_sql`` yields
    (k, ep BIGINT epoch-seconds, id, value)."""
    b = int(bucket_seconds)
    return f"""
WITH base AS (
    SELECT k, ep - (ep % {b}) AS bucket_start, ep, id,
           CAST(floor(CAST(value AS DECIMAL(38,6)) * 100) AS BIGINT) AS c
    FROM ({rows_sql}) WHERE value IS NOT NULL
), ranked AS (
    SELECT k, bucket_start, c,
           row_number() OVER (PARTITION BY k, bucket_start
                              ORDER BY ep ASC, id ASC) AS ra,
           row_number() OVER (PARTITION BY k, bucket_start
                              ORDER BY ep DESC, id DESC) AS rd
    FROM base
)
SELECT k AS {key_out},
       CAST(bucket_start AS BIGINT) AS bucket_start,
       CAST(count(*) AS BIGINT) AS n,
       max(CASE WHEN ra = 1 THEN c END) AS open_c,
       max(c) AS high_c,
       min(c) AS low_c,
       max(CASE WHEN rd = 1 THEN c END) AS close_c,
       CAST(sum(c) AS BIGINT) AS vol_c
FROM ranked
GROUP BY k, bucket_start
"""


def max_drawdown(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Maximum drawdown per key — the classic peak-to-trough risk
    metric (largest drop from a running maximum), order-dependent and
    therefore out of reach of commutative aggregation: per key, with
    rows ordered by ``order_col``,

        dd_t = max_{s ≤ t}(v_s) − v_t,    max_drawdown = max_t dd_t

    Values are exact CENTS; output (key, n, peak_c, max_drawdown_c,
    trough_after_peak_c) where trough_after_peak_c is the value at the
    FIRST order position attaining the maximum drawdown (deterministic
    tie rule, mirrored by the oracle). NULL values are skipped (a gap,
    not a zero). A never-declining series reports 0.

    Plan shape: one running-max window + one groupBy — ONE key
    shuffle, no joins, no iteration.
    """
    cents = F.floor(F.col(value_col).cast("decimal(38,6)") * 100).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("o"),
        cents.alias("c"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("o").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = base.select(
        "k",
        "o",
        "c",
        (F.max("c").over(w) - F.col("c")).alias("dd"),
    )
    wpick = Window.partitionBy("k").orderBy(F.col("dd").desc(), F.col("o").asc())
    return (
        dd.withColumn("__r", F.row_number().over(wpick))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("c").alias("peak_c"),
            F.max("dd").cast("long").alias("max_drawdown_c"),
            F.max(F.when(F.col("__r") == 1, F.col("c"))).alias(
                "trough_after_peak_c"
            ),
        )
        .select(
            F.col("k").alias(key_col),
            "n",
            "peak_c",
            "max_drawdown_c",
            "trough_after_peak_c",
        )
    )


def max_drawdown_oracle_sql(rows_sql: str, key_out: str) -> str:
    """DuckDB replica of :func:`max_drawdown`. ``rows_sql`` yields
    (k, o, value)."""
    return f"""
WITH base AS (
    SELECT k, o,
           CAST(floor(CAST(value AS DECIMAL(38,6)) * 100) AS BIGINT) AS c
    FROM ({rows_sql}) WHERE value IS NOT NULL
), dd AS (
    SELECT k, o, c,
           max(c) OVER (PARTITION BY k ORDER BY o ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - c AS dd
    FROM base
), picked AS (
    SELECT *, row_number() OVER (PARTITION BY k ORDER BY dd DESC, o ASC) AS r
    FROM dd
)
SELECT k AS {key_out},
       CAST(count(*) AS BIGINT) AS n,
       max(c) AS peak_c,
       CAST(max(dd) AS BIGINT) AS max_drawdown_c,
       max(CASE WHEN r = 1 THEN c END) AS trough_after_peak_c
FROM picked
GROUP BY k
"""
