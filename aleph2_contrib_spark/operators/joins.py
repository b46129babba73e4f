"""Temporal join operators the reference platform lacks but a Spark-native
engine should offer (as-of joins are the standard way to align event streams
with slowly-changing reference data).

Scale design: the naive formulation (range join / correlated subquery)
explodes into O(n·m) comparisons per key. The union+window formulation used
here costs exactly ONE shuffle on the join key and a per-partition sort —
the same cost as a regular sort-merge join — and never materializes
candidate pairs. At 100 TB the only knob that matters is key cardinality
(salting applies if a single key dominates).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the value columns of
    the LATEST right row with ``right_ts <= left_ts`` for the same key
    (inclusive; nulls when no prior right row exists).

    Implementation: tag both sides, union, and forward-fill the right-side
    value columns with ``last(ignorenulls)`` over a (key, ts) window — one
    shuffle, no pair explosion. Right rows at an equal timestamp sort before
    left rows, making the match inclusive.

    ``tolerance``: optional max age (a Column interval/long in the ts
    unit-seconds domain); matches older than ``left_ts - tolerance`` are
    nulled out.
    """
    right_ts = right_ts or left_ts
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    on = list(on)

    # Output emits left.* + value_cols + matched_ts; a right value column
    # shadowing a left column (both sides carrying e.g. 'price') would make
    # by-name access ambiguous downstream, and user columns named like the
    # internal tags would be clobbered by the union. Fail fast.
    reserved = {"__ts", "__side", "__match_ts", "matched_ts"} | {f"__v_{c}" for c in value_cols}
    clash = (set(left.columns) & set(value_cols)) | (set(left.columns) & reserved)
    if clash:
        raise ValueError(
            f"asof_join output-name collision on {sorted(clash)}: rename the "
            "left column(s) or pass explicit value_cols (right values are "
            "emitted under their own names, plus 'matched_ts')"
        )

    fill_cols = [f"__v_{c}" for c in value_cols]
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(fc) for c, fc in zip(value_cols, fill_cols)],
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for fc in fill_cols:
        filled = filled.withColumn(fc, F.last(fc, ignorenulls=True).over(w))
    # the matched right timestamp (for tolerance checks / output)
    match_ts = F.last(
        F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
    ).over(w)
    filled = filled.withColumn("__match_ts", match_ts)

    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        stale = F.col("__match_ts") < (F.col("__ts") - tolerance)
        for fc in fill_cols:
            out = out.withColumn(fc, F.when(stale, F.lit(None)).otherwise(F.col(fc)))
        out = out.withColumn("__match_ts", F.when(stale, F.lit(None)).otherwise(F.col("__match_ts")))

    keep = [c for c in left.columns]
    renames = dict(zip(fill_cols, value_cols))
    return out.select(
        *keep,
        *[F.col(fc).alias(renames[fc]) for fc in fill_cols],
        F.col("__match_ts").alias("matched_ts"),
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    closed: str = "left",
) -> DataFrame:
    """General interval-dimension join: attach interval-table attributes to
    each left row whose ``value_col`` falls inside [lo, hi).

    The interval side is broadcast (interval dims are small by construction
    — band tables, SLA tiers, rate cards), so the probe side never shuffles:
    a BroadcastNestedLoopJoin whose build side is a few rows. For a STATIC
    interval table known at plan time, prefer ``band_expr`` below — a CASE
    projection with no join node at all.

    ``closed``: 'left' → [lo, hi), 'right' → (lo, hi], 'both' → [lo, hi],
    'neither' → (lo, hi).
    """
    v = left[value_col]
    lo, hi = intervals[lo_col], intervals[hi_col]
    lo_cmp = v >= lo if closed in ("left", "both") else v > lo
    hi_cmp = v <= hi if closed in ("right", "both") else v < hi
    return left.join(F.broadcast(intervals), lo_cmp & hi_cmp)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket: int = 16,
) -> DataFrame:
    """Big-big point-in-interval join over an integer domain: inner-join
    each point row to every interval row with ``lo <= point < hi``
    (half-open), when NEITHER side fits in a broadcast — the case
    :func:`range_join` (broadcast) and :func:`band_expr` (static CASE)
    can't serve. Callers with timestamps convert to an integer unit first
    (epoch days/seconds), keeping the predicate exact.

    Grid bucketing turns the inequality join into an equi-join Catalyst
    can shuffle-hash: each interval is replicated to the ``ceil(width /
    bucket)`` grid cells it spans (``F.sequence`` + ``explode``), each
    point maps to exactly ONE cell, and the join key is the cell id.
    A true-predicate filter after the join removes same-cell non-matches.
    Points are never replicated, so the pair count examined is
    |points| × (intervals overlapping their cell), not |points| ×
    |intervals| — the BroadcastNestedLoopJoin explosion a naive
    inequality join compiles to.

    Scale knobs: pick ``bucket`` near the median interval width — smaller
    buckets replicate intervals more, larger buckets admit more false
    candidates per cell. Hot cells (dense time ranges) behave like any
    skewed equi-join key: AQE skew-join splitting applies because this IS
    a plain equi-join after the rewrite.

    Empty intervals (``hi <= lo``) match nothing and are dropped at the
    explode. Output: all point columns + all interval columns; the sides
    must have disjoint column names (rename before joining) — otherwise
    the post-join lo/hi filter would be ambiguous and any other shared
    name would duplicate in the output.
    """
    if bucket <= 0:
        raise ValueError(f"bucket must be a positive integer, got {bucket}")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(
            f"point_in_interval_join requires disjoint column names, both "
            f"sides carry {sorted(clash)}: rename one side first"
        )
    b = F.lit(int(bucket))
    lo, hi = F.col(lo_col), F.col(hi_col)
    iv = intervals.filter(hi > lo).withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(lo / b).cast("long"), F.floor((hi - 1) / b).cast("long")
            )
        ),
    )
    pt = points.withColumn("__cell", F.floor(F.col(point_col) / b).cast("long"))
    p = F.col(point_col)
    return (
        pt.join(iv, "__cell")
        .filter((p >= F.col(lo_col)) & (p < F.col(hi_col)))
        .drop("__cell")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str] = ("lo", "hi"),
    right_cols: tuple[str, str] = ("lo", "hi"),
    bucket: int = 16,
) -> DataFrame:
    """Big-big interval OVERLAP join over an integer domain: emit one row
    per (left, right) pair whose half-open intervals intersect —
    ``max(l_lo, r_lo) < min(l_hi, r_hi)`` — without broadcasting either
    side and without a distinct/dedup shuffle.

    Same grid rewrite as :func:`point_in_interval_join`, on both sides:
    every interval is exploded to its grid cells and the join key is the
    cell. A pair overlapping k shared cells would surface k times, so the
    join keeps a candidate only in the ONE cell that contains the overlap
    start ``max(l_lo, r_lo)`` — that point lies inside both intervals
    (hi is exclusive), so its cell is guaranteed to be in both explode
    ranges, and the dedup is a free per-row predicate instead of a
    whole-output distinct shuffle.

    Column-name collisions between the two sides are rejected up front
    (rename before joining); output is left columns + right columns.
    """
    if bucket <= 0:
        raise ValueError(f"bucket must be a positive integer, got {bucket}")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(
            f"interval_overlap_join requires disjoint column names, both "
            f"sides carry {sorted(clash)}: rename one side first"
        )
    b = F.lit(int(bucket))
    llo, lhi = F.col(left_cols[0]), F.col(left_cols[1])
    rlo, rhi = F.col(right_cols[0]), F.col(right_cols[1])
    le = left.filter(lhi > llo).withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(llo / b).cast("long"), F.floor((lhi - 1) / b).cast("long")
            )
        ),
    )
    re_ = right.filter(rhi > rlo).withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(rlo / b).cast("long"), F.floor((rhi - 1) / b).cast("long")
            )
        ),
    )
    start = F.greatest(llo, rlo)
    return (
        le.join(re_, "__cell")
        .filter(
            (start < F.least(lhi, rhi))
            & (F.col("__cell") == F.floor(start / b).cast("long"))
        )
        .drop("__cell")
    )


def band_expr(
    bands: Sequence[tuple[str, float, float]],
    value: Column,
) -> Column:
    """Compile a static band table into a single CASE WHEN projection —
    the no-join plan for interval lookup against a table known at plan
    time. First matching band wins (mirrors non-overlapping range_join
    semantics with closed='left'); values outside every band map to null.
    Stays fully inside whole-stage codegen: zero shuffle, zero extra scan.
    """
    expr = None
    for name, lo, hi in bands:
        cond = value >= F.lit(float(lo))
        if hi != float("inf"):
            cond = cond & (value < F.lit(float(hi)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    if expr is None:
        return F.lit(None).cast("string")
    return expr


def bitmap_prefilter_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    m_bits: int = 1 << 22,
) -> DataFrame:
    """Exact semi-join of ``big`` against ``small`` with a broadcast BITMAP
    pre-filter — the runtime-row-filter pattern (Spark's own runtime bloom
    filters, DPP) made explicit as an operator.

    Build side: hash the key of every ``small`` row into an ``m_bits``-wide
    bit array stored as (word_index, 64-bit mask) rows — at the default
    2^22 bits that is ≤ 65,536 rows ≈ 0.5 MB regardless of how many rows
    ``small`` has. Probe side: each ``big`` row joins its word via a
    BROADCAST hash join (map-side, no shuffle of ``big``) and survives only
    if its bit is set. Survivors — typically a tiny fraction when the key
    overlap is selective — then pass through an exact semi-join against
    ``small`` to remove hash false positives, so the RESULT is exactly
    ``big SEMI JOIN small ON on`` while only survivor rows ever reach the
    shuffle. At 100 TB this is the difference between shuffling the full
    fact table and shuffling the matched slice.

    ``on``: key column name(s), same names on both sides.
    """
    on = list(on)
    if not on:
        raise ValueError("join key required")
    for c in on:
        if c not in big.columns or c not in small.columns:
            raise ValueError(f"key column {c!r} must exist on both sides")
    if m_bits < 64 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")

    h = F.pmod(F.xxhash64(*[F.col(c) for c in on]), F.lit(m_bits))
    word = (h / 64).cast("long")
    bit = (h % 64).cast("int")

    bitmap = (
        small.select(word.alias("__w"), bit.alias("__b"))
        .groupBy("__w")
        .agg(F.expr("bit_or(shiftleft(1L, __b))").alias("__mask"))
    )
    survivors = (
        big.withColumn("__w", word)
        .withColumn("__b", bit)
        .join(F.broadcast(bitmap), "__w")
        .filter(F.expr("(shiftright(__mask, __b) & 1L) = 1L"))
        .drop("__w", "__b", "__mask")
    )
    return survivors.join(small.select(*on).distinct(), on, "left_semi")


def nearest_value_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    left_id: str,
    right_id: str,
    n_buckets: int = 64,
) -> DataFrame:
    """1-D nearest-neighbor join: for every left row, the right row whose
    value is CLOSEST (absolute distance), ties broken deterministically by
    (distance, right value, right id) ascending — timestamp/price/sensor
    alignment where asof's one-sided "latest before" is the wrong
    semantic. Returns (left_id, left_val, right_id, right_val, dist).

    Scale design — the classic formulation is a cross join pruned by a
    distance band (guess the band wrong and it's either wrong or
    quadratic). Instead, both sides are range-bucketed on value and merged
    into ONE ordered stream per bucket (the sort-merge discipline, like
    skyline_2d):

    - right rows are deduped to one representative per distinct value
      (min right-id — exactly the tie-break winner), so equal-value ties
      cost nothing downstream;
    - within a bucket, a backward window (last right value at-or-before,
      rights sorting before lefts on equal value) and a forward window
      (first right value after) find both in-bucket candidates in one
      partition-local sort;
    - cross-bucket neighbors come from an O(buckets) boundary table: the
      greatest right value in any EARLIER bucket and the least in any
      LATER bucket, computed with two windows over the tiny per-bucket
      aggregate and broadcast back.

    One shuffle of the merged stream (bucket hash), one broadcast of the
    boundary table; no inequality join ever materializes. Rows with NULL
    values are dropped on both sides; an empty right side yields an empty
    result (inner semantics).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.sql import Window

    l = left.select(
        F.col(left_id).alias("__lid"), F.col(left_val).alias("__lv")
    ).filter(F.col("__lv").isNotNull())
    # one representative per distinct right value: the min id IS the
    # (dist, value, id)-ascending tie-break winner for any query point
    r = (
        right.select(F.col(right_id).alias("__rid"), F.col(right_val).alias("__rv"))
        .filter(F.col("__rv").isNotNull())
        .groupBy("__rv")
        .agg(F.min("__rid").alias("__rid"))
    )

    rng = l.select(F.col("__lv").cast("double").alias("v")).unionByName(
        r.select(F.col("__rv").cast("double").alias("v"))
    ).agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    if rng["lo"] is None:
        return (
            l.select(
                F.col("__lid").alias(left_id),
                F.col("__lv").alias(left_val),
                F.col("__lid").alias(right_id),
                F.col("__lv").alias(right_val),
                F.lit(0.0).alias("dist"),
            ).limit(0)
        )
    lo, hi = float(rng["lo"]), float(rng["hi"])
    width = (hi - lo) or 1.0

    def bucket(col):
        return F.least(
            F.lit(n_buckets - 1),
            F.floor((col.cast("double") - F.lit(lo)) / F.lit(width) * F.lit(n_buckets)).cast("int"),
        )

    rb = r.select("__rv", "__rid", bucket(F.col("__rv")).alias("__b"))

    # O(buckets) boundary table: for bucket b, the right row with the
    # greatest value in ANY earlier bucket and the least in any later one
    per_bucket = rb.groupBy("__b").agg(
        F.max_by(F.struct("__rv", "__rid"), F.col("__rv")).alias("__hi"),
        F.min_by(F.struct("__rv", "__rid"), F.col("__rv")).alias("__lo"),
    )
    all_buckets = l.sparkSession.range(n_buckets).select(F.col("id").cast("int").alias("__b"))
    wprev = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    wnext = Window.orderBy("__b").rowsBetween(1, Window.unboundedFollowing)
    bounds = (
        all_buckets.join(per_bucket, "__b", "left")
        .select(
            "__b",
            F.last("__hi", ignorenulls=True).over(wprev).alias("__prev_nb"),
            F.first("__lo", ignorenulls=True).over(wnext).alias("__next_nb"),
        )
    )

    merged = (
        l.select(
            bucket(F.col("__lv")).alias("__b"),
            F.col("__lv").cast("double").alias("__v"),
            F.lit(0).alias("__is_r"),
            "__lid",
            F.col("__lv").alias("__orig_lv"),
            F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
            F.lit(None).cast(r.schema["__rid"].dataType).alias("__rid"),
        )
        .unionByName(
            rb.select(
                "__b",
                F.col("__rv").cast("double").alias("__v"),
                F.lit(1).alias("__is_r"),
                F.lit(None).cast(l.schema["__lid"].dataType).alias("__lid"),
                F.lit(None).cast(l.schema["__lv"].dataType).alias("__orig_lv"),
                "__rv",
                "__rid",
            )
        )
    )
    # rights sort BEFORE lefts at equal value so the backward neighbor
    # includes an exact match (dist 0)
    order = [F.col("__v").asc(), F.col("__is_r").desc()]
    wback = Window.partitionBy("__b").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wfwd = Window.partitionBy("__b").orderBy(*order).rowsBetween(
        0, Window.unboundedFollowing
    )
    cand = (
        merged.withColumn(
            "__back",
            F.last(
                F.when(F.col("__is_r") == 1, F.struct("__rv", "__rid")),
                ignorenulls=True,
            ).over(wback),
        )
        .withColumn(
            "__fwd",
            F.first(
                F.when(F.col("__is_r") == 1, F.struct("__rv", "__rid")),
                ignorenulls=True,
            ).over(wfwd),
        )
        .filter(F.col("__is_r") == 0)
        .join(F.broadcast(bounds), "__b")
        .withColumn("__back", F.coalesce(F.col("__back"), F.col("__prev_nb")))
        .withColumn("__fwd", F.coalesce(F.col("__fwd"), F.col("__next_nb")))
    )

    def dist(c):
        return F.abs(F.col("__v") - c.getField("__rv").cast("double"))

    b, f = F.col("__back"), F.col("__fwd")
    pick_back = f.isNull() | (
        b.isNotNull()
        & (
            (dist(b) < dist(f))
            | (
                (dist(b) == dist(f))
                & (
                    (b.getField("__rv") < f.getField("__rv"))
                    | (
                        (b.getField("__rv") == f.getField("__rv"))
                        & (b.getField("__rid") <= f.getField("__rid"))
                    )
                )
            )
        )
    )
    chosen = cand.withColumn("__nn", F.when(pick_back, b).otherwise(f)).filter(
        F.col("__nn").isNotNull()
    )
    return chosen.select(
        F.col("__lid").alias(left_id),
        F.col("__orig_lv").alias(left_val),
        F.col("__nn").getField("__rid").alias(right_id),
        F.col("__nn").getField("__rv").alias(right_val),
        F.abs(F.col("__v") - F.col("__nn").getField("__rv").cast("double")).alias("dist"),
    )


def nearest_value_join_oracle_sql(
    left_sql: str,
    right_sql: str,
    left_val: str,
    right_val: str,
    left_id: str,
    right_id: str,
) -> str:
    """DuckDB replica of :func:`nearest_value_join` — the quadratic
    LATERAL-order-by the dataflow operator exists to avoid. Right rows are
    deduped to min-id per value exactly like the operator."""
    return f"""
WITH l AS MATERIALIZED (
    SELECT {left_id} AS lid, {left_val} AS lv FROM ({left_sql})
    WHERE {left_val} IS NOT NULL
),
r AS MATERIALIZED (
    SELECT {right_val} AS rv, min({right_id}) AS rid FROM ({right_sql})
    WHERE {right_val} IS NOT NULL GROUP BY {right_val}
)
SELECT l.lid AS {left_id}, l.lv AS {left_val},
       nn.rid AS {right_id}, nn.rv AS {right_val},
       abs(CAST(l.lv AS DOUBLE) - CAST(nn.rv AS DOUBLE)) AS dist
FROM l, LATERAL (
    SELECT rid, rv FROM r
    ORDER BY abs(CAST(l.lv AS DOUBLE) - CAST(rv AS DOUBLE)), rv, rid
    LIMIT 1
) nn
"""


def epsilon_band_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_val: str,
    right_id: str,
    right_val: str,
    eps: int,
) -> DataFrame:
    """Symmetric ε-band join over INTEGER measures (epoch micros, cents,
    fixed-point scores): every (left, right) pair with |l − r| <= eps —
    the proximity-matching primitive (events within a second of each
    other, prices within a tick, near-simultaneous readings) that a
    plain theta join would execute as a cartesian product.

    Exactness contract: values are integers (cast to long) and ``eps``
    an integer, so membership is exact integer arithmetic — no float
    boundary ulps. Returns (left_id, right_id, diff) with
    diff = r − l ∈ [−eps, +eps]. NULL values never match.

    Plan shape at 100 TB: grid bucketing with width eps — the right side
    carries one row per record keyed by floor(v/eps); the left side
    explodes to its 3 candidate buckets (b−1, b, b+1 — any partner within
    eps lives there) JVM-side, then ONE bucket-keyed equi-join + the
    exact band filter. Shuffle volume is 3·|L| + |R| skinny rows; output
    is the true pair count. A hot bucket (many equal values) is the
    caller's density warning — profile.join_size_profile on the bucket
    key is the pre-flight. Catalyst would otherwise plan |L|·|R| BNLJ:
    test_plan_quality pins the equi-join shape.
    """
    if eps < 1:
        raise ValueError(f"eps must be >= 1, got {eps}")
    lv = F.col(left_val).cast("long")
    rv = F.col(right_val).cast("long")
    # floor division toward -inf for negatives: Spark's div truncates
    # toward zero, so subtract the non-negative pmod first — the result
    # is an exact multiple of eps, and DECIMAL division keeps it exact
    # at any long magnitude (double division would lose ulps past 2^53)
    def bucket(v):
        return (
            (v - _pmod(v, eps)).cast("decimal(38,0)") / F.lit(int(eps))
        ).cast("long")

    r = right.filter(rv.isNotNull()).select(
        F.col(right_id).alias("__rid"),
        rv.alias("__rv"),
        bucket(rv).alias("__b"),
    )
    l = left.filter(lv.isNotNull()).select(
        F.col(left_id).alias("__lid"),
        lv.alias("__lv"),
        F.explode(
            F.array(*[bucket(lv) + F.lit(d) for d in (-1, 0, 1)])
        ).alias("__b"),
    )
    return (
        l.join(r, "__b")
        .filter(F.abs(F.col("__rv") - F.col("__lv")) <= F.lit(int(eps)))
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            (F.col("__rv") - F.col("__lv")).alias("diff"),
        )
    )


def _pmod(v, m: int):
    """Non-negative modulo (Spark's % keeps the dividend's sign)."""
    return F.pmod(v, F.lit(int(m)))


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_x: str,
    left_y: str,
    right_id: str,
    right_x: str,
    right_y: str,
    radius: int,
) -> DataFrame:
    """2-D radius join over INTEGER coordinates (scaled lat/lon
    microdegrees, grid metres, pixel space): every (left, right) pair with
    squared euclidean distance <= radius² — the spatial proximity
    primitive (points of interest near a site, co-located readings,
    near-duplicate detections) that a plain theta join would execute as a
    cartesian product.

    Exactness contract: coordinates cast to long, ``radius`` an integer,
    membership decided by exact long arithmetic dx²+dy² <= r² — no
    haversine floats, no boundary ulps. Returns (left_id, right_id,
    dist_sq). NULL coordinates never match.

    Plan shape at 100 TB: the 2-D extension of
    :func:`epsilon_band_join`'s grid bucketing — the right side carries
    one row per record keyed by its (⌊x/r⌋, ⌊y/r⌋) cell; the left side
    explodes to its 9 candidate cells JVM-side (any partner within r
    lives in the 3×3 neighbourhood), then ONE cell-keyed equi-join + the
    exact distance filter. Shuffle volume is 9·|L| + |R| skinny rows and
    the per-cell pair count is density-bounded by construction (a cell is
    r×r); Catalyst would otherwise plan |L|·|R| BNLJ —
    test_plan_quality pins the equi-join shape. Overflow fence: within
    joined cells |dx|,|dy| <= 2r so dx²+dy² <= 8r², exact in a long for
    r <= 2³⁰ — enforced below rather than silently wrapping.
    """
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    if radius > (1 << 30):
        raise ValueError(
            f"radius {radius} > 2^30: dx^2+dy^2 could exceed long range "
            "inside joined cells; rescale the coordinate grid"
        )

    def cell(v):
        # floor division toward -inf (Spark div truncates toward zero);
        # DECIMAL keeps the multiple exact at any long magnitude
        return (
            (v - _pmod(v, radius)).cast("decimal(38,0)") / F.lit(int(radius))
        ).cast("long")

    rx = F.col(right_x).cast("long")
    ry = F.col(right_y).cast("long")
    r = right.filter(rx.isNotNull() & ry.isNotNull()).select(
        F.col(right_id).alias("__rid"),
        rx.alias("__rx"),
        ry.alias("__ry"),
        cell(rx).alias("__cx"),
        cell(ry).alias("__cy"),
    )
    lx = F.col(left_x).cast("long")
    ly = F.col(left_y).cast("long")
    l = (
        left.filter(lx.isNotNull() & ly.isNotNull())
        .select(
            F.col(left_id).alias("__lid"),
            lx.alias("__lx"),
            ly.alias("__ly"),
            F.explode(
                F.array(*[cell(lx) + F.lit(d) for d in (-1, 0, 1)])
            ).alias("__cx"),
            cell(ly).alias("__cy0"),
        )
        .select(
            "__lid",
            "__lx",
            "__ly",
            "__cx",
            F.explode(
                F.array(*[F.col("__cy0") + F.lit(d) for d in (-1, 0, 1)])
            ).alias("__cy"),
        )
    )
    dx = F.col("__rx") - F.col("__lx")
    dy = F.col("__ry") - F.col("__ly")
    return (
        l.join(r, ["__cx", "__cy"])
        .filter(dx * dx + dy * dy <= F.lit(int(radius) * int(radius)))
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            (dx * dx + dy * dy).alias("dist_sq"),
        )
    )


def grid_radius_join_oracle_sql(
    left_sql: str, right_sql: str, left_id: str, right_id: str, radius: int
) -> str:
    """DuckDB replica of :func:`grid_radius_join` — the plain theta join
    (correct by definition; the operator's 3×3 grid bucketing must
    reproduce it exactly). ``left_sql`` yields (lid, lx, ly),
    ``right_sql`` (rid, rx, ry), integer coordinates."""
    return f"""
SELECT l.lid AS {left_id}, r.rid AS {right_id},
       CAST((r.rx - l.lx) * (r.rx - l.lx)
          + (r.ry - l.ly) * (r.ry - l.ly) AS BIGINT) AS dist_sq
FROM ({left_sql}) l JOIN ({right_sql}) r
  ON l.lx IS NOT NULL AND l.ly IS NOT NULL
 AND r.rx IS NOT NULL AND r.ry IS NOT NULL
 AND (r.rx - l.lx) * (r.rx - l.lx) + (r.ry - l.ly) * (r.ry - l.ly)
     <= {int(radius) * int(radius)}
"""


def epsilon_band_join_oracle_sql(
    left_sql: str, right_sql: str, left_id: str, right_id: str, eps: int
) -> str:
    """DuckDB replica of :func:`epsilon_band_join` — the plain theta join
    (correct by definition; the operator's grid bucketing must reproduce
    it exactly). ``left_sql`` yields (lid, lv), ``right_sql`` (rid, rv),
    integer values."""
    return f"""
SELECT l.lid AS {left_id}, r.rid AS {right_id},
       CAST(r.rv - l.lv AS BIGINT) AS diff
FROM ({left_sql}) l JOIN ({right_sql}) r
  ON l.lv IS NOT NULL AND r.rv IS NOT NULL
 AND abs(r.rv - l.lv) <= {int(eps)}
"""


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join with DIRECTION — the full pandas ``merge_asof``
    surface (backward / forward / nearest) for the epoch-seconds
    domain, returning each left row plus ``matched_epoch`` (the chosen
    right timestamp as a BIGINT epoch, NULL when nothing qualifies).

    * backward: latest right ≤ left (inclusive) — :func:`asof_join`'s
      semantics, restated here in the epoch domain.
    * forward: earliest right ≥ left (inclusive).
    * nearest: whichever of the two candidates has the smaller
      |gap|; an exact tie prefers the BACKWARD candidate (documented —
      a tie means both sides are equally fresh, and preferring the
      past never leaks the future into point-in-time features).

    ``tolerance_seconds`` (optional) nulls out candidates farther than
    the tolerance in the match direction BEFORE the nearest-pick, so a
    one-sided miss still falls back to the other side.

    Implementation: the same union + ordered-window formulation as
    :func:`asof_join` — ONE shuffle on (key, ts), a backward
    last(ignorenulls) fill and a forward first(ignorenulls) fill over
    the same sorted partition, never a pair join. Equal timestamps are
    inclusive in BOTH directions (right rows sort before left for the
    backward fill; the forward fill's frame starts at the current row
    and right rows at the same ts are reachable because the frame is
    ordered by (ts, side) with left first only for lookahead — see the
    per-direction orderings below).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction}")
    right_ts = right_ts or left_ts
    on = list(on)
    l = left.select(
        *left.columns,
        F.col(left_ts).cast("timestamp").cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
    )
    r = right.select(
        *on,
        F.col(right_ts).cast("timestamp").cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # backward: right rows (side 0) sort BEFORE left at equal ts -> the
    # frame [unbounded, current] includes the equal-ts right row
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: same physical sort; the frame [current, unbounded]
    # still reaches an equal-ts right row ONLY if it sorts at-or-after
    # the left row, so order (ts, side DESC) for this fill — Spark
    # allows a different orderBy per window over one shuffle because
    # both orderings share the (key, ts) sort prefix and side is tiny
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    r_ts = F.when(F.col("__side") == 0, F.col("__ts"))
    u = u.withColumn("__back", F.last(r_ts, ignorenulls=True).over(wb)).withColumn(
        "__fwd", F.first(r_ts, ignorenulls=True).over(wf)
    )
    out = u.filter(F.col("__side") == 1)
    back, fwd, ts = F.col("__back"), F.col("__fwd"), F.col("__ts")
    if tolerance_seconds is not None:
        tol = F.lit(int(tolerance_seconds))
        back = F.when(ts - back <= tol, back)
        fwd = F.when(fwd - ts <= tol, fwd)
    if direction == "backward":
        chosen = back
    elif direction == "forward":
        chosen = fwd
    else:
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(fwd - ts < ts - back, fwd)
            .otherwise(back)  # tie -> backward
        )
    return out.select(*left.columns, chosen.cast("long").alias("matched_epoch"))


def asof_directional_oracle_sql(
    left_sql: str,
    right_sql: str,
    key: str,
    direction: str,
    tolerance_seconds: int | None,
    out_cols: Sequence[str],
) -> str:
    """DuckDB replica of :func:`asof_join_directional`. ``left_sql``
    yields (key, ts_epoch BIGINT, *out_cols); ``right_sql`` yields
    (key, ts_epoch). Identical union + two-window formulation and
    tie rule."""
    cols = ", ".join(out_cols)
    tol_back = (
        f"CASE WHEN __ts - __back <= {int(tolerance_seconds)} THEN __back END"
        if tolerance_seconds is not None
        else "__back"
    )
    tol_fwd = (
        f"CASE WHEN __fwd - __ts <= {int(tolerance_seconds)} THEN __fwd END"
        if tolerance_seconds is not None
        else "__fwd"
    )
    if direction == "backward":
        chosen = "b2"
    elif direction == "forward":
        chosen = "f2"
    else:
        chosen = (
            "CASE WHEN b2 IS NULL THEN f2 WHEN f2 IS NULL THEN b2 "
            "WHEN f2 - __ts < __ts - b2 THEN f2 ELSE b2 END"
        )
    return f"""
WITH l AS ({left_sql}), r AS ({right_sql}),
u AS (
    SELECT {key}, ts_epoch AS __ts, 1 AS __side, {cols} FROM l
    UNION ALL BY NAME
    SELECT {key}, ts_epoch AS __ts, 0 AS __side FROM r
), filled AS (
    SELECT *,
           last_value(CASE WHEN __side = 0 THEN __ts END IGNORE NULLS)
               OVER (PARTITION BY {key} ORDER BY __ts ASC, __side ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS __back,
           first_value(CASE WHEN __side = 0 THEN __ts END IGNORE NULLS)
               OVER (PARTITION BY {key} ORDER BY __ts ASC, __side DESC
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS __fwd
    FROM u
), tol AS (
    SELECT *, {tol_back} AS b2, {tol_fwd} AS f2 FROM filled WHERE __side = 1
)
SELECT {key}, {cols}, CAST({chosen} AS BIGINT) AS matched_epoch FROM tol
"""
