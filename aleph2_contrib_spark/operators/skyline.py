"""Skyline (Pareto-frontier) queries: rows not dominated by any other row
across a set of criteria — multi-criteria shortlisting (cheapest-AND-best
suppliers, price/quality corpus filtering, model-selection frontiers). The
reference exposes generic query + SQL surfaces; the skyline is the classic
operator that is painful in pure SQL (quadratic NOT EXISTS) and natural as
a dataflow program.

Two implementations:

- :func:`skyline_2d` — the scalable 2-criteria path, pure JVM Column
  program, ONE data-sized shuffle. Points are range-bucketed on x; a
  bucket-level prefix-min of y (an O(buckets) table) eliminates
  cross-bucket domination, and a within-bucket running-min window
  eliminates local domination. No self-joins, no single global window:
  the classic sort-filter skyline, parallelized by bucket.

- :func:`skyline` — any number of criteria, each MIN or MAX: per-partition
  local skyline (vectorized numpy dominance inside ``mapInPandas``)
  followed by a final exact pass on the gathered candidates. Local
  skylines are sound (a globally non-dominated point is non-dominated in
  every subset containing it), so the reduce input is already pruned;
  frontier sizes are tiny in practice, and the final pass degrades
  gracefully but is capped (fail-fast) to keep the single-task step
  honest.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = True,
    minimize_y: bool = True,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact 2-criteria skyline over DISTINCT (x, y) points.

    A point p dominates q when p is no worse on both criteria and strictly
    better on at least one. Returns the non-dominated (x_col, y_col) rows.
    MAX criteria are handled by negating into MIN space internally, so the
    core only reasons about minimization.

    Plan: distinct → two O(1)-row aggregates for the x range → bucket by x
    value (equal x always lands in one bucket, so earlier buckets are
    STRICTLY smaller x) → per-bucket min-y groupBy → prefix-min over the
    O(buckets) table (single tiny window) → one within-bucket window
    ordered (x, y) with a running min over preceding rows. A point is
    dominated iff the strictly-earlier-bucket prefix min ≤ its y, or the
    within-bucket preceding min ≤ its y (preceding-in-order ⇒ x smaller,
    or x equal with y smaller, on distinct points). One shuffle of the
    data (bucket hash), one broadcast of the prefix table.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.sql import Window

    sx = F.col(x_col) if minimize_x else -F.col(x_col)
    sy = F.col(y_col) if minimize_y else -F.col(y_col)
    pts = df.select(
        F.col(x_col).alias("__ox"),
        F.col(y_col).alias("__oy"),
        sx.cast("double").alias("__bx"),
        sx.alias("__x"),
        sy.alias("__y"),
    ).distinct()

    rng = pts.agg(
        F.min("__bx").alias("lo"), F.max("__bx").alias("hi")
    ).first()
    if rng["lo"] is None:
        return pts.select(F.col("__ox").alias(x_col), F.col("__oy").alias(y_col)).limit(0)
    lo, hi = float(rng["lo"]), float(rng["hi"])
    width = (hi - lo) or 1.0
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("__bx") - F.lit(lo)) / F.lit(width) * F.lit(n_buckets)).cast("int"),
    ).alias("__b")
    pb = pts.select("__ox", "__oy", "__x", "__y", bucket)

    # prefix min of y over STRICTLY earlier buckets — O(n_buckets) rows,
    # the single-partition window is free at that size
    wprev = (
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        pb.groupBy("__b")
        .agg(F.min("__y").alias("__bmin"))
        .select("__b", F.min("__bmin").over(wprev).alias("__prev_bucket_min"))
    )

    win = Window.partitionBy("__b").orderBy(
        F.col("__x").asc(), F.col("__y").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    out = (
        pb.join(F.broadcast(prefix), "__b")
        .withColumn("__prev_min", F.min("__y").over(win))
        .filter(
            (F.col("__prev_min").isNull() | (F.col("__prev_min") > F.col("__y")))
            & (
                F.col("__prev_bucket_min").isNull()
                | (F.col("__prev_bucket_min") > F.col("__y"))
            )
        )
    )
    return out.select(F.col("__ox").alias(x_col), F.col("__oy").alias(y_col))


def skyline(
    df: DataFrame,
    criteria: Sequence[tuple[str, str]],
    max_frontier: int = 200_000,
) -> DataFrame:
    """Exact skyline for any number of criteria.

    ``criteria``: [(column, "min" | "max"), ...]. Returns the distinct
    non-dominated rows projected to the criteria columns.

    Scale design: stage 1 computes a LOCAL skyline inside every Arrow
    batch via ``mapInPandas`` (vectorized numpy dominance — each kept
    point is checked against the running frontier; sound because global
    skyline points survive in any subset). Stage 2 repartitions the
    surviving candidates to one task and runs the same exact filter once —
    frontier sizes are small for correlated data, and the stage-2 input is
    counted first and FAILS FAST above ``max_frontier`` rather than
    silently serializing an unbounded set through one task (d-dim
    anti-correlated worst cases need a partitioned d>2 skyline; use
    :func:`skyline_2d` for the 2-criteria case, which has no such cap).
    """
    if not criteria:
        raise ValueError("at least one criterion required")
    for c, d in criteria:
        if d not in ("min", "max"):
            raise ValueError(f"direction must be 'min' or 'max', got {d!r}")
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    cols = [c for c, _ in criteria]
    pts = df.select(*cols).distinct()
    schema = pts.schema
    # minimize-space copy for the dominance math, original values carried
    signs = [1.0 if d == "min" else -1.0 for _, d in criteria]

    def _local_skyline(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf[cols].to_numpy(dtype="float64") * np.asarray(signs)
            keep_rows = []
            frontier = np.empty((0, vals.shape[1]))
            # sort by sum of criteria: likely dominators come first, so the
            # frontier stays small while scanning
            order = np.argsort(vals.sum(axis=1), kind="stable")
            for i in order:
                v = vals[i]
                if len(frontier) and (
                    ((frontier <= v).all(axis=1) & (frontier < v).any(axis=1)).any()
                ):
                    continue
                frontier = np.vstack([frontier, v])
                keep_rows.append(i)
            yield pdf.iloc[sorted(keep_rows)]

    def _exact_skyline(batches):
        # Final single-task pass. Arrow hands the partition over as MULTIPLE
        # batches (arrow.maxRecordsPerBatch); the dominance frontier must
        # span all of them, so concatenate before filtering — a per-batch
        # frontier would let a point survive whose dominator sits in a
        # different batch.
        import pandas as pd

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        yield from _local_skyline([pd.concat(pdfs, ignore_index=True)])

    local = pts.mapInPandas(_local_skyline, schema=schema)
    n_candidates = local.count()
    if n_candidates > max_frontier:
        raise ValueError(
            f"stage-2 skyline input has {n_candidates} candidates "
            f"(> max_frontier={max_frontier}); partition the data or use "
            "skyline_2d for 2-criteria skylines"
        )
    return local.repartition(1).mapInPandas(_exact_skyline, schema=schema)


def skyline_oracle_sql(
    points_sql: str, criteria: Sequence[tuple[str, str]]
) -> str:
    """ANSI-SQL replica (quadratic NOT EXISTS dominance) for differential
    testing — the formulation the dataflow operator exists to avoid.
    ``points_sql`` must yield exactly the criteria columns."""
    conds = []
    stricts = []
    for c, d in criteria:
        op = "<=" if d == "min" else ">="
        sop = "<" if d == "min" else ">"
        conds.append(f"o.{c} {op} p.{c}")
        stricts.append(f"o.{c} {sop} p.{c}")
    return f"""
WITH pts AS MATERIALIZED (SELECT DISTINCT * FROM ({points_sql}))
SELECT * FROM pts p
WHERE NOT EXISTS (
    SELECT 1 FROM pts o
    WHERE {" AND ".join(conds)} AND ({" OR ".join(stricts)})
)
"""
