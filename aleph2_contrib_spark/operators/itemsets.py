"""Frequent-itemset mining (Apriori levels 1-3) over (transaction, item)
pairs — the classic market-basket operator the reference's basket analytics
(pair lift, `operators/events.py:162`) stops short of; extends the same
event-derived baskets to support-pruned itemsets of size up to 3.

Scale design: the naive formulation enumerates every k-subset of every
transaction — O(Σ |t| choose k), a combinatorial explosion at 100 TB. The
Apriori downward-closure property is applied INSIDE the joins instead:

- level 1 is one partial-aggregated groupBy;
- level-2 pair enumeration only joins items that survived level 1 (a
  broadcast semi-join prunes the self-join inputs BEFORE the pair blowup);
- level-3 extension only grows occurrences of frequent PAIRS (semi-join on
  L2), and every extension is checked against BOTH of its other sub-pairs
  (full Apriori pruning) before it is ever counted.

Every join is on txn_id — one co-partitioned shuffle domain — and the
frequent-set side of each semi-join is support-bounded (≤ n_txns / minsup
entries), so Spark broadcasts it. No per-transaction subset explosion ever
materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_itemsets(
    transactions: DataFrame,
    txn_col: str = "txn_id",
    item_col: str = "item",
    minsup: int = 2,
    max_size: int = 3,
) -> DataFrame:
    """Support-pruned frequent itemsets of size 1..``max_size`` (≤ 3).

    ``transactions``: one row per (transaction, item); duplicates are
    collapsed (set semantics — an item counts once per transaction).
    Returns (size, i1, i2, i3, support) with NULL padding for the unused
    item slots; items within a set are ordered ``i1 < i2 < i3`` so each
    itemset appears exactly once.
    """
    if minsup < 1:
        raise ValueError(f"minsup must be >= 1, got {minsup}")
    if not 1 <= max_size <= 3:
        raise ValueError(f"max_size must be in 1..3, got {max_size}")

    tx = transactions.select(
        F.col(txn_col).alias("__t"), F.col(item_col).alias("__i")
    ).distinct()

    l1 = (
        tx.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= minsup)
    )
    out = l1.select(
        F.lit(1).alias("size"),
        F.col("__i").alias("i1"),
        F.lit(None).cast("string").alias("i2"),
        F.lit(None).cast("string").alias("i3"),
        "support",
    )
    if max_size == 1:
        return out

    # prune the transaction stream to frequent items BEFORE any self-join:
    # this is the level-1 Apriori cut, and it is the difference between
    # joining the raw stream and joining only its frequent subset
    f1 = l1.select("__i")
    txf = tx.join(F.broadcast(f1), "__i").select("__t", "__i")

    a, b = txf.alias("a"), txf.alias("b")
    pair_occ = a.join(b, "__t").filter(F.col("a.__i") < F.col("b.__i")).select(
        "__t", F.col("a.__i").alias("i1"), F.col("b.__i").alias("i2")
    )
    l2 = (
        pair_occ.groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= minsup)
    )
    out = out.unionByName(
        l2.select(
            F.lit(2).alias("size"),
            "i1",
            "i2",
            F.lit(None).cast("string").alias("i3"),
            "support",
        )
    )
    if max_size == 2:
        return out

    # level 3: extend only occurrences of FREQUENT pairs (semi-join on L2),
    # and require both remaining sub-pairs (i1,i3) and (i2,i3) frequent —
    # downward closure applied before the count, not after
    f2 = l2.select("i1", "i2")
    p2 = pair_occ.join(F.broadcast(f2), ["i1", "i2"], "left_semi")
    ext = (
        p2.join(txf.alias("c"), "__t")
        .filter(F.col("c.__i") > F.col("i2"))
        .select("__t", "i1", "i2", F.col("c.__i").alias("i3"))
        .join(
            F.broadcast(f2.select(F.col("i1"), F.col("i2").alias("i3"))),
            ["i1", "i3"],
            "left_semi",
        )
        .join(
            F.broadcast(f2.select(F.col("i1").alias("i2"), F.col("i2").alias("i3"))),
            ["i2", "i3"],
            "left_semi",
        )
    )
    l3 = (
        ext.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= minsup)
    )
    return out.unionByName(l3.select(F.lit(3).alias("size"), "i1", "i2", "i3", "support"))


def frequent_itemsets_oracle_sql(txn_sql: str, minsup: int, max_size: int = 3) -> str:
    """DuckDB replica of :func:`frequent_itemsets`. ``txn_sql`` must yield
    (txn_id, item); same Apriori joins spelled in ANSI SQL."""
    if not 1 <= max_size <= 3:
        raise ValueError(f"max_size must be in 1..3, got {max_size}")
    sql = f"""
WITH tx AS MATERIALIZED (SELECT DISTINCT txn_id AS t, item AS i FROM ({txn_sql})),
l1 AS MATERIALIZED (
    SELECT i, count(*) AS support FROM tx GROUP BY i HAVING count(*) >= {minsup}
),
txf AS MATERIALIZED (SELECT tx.t, tx.i FROM tx JOIN l1 ON tx.i = l1.i),
pair_occ AS MATERIALIZED (
    SELECT a.t, a.i AS i1, b.i AS i2
    FROM txf a JOIN txf b ON a.t = b.t AND a.i < b.i
),
l2 AS MATERIALIZED (
    SELECT i1, i2, count(*) AS support FROM pair_occ
    GROUP BY i1, i2 HAVING count(*) >= {minsup}
),
l3 AS MATERIALIZED (
    SELECT p.i1, p.i2, c.i AS i3, count(*) AS support
    FROM pair_occ p
    JOIN l2 ON p.i1 = l2.i1 AND p.i2 = l2.i2
    JOIN txf c ON c.t = p.t AND c.i > p.i2
    WHERE EXISTS (SELECT 1 FROM l2 x WHERE x.i1 = p.i1 AND x.i2 = c.i)
      AND EXISTS (SELECT 1 FROM l2 x WHERE x.i1 = p.i2 AND x.i2 = c.i)
    GROUP BY p.i1, p.i2, c.i HAVING count(*) >= {minsup}
)
SELECT 1 AS size, i AS i1, CAST(NULL AS VARCHAR) AS i2, CAST(NULL AS VARCHAR) AS i3,
       support FROM l1
"""
    if max_size >= 2:
        sql += (
            "UNION ALL SELECT 2, i1, i2, CAST(NULL AS VARCHAR), support FROM l2\n"
        )
    if max_size >= 3:
        sql += "UNION ALL SELECT 3, i1, i2, i3, support FROM l3\n"
    return sql
