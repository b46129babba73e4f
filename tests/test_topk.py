"""exact_topk: TPUT-style pruned top-k must equal the plain aggregate
whenever it certifies, and must refuse rather than approximate when the
bound fails."""

import random

import pytest
from pyspark.sql import functions as F

from aleph2_contrib_spark.operators.topk import exact_topk


def _plain_topk(df, keys, k):
    order = [F.col("cnt").desc()] + [F.col(c).asc() for c in keys]
    return (
        df.na.drop(subset=keys)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(*order)
        .limit(k)
        .collect()
    )


def _zipf_rows(n, vocab, seed):
    rng = random.Random(seed)
    # approximate Zipf by repeated halving of mass over ranks
    return [(f"w{min(int(rng.paretovariate(1.1)), vocab)}",) for _ in range(n)]


def test_topk_matches_plain_aggregate_on_zipf(spark):
    df = spark.createDataFrame(_zipf_rows(20000, 500, 3), ["tok"])
    got = exact_topk(df, ["tok"], 10).collect()
    want = _plain_topk(df, ["tok"], 10)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_topk_partition_invariant(spark):
    rows = _zipf_rows(8000, 200, 5)
    a = spark.createDataFrame(rows, ["tok"]).repartition(2)
    b = spark.createDataFrame(rows, ["tok"]).repartition(17)
    ra = [tuple(r) for r in exact_topk(a, ["tok"], 8).collect()]
    rb = [tuple(r) for r in exact_topk(b, ["tok"], 8).collect()]
    assert ra == rb and len(ra) == 8


def test_topk_multi_key_and_ties(spark):
    rows = [("a", 1)] * 5 + [("b", 2)] * 5 + [("c", 3)] * 2 + [("a", 9)] * 2
    df = spark.createDataFrame(rows, ["x", "y"])
    got = [tuple(r) for r in exact_topk(df, ["x", "y"], 3).collect()]
    # ties: cnt desc then x asc, y asc
    assert got == [("a", 1, 5), ("b", 2, 5), ("a", 9, 2)]


def test_topk_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",)], ["tok"]
    )
    got = [tuple(r) for r in exact_topk(df, ["tok"], 2).collect()]
    assert got == [("a", 2), ("b", 1)]


def test_topk_uniform_data_refuses_to_approximate(spark):
    # every key distinct per row spread over many partitions: pruning can
    # never certify -> must raise, not return a plausible-looking answer
    df = (
        spark.range(0, 5000)
        .select(F.col("id").cast("string").alias("tok"))
        .repartition(16)
    )
    with pytest.raises(ValueError, match="cannot certify"):
        exact_topk(df, ["tok"], 5, local_budget=5)


def test_topk_fewer_distinct_than_k_without_pruning(spark):
    df = spark.createDataFrame([("a",)] * 3 + [("b",)], ["tok"])
    got = [tuple(r) for r in exact_topk(df, ["tok"], 10).collect()]
    assert got == [("a", 3), ("b", 1)]
