

# -- rrf_fusion ---------------------------------------------------------------


def test_rrf_fusion_hand_worked(spark):
    import pytest

    from aleph2_contrib_spark.operators.similarity import rrf_fusion

    # list A ranks: b(10)=1, a(5)=2, c(1)=3 ; list B ranks: a(9)=1, c(2)=2
    la = spark.createDataFrame([("a", 5), ("b", 10), ("c", 1)], "doc string, s long")
    lb = spark.createDataFrame([("a", 9), ("c", 2), (None, 99)], "doc string, s long")
    got = {
        r["id"]: (r["n_lists"], r["rrf_f6"])
        for r in rrf_fusion(
            [("A", la, "doc", "s"), ("B", lb, "doc", "s")], k0=60
        ).collect()
    }
    t = lambda r: 1000000 // (60 + r)
    assert got == {
        "a": (2, t(2) + t(1)),
        "b": (1, t(1)),
        "c": (2, t(3) + t(2)),
    }
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fusion([])
    with pytest.raises(ValueError, match="k0"):
        rrf_fusion([("A", la, "doc", "s")], k0=0)


def test_rrf_fusion_tie_break_and_oracle(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.similarity import (
        rrf_fusion,
        rrf_fusion_oracle_sql,
    )

    rnd = random.Random(17)
    rows_a = [(i, rnd.randint(1, 8)) for i in range(60)]   # heavy ties
    rows_b = [(i, rnd.randint(1, 8)) for i in range(5, 70)]
    la = spark.createDataFrame(rows_a, "id long, s long")
    lb = spark.createDataFrame(rows_b, "id long, s long")
    pa, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    la.coalesce(1).write.parquet(pa)
    lb.coalesce(1).write.parquet(pb)
    got = {tuple(x) for x in rrf_fusion([("A", la, "id", "s"), ("B", lb, "id", "s")]).collect()}
    sql = rrf_fusion_oracle_sql(
        [f"SELECT id, s FROM '{pa}/*.parquet'", f"SELECT id, s FROM '{pb}/*.parquet'"]
    )
    want = {tuple(x) for x in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) > 0
