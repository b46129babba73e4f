

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


def test_random_projection_exact_f6(spark):
    import hashlib

    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.similarity import (
        jl_sign_matrix,
        random_projection_f6,
    )

    vecs = [
        Row(vec_id=1, embedding=[0.5, -1.25, 2.0, 0.1]),
        Row(vec_id=2, embedding=[0.0, 0.0, 0.0, 0.0]),
        Row(vec_id=3, embedding=[1.0, 2.0, 3.0]),  # wrong dim -> dropped
        Row(vec_id=4, embedding=None),  # NULL -> dropped
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in random_projection_f6(
        df, "embedding", "vec_id", dim=4, k=3, seed="t").collect()}
    assert set(out) == {1, 2}

    signs = jl_sign_matrix(4, 3, seed="t")
    # the matrix is the documented md5-parity construction
    for j in range(3):
        for i in range(4):
            b = hashlib.md5(f"t:{j}:{i}".encode()).digest()[0]
            assert signs[j][i] == (1 if b % 2 == 0 else -1)

    import math

    xf = [math.floor(x * 1_000_000.0) for x in [0.5, -1.25, 2.0, 0.1]]
    for j in range(3):
        exp = sum(s * v for s, v in zip(signs[j], xf))
        assert out[1][f"p{j:02d}"] == exp
    assert all(out[2][f"p{j:02d}"] == 0 for j in range(3))


def test_random_projection_preserves_relative_distance(spark):
    """JL sanity: identical vectors project identically; a far vector
    stays far in the projected space (sign test, not a distortion
    proof)."""
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.similarity import random_projection_f6

    a = [1.0] * 16
    far = [100.0 if i % 2 else -100.0 for i in range(16)]
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=a), Row(vec_id=2, embedding=list(a)),
         Row(vec_id=3, embedding=far)],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in random_projection_f6(
        df, "embedding", "vec_id", dim=16, k=4).collect()}
    p = lambda r: [rows[r][f"p{j:02d}"] for j in range(4)]
    assert p(1) == p(2)
    d12 = sum((x - y) ** 2 for x, y in zip(p(1), p(2)))
    d13 = sum((x - y) ** 2 for x, y in zip(p(1), p(3)))
    assert d12 == 0 and d13 > 0


def test_sign_hamming_codes_bits(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.similarity import sign_hamming_codes

    v = [0.0] * 64
    v[0] = 1.0   # bit 0 of lo
    v[31] = 2.0  # bit 31 of lo
    v[32] = 3.0  # bit 0 of hi
    v[63] = -1.0  # negative -> 0
    rows = [
        Row(vec_id=1, embedding=v),
        Row(vec_id=2, embedding=[0.5] * 64),   # all bits set
        Row(vec_id=3, embedding=[-0.5] * 64),  # none set
        Row(vec_id=4, embedding=[1.0] * 63),   # wrong dim -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: (r.code_lo, r.code_hi) for r in sign_hamming_codes(
        df, "embedding", "vec_id").collect()}
    assert out[1] == (1 | (1 << 31), 1)
    assert out[2] == ((1 << 32) - 1, (1 << 32) - 1)
    assert out[3] == (0, 0)
    assert 4 not in out


def test_sign_hamming_shortlist_recall_on_clustered_vectors(spark):
    """The hamming shortlist must surface true cosine neighbors on a
    clustered corpus: vectors drawn near 4 orthogonal-ish centroids;
    for each anchor, the hamming top-10 must contain >= 6 of the exact
    cosine top-10 (deterministic construction, no RNG)."""
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.similarity import sign_hamming_codes

    def vec(cluster, j):
        # centroid = +1 on its 16-dim block, small deterministic jitter
        v = [0.0] * 64
        for i in range(64):
            base = 1.0 if i // 16 == cluster else -0.2
            v[i] = base + (((i * 7 + j * 13) % 11) - 5) / 40.0
        return v

    rows = [
        Row(vec_id=c * 25 + j, embedding=vec(c, j), cluster=c)
        for c in range(4)
        for j in range(25)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, cluster int")
    codes = {r.vec_id: (r.code_lo, r.code_hi) for r in sign_hamming_codes(
        df, "embedding", "vec_id").collect()}
    vecs = {r.vec_id: (r.embedding, r.cluster) for r in df.collect()}

    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    def ham(i, j):
        (lo1, hi1), (lo2, hi2) = codes[i], codes[j]
        return bin(lo1 ^ lo2).count("1") + bin(hi1 ^ hi2).count("1")

    # 1-bit codes are a SHORTLIST tier: within a tight cluster the sign
    # pattern barely varies, so hamming cannot rank near-identical
    # neighbors (ties) — assert what the tier is FOR: the shortlist at
    # 2x the target k recovers the exact top-k, and never crosses
    # clusters before exhausting its own.
    for anchor in (0, 25, 50, 75):
        others = [v for v in codes if v != anchor]
        exact = set(sorted(others, key=lambda v: -cos(vecs[anchor][0], vecs[v][0]))[:10])
        short20 = sorted(others, key=lambda v: (ham(anchor, v), v))[:20]
        assert len(exact & set(short20)) >= 8, (anchor, len(exact & set(short20)))
        assert all(vecs[v][1] == vecs[anchor][1] for v in short20), anchor
