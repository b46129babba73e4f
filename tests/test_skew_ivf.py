"""Salted aggregation + IVF similarity tests."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aleph2_contrib_spark.operators.skew import salted_agg
from aleph2_contrib_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_build_centroids,
    ivf_topk,
)


def test_salted_agg_matches_plain(spark):
    # hot key "a" has 90% of rows
    rows = [Row(k="a", v=float(i % 7)) for i in range(900)] + [
        Row(k="b", v=float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["k"]: (r["n"], r["total"], r["mn"], r["mx"])
        for r in salted_agg(
            df, ["k"],
            {"n": ("count", "*"), "total": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
        ).collect()
    }
    exp = {
        r["k"]: (r["n"], r["total"], r["mn"], r["mx"])
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    assert got == exp


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.createDataFrame([Row(k="a", v=1.0)])
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(df, ["k"], {"a": ("avg", "v")})


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_centroids_deterministic(spark, emb):
    c1 = ivf_build_centroids(emb, n_centroids=8)
    c2 = ivf_build_centroids(emb, n_centroids=8)
    assert c1 == c2 and len(c1) == 8 and len(c1[0]) == 64


def test_ivf_assign_all_rows(spark, emb):
    cents = ivf_build_centroids(emb, n_centroids=8)
    out = ivf_assign(emb, cents)
    assert out.filter(F.col("__ivf_cell").isNull()).count() == 0
    assert out.select("__ivf_cell").distinct().count() > 1


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    qvec = emb.filter(F.col("vec_id") == 1).head()["embedding"]
    exact = [r["vec_id"] for r in brute_force_topk(emb, qvec, k=10).collect()]
    cents = ivf_build_centroids(emb, n_centroids=8)
    approx = [r["vec_id"] for r in ivf_topk(emb, qvec, cents, k=10, nprobe=4).collect()]
    # top-1 must match; recall@10 reasonably high with half the cells probed
    assert approx[0] == exact[0]
    assert len(set(exact) & set(approx)) >= 6


def test_knn_join_matches_bruteforce(spark):
    import numpy as np
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.similarity import brute_force_topk, knn_join

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(float)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(40)]
    ).repartition(6)
    queries = df.filter("vec_id < 2")
    cands = df.filter("vec_id >= 2")
    out = knn_join(cands, queries, k=5)
    got = {
        qid: [r["vec_id"] for r in rows]
        for qid, rows in __import__("itertools").groupby(
            sorted(out.collect(), key=lambda r: (r["query_id"], -r["score"], r["vec_id"])),
            key=lambda r: r["query_id"],
        )
    }
    for qid in (0, 1):
        expect = [
            r["vec_id"]
            for r in brute_force_topk(cands, vecs[qid].tolist(), k=5).collect()
        ]
        assert got[qid] == expect


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.skew import salted_join

    # heavy skew: 90% of left rows share one key
    left = spark.createDataFrame(
        [Row(k="hot" if i % 10 else f"k{i}", v=i) for i in range(1000)]
    )
    right = spark.createDataFrame(
        [Row(k="hot", tag="H")] + [Row(k=f"k{i}", tag=f"t{i}") for i in range(0, 1000, 10)]
    )
    plain = left.join(right, ["k"]).groupBy("k", "tag").count()
    salted = salted_join(left, right, ["k"], salt_buckets=8).groupBy("k", "tag").count()
    a = {(r["k"], r["tag"]): r["count"] for r in plain.collect()}
    b = {(r["k"], r["tag"]): r["count"] for r in salted.collect()}
    assert a == b


def test_salted_join_left_preserves_unmatched(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.skew import salted_join

    left = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    right = spark.createDataFrame([Row(k="a", tag="x")])
    out = salted_join(left, right, ["k"], salt_buckets=4, how="left").collect()
    got = {(r["k"], r["tag"]) for r in out}
    assert got == {("a", "x"), ("b", None)}


def test_knn_join_query_cap_fails_fast(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.similarity import knn_join

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(30)]
    )
    with pytest.raises(ValueError, match="max_broadcast_queries"):
        knn_join(df, df, k=3, max_broadcast_queries=10)
    # at or under the cap: runs normally
    assert knn_join(df.limit(5), df.limit(10), k=3, max_broadcast_queries=10).count() == 10 * 3


def test_ivf_distributed_kmeans_centroids(spark, sf_dir):
    """The Spark ML KMeans quantizer feeds the same assign/search path and
    reaches reasonable recall vs brute force on the real embeddings."""
    from aleph2_contrib_spark.operators import similarity as sim
    from aleph2_contrib_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = sim.ivf_build_centroids_distributed(emb, n_centroids=8, max_iter=5)
    assert len(cents) == 8 and all(len(c) == len(cents[0]) for c in cents)
    qvec = emb.filter(F.col("vec_id") == 1).select("embedding").head()[0]
    exact = {r.vec_id for r in sim.brute_force_topk(emb, qvec, k=10).collect()}
    assigned = sim.ivf_assign(emb, cents)
    approx = {r.vec_id for r in sim.ivf_topk(assigned, qvec, cents, k=10, nprobe=3).collect()}
    assert len(exact & approx) >= 6, (exact, approx)


def test_pq_encode_and_adc_recall(spark, sf_dir):
    """PQ: codes have m entries in [0, n_codes); ADC top-k reaches decent
    recall vs exact euclidean on the real embeddings table."""
    import math

    from aleph2_contrib_spark.operators import similarity as sim
    from aleph2_contrib_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = sim.pq_train_codebooks(emb, m=8, n_codes=64, sample_rows=1024, iters=5)
    assert len(books) == 8
    enc = sim.pq_encode(emb, books)
    row = enc.select("pq_codes").head()
    assert len(row.pq_codes) == 8 and all(0 <= c < 64 for c in row.pq_codes)

    # Recall is noisy per-query on synthetic (unclustered) embeddings —
    # the worst case for PQ — so assert the AVERAGE overlap across several
    # queries clears a bar far above chance (random 10-of-500 ≈ 0.2).
    overlaps = []
    for qid in (1, 2, 3, 4, 5):
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == qid).select("embedding").head()[0]]
        approx = {r.vec_id for r in sim.pq_topk(enc, qvec, books, k=10).collect()}
        # exact euclidean top-10 (PQ approximates L2, not cosine)
        d2 = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(v) for v in qvec]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        exact = {
            r.vec_id
            for r in emb.select("vec_id", d2.alias("d2")).orderBy(F.col("d2").asc(), F.col("vec_id").asc()).limit(10).collect()
        }
        overlaps.append(len(exact & approx))
    assert sum(overlaps) / len(overlaps) >= 3.0, overlaps


def test_pq_deterministic(spark, sf_dir):
    from aleph2_contrib_spark.operators import similarity as sim
    from aleph2_contrib_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    b1 = sim.pq_train_codebooks(emb, m=4, n_codes=16, sample_rows=256, iters=3)
    b2 = sim.pq_train_codebooks(emb, m=4, n_codes=16, sample_rows=256, iters=3)
    assert b1 == b2


def test_pq_codebooks_partition_invariant_and_seeded(spark):
    """Codebook training must sample representatively and reproducibly:
    same seed → identical books regardless of input partitioning; a
    different seed may differ (proves the seed actually selects rows)."""
    from aleph2_contrib_spark.operators.similarity import pq_train_codebooks

    df = spark.range(300).select(
        F.array(*[(F.col("id") * (i + 1) % 97).cast("float") for i in range(8)]).alias(
            "embedding"
        )
    )
    b1 = pq_train_codebooks(df, m=2, n_codes=4, sample_rows=64, iters=2, seed=7)
    b2 = pq_train_codebooks(df.repartition(13), m=2, n_codes=4, sample_rows=64, iters=2, seed=7)
    assert b1 == b2


def test_ivf_pq_topk_composed_recall(spark, sf_dir):
    """IVF-PQ with full probing and a generous refine must recover the
    exact top-k head: the refine stage re-ranks by true cosine, so
    errors can only come from PQ dropping a true neighbor out of the
    shortlist — averaged overlap must clear a far-above-chance bar."""
    from aleph2_contrib_spark.operators import similarity as sim
    from aleph2_contrib_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = sim.ivf_build_centroids(emb, n_centroids=8)
    books = sim.pq_train_codebooks(emb, m=8, n_codes=64, sample_rows=1024, iters=5)
    overlaps = []
    for qid in (1, 2, 3):
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == qid).select("embedding").head()[0]]
        approx = {r.vec_id for r in sim.ivf_pq_topk(
            emb, qvec, cents, books, k=10, nprobe=8, refine=6).collect()}
        exact = {r.vec_id for r in sim.brute_force_topk(emb, qvec, 10).collect()}
        overlaps.append(len(exact & approx))
    assert sum(overlaps) / len(overlaps) >= 5.0, overlaps


def test_ivf_pq_prunes_to_probed_cells(spark, sf_dir):
    """nprobe=1 must only ever score rows of the single probed cell."""
    from aleph2_contrib_spark.operators import similarity as sim
    from aleph2_contrib_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = sim.ivf_build_centroids(emb, n_centroids=8)
    books = sim.pq_train_codebooks(emb, m=8, n_codes=16, sample_rows=512, iters=3)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).select("embedding").head()[0]]
    out = sim.ivf_pq_topk(emb, qvec, cents, books, k=5, nprobe=1, refine=2)
    got = {r.vec_id for r in out.collect()}
    assigned = sim.ivf_assign(emb, cents)
    import math
    qn = math.sqrt(sum(x * x for x in qvec)) or 1.0
    best_cell = max(
        range(len(cents)),
        key=lambda i: sum(a * b for a, b in zip(qvec, cents[i]))
        / (qn * (math.sqrt(sum(x * x for x in cents[i])) or 1.0)),
    )
    cell_ids = {r.vec_id for r in assigned.filter(F.col("__ivf_cell") == best_cell).select("vec_id").collect()}
    assert got <= cell_ids


def test_codebook_store_roundtrip_and_equivalence(spark, emb):
    """Store-backed topk over all cells == brute force; centroids survive
    the catalog round-trip bit-exact."""
    from aleph2_contrib_spark.operators.similarity import CodebookStore

    store = CodebookStore(spark, "t_cbk_rt", n_centroids=8)
    store.build(emb)
    assert store.exists()
    assert store.centroids() == ivf_build_centroids(emb, n_centroids=8)
    qvec = emb.filter(F.col("vec_id") == 1).head()["embedding"]
    exact = [r["vec_id"] for r in brute_force_topk(emb, qvec, k=10).collect()]
    got = [r["id"] for r in store.topk(qvec, k=10, nprobe=8).collect()]
    assert got == exact


def test_codebook_store_topk_prunes_partitions(spark, emb):
    """The probe scan must touch only the probed cells' directories:
    partition filters on __ivf_cell appear in the physical plan and the
    candidate count equals those cells' population."""
    from aleph2_contrib_spark.operators.similarity import CodebookStore

    store = CodebookStore(spark, "t_cbk_prune", n_centroids=8)
    store.build(emb)
    qvec = emb.filter(F.col("vec_id") == 1).head()["embedding"]
    out = store.topk(qvec, k=5, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__ivf_cell" in plan and ("PartitionFilters" in plan or "partition filters" in plan.lower())
    out.collect()


def test_codebook_store_append_assigns_with_stored_codebook(spark, emb):
    from aleph2_contrib_spark.operators.similarity import CodebookStore, ivf_assign

    half1 = emb.filter(F.col("vec_id") % 2 == 0)
    half2 = emb.filter(F.col("vec_id") % 2 == 1)
    store = CodebookStore(spark, "t_cbk_app", n_centroids=8)
    store.build(half1)
    store.append(half2)
    cells = spark.table(store.cells_table)
    assert cells.count() == emb.count()
    # appended rows carry the STORED codebook's assignment
    expect = ivf_assign(half2, store.centroids())
    got = {r["id"]: r["__ivf_cell"] for r in cells.collect()}
    for r in expect.select("vec_id", "__ivf_cell").collect():
        assert got[r["vec_id"]] == r["__ivf_cell"]


# -- embedding_covariance ----------------------------------------------------


def test_embedding_covariance_exact_small(spark):
    """Hand-checkable 2-dim case: exact fixed-point sums and covariance
    numerator n*Sxy - Sx*Sy."""
    from aleph2_contrib_spark.operators.similarity import embedding_covariance

    rows = [([1.0, 2.0],), ([3.0, 5.0],), ([0.5, -1.25],)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    got = {(r["i"], r["j"]): r for r in embedding_covariance(df, scale=1000).collect()}
    # fx vectors: (1000,2000) (3000,5000) (500,-1250)
    assert got[(0, 0)]["sum_xy_fx2"] == 1000**2 + 3000**2 + 500**2
    assert got[(0, 1)]["sum_xy_fx2"] == 1000*2000 + 3000*5000 + 500*(-1250)
    assert got[(1, 1)]["sum_x_fx"] == 2000 + 5000 - 1250
    r01 = got[(0, 1)]
    assert r01["cov_num_fx2"] == 3 * r01["sum_xy_fx2"] - r01["sum_x_fx"] * r01["sum_y_fx"]
    # wrong-length and NULL vectors excluded
    df2 = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0],), (None,)], "embedding array<double>"
    )
    got2 = embedding_covariance(df2, dim=2).collect()
    assert all(r["n"] == 1 for r in got2) and len(got2) == 3


def test_embedding_covariance_matches_numpy(spark):
    """Float covariance recovered from the exact numerator agrees with
    numpy on well-scaled data (fixed-point floor error ~1/scale)."""
    import numpy as np

    from aleph2_contrib_spark.operators.similarity import embedding_covariance

    rng = np.random.RandomState(3)
    X = rng.uniform(-1, 1, size=(200, 4))
    df = spark.createDataFrame(
        [(row.tolist(),) for row in X], "embedding array<double>"
    )
    got = {(r["i"], r["j"]): r for r in embedding_covariance(df, scale=100000).collect()}
    n = 200
    C = np.cov(X, rowvar=False, ddof=1)
    for i in range(4):
        for j in range(i, 4):
            r = got[(i, j)]
            est = float(r["cov_num_fx2"]) / (100000.0**2 * n * (n - 1))
            assert abs(est - C[i, j]) < 2e-4, (i, j, est, C[i, j])


def test_embedding_covariance_oracle_matches(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.similarity import (
        embedding_covariance,
        embedding_covariance_oracle_sql,
    )

    import numpy as np
    rng = np.random.RandomState(9)
    X = rng.uniform(-2, 2, size=(60, 3)).astype("float32")
    df = spark.createDataFrame(
        [(row.tolist(),) for row in X], "embedding array<float>"
    )
    p = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in embedding_covariance(df, dim=3).collect()}
    sql = embedding_covariance_oracle_sql(f"'{p}/*.parquet'", "embedding", dim=3)
    want = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == want


# -- int8 scalar quantization (SQ8) -------------------------------------------


def test_int8_quantize_roundtrip_bound_and_edges(spark):
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.similarity import (
        dequantize_embeddings_int8,
        quantize_embeddings_int8,
    )

    rows = [
        (1, [1.0, -2.0, 0.5, 2.0]),
        (2, [0.001, -0.001, 0.0005, 0.0]),  # tiny magnitudes
        (3, [0.0, 0.0, 0.0, 0.0]),          # all-zero -> all-zero codes, m=0
        (4, None),                           # NULL passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    q = quantize_embeddings_int8(df)
    d = {r["doc_id"]: r for r in dequantize_embeddings_int8(q).collect()}
    # max-magnitude component quantizes to ±127 exactly
    assert d[1]["q8"][3] == 127 and d[1]["q8"][1] == -127
    for did in (1, 2):
        m = d[did]["q_max_abs"]
        for a, b in zip(d[did]["embedding"], d[did]["embedding_deq"]):
            assert abs(a - b) <= m / 127 + 1e-12
        assert all(-127 <= c <= 127 for c in d[did]["q8"])
    assert d[3]["q8"] == [0, 0, 0, 0] and d[3]["q_max_abs"] == 0.0
    assert d[4]["q8"] is None and d[4]["q_max_abs"] is None


def test_int8_quantization_stats_oracle_matches(spark, tmp_path):
    import duckdb
    import numpy as np

    from aleph2_contrib_spark.operators.similarity import (
        int8_quantization_stats,
        int8_quantization_stats_oracle_sql,
    )

    rng = np.random.RandomState(13)
    X = rng.uniform(-3, 3, size=(120, 6)).astype("float32")
    rows = [(i, x.tolist()) for i, x in enumerate(X)]
    rows.append((500, [0.0] * 6))  # dropped (m = 0)
    rows.append((501, None))       # dropped (NULL)
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    p = str(tmp_path / "e.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in int8_quantization_stats(df).collect()}
    sql = int8_quantization_stats_oracle_sql(f"'{p}/*.parquet'", "embedding", "doc_id")
    want = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) == 120
    # worst reconstruction error respects the 1e6/127 construction bound
    assert max(r[7] for r in got) <= 1_000_000 // 127


def test_int8_quantize_property(spark):
    """Property over adversarial vectors (tiny/huge magnitudes, negatives,
    repeated values): codes stay in [-127,127], max-|x| components land
    within one code of full scale (floor quantization can give ±126 when
    x·127/m rounds an ulp below the integer), and reconstruction error
    never exceeds m/127."""
    import random

    from aleph2_contrib_spark.operators.similarity import (
        dequantize_embeddings_int8,
        quantize_embeddings_int8,
    )

    rnd = random.Random(99)
    rows = []
    for i in range(60):
        scale = 10.0 ** rnd.randint(-6, 6)
        dim = rnd.randint(1, 12)
        rows.append((i, [rnd.uniform(-1, 1) * scale for _ in range(dim)]))
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    out = dequantize_embeddings_int8(quantize_embeddings_int8(df)).collect()
    assert len(out) == 60
    for r in out:
        m = r["q_max_abs"]
        assert m == max(abs(x) for x in r["embedding"])
        assert all(-127 <= c <= 127 for c in r["q8"])
        # the max-|x| component lands at full scale (±127) or one code
        # below it (floor + IEEE rounding)
        k = max(range(len(r["embedding"])), key=lambda j: abs(r["embedding"][j]))
        assert abs(r["q8"][k]) in (126, 127)
        for a, b in zip(r["embedding"], r["embedding_deq"]):
            assert abs(a - b) <= m / 127 * (1 + 1e-12)
