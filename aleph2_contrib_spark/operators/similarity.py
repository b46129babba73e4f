"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a narrow pass (score per row, no
shuffle) followed by a top-k sort that Spark executes as per-partition
top-k + driver merge (TakeOrderedAndProject), so it scales to billions of
rows without a global sort.

Scale path: LSH bucketing via random signed hyperplanes — assignment is a
narrow pass; search touches only the probe's bucket (and neighbors for
multi-probe). Bucket assignment uses a deterministic seed so results are
reproducible.

All dot products are Catalyst ``aggregate``/``zip_with`` expressions —
JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import math
import random
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector. Returns
    (id, score) ordered desc with id tiebreak (deterministic)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col), q).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-hyperplane bucket id (int): bit b = sign(vec · plane_b)."""
    bits = []
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bits.append(F.when(dot(vec, p) >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only the rows in the query's LSH bucket.
    At scale the table is written partitioned by bucket id, so this prunes
    to ~n/2^planes of the data before any scoring."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qbucket = 0
    for b, plane in enumerate(planes):
        if sum(float(x) * float(y) for x, y in zip(query_vec, plane)) >= 0:
            qbucket |= 1 << b
    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("__bucket") == F.lit(qbucket))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def deterministic_vector_sample(
    df: DataFrame, vec_col: str, sample_rows: int, seed: int = 42
) -> list:
    """Bounded, deterministic, partitioning-independent sample of vector
    rows: the ``sample_rows`` smallest rows by seeded 64-bit hash of the
    vector. A bare .limit() would take a biased partition-order prefix and
    .sample(seed=) changes with partitioning.

    Plan shape (the round-4 hotspot fix): NOT a global orderBy+limit —
    TakeOrdered is O(n log k) but still hashes, compares, and heap-sifts
    every row of the corpus per training call. Instead: one cheap count,
    then a hash-THRESHOLD filter scan (Catalyst pushes the comparison
    beside the scan, no sort anywhere) that passes ~4× sample_rows rows,
    and a driver-side sort of just those. The selected SET is the global
    hash-order prefix, so the result is identical across partitionings
    and runs. The undersample fallback is a TakeOrdered top-k — BOUNDED
    at sample_rows driver rows. (It is NOT vanishingly unlikely on every
    corpus: duplicate vectors share one hash, so the threshold filter
    passes whole duplicate-groups or none — a corpus of few distinct
    vectors routinely lands here, and an unbounded collect would pull
    the entire corpus to the driver.)"""
    h = F.xxhash64(F.col(vec_col), F.lit(seed))
    cnt = df.count()
    if cnt == 0:
        return []
    if cnt <= max(sample_rows, 64) * 8:
        rows = df.select(F.col(vec_col).alias("v"), h.alias("h")).collect()
    else:
        # unsigned-order threshold: u < cap  ⇔  h >= 0 AND h < cap for
        # cap < 2^63 (frac ≤ 1/2 is guaranteed by the branch above)
        cap = int(min(0.5, 4.0 * sample_rows / cnt) * (1 << 64))
        cand = (
            df.select(F.col(vec_col).alias("v"), h.alias("h"))
            .filter((F.col("h") >= 0) & (F.col("h") < F.lit(cap)))
            .collect()
        )
        if len(cand) < sample_rows:
            # undersample (duplicate-heavy corpus or statistical fluke):
            # exact global top-k by unsigned hash — TakeOrderedAndProject,
            # ≤ sample_rows rows to the driver, same set as the prefix
            # (unsigned order = non-negatives ascending, then negatives)
            cand = (
                df.select(F.col(vec_col).alias("v"), h.alias("h"))
                .orderBy((F.col("h") < 0).asc(), F.col("h").asc())
                .limit(sample_rows)
                .collect()
            )
        rows = cand
    rows.sort(key=lambda r: r["h"] & ((1 << 64) - 1))
    return [r["v"] for r in rows[:sample_rows]]


def ivf_build_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """IVF coarse quantizer: k-means on a bounded driver-side sample.

    The sample is tiny (n_centroids × ~128 rows) regardless of table size —
    the one deliberate driver-side step; assignment and search stay
    distributed. Deterministic: the sample is the global prefix of a
    seeded hash order (``deterministic_vector_sample`` — representative
    + reproducible regardless of partitioning, computed by threshold
    filter rather than a corpus-wide sort) and the k-means init indices
    come from the seeded rng."""
    import numpy as np

    sample = deterministic_vector_sample(df, vec_col, sample_rows, seed)
    X = np.asarray([list(v) for v in sample], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        # cosine assignment on normalized vectors
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        Cn = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)
        assign = (Xn @ Cn.T).argmax(axis=1)
        for c in range(len(cents)):
            m = X[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents.tolist()


def ivf_build_centroids_distributed(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[float]]:
    """Distributed IVF coarse quantizer: Spark ML KMeans over the FULL
    vector table (k-means|| init, executors do the lifting) — the scale
    path when a bounded driver sample would misrepresent the distribution
    (billions of vectors / many fine cells). Vectors are L2-normalized
    first so euclidean k-means orders like cosine, matching ``ivf_assign``.

    Deterministic for a fixed seed + input. For everyday cell counts the
    sampled ``ivf_build_centroids`` is cheaper (one tiny collect, no ML
    job); both feed the same ``ivf_assign``/``ivf_topk``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    unit = F.transform(v, lambda x: x / (norm + F.lit(1e-300)))
    data = df.select(array_to_vector(unit).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(data)
    return [list(map(float, c)) for c in model.clusterCenters()]


def ivf_assign(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Assign each row to its nearest centroid (cosine) — a narrow
    Arrow-batched pass: one (batch × centroids) numpy matmul per batch,
    ~100x the interpreted per-centroid fold. Ties break to the HIGHER cell
    id (same as array_max over struct(score, cell)). At scale the table is
    written partitioned by ``__ivf_cell`` so probes prune to cells."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    Cn = (C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-300)).T.copy()

    def assign_fn(vs):
        if not len(vs):
            return pd.Series([], dtype="int32")
        X = np.asarray([list(v) for v in vs], dtype=np.float64)
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-300)
        S = Xn @ Cn
        k = S.shape[1]
        # argmax with ties → higher cell id: argmax over reversed columns
        best = (k - 1) - S[:, ::-1].argmax(axis=1)
        return pd.Series(best.astype("int32"))

    udf = pandas_udf(assign_fn, "int")
    return df.withColumn("__ivf_cell", udf(F.col(vec_col).cast("array<double>")))


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score only rows in the ``nprobe`` cells nearest the
    query. With the table partitioned by cell this is a partition-pruned
    scan of nprobe/n_centroids of the data."""
    import math as _m

    q = list(map(float, query_vec))
    qn = _m.sqrt(sum(x * x for x in q)) or 1.0

    def cos_q(c):
        cn = _m.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(q, c)) / (qn * cn)

    probe_cells = sorted(range(len(centroids)), key=lambda i: -cos_q(centroids[i]))[:nprobe]
    assigned = ivf_assign(df, centroids, vec_col)
    cand = assigned.filter(F.col("__ivf_cell").isin(probe_cells))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


class CodebookStore:
    """Persisted IVF index — the steady-state half of ANN search at
    corpus scale (the CodebookStore analogue of dedup's
    MinHashSignatureStore): training and assignment run ONCE (a
    maintenance job), every subsequent query is O(probe).

    Two catalog tables under a (corpus, params)-keyed prefix:

    - ``<prefix>_centroids`` (cell, vec): the coarse quantizer — tiny
      (n_centroids rows), collected to the driver per query.
    - ``<prefix>_cells`` (id, vec), PARTITIONED by ``__ivf_cell``: every
      corpus vector stored under its cell's directory, so ``topk`` with
      ``nprobe`` cells is a partition-pruned scan of nprobe/n_centroids
      of the data — no assignment pass, no full-table read (the 100 TB
      shape: repeated queries against a trained index).

    ``append`` is the post-ingest maintenance op: new vectors are
    assigned with the STORED centroids (the codebook is immutable once
    trained — retrain via ``build`` when drift warrants) and appended
    partition-aligned."""

    def __init__(
        self,
        spark,
        prefix: str,
        *,
        n_centroids: int = 16,
        sample_rows: int = 2048,
        iters: int = 5,
        seed: int = 42,
        distributed_train: bool = False,
    ):
        self.spark = spark
        self.prefix = prefix
        self.n_centroids = n_centroids
        self.sample_rows = sample_rows
        self.iters = iters
        self.seed = seed
        self.distributed_train = distributed_train
        self.centroids_table = f"{prefix}_centroids"
        self.cells_table = f"{prefix}_cells"

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(
            self.centroids_table
        ) and self.spark.catalog.tableExists(self.cells_table)

    def build(
        self, df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> "CodebookStore":
        """Train the quantizer and materialize both tables (overwrite)."""
        from aleph2_contrib_spark.sources.bucketed import write_partitioned
        from aleph2_contrib_spark.sources.bucketed import drop_table_and_managed_dir

        if self.distributed_train:
            cents = ivf_build_centroids_distributed(
                df, n_centroids=self.n_centroids, vec_col=vec_col, seed=self.seed
            )
        else:
            cents = ivf_build_centroids(
                df,
                n_centroids=self.n_centroids,
                vec_col=vec_col,
                sample_rows=self.sample_rows,
                iters=self.iters,
                seed=self.seed,
            )
        drop_table_and_managed_dir(self.spark, self.centroids_table)
        self.spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            schema="cell int, vec array<double>",
        ).write.format("parquet").saveAsTable(self.centroids_table)
        assigned = ivf_assign(
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")), cents, "vec"
        )
        write_partitioned(assigned, self.cells_table, ["__ivf_cell"])
        return self

    def centroids(self) -> list[list[float]]:
        rows = self.spark.table(self.centroids_table).orderBy("cell").collect()
        return [list(r["vec"]) for r in rows]

    def append(self, df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> None:
        """Assign new vectors with the stored codebook and append them
        partition-aligned (per-ingest cost O(batch))."""
        from aleph2_contrib_spark.sources.bucketed import write_partitioned

        assigned = ivf_assign(
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
            self.centroids(),
            "vec",
        )
        write_partitioned(assigned, self.cells_table, ["__ivf_cell"], mode="append")

    def topk(self, query_vec: Sequence[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        """IVF search against the stored index: pick the ``nprobe`` cells
        nearest the query (driver arithmetic over the tiny codebook),
        partition-prune the cells table to exactly those directories, and
        run the exact top-k on the candidates."""
        import math as _m

        cents = self.centroids()
        q = list(map(float, query_vec))
        qn = _m.sqrt(sum(x * x for x in q)) or 1.0

        def cos_q(c):
            cn = _m.sqrt(sum(x * x for x in c)) or 1.0
            return sum(a * b for a, b in zip(q, c)) / (qn * cn)

        probe_cells = sorted(range(len(cents)), key=lambda i: -cos_q(cents[i]))[:nprobe]
        cand = self.spark.table(self.cells_table).filter(
            F.col("__ivf_cell").isin(probe_cells)
        )
        return brute_force_topk(cand, q, k, "id", "vec")


def exact_blocked_cosine_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT cosine pairs (id_a < id_b, cosine ≥ threshold) within blocks.

    One shuffle on the block key, then each block computes its full cosine
    matrix with a single numpy matmul — ~1000x the throughput of the
    per-pair interpreted zip_with fold. Results are floor(x·1e6)-stable vs
    a sequential-fold engine (DuckDB): summation-order differences are
    ~1e-16 relative, i.e. ~1e-10 f6 units from any floor boundary.

    Scale notes: pair count is O(sum m_b²); at corpus scale the block key
    should bound m_b (LSH/IVF cell, or sub-salt + matrix tiling). Skewed or
    too-few blocks serialize onto few tasks — pick block granularity ≥
    cluster parallelism."""
    import numpy as np
    import pandas as pd

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cos_f6"])
        X = np.asarray([list(v) for v in pdf["v"]], dtype=np.float64)
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-300)
        S = Xn @ Xn.T
        ids = pdf["id"].to_numpy()
        iu, ju = np.triu_indices(len(pdf), k=1)
        s = S[iu, ju]
        keep = s >= threshold
        ia, jb = ids[iu[keep]], ids[ju[keep]]
        lo = np.minimum(ia, jb)
        hi = np.maximum(ia, jb)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cos_f6": np.floor(s[keep] * 1e6).astype(np.int64)}
        )

    id_type = df.schema[id_col].dataType.simpleString()
    blocked = df.select(
        F.col(block_col).alias("b"),
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return blocked.groupBy("b").applyInPandas(
        score_block, schema=f"id_a {id_type}, id_b {id_type}, cos_f6 long"
    )


def all_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ threshold) via LSH blocking:
    join only within buckets instead of the full cross product."""
    first = df.select(F.col(vec_col)).head()
    if first is None:
        return df.sparkSession.createDataFrame([], f"id_a long, id_b long, score double")
    dim = len(first[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    # Per-bucket matrix scoring: one shuffle on the bucket id, then each
    # group computes its full cosine matrix with one numpy matmul — the
    # per-pair interpreted-expression path costs ~100x more. Bucket size is
    # bounded by the plane count, which bounds the O(m²) per group.
    import numpy as np
    import pandas as pd

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "score"])
        X = np.asarray([list(v) for v in pdf["v"]], dtype=np.float64)
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-300)
        S = Xn @ Xn.T
        ids = pdf["id"].to_numpy()
        iu, ju = np.triu_indices(len(pdf), k=1)
        keep = S[iu, ju] >= threshold
        ia, jb = ids[iu[keep]], ids[ju[keep]]
        lo = np.minimum(ia, jb)
        hi = np.maximum(ia, jb)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "score": S[iu, ju][keep]})

    id_type = df.schema[id_col].dataType.simpleString()
    return bucketed.groupBy("bucket").applyInPandas(
        score_bucket, schema=f"id_a {id_type}, id_b {id_type}, score double"
    )


def knn_join(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
    max_broadcast_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine k-NN JOIN: for every query vector, the top-k nearest
    candidate vectors. Returns (query_id, vec_id, score).

    Scale shape: the query set is collected and broadcast (it must be
    small — thousands, not millions); each candidate partition computes one
    numpy matmul against all queries and emits only its LOCAL top-k per
    query, so the candidate side never shuffles and the final exact merge
    ranks just k x n_partitions x n_queries rows. This is the distributed
    brute-force baseline an IVF/LSH index is benchmarked against.

    The collect is HARD-CAPPED at ``max_broadcast_queries`` rows: the guard
    probes limit(cap+1), so an oversized query side fails fast with a
    pointer to ivf_topk instead of melting the driver.
    """
    import numpy as np
    import pandas as pd

    query_id_col = query_id_col or id_col
    query_vec_col = query_vec_col or vec_col
    qrows = (
        queries.select(query_id_col, query_vec_col)
        .limit(max_broadcast_queries + 1)
        .collect()
    )
    if len(qrows) > max_broadcast_queries:
        raise ValueError(
            f"knn_join query side exceeds max_broadcast_queries="
            f"{max_broadcast_queries}: this operator broadcasts the query "
            "set from the driver and is meant for small query batches. For "
            "large query sets use ivf_topk (distributed index) or raise "
            "the cap explicitly if the driver can hold it."
        )
    if not qrows:
        return candidates.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, score double"
        )
    qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    Qn = Q / (np.linalg.norm(Q, axis=1, keepdims=True) + 1e-300)

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([list(v) for v in pdf["v"]], dtype=np.float64)
            Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-300)
            S = Xn @ Qn.T  # (n_cand, n_query)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            kk = min(k, len(pdf))
            # per query: local top-k by (score desc, id asc)
            order = np.lexsort((ids[:, None].repeat(S.shape[1], 1), -S), axis=0)[:kk]
            out_q = np.repeat(qids[None, :], kk, axis=0).ravel()
            out_i = ids[order].ravel()
            out_s = np.take_along_axis(S, order, axis=0).ravel()
            yield pd.DataFrame({"query_id": out_q, "vec_id": out_i, "score": out_s})

    part = candidates.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).mapInPandas(local_topk, schema="query_id long, vec_id long, score double")

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        part.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ)
# --------------------------------------------------------------------------


def pq_train_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    sample_rows: int = 4096,
    iters: int = 10,
    seed: int = 42,
):
    """Train PQ codebooks: split the vector into ``m`` subspaces and
    k-means each on a bounded driver sample (same deliberate driver-side
    step as ivf_build_centroids — codebooks are tiny: m × n_codes × d/m
    floats; encoding and search stay distributed). Deterministic.

    Returns list of m (n_codes × d/m) codebooks (nested python lists).
    """
    import numpy as np

    # Representative + reproducible sample: global prefix of a seeded
    # hash order, computed by threshold filter (no corpus-wide sort) —
    # see deterministic_vector_sample for the plan-shape rationale.
    sample = deterministic_vector_sample(df, vec_col, sample_rows, seed)
    X = np.asarray([list(v) for v in sample], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)

    def _kmeanspp(S: "np.ndarray", k: int) -> "np.ndarray":
        # k-means++ seeding: spread initial centers ∝ squared distance to
        # the nearest chosen center — far less order/init-sensitive than
        # uniform index choice, and deterministic under the seeded rng.
        C = [S[rng.randint(len(S))]]
        d2 = ((S - C[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            tot = d2.sum()
            if tot <= 0:
                C.append(S[rng.randint(len(S))])
                continue
            idx = int(np.searchsorted(np.cumsum(d2 / tot), rng.rand()))
            idx = min(idx, len(S) - 1)
            C.append(S[idx])
            d2 = np.minimum(d2, ((S - C[-1]) ** 2).sum(axis=1))
        return np.asarray(C)

    books = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        k = min(n_codes, len(S))
        C = _kmeanspp(S, k)
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                mset = S[a == c]
                if len(mset):
                    C[c] = mset.mean(axis=0)
        books.append(C.tolist())
    return books


def pq_encode(df: DataFrame, codebooks, vec_col: str = "embedding") -> DataFrame:
    """Encode vectors to PQ codes (array<smallint>, one code per
    subspace): a narrow Arrow-batched pass — per batch, m vectorized
    (batch × n_codes) nearest-centroid assignments. A 64-d float vector
    (256 B as float32) compresses to m bytes — the representation that
    lets 100 TB of embeddings fit a fraction of cluster memory."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    sub = B[0].shape[1]

    def encode_fn(vs):
        if not len(vs):
            return pd.Series([], dtype=object)
        X = np.asarray([list(v) for v in vs], dtype=np.float64)
        codes = np.empty((len(X), m), dtype=np.int16)
        for j in range(m):
            S = X[:, j * sub : (j + 1) * sub]
            # ||s-c||² = ||s||² - 2s·c + ||c||²; ||s||² constant per row
            d2 = -2.0 * (S @ B[j].T) + (B[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    udf = pandas_udf(encode_fn, "array<smallint>")
    return df.withColumn("pq_codes", udf(F.col(vec_col).cast("array<double>")))


def pq_topk(
    df: DataFrame,
    query_vec,
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): precompute the
    query's (m × n_codes) distance lookup table once, then score each
    row's codes by m table lookups — no float vectors are read at all.
    Per-partition top-k then TakeOrderedAndProject, like brute_force_topk.

    Returns (id, adc_d2) ascending — squared-L2 approximation; on
    normalized vectors the ordering tracks cosine."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(list(query_vec), dtype=np.float64)
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    sub = B[0].shape[1]
    # LUT[j][c] = ||q_j - B[j][c]||²
    lut = [((B[j] - q[j * sub : (j + 1) * sub]) ** 2).sum(axis=1) for j in range(m)]

    def score_fn(codes):
        if not len(codes):
            return pd.Series([], dtype="float64")
        C = np.asarray([list(c) for c in codes], dtype=np.int64)
        s = np.zeros(len(C), dtype=np.float64)
        for j in range(m):
            s += lut[j][C[:, j]]
        return pd.Series(s)

    udf = pandas_udf(score_fn, "double")
    scored = df.select(id_col, udf(F.col(codes_col)).alias("adc_d2"))
    return scored.orderBy(F.col("adc_d2").asc(), F.col(id_col).asc()).limit(k)


def ivf_pq_topk(
    df: DataFrame,
    query_vec,
    centroids,
    codebooks,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coded: DataFrame | None = None,
) -> DataFrame:
    """Composed IVF-PQ search — the production ANN shape (a coarse
    quantizer prunes the scan, PQ codes score candidates without reading
    float vectors, an exact refine pass re-ranks the short list):

    1. probe the ``nprobe`` cells nearest the query (cell assignment is
       a narrow Arrow pass; with the table written partitioned by
       ``__ivf_cell`` the probe is a partition-pruned scan),
    2. ADC-score the probed rows from their ``m``-byte PQ codes — the
       only per-row work, m table lookups, no vector reads,
    3. exact cosine re-rank of the top ``refine * k`` ADC candidates
       (reads ``refine*k`` float vectors total, a driver-bounded list).

    At 100 TB: step 2's input is nprobe/n_centroids of the table at
    ~1/32 the bytes (codes vs float32 vectors); step 3 touches a few
    dozen rows. Returns (id, score) by exact cosine, descending."""
    import math as _m

    q = list(map(float, query_vec))
    qn = _m.sqrt(sum(x * x for x in q)) or 1.0

    def cos_q(c):
        cn = _m.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(q, c)) / (qn * cn)

    probe_cells = sorted(range(len(centroids)), key=lambda i: -cos_q(centroids[i]))[:nprobe]
    # ``coded``: optionally a precomputed ivf_assign + pq_encode of ``df``
    # (columns __ivf_cell, pq_codes) — multi-query callers pay the two
    # Arrow passes ONCE and share the (typically persisted) code table
    # across queries; per-row encoding is deterministic, so encoding all
    # cells up front then filtering equals encoding the probed cells.
    if coded is None:
        assigned = ivf_assign(df, centroids, vec_col)
        coded = pq_encode(
            assigned.filter(F.col("__ivf_cell").isin(probe_cells)), codebooks, vec_col
        )
        cand = coded
    else:
        cand = coded.filter(F.col("__ivf_cell").isin(probe_cells))
    short = pq_topk(cand.select(id_col, "pq_codes"), q, codebooks, k=refine * k, id_col=id_col)
    refined = df.join(F.broadcast(short.select(id_col)), id_col, "inner")
    return brute_force_topk(refined, q, k, id_col, vec_col)


def label_centroids(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-label centroid of an embedding column — the vector-aggregation
    primitive behind class prototypes, cluster summaries, and IVF codebook
    refreshes over a labeled corpus.

    Engine-portable by the repo's fixed-point discipline: each component is
    floored to ``scale`` fixed-point (bigint) BEFORE summing, so the sums
    are exact integers — independent of addition order, partitioning, and
    engine — and the centroid is the integer division floor(sum/n). Output:
    (label, n_vectors, centroid_f6 array<bigint>).

    Plan shape — the part that matters at 100 TB: posexplode to
    (label, pos, component) then ONE groupBy(label, pos) with map-side
    partial aggregation; n·dim skinny rows shuffle at most once (partial
    sums collapse most of it), and the final per-label array is rebuilt
    from dim rows via a tiny second agg. No per-row Python, no
    whole-vector structs through the shuffle, no width limit on dim.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "c"),
    ).select(
        "label",
        "pos",
        F.floor(F.col("c").cast("double") * scale).cast("bigint").alias("c_fx"),
    )
    per_pos = exploded.groupBy("label", "pos").agg(
        F.sum("c_fx").alias("sum_fx"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_pos.withColumn(
            "comp_fx", F.floor(F.col("sum_fx") / F.col("n")).cast("bigint")
        )
        .groupBy("label")
        .agg(
            F.max("n").alias("n_vectors"),
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("comp_fx")))
            ).alias("__sorted"),
        )
        .select(
            "label",
            "n_vectors",
            F.transform(F.col("__sorted"), lambda s: s["comp_fx"]).alias(
                "centroid_f6"
            ),
        )
    )


def hard_negative_mining(
    candidates: DataFrame,
    anchors: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_broadcast_anchors: int = 100_000,
) -> DataFrame:
    """Contrastive-training pair mining: for every anchor, the top-k most
    cosine-similar candidates with a DIFFERENT label — the "hard
    negatives" that dominate the gradient signal when training embedding
    models on a prepared corpus. The supervised sibling of ``knn_join``.

    Returns (anchor_id, vec_id, score) — k rows per anchor (fewer when
    the other-label candidate pool is smaller than k).

    Scale shape (same contract as knn_join): anchors are collected and
    broadcast (small side, hard-capped with a fail-fast probe); each
    candidate partition computes ONE numpy matmul against all anchors,
    masks same-label columns to -inf BEFORE ranking (the label filter
    must precede top-k — filtering after would leave anchors with
    < k negatives even when enough exist), and emits only its local
    top-k per anchor. Candidates never shuffle; the exact merge ranks
    k · n_partitions · n_anchors rows. For million-anchor mining, run
    this per IVF cell instead (ivf_topk's partitioning) — same math,
    sharded anchor set.
    """
    import numpy as np
    import pandas as pd

    arows = (
        anchors.select(id_col, vec_col, label_col)
        .limit(max_broadcast_anchors + 1)
        .collect()
    )
    if len(arows) > max_broadcast_anchors:
        raise ValueError(
            f"hard_negative_mining anchor side exceeds max_broadcast_anchors="
            f"{max_broadcast_anchors}: anchors broadcast from the driver. "
            "Shard the anchor set (e.g. per IVF cell) for larger runs."
        )
    if not arows:
        return candidates.sparkSession.createDataFrame(
            [], "anchor_id long, vec_id long, score double"
        )
    aids = np.asarray([r[0] for r in arows], dtype=np.int64)
    alabels = np.asarray([r[2] for r in arows])
    A = np.asarray([list(r[1]) for r in arows], dtype=np.float64)
    An = A / (np.linalg.norm(A, axis=1, keepdims=True) + 1e-300)

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([list(v) for v in pdf["v"]], dtype=np.float64)
            Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-300)
            S = Xn @ An.T  # (n_cand, n_anchor)
            labels = pdf["lbl"].to_numpy()
            same = labels[:, None] == alabels[None, :]
            S = np.where(same, -np.inf, S)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            kk = min(k, len(pdf))
            order = np.lexsort((ids[:, None].repeat(S.shape[1], 1), -S), axis=0)[:kk]
            out_a = np.repeat(aids[None, :], kk, axis=0).ravel()
            out_i = ids[order].ravel()
            out_s = np.take_along_axis(S, order, axis=0).ravel()
            keep = np.isfinite(out_s)
            yield pd.DataFrame(
                {"anchor_id": out_a[keep], "vec_id": out_i[keep], "score": out_s[keep]}
            )

    part = candidates.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.col(label_col).alias("lbl"),
    ).mapInPandas(local_topk, schema="anchor_id long, vec_id long, score double")

    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        part.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mmr_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 5,
    lam: float = 0.75,
    pool_size: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998) — the rerank stage of a retrieval pipeline: take the
    ``pool_size`` most relevant vectors, then greedily select ``k`` of
    them trading relevance against redundancy with what's already
    selected:

        mmr(c) = lam · rel(c) − (1 − lam) · max_{s ∈ selected} sim(c, s)

    (the first pick's redundancy term is 0, so it is the pure-relevance
    argmax). Ties break toward the smaller id. ``lam`` defaults to 0.75
    so ``1 − lam`` is exact in binary floating point and both engines
    compute the identical subtraction.

    Scale shape — the two-stage rerank pattern: stage 1 scores the FULL
    corpus distributively (narrow cosine pass, TakeOrderedAndProject
    top-``pool_size``); stage 2 is bounded by construction — pool²
    pairwise cosines via the same Catalyst fold (so pool sims and
    corpus rels are bit-identical quantities), then an O(k·pool) greedy
    on the driver over ≤ pool_size scalars. The corpus never feeds the
    quadratic stage; at 100 TB stage 1 is the only data-sized cost (or
    is replaced by the IVF/LSH retrievers in this module feeding the
    same rerank).

    Returns (rank, id, mmr_f6): selection order 1..k with the
    fixed-point MMR score at selection time.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    pool_df = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            cosine(F.col(vec_col), q).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("id").asc())
        .limit(pool_size)
    )
    pool_df = pool_df.persist()
    try:
        pool = [(r["id"], float(r["rel"])) for r in pool_df.select("id", "rel").collect()]
        a = pool_df.select(F.col("id").alias("ia"), F.col("v").alias("va"))
        b = pool_df.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
        sim_rows = (
            a.crossJoin(b)
            .filter(F.col("ia") < F.col("ib"))
            .select("ia", "ib", cosine(F.col("va"), F.col("vb")).alias("s"))
            .collect()
        )
    finally:
        pool_df.unpersist()
    sims: dict[tuple, float] = {}
    for r in sim_rows:
        sims[(r["ia"], r["ib"])] = float(r["s"])
        sims[(r["ib"], r["ia"])] = float(r["s"])

    rel = dict(pool)
    remaining = sorted(rel)  # ascending id -> strict > keeps smallest id on ties
    selected: list = []
    out: list[tuple] = []
    for rank in range(1, min(k, len(remaining)) + 1):
        best_id, best_v = None, None
        for cid in remaining:
            maxsim = max((sims[(cid, s)] for s in selected), default=0.0)
            v = lam * rel[cid] - (1.0 - lam) * maxsim
            if best_v is None or v > best_v:
                best_id, best_v = cid, v
        remaining.remove(best_id)
        selected.append(best_id)
        out.append((rank, best_id, int(math.floor(best_v * 1000000.0))))

    spark = df.sparkSession
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    return spark.createDataFrame(
        out,
        T.StructType(
            [
                T.StructField("rank", T.IntegerType(), False),
                T.StructField(id_col, id_type, False),
                T.StructField("mmr_f6", T.LongType(), False),
            ]
        ),
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: int = 1000,
) -> DataFrame:
    """Exact covariance/Gram statistics of an embedding column in ONE
    aggregation pass — the primitive behind whitening, PCA preprocessing,
    drift detection between embedding snapshots, and anisotropy audits
    of a vector corpus.

    Engine-portable by the repo's fixed-point discipline: components are
    floored to ``scale`` fixed-point BEFORE any product, so every pair
    sum is an exact integer (DECIMAL(38,0) — order/partition/engine
    independent), and the covariance NUMERATOR ``n·Σxy − Σx·Σy`` is
    emitted exactly rather than divided into a float. One output row per
    unordered component pair (i <= j):

        (i, j, n, sum_xy_fx2, sum_x_fx, sum_y_fx, cov_num_fx2)

    where ``*_fx`` carry factor ``scale`` and ``*_fx2`` factor
    ``scale²``; true covariance = cov_num_fx2 / (scale²·n·(n−1)) for the
    sample form — callers divide at the boundary.

    Plan shape at 100 TB: the per-row upper-triangle products are built
    JVM-side (nested F.transform over F.sequence — no Python) and
    posexploded to dim·(dim+1)/2 skinny (i, j, xy) rows; ONE
    groupBy(i, j) with map-side partial aggregation collapses each
    partition to ≤ pairs rows before the shuffle, so shuffle volume is
    O(partitions · dim²) regardless of row count. Per-component sums Σx
    come from a separate dim-sized posexplode (decimal accumulation
    from the first add — a long Σx would wrap silently past 2^63) and
    broadcast-join back onto the pair aggregates. NULL vectors and
    vectors of the wrong length are excluded (counted against nothing).

    ``dim`` defaults to the first row's vector length (one tiny head()
    probe — pass it explicitly in pipelines where the probe is unwanted).
    """
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).filter(
            F.col("d") > 0
        ).head()
        if first is None:
            raise ValueError("cannot infer dim from an empty/all-null column")
        dim = int(first["d"])
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    from aleph2_contrib_spark.parallel import ensure_parallelism

    v = F.col(vec_col).cast("array<double>")
    fx = F.transform(v, lambda x: F.floor(x * F.lit(int(scale))).cast("long"))
    # The dim·(dim+1)/2 per-row product build + map-side partial agg all
    # run BELOW the first exchange — spread the input so a one-split
    # table doesn't serialize the whole Gram pass onto one core (no-op
    # when the source already has >= cores splits).
    base = ensure_parallelism(df.filter(F.size(v) == dim).select(fx.alias("__fx")))
    # product fast path: fx values are longs; when BOTH factors are
    # < 3e9 in magnitude the product fits a long exactly (3e9² = 9e18
    # < 2^63), so the hot multiply stays in JVM long arithmetic and
    # only the result widens to decimal — Spark's Decimal multiply
    # always routes through java.math.BigDecimal, which measured ~2x
    # the whole covariance pass. Factors at or above the bound (values
    # beyond ~3e6 at the default scale) take the exact decimal multiply
    # — never a silent long overflow, exact at any magnitude.
    _LONG_SAFE = F.lit(3_000_000_000)

    def _xy(x, y):
        return F.when(
            (F.abs(x) < _LONG_SAFE) & (F.abs(y) < _LONG_SAFE),
            (x * y).cast("decimal(38,0)"),
        ).otherwise(x.cast("decimal(38,0)") * y)

    # Small-dim fast path (the numeric-correlation profile shape: k
    # table columns, k(k+1)/2 ≤ 120 pairs): ONE wide aggregation with a
    # sum expression per pair — no per-row explode at all, so the row
    # volume never multiplies by pairs and the only shuffle is the
    # global-agg partial/final exchange (one row). Values are the SAME
    # exact decimals as the explode path below — this is a plan choice,
    # not a semantics choice. Above the threshold the wide agg's codegen
    # cost and single-row hotspot stop paying; the posexplode path's
    # shuffle is O(partitions · dim²) and scales to any dim.
    if dim * (dim + 1) // 2 <= 120:
        def _x(i: int):
            return F.element_at("__fx", i + 1)

        aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
        for i in range(dim):
            aggs.append(
                F.sum(_x(i).cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias(f"__sx_{i}")
            )
        for i in range(dim):
            for j in range(i, dim):
                aggs.append(
                    F.sum(_xy(_x(i), _x(j)))
                    .cast("decimal(38,0)")
                    .alias(f"__sxy_{i}_{j}")
                )
        row = base.agg(*aggs)
        structs = [
            F.struct(
                F.lit(i).cast("int").alias("i"),
                F.lit(j).cast("int").alias("j"),
                F.col(f"__sxy_{i}_{j}").alias("sum_xy_fx2"),
                F.col(f"__sx_{i}").alias("sum_x_fx"),
                F.col(f"__sx_{j}").alias("sum_y_fx"),
            )
            for i in range(dim)
            for j in range(i, dim)
        ]
        return (
            row.select(
                F.col("__n").alias("n"), F.explode(F.array(*structs)).alias("p")
            )
            .filter(F.col("n") > 0)  # explode path emits nothing on empty input
            .select(
                "p.i",
                "p.j",
                "n",
                "p.sum_xy_fx2",
                "p.sum_x_fx",
                "p.sum_y_fx",
                (
                    F.col("n").cast("decimal(38,0)") * F.col("p.sum_xy_fx2")
                    - F.col("p.sum_x_fx") * F.col("p.sum_y_fx")
                ).cast("decimal(38,0)").alias("cov_num_fx2"),
            )
        )

    # per-component sums Σx_i come from ONE dim-sized posexplode (not
    # duplicated through every pair group as the first version did —
    # 40% of the dim² explode was redundant x/y baggage) and accumulate
    # in DECIMAL from the first add: a long-typed Σx wraps silently
    # past 2^63, exactly the overflow class this operator exists to
    # avoid. The tiny (dim-row) sum table broadcast-joins back onto the
    # pair aggregates.
    comp = (
        base.select(F.posexplode("__fx").alias("i", "__x"))
        .groupBy("i")
        .agg(
            F.sum(F.col("__x").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("__sx")
        )
    )
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    _xy(
                        F.element_at("__fx", i + 1),
                        F.element_at("__fx", j + 1),
                    ).alias("xy"),
                ),
            ),
        )
    )
    exploded = base.select(F.explode(pairs).alias("p")).select("p.*")
    agg = exploded.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xy").cast("decimal(38,0)").alias("sum_xy_fx2"),
    )
    return (
        agg.join(
            F.broadcast(comp.select("i", F.col("__sx").alias("sum_x_fx"))),
            "i",
        )
        .join(
            F.broadcast(
                comp.select(
                    F.col("i").alias("j"), F.col("__sx").alias("sum_y_fx")
                )
            ),
            "j",
        )
        .select(
            "i",
            "j",
            "n",
            "sum_xy_fx2",
            "sum_x_fx",
            "sum_y_fx",
            (
                F.col("n").cast("decimal(38,0)") * F.col("sum_xy_fx2")
                - F.col("sum_x_fx") * F.col("sum_y_fx")
            ).cast("decimal(38,0)").alias("cov_num_fx2"),
        )
    )


def embedding_covariance_oracle_sql(
    table: str, vec_expr: str = "embedding", dim: int = 16, scale: int = 1000
) -> str:
    """DuckDB replica of :func:`embedding_covariance` (HUGEINT carries the
    exact pair sums; same fixed-point floors)."""
    return f"""
WITH fx AS (
    SELECT list_transform(CAST({vec_expr} AS DOUBLE[]),
                          x -> CAST(floor(x * {int(scale)}) AS BIGINT)) AS v
    FROM {table}
    WHERE {vec_expr} IS NOT NULL AND len({vec_expr}) = {int(dim)}
), pairs AS (
    SELECT i.i AS i, j.j AS j,
           CAST(v[i.i + 1] AS HUGEINT) * v[j.j + 1] AS xy,
           v[i.i + 1] AS x, v[j.j + 1] AS y
    FROM fx, (SELECT unnest(range(0, {int(dim)})) AS i) i,
         (SELECT unnest(range(0, {int(dim)})) AS j) j
    WHERE j.j >= i.i
), agg AS (
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(count(*) AS BIGINT) AS n,
           sum(xy) AS sxy, CAST(sum(x) AS HUGEINT) AS sx,
           CAST(sum(y) AS HUGEINT) AS sy
    FROM pairs GROUP BY i, j
)
SELECT i, j, n,
       CAST(sxy AS DECIMAL(38,0)) AS sum_xy_fx2,
       CAST(sx AS DECIMAL(38,0)) AS sum_x_fx,
       CAST(sy AS DECIMAL(38,0)) AS sum_y_fx,
       CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS cov_num_fx2
FROM agg
"""


def rrf_fusion(
    lists: list[tuple[str, DataFrame, str, str]], k0: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke & Buettcher, SIGIR 2009)
    — the standard way to combine heterogeneous retrieval signals (BM25
    text ranks + embedding-cosine ranks + recency ranks) without score
    calibration, completing the hybrid-search stack next to
    text.bm25_scores and the ANN family.

    Each entry is (name, candidates_df, id_col, score_col): the list is
    ranked by score DESC (ties broken by id ASC — total order, so ranks
    are engine-exact), and a document at rank r contributes
    floor(1e6 / (k0 + r)) — the RRF term in exact f6 fixed point, so
    fused scores are integers and portable. Returns
    (id, n_lists, rrf_f6); the caller sorts/cuts top-k.

    Contract: inputs are CANDIDATE lists (each the top-k output of a
    retrieval stage, ≤ ~1e5 rows), so the per-list ranking window is the
    documented tiny-table window pattern — NOT a corpus-scale sort. At
    100 TB the corpus-scale work happened upstream in the retrievers;
    fusing corpus-sized lists would need the two-phase global-rank
    machinery (corpus.quality_budget_filter) instead — by design this
    operator does not silently absorb that cost.
    """
    from pyspark.sql import Window

    if not lists:
        raise ValueError("lists must be non-empty")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    parts = []
    for name, df, id_col, score_col in lists:
        w = Window.orderBy(F.col("__s").desc(), F.col("__id").asc())
        parts.append(
            df.select(
                F.col(id_col).alias("__id"), F.col(score_col).alias("__s")
            )
            .filter(F.col("__id").isNotNull())
            .withColumn("__rnk", F.row_number().over(w))
            .select("__id", "__rnk")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            F.sum(F.expr(f"1000000 div ({int(k0)} + __rnk)"))
            .cast("long")
            .alias("rrf_f6"),
        )
        .withColumnRenamed("__id", "id")
    )


def rrf_fusion_oracle_sql(
    list_sqls: list[str], id_out: str = "id", k0: int = 60
) -> str:
    """DuckDB replica of :func:`rrf_fusion` — identical DESC-score/ASC-id
    ranking and floor(1e6/(k0+r)) terms. Each ``list_sqls`` entry yields
    (id, s)."""
    ranked = [
        f"""SELECT id, row_number() OVER (ORDER BY s DESC, id ASC) AS rnk
FROM ({sql}) WHERE id IS NOT NULL"""
        for sql in list_sqls
    ]
    u = "\nUNION ALL\n".join(ranked)
    return f"""
SELECT id AS {id_out}, CAST(count(*) AS BIGINT) AS n_lists,
       CAST(sum(1000000 // ({int(k0)} + rnk)) AS BIGINT) AS rrf_f6
FROM ({u}) GROUP BY id
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization (SQ8) — the embedding STORAGE primitive
# ---------------------------------------------------------------------------


def quantize_embeddings_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    out_col: str = "q8",
    scale_col: str = "q_max_abs",
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column — the
    standard 4× storage cut (float32 → int8 + one scalar) applied to a
    vector corpus before it ships to an ANN index or an archival tier
    (FAISS's SQ8 / "scalar quantizer" form).

    Per vector: m = max|x_i| (the scalar carried alongside), and
    q_i = floor(x_i · 127 / m) clamped to [-127, 127] — FLOOR, not
    round-half-*, because the two engines' round modes differ (Spark
    HALF_UP, DuckDB half-even) while floor of the identical IEEE-double
    expression is bit-portable (the module's f6 discipline applied to
    quantization). Dequantize: x̂_i = q_i · m / 127, with
    |x − x̂| ≤ m/127 by construction. All-zero vectors quantize to all
    zeros with m = 0 (dequantizes exactly); NULL vectors pass through
    as NULL.

    Plan shape at 100 TB: one narrow projection, no shuffle, no Python
    — array max + one transform, all Catalyst expressions. The output
    column is array<int> holding int8-range values (Spark's tinyint
    arrays widen in most sinks anyway; the RANGE is the contract).
    """
    v = F.col(vec_col).cast("array<double>")
    m = F.array_max(F.transform(v, F.abs))
    q = F.when(m == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127), F.floor(x * F.lit(127.0) / m).cast("int")
                ),
            ),
        )
    )
    return df.withColumn(out_col, q).withColumn(
        scale_col, F.when(v.isNull(), F.lit(None)).otherwise(m)
    )


def dequantize_embeddings_int8(
    df: DataFrame,
    q_col: str = "q8",
    scale_col: str = "q_max_abs",
    out_col: str = "embedding_deq",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings_int8`: x̂_i = q_i · m / 127
    (exact for the all-zero case, within m/127 elsewhere)."""
    m = F.col(scale_col)
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col), lambda qv: qv.cast("double") * m / F.lit(127.0)
        ),
    )


def int8_quantization_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-vector QA row for the SQ8 path — the audit a pipeline runs
    before swapping an index to quantized storage. One row per vector:

        (id, dim, scale_ppb, q_sum, q_l1, q_min, q_max, err_ppm_max)

    scale_ppb = floor(m·1e9) pins the carried scalar in exact integer
    parts-per-billion; q_* are exact integer aggregates of the int8
    codes (checksums a reader can re-derive); err_ppm_max =
    floor(1e6 · max|x_i − q_i·m/127| / m) is the worst reconstruction
    error relative to the vector's own magnitude — ≤ 1e6/127 ≈ 7874 by
    construction, so a larger value is a broken reader, not noise.
    All-zero and NULL vectors are dropped (nothing to audit).

    Plan shape: one narrow projection, zero shuffles — every statistic
    folds inside the row via F.aggregate/F.zip_with.
    """
    q8 = quantize_embeddings_int8(df, vec_col, id_col)
    v = F.col(vec_col).cast("array<double>")
    m = F.col("q_max_abs")
    deq = F.transform(F.col("q8"), lambda qv: qv.cast("double") * m / F.lit(127.0))
    abs_err = F.zip_with(v, deq, lambda a, b: F.abs(a - b))
    return (
        q8.filter(F.col("q_max_abs").isNotNull() & (F.col("q_max_abs") > 0.0))
        .select(
            F.col(id_col),
            F.size(v).cast("int").alias("dim"),
            F.floor(m * F.lit(1_000_000_000.0)).cast("long").alias("scale_ppb"),
            F.aggregate(
                "q8", F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("q_sum"),
            F.aggregate(
                "q8", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
            ).alias("q_l1"),
            F.array_min("q8").cast("int").alias("q_min"),
            F.array_max("q8").cast("int").alias("q_max"),
            F.floor(F.array_max(abs_err) * F.lit(1_000_000.0) / m)
            .cast("long")
            .alias("err_ppm_max"),
        )
    )


def int8_quantization_stats_oracle_sql(
    table: str, vec_expr: str = "embedding", id_col: str = "doc_id"
) -> str:
    """DuckDB replica of :func:`int8_quantization_stats` — identical
    IEEE-double expressions (x·127/m, q·m/127), identical floors and
    clamps, so every integer output matches bit-for-bit."""
    return f"""
WITH base AS (
    SELECT {id_col},
           list_transform(CAST({vec_expr} AS DOUBLE[]), x -> x) AS v,
           list_max(list_transform(CAST({vec_expr} AS DOUBLE[]), x -> abs(x))) AS m
    FROM {table}
    WHERE {vec_expr} IS NOT NULL
), q AS (
    SELECT {id_col}, v, m,
           list_transform(
               v, x -> greatest(-127, least(127,
                   CAST(floor(x * 127.0 / m) AS INT)))) AS q8
    FROM base WHERE m > 0
), err AS (
    SELECT {id_col}, v, m, q8,
           list_max(list_transform(range(1, len(v) + 1),
               i -> abs(v[i] - q8[i] * m / 127.0))) AS max_err
    FROM q
)
SELECT {id_col},
       CAST(len(v) AS INT) AS dim,
       CAST(floor(m * 1000000000.0) AS BIGINT) AS scale_ppb,
       CAST(list_sum(q8) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(q8, x -> abs(x))) AS BIGINT) AS q_l1,
       CAST(list_min(q8) AS INT) AS q_min,
       CAST(list_max(q8) AS INT) AS q_max,
       CAST(floor(max_err * 1000000.0 / m) AS BIGINT) AS err_ppm_max
FROM err
"""


def jl_sign_matrix(dim: int, k: int, seed: str = "jl") -> list[list[int]]:
    """Deterministic ±1 projection matrix for :func:`random_projection_f6`
    — k rows of dim signs, sign = parity of the first md5 byte of
    "seed:row:col" (Achlioptas 2003 showed ±1 entries satisfy the
    Johnson-Lindenstrauss lemma; md5 gives both engines — and any future
    reader in any language — the same matrix from the same seed string
    with no RNG-implementation coupling)."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[0] % 2 == 0
            else -1
            for i in range(dim)
        ]
        for j in range(k)
    ]


def random_projection_f6(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 16,
    seed: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction, engine-exact:
    project dim-wide embeddings onto k seeded ±1 directions,

        p_j = Σ_i sign(j,i) · floor(x_i · 1e6)

    — f6 fixed-point inputs so the projection is pure int64 arithmetic
    and hashes identically everywhere (callers divide by 1e6·√k at the
    edge to recover the JL-scaled coordinates). The cheap first stage of
    every wide-embedding pipeline here: distances in k=16 dims
    approximate distances in dim=64 within JL distortion, so dedup
    blocking / ANN shortlist / drift screens can run 4× narrower before
    the exact pass rescores the survivors.

    Rows whose vector is NULL or not exactly ``dim`` wide are dropped.
    Overflow: |p_j| ≤ dim · max|x| · 1e6 — int64-safe through
    max|x| ~ 1e8 at dim 64; rescale beyond.

    Plan shape: ZERO shuffles — one narrow projection; each output is a
    zip_with against a literal sign array folded by F.aggregate, all
    JVM-side. At 100 TB this is a map-only pass bounded by scan speed.
    """
    signs = jl_sign_matrix(dim, k, seed)
    xf = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(1_000_000.0)).cast("long"),
    )
    base = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(F.col(id_col), xf.alias("__xf"))
    cols = [F.col(id_col)]
    for j, row in enumerate(signs):
        lit_row = F.array(*[F.lit(s) for s in row])
        term = F.zip_with(F.col("__xf"), lit_row, lambda x, s: x * s)
        cols.append(
            F.aggregate(
                term, F.lit(0).cast("long"), lambda acc, v: acc + v
            ).alias(f"p{j:02d}")
        )
    return base.select(*cols)


def random_projection_oracle_sql(
    table: str,
    vec_expr: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 16,
    seed: str = "jl",
) -> str:
    """DuckDB replica of :func:`random_projection_f6`: identical f6
    floors, identical literal sign matrix, explicit 1-indexed sums."""
    signs = jl_sign_matrix(dim, k, seed)
    proj = ",\n       ".join(
        "CAST("
        + " + ".join(
            f"{'' if s == 1 else '-'}xf[{i + 1}]"
            for i, s in enumerate(row)
        )
        + f" AS BIGINT) AS p{j:02d}"
        for j, row in enumerate(signs)
    )
    return f"""
WITH base AS (
    SELECT {id_col},
           list_transform(CAST({vec_expr} AS DOUBLE[]),
                          x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS xf
    FROM {table}
    WHERE {vec_expr} IS NOT NULL AND len({vec_expr}) = {dim}
)
SELECT {id_col},
       {proj}
FROM base
"""


def sign_hamming_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Binary sign hashing (Charikar 2002's SimHash family applied to
    raw embedding coordinates): each vector becomes dim sign bits packed
    into two BIGINT halves (code_lo = bits 0..31, code_hi = 32..63 —
    two halves so no bit ever reaches a signed-overflow position on
    either engine), Hamming distance between codes approximates angular
    distance at 1 bit/dim — 32× smaller than float32 storage and
    distance is two XOR+popcounts. The cheapest ANN shortlist tier,
    below even :func:`random_projection_f6`.

    Bits are exact: bit i set iff x_i > 0 (ties-to-zero deterministic on
    IEEE equality), packed by summing power-of-two literals — pure
    integer arithmetic, engine-identical. Rows not exactly ``dim`` wide
    or NULL are dropped.

    Plan shape: ZERO shuffles, one narrow projection."""
    assert dim <= 64, "two 32-bit halves — widen the half count past 64"
    half = dim // 2
    v = F.col(vec_col)

    def pack(offset: int, n: int) -> Column:
        powers = F.array(*[F.lit(1 << i) for i in range(n)])
        bits = F.zip_with(
            F.slice(v, offset + 1, n),
            powers,
            lambda x, p: F.when(x > 0, p).otherwise(F.lit(0)),
        )
        return F.aggregate(
            bits, F.lit(0).cast("long"), lambda acc, x: acc + x
        )

    return df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)).select(
        F.col(id_col),
        pack(0, half).alias("code_lo"),
        pack(half, dim - half).alias("code_hi"),
    )
