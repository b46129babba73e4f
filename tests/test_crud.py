"""CrudService surface tests (SURVEY §2.2): read/meta/layout ops not already
covered by the gate queries — modeled on TestMongoDbCrudService /
TestElasticsearchCrudService shapes (store/count/meta-model/index mgmt)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aleph2_contrib_spark.functions.query import Q
from aleph2_contrib_spark.operators.crud import CrudService


@pytest.fixture()
def svc(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [Row(_id=str(i), n=i, s=f"s{i % 3}") for i in range(20)]
    ).write.parquet(path)
    return CrudService(spark, path=path)


def test_get_and_count(svc):
    assert svc.get_object_by_id("7")["n"] == 7
    assert svc.count_objects() == 20
    assert svc.count_objects(Q.all_of().when("s", "s0")) == 7


def test_meta_model(svc):
    mm = svc.get_meta_model()
    assert {c["name"] for c in mm["columns"]} == {"_id", "n", "s"}


def test_optimize_query_clusters_and_preserves(svc):
    before = {r["_id"]: r["n"] for r in svc.df.collect()}
    svc.optimize_query(["s", "n"])
    after = {r["_id"]: r["n"] for r in svc.df.collect()}
    assert before == after  # clustering never changes contents
    assert svc.deregister_optimized_query(["s", "n"]) is True
    assert svc.deregister_optimized_query(["s", "n"]) is False


def test_optimize_query_noop_in_memory(spark):
    df = spark.createDataFrame([Row(_id="a", n=1)])
    svc = CrudService(spark, df=df)
    svc.optimize_query(["n"])  # no path: must not raise
    assert svc.count_objects() == 1


def test_optimize_query_zorders_numeric_compound_index(spark):
    """A multi-field optimizeQuery on a commit-log table clusters on the
    Z-curve: both fields' zone maps become selective, and a string field
    in the list falls back to lexicographic without raising."""
    import tempfile

    from aleph2_contrib_spark.functions.query import Q
    from aleph2_contrib_spark.sources.txlog import TransactionalTable

    root = tempfile.mkdtemp(prefix="a2s_crud_zorder_")
    t = TransactionalTable(spark, root, stats_cols=("a", "b"))
    t.append(
        spark.range(4096).repartition(16).select(
            ((F.col("id") * 2654435761) % 500).alias("a"),
            ((F.col("id") * 7919 + 13) % 500).alias("b"),
            F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("s"),
        )
    )
    svc = CrudService(spark, table=t)
    svc.optimize_query(["a", "b"])
    _, active = t.snapshot()
    total = len(active)
    assert total >= 8
    # with F files over d dims the curve resolves ~F^(1/d) buckets per
    # dim; a range inside ONE per-dim bucket must prune to well under
    # half the files ON EITHER DIMENSION (lexicographic clustering would
    # leave the trailing dim's zone maps spanning everything)
    for col in ("a", "b"):
        touched = len(t._prune_files(active, Q.all_of().range_closed_closed(col, 40, 80)))
        assert touched <= total // 2, (col, touched, total)
    # string field: silent lexicographic fallback, still a commit
    svc.optimize_query(["s", "a"])
    assert svc.count_objects() == 4096


def test_masked_repo_field_level_visibility(svc, spark):
    """G7 field-level half: rows filtered, columns dropped, pseudonymized
    columns stable + non-reversible; unknown columns fail fast; masking
    stays a pruned projection (dropped col absent from ReadSchema)."""
    masked = svc.get_masked_repo(
        auth_spec=Q.all_of().when("s", "s1"), drop_cols=["s"], hash_cols=["_id"]
    )
    rows = masked.df.collect()
    assert rows and all(r.n % 3 == 1 for r in rows)
    assert "s" not in masked.df.columns
    # sha256 digests: 64 hex chars, stable across two reads
    again = {r.n: r._id for r in masked.df.collect()}
    assert all(len(r._id) == 64 for r in rows)
    assert {r.n: r._id for r in rows} == again
    with pytest.raises(ValueError, match="not in schema"):
        svc.get_masked_repo(drop_cols=["nope"])
    # without the auth filter referencing it, a dropped column never
    # reaches the parquet reader at all
    plan = (
        svc.get_masked_repo(drop_cols=["s"])
        .df.select("n")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ReadSchema" in plan and "s:string" not in plan.split("ReadSchema")[1][:200]
