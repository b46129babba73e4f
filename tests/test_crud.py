"""CrudService surface tests (SURVEY §2.2): read/meta/layout ops not already
covered by the gate queries — modeled on TestMongoDbCrudService /
TestElasticsearchCrudService shapes (store/count/meta-model/index mgmt)."""

import pytest
from pyspark.sql import Row

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
