"""Graph decompose + merge tests (SURVEY §2.5, FIXTURES.md §3)."""

import pytest
from pyspark.sql import Row

from aleph2_contrib_spark.operators.graph import (
    DecompElement,
    build_graph,
    decompose,
    merge_vertices,
    resolve_edges,
)

EL = [DecompElement(from_fields=["src_ip"], to_fields=["dst_ip"], edge_name="connects", from_type="ip", to_type="ip")]


@pytest.fixture()
def records(spark):
    return spark.createDataFrame(
        [
            Row(_id="1", src_ip="10.0.0.1", dst_ip="10.0.0.2", bytes=100),
            Row(_id="2", src_ip="10.0.0.1", dst_ip="10.0.0.2", bytes=200),  # dup edge
            Row(_id="3", src_ip="10.0.0.2", dst_ip="10.0.0.3", bytes=300),
            Row(_id="4", src_ip="10.0.0.4", dst_ip="10.0.0.4", bytes=50),  # self-loop
            Row(_id="5", src_ip=None, dst_ip="10.0.0.9", bytes=1),  # null endpoint
        ]
    )


def test_decompose_vertices_dedup(spark, records):
    v, e = decompose(records, EL, bucket_path="/test/bucket")
    names = sorted(r["key"]["name"] for r in v.collect())
    assert names == ["10.0.0.1", "10.0.0.2", "10.0.0.3", "10.0.0.4"]
    assert all(r["bucket_path"] == "/test/bucket" for r in v.collect())


def test_decompose_edges(spark, records):
    _, e = decompose(records, EL)
    # raw edges before dedup: 4 non-null records
    assert e.count() == 4
    pairs = {(r["outV"]["name"], r["inV"]["name"]) for r in e.collect()}
    assert ("10.0.0.1", "10.0.0.2") in pairs and ("10.0.0.4", "10.0.0.4") in pairs


def test_edge_dedup_and_self_loop(spark, records):
    v, e = build_graph(records, EL)
    edges = {(r["outV"]["name"], r["inV"]["name"]) for r in e.collect()}
    assert edges == {("10.0.0.1", "10.0.0.2"), ("10.0.0.2", "10.0.0.3"), ("10.0.0.4", "10.0.0.4")}


def test_merge_first_wins_existing_priority(spark, records):
    v, _ = decompose(records, EL)
    existing = spark.createDataFrame(
        [Row(key=Row(name="10.0.0.1", type="ip"), label="ip_EXISTING", bucket_path="/old")]
    )
    merged = merge_vertices(existing, v)
    by_name = {r["key"]["name"]: r["label"] for r in merged.collect()}
    assert by_name["10.0.0.1"] == "ip_EXISTING"  # existing wins
    assert by_name["10.0.0.3"] == "ip"
    assert merged.count() == 4


def test_rerun_idempotent(spark, records):
    v1, e1 = build_graph(records, EL)
    v2, e2 = build_graph(records, EL, existing_vertices=v1, existing_edges=e1)
    assert v2.count() == v1.count() and e2.count() == e1.count()


def test_edges_to_unknown_vertices_dropped(spark, records):
    _, e = decompose(records, EL)
    winners = spark.createDataFrame(
        [Row(key=Row(name="10.0.0.1", type="ip"), label="ip", bucket_path="/")]
    )
    # only edges with BOTH endpoints in winners survive; none here qualify
    assert resolve_edges(e, winners).count() == 0
