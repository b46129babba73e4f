"""Stateful streaming (applyInPandasWithState), user graph-merge modules,
and CRUD meta-model tests."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import Row

from aleph2_contrib_spark.operators.crud import CrudService
from aleph2_contrib_spark.operators.graph import DecompElement, decompose, merge_vertices
from aleph2_contrib_spark.plans.pipeline import EnrichmentModule
from aleph2_contrib_spark.streaming.stateful import RunningCountModule, apply_stateful


def test_stateful_running_count_across_batches(spark, tmp_path):
    """State persists across micro-batches: two file drops, counts accumulate."""
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for u, n in [("u1", 2), ("u2", 1)]:
            for i in range(n):
                f.write(json.dumps({"user": u, "v": i}) + "\n")

    collected = []

    stream = (
        spark.readStream.schema("user string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = apply_stateful(
        stream,
        ["user"],
        RunningCountModule(),
        output_schema="key string, running_total long",
        state_schema="total long",
    )
    ckpt = str(tmp_path / "ckpt")
    q = out.writeStream.foreachBatch(
        lambda df, bid: collected.extend((bid, r["key"], r["running_total"]) for r in df.collect())
    ).option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {(k): t for (_, k, t) in collected}
    assert got == {"u1": 2, "u2": 1}

    # second drop: counts continue from checkpointed state
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"user": "u1", "v": 9}) + "\n")
    collected.clear()
    stream2 = (
        spark.readStream.schema("user string, v long").option("maxFilesPerTrigger", 1).json(str(src))
    )
    out2 = apply_stateful(
        stream2, ["user"], RunningCountModule(),
        output_schema="key string, running_total long", state_schema="total long",
    )
    q2 = out2.writeStream.foreachBatch(
        lambda df, bid: collected.extend((bid, r["key"], r["running_total"]) for r in df.collect())
    ).option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    assert ("u1" in {k for (_, k, _) in collected})
    assert {t for (_, k, t) in collected if k == "u1"} == {3}  # 2 + 1


class PickRichest(EnrichmentModule):
    """User merge module: winner = candidate with the longest label."""

    def on_object_batch(self, batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values("label", key=lambda s: s.str.len(), ascending=False)
        return b.head(1).drop(columns=["__prio"])


def test_user_merge_module(spark):
    records = spark.createDataFrame(
        [Row(_id="1", src_ip="10.0.0.1", dst_ip="10.0.0.2")]
    )
    new_v, _ = decompose(records, [DecompElement(["src_ip"], ["dst_ip"], "connects", "ip", "ip")])
    existing = spark.createDataFrame(
        [Row(key=Row(name="10.0.0.1", type="ip"), label="ip_with_long_history", bucket_path="/old")]
    )
    merged = merge_vertices(existing, new_v, merge_module=PickRichest())
    by_name = {r["key"]["name"]: r["label"] for r in merged.collect()}
    assert by_name["10.0.0.1"] == "ip_with_long_history"  # module picked richest
    assert by_name["10.0.0.2"] == "ip"
    assert merged.count() == 2


def test_crud_meta_model(spark):
    df = spark.createDataFrame([Row(_id="a", n=1, tags=["x"])])
    svc = CrudService(spark, df=df)
    mm = svc.get_meta_model()
    cols = {c["name"]: c["type"] for c in mm["columns"]}
    assert cols == {"_id": "string", "n": "bigint", "tags": "array<string>"}


def test_session_window_module_times_out_and_closes(spark, tmp_path):
    """ProcessingTimeTimeout path: a key with no new data past timeout_ms
    gets on_timeout — one session summary row is emitted and the state is
    removed (a later event would open a FRESH session)."""
    import time

    from aleph2_contrib_spark.streaming.stateful import SessionWindowModule

    src = tmp_path / "sess_in"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for v in (3.0, 7.0):
            f.write(json.dumps({"user": "u1", "value": v}) + "\n")

    collected = []
    stream = (
        spark.readStream.schema("user string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = apply_stateful(
        stream,
        ["user"],
        SessionWindowModule(timeout_ms=2000),
        output_schema="key string, n_events long, v_min double, v_max double",
        state_schema="n long, v_min double, v_max double",
        timeout="ProcessingTimeTimeout",
    )
    q = (
        out.writeStream.foreachBatch(
            lambda df, bid: collected.extend(r.asDict() for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while not collected and time.time() < deadline:
            time.sleep(1)
    finally:
        q.stop()
    assert collected == [{"key": "u1", "n_events": 2, "v_min": 3.0, "v_max": 7.0}]
