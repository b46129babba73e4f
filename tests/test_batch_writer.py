"""C5 buffered batch-write trigger tests (reference HfdsDataWriteService
check_segment:537-550, defaults :437-441): segments roll on object count,
staged byte size, or elapsed flush interval — whichever fires first."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from aleph2_contrib_spark.model.bucket import Bucket, TemporalSchema, WriteSettings
from aleph2_contrib_spark.sources.batch_writer import BatchWriteService
from aleph2_contrib_spark.sources.storage import TimePartitionedTable

SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


def obj(i, month=1):
    return {"_id": f"o{i}", "ts": dt.datetime(2020, month, 1 + i % 27), "v": float(i)}


def make_writer(spark, tmp_path, clock, **settings):
    bucket = Bucket(
        full_name="/test/batchwrite",
        path=str(tmp_path / "bw"),
        temporal=TemporalSchema(time_field="ts", grouping_time_period="month"),
        write=WriteSettings(**settings),
    )
    return BatchWriteService(TimePartitionedTable(spark, bucket), SCHEMA, clock=clock)


def test_defaults_match_reference(spark, tmp_path):
    w = make_writer(spark, tmp_path, FakeClock())
    # HfdsDataWriteService.java:437-441: 5000 objects / 20 MB / 10 min
    assert w.max_objects == 5000
    assert w.max_size_b == 20 * 1024 * 1024
    assert w.flush_interval_s == 600


def test_count_trigger_rolls_segments(spark, tmp_path):
    w = make_writer(spark, tmp_path, FakeClock(), batch_max_objects=10)
    w.store_objects(obj(i) for i in range(35))
    # strict > threshold (reference :539): roll at 11, 22, 33 staged
    assert w.segments_written == 3
    assert w.staged_objects == 2
    assert w.flush() and w.segments_written == 4
    total = w.table.read().count()
    assert total == 35


def test_size_trigger_rolls_segments(spark, tmp_path):
    w = make_writer(
        spark, tmp_path, FakeClock(), batch_max_objects=10_000, batch_max_size_kb=1
    )
    n = 50  # ~70 B/object staged → > 1 KB every ~15 objects
    w.store_objects(obj(i) for i in range(n))
    assert w.segments_written >= 2  # size trigger rolled, count never reached
    assert w.staged_bytes <= 1024  # buffer re-bounded after each roll
    w.flush()
    assert w.table.read().count() == n  # no rows lost across rolls


def test_interval_trigger_on_poll(spark, tmp_path):
    clock = FakeClock()
    w = make_writer(spark, tmp_path, clock, batch_flush_interval_s=600)
    w.store_objects(obj(i) for i in range(5))
    assert w.segments_written == 0
    assert not w.poll()  # interval not elapsed — nothing written
    clock.t += 601
    assert w.poll()  # the reference's queue-timeout path (:456-460)
    assert w.segments_written == 1 and w.staged_objects == 0


def test_interval_trigger_on_store(spark, tmp_path):
    clock = FakeClock()
    w = make_writer(spark, tmp_path, clock, batch_flush_interval_s=600)
    w.store_object(obj(0))
    clock.t += 601
    w.store_object(obj(1))  # check_segment fires on the write path too
    assert w.segments_written == 1


def test_clock_backwards_triggers(spark, tmp_path):
    clock = FakeClock()
    w = make_writer(spark, tmp_path, clock)
    w.store_object(obj(0))
    clock.t -= 50  # reference :545: clock change → trigger immediately
    w.store_object(obj(1))
    assert w.segments_written == 1


def test_set_batch_properties_overrides(spark, tmp_path):
    w = make_writer(spark, tmp_path, FakeClock())
    w.set_batch_properties(max_objects=2, max_size_kb=None)
    assert w.max_objects == 2 and w.max_size_b == 20 * 1024 * 1024
    w.store_objects(obj(i) for i in range(3))
    assert w.segments_written == 1


def test_segments_land_time_routed(spark, tmp_path):
    """Completed segments move into the time-routed store (reference
    complete_segment :582-620 renames into getSuffix(batch_time))."""
    import os

    from aleph2_contrib_spark.sources.storage import PARTITION_COL

    w = make_writer(spark, tmp_path, FakeClock(), batch_max_objects=3)
    w.store_objects([obj(0, month=1), obj(1, month=2), obj(2, month=2), obj(3, month=3)])
    w.flush()
    parts = sorted(
        d for d in os.listdir(w.table.primary_path) if d.startswith(PARTITION_COL)
    )
    assert parts == [
        f"{PARTITION_COL}=2020-01-01T00",
        f"{PARTITION_COL}=2020-02-01T00",
        f"{PARTITION_COL}=2020-03-01T00",
    ]
    assert w.table.read().count() == 4
