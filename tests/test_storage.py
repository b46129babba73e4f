"""Time-partitioned storage tests (SURVEY S9, S14-S19, Q18, C16)."""

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aleph2_contrib_spark.functions.query import Q
from aleph2_contrib_spark.model.bucket import Bucket, ColumnarSchema, TemporalSchema
from aleph2_contrib_spark.sources.storage import PARTITION_COL, TimePartitionedTable


@pytest.fixture()
def events_df(spark):
    rows = [
        Row(_id="a", ts=dt.datetime(2020, 1, 5), v=1.0, s="x"),
        Row(_id="b", ts=dt.datetime(2020, 2, 10), v=2.0, s="y"),
        Row(_id="c", ts=dt.datetime(2020, 2, 20), v=3.0, s="z"),
        Row(_id="d", ts=dt.datetime(2021, 3, 1), v=4.0, s="w"),
    ]
    return spark.createDataFrame(rows)


def make_table(spark, tmp_path, **kw):
    bucket = Bucket(
        full_name="/test/events",
        path=str(tmp_path / "events"),
        temporal=TemporalSchema(time_field="ts", grouping_time_period="month", **kw),
    )
    return TimePartitionedTable(spark, bucket)


def test_write_routes_by_time(spark, tmp_path, events_df):
    t = make_table(spark, tmp_path)
    t.write(events_df)
    parts = sorted(d for d in os.listdir(t.primary_path) if d.startswith(PARTITION_COL))
    assert parts == [
        f"{PARTITION_COL}=2020-01-01T00",
        f"{PARTITION_COL}=2020-02-01T00",
        f"{PARTITION_COL}=2021-03-01T00",
    ]


def test_late_data_lands_in_old_partition(spark, tmp_path, events_df):
    """Event-time routing with no lateness cutoff (SURVEY §2.7)."""
    t = make_table(spark, tmp_path)
    t.write(events_df)
    late = spark.createDataFrame([Row(_id="late", ts=dt.datetime(2020, 1, 30), v=9.0, s="l")])
    t.write(late)
    jan = t.read(dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 31))
    assert sorted(r["_id"] for r in jan.collect()) == ["a", "late"]


def test_read_prunes_partitions(spark, tmp_path, events_df):
    t = make_table(spark, tmp_path)
    t.write(events_df)
    out = t.read(dt.datetime(2020, 2, 1), dt.datetime(2020, 2, 28))
    assert sorted(r["_id"] for r in out.collect()) == ["b", "c"]
    # physical plan must show partition filters (pruning, not post-filter)
    plan = out.filter(F.lit(True))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_read_with_query_injects_partition_bounds(spark, tmp_path, events_df):
    t = make_table(spark, tmp_path)
    t.write(events_df)
    spec = Q.all_of().range_closed_open("ts", dt.datetime(2020, 2, 1), dt.datetime(2020, 3, 1)).range_above("v", 2.5)
    out = t.read_with_query(spec)
    assert [r["_id"] for r in out.collect()] == ["c"]


def test_age_out(spark, tmp_path, events_df):
    t = make_table(spark, tmp_path, exist_age_max="365 days")
    t.write(events_df)
    removed = t.age_out(now=dt.datetime(2021, 3, 2))
    assert removed == ["2020-01-01T00", "2020-02-01T00"]
    assert sorted(r["_id"] for r in t.read().collect()) == ["d"]


def test_secondary_buffer_promote(spark, tmp_path, events_df):
    t = make_table(spark, tmp_path)
    t.write(events_df)
    v2 = spark.createDataFrame([Row(_id="new", ts=dt.datetime(2022, 1, 1), v=10.0, s="n")])
    t.write_to_buffer(v2, "ping")
    assert t.read().count() == 4  # readers still see old primary
    t.promote_buffer("ping")
    assert [r["_id"] for r in t.read().collect()] == ["new"]


def test_columnar_include_exclude(spark, tmp_path, events_df):
    bucket = Bucket(
        full_name="/test/events",
        path=str(tmp_path / "ev2"),
        temporal=TemporalSchema(time_field="ts", grouping_time_period="month"),
        columnar=ColumnarSchema(field_exclude_list=("s",)),
    )
    t = TimePartitionedTable(spark, bucket)
    t.write(events_df)
    assert sorted(t.read().columns) == ["_id", "ts", "v"]


def test_collide_policy_error(spark, tmp_path, events_df):
    bucket = Bucket(
        full_name="/t", path=str(tmp_path / "ev3"),
        temporal=TemporalSchema(time_field="ts", grouping_time_period="month"),
        collide_policy="error",
    )
    t = TimePartitionedTable(spark, bucket)
    t.write(events_df)
    bad = spark.createDataFrame([Row(_id="x", ts=dt.datetime(2020, 5, 1), v="not-a-double", s="q")])
    with pytest.raises(ValueError, match="schema collision"):
        t.write(bad)


def test_collide_policy_new_type(spark, tmp_path, events_df):
    """S16 new_type: a colliding column is stored under the next free
    <name>_N suffix (ES auto-type retry type_1→type_2…); readers see both
    representations with nulls where a row lacks one, and a later write
    with the SAME evolved type reuses the suffix column."""
    bucket = Bucket(
        full_name="/t", path=str(tmp_path / "ev4"),
        temporal=TemporalSchema(time_field="ts", grouping_time_period="month"),
        collide_policy="new_type",
    )
    t = TimePartitionedTable(spark, bucket)
    t.write(events_df)
    evolved = spark.createDataFrame(
        [Row(_id="x", ts=dt.datetime(2020, 5, 1), v="not-a-double", s="q")]
    )
    t.write(evolved)
    t.write(evolved.withColumn("_id", F.lit("y")))  # same evolved type → reuse v_2
    got = t.read()
    assert sorted(got.columns) == ["_id", "s", "ts", "v", "v_2"]
    assert got.filter(F.col("v").isNotNull()).count() == 4
    assert sorted(
        r["v_2"] for r in got.filter(F.col("v_2").isNotNull()).collect()
    ) == ["not-a-double", "not-a-double"]
    assert dict(got.dtypes)["v"] == "double" and dict(got.dtypes)["v_2"] == "string"


def test_optimize_clusters_data(spark, tmp_path, events_df):
    t = make_table(spark, tmp_path)
    t.write(events_df)
    t.optimize(["v"])
    assert t.read().count() == 4


def test_delete_datastore(spark, tmp_path, events_df):
    t = make_table(spark, tmp_path)
    t.write(events_df)
    t.delete_datastore()
    assert not os.path.exists(t.bucket.path)


def test_columnar_schema_type_and_pattern_selection(spark, events_df):
    cs = ColumnarSchema(field_type_include_list=("number",), field_include_pattern_list=("_i*",))
    assert cs.select_columns(events_df.schema) == ["_id", "v"]


def test_write_clusters_files_per_partition(spark, tmp_path, events_df):
    from aleph2_contrib_spark.model.bucket import WriteSettings

    # default: one file per period regardless of input parallelism
    b1 = Bucket(
        full_name="/t/one", path=str(tmp_path / "one"),
        temporal=TemporalSchema(time_field="ts", grouping_time_period="month"),
    )
    t1 = TimePartitionedTable(spark, b1)
    t1.write(events_df.repartition(8))
    for d in os.listdir(t1.primary_path):
        if d.startswith(PARTITION_COL):
            files = [f for f in os.listdir(os.path.join(t1.primary_path, d)) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)

    # files_per_partition=2: at most 2 files per period, contents intact
    b2 = Bucket(
        full_name="/t/two", path=str(tmp_path / "two"),
        temporal=TemporalSchema(time_field="ts", grouping_time_period="month"),
        write=WriteSettings(files_per_partition=2),
    )
    t2 = TimePartitionedTable(spark, b2)
    t2.write(events_df.repartition(8))
    for d in os.listdir(t2.primary_path):
        if d.startswith(PARTITION_COL):
            files = [f for f in os.listdir(os.path.join(t2.primary_path, d)) if f.endswith(".parquet")]
            assert 1 <= len(files) <= 2, (d, files)
    assert {r["_id"] for r in t2.read().collect()} == {"a", "b", "c", "d"}


def test_write_salted_with_columnar_excluding_time_field(spark, tmp_path, events_df):
    # files_per_partition>1 + a columnar schema that DROPS the time field:
    # the salt must be computed before the projection (regression: this
    # raised an unresolved-column AnalysisException)
    from aleph2_contrib_spark.model.bucket import WriteSettings

    b = Bucket(
        full_name="/t/salted", path=str(tmp_path / "salted"),
        temporal=TemporalSchema(time_field="ts", grouping_time_period="month"),
        columnar=ColumnarSchema(field_exclude_list=("ts", "s")),
        write=WriteSettings(files_per_partition=2),
    )
    t = TimePartitionedTable(spark, b)
    t.write(events_df.repartition(8))
    out = t.read()
    assert sorted(out.columns) == ["_id", "v"]  # no salt column persisted
    assert {r["_id"] for r in out.collect()} == {"a", "b", "c", "d"}


def test_compact_bin_packs_small_files(spark, tmp_path, events_df):
    """Repeated appends accumulate small files; compact() rewrites only
    the oversplit partitions, preserves all rows, and keeps the partition
    layout (pruning still works)."""
    import glob

    t = make_table(spark, tmp_path)
    for _ in range(5):  # 5 appends -> >=5 files per partition
        t.write(events_df)
    old_primary = t.primary_path
    feb_old = os.path.join(old_primary, f"{PARTITION_COL}=2020-02-01T00")
    before = len(glob.glob(os.path.join(feb_old, "part-*")))
    assert before >= 5
    # a reader resolved before the compaction
    old_reader = spark.read.parquet(old_primary)
    report = t.compact(target_file_bytes=1 << 30)  # everything fits one file
    assert report[f"{PARTITION_COL}=2020-02-01T00"][1] == 1
    # publication is a pointer commit: primary now names a NEW version dir
    assert t.primary_path != old_primary
    feb = os.path.join(t.primary_path, f"{PARTITION_COL}=2020-02-01T00")
    assert len(glob.glob(os.path.join(feb, "part-*"))) == 1
    df = spark.read.parquet(t.primary_path)
    assert df.count() == 4 * 5
    # partition directory layout intact -> pruning by partition col works
    assert df.filter(F.col(PARTITION_COL) == "2020-02-01T00").count() == 2 * 5
    # the racing reader's snapshot survived (vacuum grace keeps the old dir)
    assert old_reader.count() == 4 * 5


def test_compact_skips_already_packed(spark, tmp_path, events_df):
    t = make_table(spark, tmp_path)
    t.write(events_df)
    t.compact(target_file_bytes=1 << 30)
    # second run: nothing left to do
    assert t.compact(target_file_bytes=1 << 30) == {}


def test_promote_is_pointer_commit_not_directory_move(spark, tmp_path, events_df):
    """S17 object-store safety: promote repoints _current; the promoted
    buffer's data directory is NOT moved, and the retired primary stays on
    disk (grace window) so in-flight readers keep a valid path."""
    from aleph2_contrib_spark.sources import manifest

    t = make_table(spark, tmp_path)
    t.write(events_df)
    old_primary = t.primary_path
    v2 = spark.createDataFrame([Row(_id="new", ts=dt.datetime(2022, 1, 1), v=10.0, s="n")])
    t.write_to_buffer(v2, "ping")
    buffer_dir = t.buffer_path("ping")
    t.promote_buffer("ping")
    # pointer names the former buffer dir verbatim — zero data movement
    assert t.primary_path == buffer_dir
    assert os.path.isdir(buffer_dir)
    assert manifest.read_pointer(str(tmp_path / "events")) is not None
    # retired primary kept for the grace window
    assert os.path.isdir(old_primary)


def test_concurrent_reader_survives_promote_loop(spark, tmp_path, events_df):
    """A reader that resolved the primary BEFORE a promote still collects
    cleanly AFTER it (snapshot-style isolation via retained versions) —
    the failure mode of the old directory swap was exactly this reader
    dying on a vanished path."""
    t = make_table(spark, tmp_path)
    t.write(events_df)
    for i in range(3):
        pre_resolved = t.read()  # lazy plan over the current version
        buf = spark.createDataFrame(
            [Row(_id=f"gen{i}", ts=dt.datetime(2022, 1, 1 + i), v=float(i), s="g")]
        )
        t.write_to_buffer(buf, "pong")
        t.promote_buffer("pong")
        # post-promote: the pre-promote reader's files are intact
        assert pre_resolved.count() in (4, 1)
        assert [r["_id"] for r in t.read().collect()] == [f"gen{i}"]


def test_buffer_overwrite_after_promote_never_touches_live_data(spark, tmp_path, events_df):
    """Reloading a buffer name that was previously promoted must write a
    FRESH version dir — not clobber the live primary that dir became."""
    t = make_table(spark, tmp_path)
    t.write(events_df)
    t.write_to_buffer(events_df.limit(2), "ping")
    t.promote_buffer("ping")
    live = t.primary_path
    t.write_to_buffer(events_df.limit(1), "ping")  # reload same buffer name
    assert t.buffer_path("ping") != live
    assert t.read().count() == 2  # live data untouched
    t.promote_buffer("ping")
    assert t.read().count() == 1


def test_compaction_plan_quota_binning(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.sources.storage import compaction_plan

    files = spark.createDataFrame(
        [
            Row(part="p", f="a", sz=90),   # 0 before  -> bin 0
            Row(part="p", f="b", sz=60),   # 90 before -> bin 0 (overshoot)
            Row(part="p", f="c", sz=40),   # 150       -> bin 1
            Row(part="p", f="d", sz=40),   # 190       -> bin 1
            Row(part="p", f="e", sz=10),   # 230       -> bin 2
            Row(part="q", f="big", sz=500),  # oversize file alone in bin 0
            Row(part="q", f="tail", sz=10),  # 500 before -> bin 5
        ]
    )
    out = {
        (r.part, r.f): (r.bin_id, r.bin_seq)
        for r in compaction_plan(files, "part", "f", "sz", 100).collect()
    }
    assert out == {
        ("p", "a"): (0, 1),
        ("p", "b"): (0, 2),
        ("p", "c"): (1, 1),
        ("p", "d"): (1, 2),
        ("p", "e"): (2, 1),
        ("q", "big"): (0, 1),
        ("q", "tail"): (5, 1),
    }
