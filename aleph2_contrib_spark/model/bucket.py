"""Bucket / data-schema model — the declarative dataset spec.

Mirrors the reference's DataBucketBean + data_schema sub-beans (fixture:
test_end_2_end_bucket.json — temporal grouping_time_period + exist_age_max,
columnar field lists, search/document schemas), re-targeted at a Parquet
table partitioned by a derived time bucket.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import types as T

_PERIODS = {"hour", "day", "week", "month", "quarter", "year"}


@dataclass(frozen=True)
class TemporalSchema:
    """Time partitioning + retention (reference temporal_schema:
    grouping_time_period, time_field, exist_age_max)."""

    time_field: str = "@timestamp"
    grouping_time_period: str = "month"  # hour|day|week|month|quarter|year
    exist_age_max: str | None = None  # e.g. "30 days"

    def __post_init__(self):
        if self.grouping_time_period not in _PERIODS:
            raise ValueError(f"bad grouping_time_period {self.grouping_time_period}")


@dataclass(frozen=True)
class ColumnarSchema:
    """Write-side column selection (reference columnar_schema include/
    exclude by name, glob pattern, or type —
    ElasticsearchIndexUtils.java:483-500; default columnar set =
    string/number/date :667-682)."""

    field_include_list: Sequence[str] = ()
    field_exclude_list: Sequence[str] = ()
    field_include_pattern_list: Sequence[str] = ()
    field_exclude_pattern_list: Sequence[str] = ()
    field_type_include_list: Sequence[str] = ()  # e.g. ("string","number","date")
    field_type_exclude_list: Sequence[str] = ()

    def select_columns(self, schema: T.StructType) -> list[str]:
        def type_class(dt: T.DataType) -> str:
            if isinstance(dt, T.StringType):
                return "string"
            if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
                               T.FloatType, T.DoubleType, T.DecimalType)):
                return "number"
            if isinstance(dt, (T.DateType, T.TimestampType)):
                return "date"
            if isinstance(dt, T.BooleanType):
                return "boolean"
            if isinstance(dt, T.BinaryType):
                return "binary"
            return "complex"

        out = []
        for f in schema.fields:
            tc = type_class(f.dataType)
            included = (
                not (self.field_include_list or self.field_include_pattern_list or self.field_type_include_list)
                or f.name in self.field_include_list
                or any(fnmatch.fnmatch(f.name, p) for p in self.field_include_pattern_list)
                or tc in self.field_type_include_list
            )
            excluded = (
                f.name in self.field_exclude_list
                or any(fnmatch.fnmatch(f.name, p) for p in self.field_exclude_pattern_list)
                or tc in self.field_type_exclude_list
            )
            if included and not excluded:
                out.append(f.name)
        return out


@dataclass(frozen=True)
class WriteSettings:
    """Segment rolling (reference target_write_settings: batch_max_objects
    5000 / batch_max_size_kb 20MB / batch_flush_interval 10min —
    HfdsDataWriteService.java:438-441). In Spark these map to
    maxRecordsPerFile + streaming trigger interval."""

    batch_max_objects: int = 5000
    batch_max_size_kb: int = 20 * 1024
    batch_flush_interval_s: int = 600
    compression: str = "snappy"  # gzip | snappy | none (codec list :642-686)
    # Files written per time-partition (small-files control): writes are
    # clustered on the partition value plus a salt bounded by this, so a
    # partitioned write produces files_per_partition files per period
    # instead of one per (task, period) pair. Raise it when single periods
    # exceed one task's comfortable output size.
    files_per_partition: int = 1


@dataclass(frozen=True)
class Bucket:
    """The dataset spec: name + path + per-service schemas."""

    full_name: str  # e.g. "/security/events"
    path: str  # storage root
    temporal: TemporalSchema | None = None
    columnar: ColumnarSchema | None = None
    write: WriteSettings = field(default_factory=WriteSettings)
    dedup_fields: Sequence[str] = ()  # document_schema.deduplication_fields
    collide_policy: str = "new_type"  # new_type (schema evolution) | error

    @property
    def base_name(self) -> str:
        """Signature-free base name (reference getBaseIndexName derives
        from the bucket path)."""
        return self.full_name.strip("/").replace("/", "_")
