"""C5 batch-write sub-service: buffered per-object ingest with
count/size/interval segment triggers.

Re-expresses the reference's HDFS buffered writer (HfdsDataWriteService
WriterWorker, aleph2_storage_service_hdfs/.../HfdsDataWriteService.java:
400-660): objects accumulate in a staging buffer (the reference's shared
queue) and a *segment completes* — the buffered rows are written as one
file set into the bucket's time-routed store — when ANY of the three
triggers fires (check_segment :537-550, defaults :437-441 via
WriteSettings):

* object count  > ``batch_max_objects``        (default 5000)
* staged bytes  > ``batch_max_size_kb`` KB     (default 20 MB)
* wall time since last segment > ``batch_flush_interval_s`` (default 600 s)
* clock went backwards (reference :545 — trigger immediately)

Scale notes: this is the *micro-ingest edge* (per-object ``store_object``
calls from interactive services — reference IDataWriteService
.getBatchWriteSubservice). Bulk ingest should go straight to
``TimePartitionedTable.write`` (a distributed partitioned commit); in
Structured Streaming the interval trigger maps to
``trigger(processingTime=...)`` and the count/size triggers to
``maxRecordsPerFile`` (streaming/runner.py). The buffer here is
driver-side by design — its size is bounded by the roll thresholds
themselves (≤ max_objects rows / ≤ max_size bytes), so it never grows
with table size.
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable, Iterable, Mapping

from pyspark.sql import types as T

from aleph2_contrib_spark.sources.storage import TimePartitionedTable


class BatchWriteService:
    """Buffered writer over one bucket's time-partitioned store."""

    def __init__(
        self,
        table: TimePartitionedTable,
        schema: T.StructType,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.table = table
        self.schema = schema
        self._clock = clock
        self._buffer: list[dict[str, Any]] = []
        self._staged_bytes = 0
        self._last_segmented = clock()
        self.segments_written = 0
        w = table.bucket.write
        self.max_objects = w.batch_max_objects
        self.max_size_b = w.batch_max_size_kb * 1024
        self.flush_interval_s = w.batch_flush_interval_s

    def set_batch_properties(
        self,
        max_objects: int | None = None,
        max_size_kb: int | None = None,
        flush_interval_s: int | None = None,
    ) -> None:
        """Runtime trigger overrides (reference setBatchProperties:291-298 —
        absent values keep the current setting)."""
        if max_objects is not None:
            self.max_objects = max_objects
        if max_size_kb is not None:
            self.max_size_b = max_size_kb * 1024
        if flush_interval_s is not None:
            self.flush_interval_s = flush_interval_s

    # -- ingest ------------------------------------------------------------
    def store_object(self, obj: Mapping[str, Any]) -> None:
        """Stage one object; complete the segment if a trigger fires
        (reference write :520-530 then check_segment :537-550)."""
        self._buffer.append(dict(obj))
        # staged-size accounting mirrors the reference: serialized JSON
        # bytes + newline (:525-529)
        self._staged_bytes += len(json.dumps(obj, default=str).encode()) + 1
        self._check_segment()

    def store_objects(self, objs: Iterable[Mapping[str, Any]]) -> None:
        for o in objs:
            self.store_object(o)

    def poll(self) -> bool:
        """Timer tick: the reference's queue-poll timeout path (:456-460) —
        completes the current segment if the flush interval elapsed even
        with no new objects. Returns True if a segment was written."""
        now = self._clock()
        if now < self._last_segmented or (now - self._last_segmented) > self.flush_interval_s:
            return self.flush()
        return False

    def flush(self) -> bool:
        """Complete the current segment unconditionally (the reference's
        shutdown hook / complete_segment :582-620). Returns True if rows
        were written."""
        self._last_segmented = self._clock()
        if not self._buffer:
            return False
        df = self.table.spark.createDataFrame(self._buffer, schema=self.schema)
        self.table.write(df, mode="append")
        self.segments_written += 1
        self._buffer.clear()
        self._staged_bytes = 0
        return True

    # -- triggers ----------------------------------------------------------
    def _check_segment(self) -> None:
        now = self._clock()
        trigger = (
            len(self._buffer) > self.max_objects
            or self._staged_bytes > self.max_size_b
            or (now - self._last_segmented) > self.flush_interval_s
            or now < self._last_segmented  # clock went backwards (:545)
        )
        if trigger:
            self.flush()

    # -- introspection -----------------------------------------------------
    @property
    def staged_objects(self) -> int:
        return len(self._buffer)

    @property
    def staged_bytes(self) -> int:
        return self._staged_bytes
