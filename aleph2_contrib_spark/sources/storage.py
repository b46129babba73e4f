"""Time-partitioned table storage: routed writes, pruned reads, retention,
secondary ("ping-pong") buffers.

Reference behaviors re-expressed on partitioned parquet:

- S15 time-based routing: each record lands in the partition its time_field
  value names (reference ElasticsearchContext.getWritableIndex:532-546) —
  ``partitionBy(time_bucket)`` does per-record routing natively, including
  late data (event-time partitioning, no lateness cutoff — SURVEY §2.7).
- S9/Q18 read pruning: reads with a time range touch only matching
  partitions (reference getTimedIndexes:156-164) — Catalyst partition
  pruning on the derived ``__time_bucket`` column.
- S18 retention: drop whole partitions older than exist_age_max
  (reference handleAgeOutRequest:646-735).
- S17 secondary buffers: buffers and the primary are immutable version
  directories named by pointer files (``manifest.py``); promote is ONE
  atomic pointer repoint — zero data movement, concurrent readers keep
  their resolved version (reference promotes by atomically moving the ES
  read alias, ElasticsearchIndexService:495-545).
- S14 segment rolling: maxRecordsPerFile + compression codec.
- C16 optimizeQuery: sortWithinPartitions on the optimized field list
  (Z-order-ish data clustering for min/max skipping).

At 100 TB: writes are a narrow pass + partitioned commit (one file set per
time bucket); reads prune to the queried window; retention is metadata-only
directory deletes — no full-table rewrite anywhere.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aleph2_contrib_spark.model.bucket import Bucket
from aleph2_contrib_spark.functions.query import (
    MultiQuery,
    SingleQuery,
    extract_date_range,
)
from aleph2_contrib_spark.sources import manifest

PARTITION_COL = "__time_bucket"

_TRUNC = {"hour": "hour", "day": "day", "week": "week", "month": "month",
          "quarter": "quarter", "year": "year"}


def time_bucket_col(time_field: str, period: str) -> F.Column:
    """Derived partition value: date_trunc(period, time_field) rendered as
    a sortable string (directory-name friendly)."""
    return F.date_format(
        F.date_trunc(_TRUNC[period], F.col(time_field)), "yyyy-MM-dd'T'HH"
    )


class TimePartitionedTable:
    """One bucket's primary store (+ optional secondary buffers)."""

    def __init__(self, spark: SparkSession, bucket: Bucket):
        if bucket.temporal is None:
            raise ValueError("TimePartitionedTable requires a temporal schema")
        self.spark = spark
        self.bucket = bucket

    @property
    def primary_path(self) -> str:
        """Live primary data dir, resolved through the ``_current`` pointer
        (legacy pre-pointer layout: the ``current`` directory)."""
        return manifest.resolve(self.bucket.path, legacy="current") or os.path.join(
            self.bucket.path, "current"
        )

    # -- write (S14/S15/S16) ----------------------------------------------
    def write(self, df: DataFrame, mode: str = "append", path: str | None = None) -> None:
        t = self.bucket.temporal
        out = df.withColumn(PARTITION_COL, time_bucket_col(t.time_field, t.grouping_time_period))
        # Salt is derived from the raw time field BEFORE the columnar
        # projection (which may drop that field from the stored schema);
        # it only steers the repartition and is dropped before the write.
        fpp = max(1, self.bucket.write.files_per_partition)
        salt_col = "__a2s_write_salt"
        if fpp > 1:
            out = out.withColumn(salt_col, F.pmod(F.xxhash64(F.col(t.time_field)), F.lit(fpp)))
        if self.bucket.columnar is not None:
            cols = self.bucket.columnar.select_columns(df.schema)
            out = out.select(*cols, PARTITION_COL, *([salt_col] if fpp > 1 else []))
        if os.path.exists(path or self.primary_path):
            # S16 collide policy (reference ElasticsearchIndexUtils
            # getTypeKey:115-128 + auto-type retry type_1→type_2…):
            # - "error": fail the write on any same-name/different-type
            #   column (schema-on-write validation).
            # - "new_type": the colliding incoming column is stored under
            #   the next free "<name>_N" suffix whose stored type matches
            #   (reusing an existing suffix column when types agree) — the
            #   parquet rendering of ES retrying the doc under type_2: both
            #   representations coexist, readers see both columns with
            #   nulls where a row lacks that representation (mergeSchema
            #   on read).
            existing = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(path or self.primary_path)
                .schema
            )
            etypes = {f.name: f.dataType for f in existing.fields}
            for f in list(out.schema.fields):
                if f.name in etypes and etypes[f.name] != f.dataType and f.name != PARTITION_COL:
                    if self.bucket.collide_policy == "error":
                        raise ValueError(
                            f"schema collision on '{f.name}': {etypes[f.name]} vs {f.dataType}"
                            " (collide_policy=error)"
                        )
                    n = 2
                    while f"{f.name}_{n}" in etypes and etypes[f"{f.name}_{n}"] != f.dataType:
                        n += 1
                    out = out.withColumnRenamed(f.name, f"{f.name}_{n}")
        # Cluster on the partition value (+ bounded salt) before the
        # partitioned write: without this every task holding rows of a
        # period opens its own file there, producing tasks x periods small
        # files; with it each period gets files_per_partition files and the
        # write parallelism is periods x files_per_partition tasks.
        if fpp > 1:
            out = out.repartition(F.col(PARTITION_COL), F.col(salt_col)).drop(salt_col)
        else:
            out = out.repartition(F.col(PARTITION_COL))
        (
            out.write.mode(mode)
            .option("maxRecordsPerFile", self.bucket.write.batch_max_objects)
            .option("compression", self.bucket.write.compression)
            .partitionBy(PARTITION_COL)
            .parquet(path or self.primary_path)
        )

    # -- read (S9 pruned) --------------------------------------------------
    def read(self, time_min: dt.datetime | None = None, time_max: dt.datetime | None = None) -> DataFrame:
        # mergeSchema: a new_type-evolved store holds files with different
        # column sets; a single-footer schema sample would hide the
        # suffix columns. Cost = one footer read per file (parallelized);
        # stores written under collide_policy=error never evolve and pay
        # only the footer pass.
        df = self.spark.read.option("mergeSchema", "true").parquet(self.primary_path)
        t = self.bucket.temporal
        if time_min is not None:
            df = df.filter(
                F.col(PARTITION_COL)
                >= F.date_format(F.date_trunc(_TRUNC[t.grouping_time_period], F.lit(time_min)), "yyyy-MM-dd'T'HH")
            )
        if time_max is not None:
            df = df.filter(
                F.col(PARTITION_COL)
                <= F.date_format(F.date_trunc(_TRUNC[t.grouping_time_period], F.lit(time_max)), "yyyy-MM-dd'T'HH")
            )
        return df.drop(PARTITION_COL)

    def read_with_query(self, spec: SingleQuery | MultiQuery) -> DataFrame:
        """Q18 end-to-end: extract the obvious date range from the DSL query
        and prune partitions before applying the full predicate."""
        t = self.bucket.temporal
        lo, hi = extract_date_range(spec, t.time_field)
        from aleph2_contrib_spark.functions.query import apply_query

        return apply_query(self.read(lo, hi), spec)

    # -- retention (S18) ---------------------------------------------------
    def age_out(self, now: dt.datetime | None = None) -> list[str]:
        """Delete partitions entirely older than exist_age_max. Directory-
        level deletes — no data rewrite. Returns removed partition values."""
        t = self.bucket.temporal
        if t.exist_age_max is None:
            return []
        n, unit = t.exist_age_max.split()
        delta = dt.timedelta(**{unit if unit.endswith("s") else unit + "s": int(n)})
        now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        cutoff = now - delta
        cutoff_str = cutoff.strftime("%Y-%m-%dT%H")
        removed = []
        if not os.path.exists(self.primary_path):
            return removed
        for d in sorted(os.listdir(self.primary_path)):
            if not d.startswith(PARTITION_COL + "="):
                continue
            val = d.split("=", 1)[1]
            if val < cutoff_str:
                shutil.rmtree(os.path.join(self.primary_path, d))
                removed.append(val)
        return removed

    # -- secondary buffers (S17) ------------------------------------------
    def buffer_path(self, name: str) -> str:
        """Live data dir of buffer ``name`` (pointer-resolved; legacy
        pre-pointer layout: the ``buffer_<name>`` directory)."""
        return manifest.resolve(
            self.bucket.path, manifest.buffer_pointer(name), legacy=f"buffer_{name}"
        ) or os.path.join(self.bucket.path, f"buffer_{name}")

    def write_to_buffer(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        """Load a secondary buffer. ``overwrite`` writes a FRESH immutable
        version dir and repoints the buffer only once the write completes —
        a failed load can never corrupt the existing buffer, and a buffer
        that was previously promoted (its dir is now the primary) is never
        touched. ``append`` adds files to the buffer's current version."""
        ptr = manifest.buffer_pointer(name)
        if mode == "overwrite" or manifest.resolve(self.bucket.path, ptr, legacy=f"buffer_{name}") is None:
            version = manifest.new_version()
            self.write(df, mode="overwrite", path=os.path.join(self.bucket.path, version))
            manifest.commit(self.bucket.path, version, ptr)
        else:
            self.write(df, mode=mode, path=self.buffer_path(name))

    def promote_buffer(self, name: str, vacuum: bool = True) -> None:
        """S17 promote as a pure metadata commit: repoint ``_current`` at
        the buffer's data dir (reference: atomic ES alias move,
        ElasticsearchIndexService.java:495-545). No data moves; a reader
        that resolved the old primary keeps reading an intact directory —
        retirement happens via ``manifest.vacuum`` with a grace window."""
        bp = self.buffer_path(name)
        if not os.path.exists(bp):
            raise FileNotFoundError(bp)
        if manifest.read_pointer(self.bucket.path) is None and os.path.isdir(
            os.path.join(self.bucket.path, "current")
        ):
            # adopt the legacy primary dir into the pointer scheme so the
            # promote below retires it cleanly
            manifest.commit(self.bucket.path, "current")
        manifest.commit(self.bucket.path, os.path.relpath(bp, self.bucket.path))
        manifest.drop_pointer(self.bucket.path, manifest.buffer_pointer(name))
        if vacuum:
            manifest.vacuum(self.bucket.path, keep=1)

    # -- misc --------------------------------------------------------------
    def optimize(self, sort_cols: list[str], path: str | None = None) -> None:
        """C16 optimizeQuery: cluster data by the given field list so
        min/max stats skip files (parquet stand-in for a secondary index).
        The clustered copy is written as a NEW version dir and promoted by
        pointer commit — the table stays readable during the rewrite.
        """
        p = path or self.primary_path
        df = self.spark.read.parquet(p)
        version = manifest.new_version()
        (
            df.repartition(F.col(PARTITION_COL))
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(os.path.join(self.bucket.path, version))
        )
        self._publish_version(version, path)

    def _publish_version(self, version: str, replaced_path: str | None) -> None:
        """Make ``version`` (a just-written root-relative data dir) the
        live data for whatever pointer currently names ``replaced_path``
        (None → the primary). One atomic pointer write; the replaced
        directory is retired by ``manifest.vacuum`` grace, never moved —
        concurrent readers keep their resolved version. Unmanaged paths
        are refused: the swap-in-place alternative has a reader-visible
        window where the directory is missing, which is exactly the
        non-atomicity this storage layer exists to rule out."""
        if replaced_path is None or os.path.realpath(replaced_path) == os.path.realpath(
            self.primary_path
        ):
            manifest.commit(self.bucket.path, version)
            manifest.vacuum(self.bucket.path, keep=1)
            return
        for name in os.listdir(self.bucket.path):
            if name.startswith("_buffer_") and manifest.resolve(self.bucket.path, name) == replaced_path:
                manifest.commit(self.bucket.path, version, name)
                manifest.vacuum(self.bucket.path, keep=1)
                return
        raise ValueError(
            f"{replaced_path!r} is not the primary or a pointer-managed buffer of "
            f"{self.bucket.path!r}; refusing a non-atomic in-place swap"
        )

    @staticmethod
    def _link_or_copy_tree(src: str, dst: str) -> None:
        """Populate ``dst`` with ``src``'s files without copying bytes:
        hardlinks when the filesystem allows, byte-copy fallback. The
        local-disk rendering of what a manifest/commit-log does on an
        object store — untouched data is REFERENCED by the new version,
        not duplicated."""
        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            troot = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(troot, exist_ok=True)
            for f in files:
                s, t = os.path.join(root, f), os.path.join(troot, f)
                try:
                    os.link(s, t)
                except OSError:
                    shutil.copy2(s, t)

    def compact(
        self,
        target_file_bytes: int = 128 << 20,
        path: str | None = None,
    ) -> dict[str, tuple[int, int]]:
        """Small-file compaction: per time-partition, bin-pack parquet
        files to ~``target_file_bytes``. Streaming/micro-batch appends and
        low-volume partitions accumulate small files; this is the
        incremental maintenance job that fixes them — only partitions
        whose file count exceeds the bin-packed need are rewritten
        (``optimize()`` is the full clustering rewrite; this touches the
        minimum). The partition value stays encoded in the directory name,
        so the table layout and partition pruning are preserved.

        Publication is ONE atomic pointer commit of a new version dir:
        compacted partitions get fresh files, untouched partitions are
        hardlinked (referenced, not copied — the on-disk analogue of a
        table-format manifest entry), and readers racing the compaction
        keep their resolved version intact through the vacuum grace
        window. Each partition rewrite is its own Spark job; a production
        scheduler submits them concurrently — the per-partition logic is
        identical.

        Returns {partition_dir_name: (files_before, files_after)} for the
        partitions rewritten.
        """
        import glob as _glob
        import math as _math

        p = path or self.primary_path
        plan: dict[str, tuple[int, int]] = {}
        for part_dir in sorted(_glob.glob(os.path.join(p, f"{PARTITION_COL}=*"))):
            files = _glob.glob(os.path.join(part_dir, "part-*"))
            if len(files) < 2:
                continue
            total = sum(os.path.getsize(f) for f in files)
            need = max(1, _math.ceil(total / target_file_bytes))
            if len(files) <= need:
                continue
            plan[os.path.basename(part_dir)] = (len(files), need)
        if not plan:
            return {}
        version = manifest.new_version()
        dest_root = os.path.join(self.bucket.path, version)
        os.makedirs(dest_root, exist_ok=True)
        for entry in sorted(os.listdir(p)):
            src = os.path.join(p, entry)
            dst = os.path.join(dest_root, entry)
            if entry in plan:
                _before, need = plan[entry]
                df = self.spark.read.parquet(src)
                df.coalesce(need).write.mode("overwrite").parquet(dst)
            elif os.path.isdir(src):
                self._link_or_copy_tree(src, dst)
            else:  # top-level markers (_SUCCESS)
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
        self._publish_version(version, p)
        return plan

    def delete_datastore(self) -> None:
        """S19 bucket deletion."""
        shutil.rmtree(self.bucket.path, ignore_errors=True)


def compaction_plan(
    files: DataFrame,
    part_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planner — the maintenance pass every
    long-lived lakehouse runs over the rolling segments that
    :class:`StorageService` writes (S14: size/time-rolled segment
    files; the reference rolls HDFS segment files the same way,
    HfdsDataWriteService's segment rotation): group each partition's
    files into compaction bins of ~``target_bytes`` so the rewrite jobs
    are right-sized and file counts stop growing.

    Binning rule (deterministic QUOTA binning, the distributed-friendly
    form also used by ``corpus.pack_sequences``): within each
    partition, order files by (size DESC, file id ASC) and assign

        bin_id = cum_bytes_before  div  target_bytes

    Size-descending order packs the big files first so small files
    backfill the remainder quotas; a file ≥ target lands alone in its
    quota (its own cum span pushes the next file into a fresh bin).
    Unlike greedy first-fit (inherently sequential, driver-bound),
    quota binning is ONE window cumsum per partition — and its bins
    overshoot the target by at most one file, the same guarantee
    first-fit-decreasing gives a compactor in practice.

    Returns (part, file, size, bin_id, bin_seq) — bin_seq is the
    file's rank inside its bin (1 = largest), handy for rewrite-task
    ordering. Singleton bins whose single file already exceeds the
    target are "already compacted" — a rewriter skips bins of one file.

    Plan shape at 100 TB of MANIFEST (not data): one key shuffle for
    the per-partition window; output is manifest-sized. The data files
    themselves are never read here.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(size_col).desc(), F.col(file_col).asc())
    )
    cum_before = F.coalesce(
        F.sum(F.col(size_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    out = files.select(
        F.col(part_col),
        F.col(file_col),
        F.col(size_col).cast("long").alias(size_col),
        cum_before.cast("long").alias("__cum"),
    ).withColumn(
        "bin_id", F.expr(f"CAST(__cum div {int(target_bytes)} AS BIGINT)")
    )
    wbin = Window.partitionBy(part_col, "bin_id").orderBy(
        F.col(size_col).desc(), F.col(file_col).asc()
    )
    return out.select(
        part_col,
        file_col,
        size_col,
        "bin_id",
        F.row_number().over(wbin).cast("int").alias("bin_seq"),
    )


def compaction_plan_oracle_sql(
    files_sql: str,
    part_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> str:
    """DuckDB replica of :func:`compaction_plan` — identical windows,
    identical truncating quota division."""
    return f"""
WITH f AS ({files_sql}),
c AS (
    SELECT {part_col}, {file_col}, CAST({size_col} AS BIGINT) AS {size_col},
           CAST(coalesce(sum({size_col}) OVER (
               PARTITION BY {part_col}
               ORDER BY {size_col} DESC, {file_col} ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum
    FROM f
)
SELECT {part_col}, {file_col}, {size_col},
       CAST(cum // {int(target_bytes)} AS BIGINT) AS bin_id,
       CAST(row_number() OVER (
           PARTITION BY {part_col}, cum // {int(target_bytes)}
           ORDER BY {size_col} DESC, {file_col} ASC) AS INT) AS bin_seq
FROM c
"""
