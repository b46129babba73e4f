"""File-ingest sources: JSON lines, XML, binary passthrough, and
consume-then-archive inbox semantics.

Reference parsers (SURVEY S1-S5): BeJsonParser (newline/concatenated JSON),
BeXmlParser (root element paths, attribute prefix, case preservation —
BeXmlParser.java:48-280), BeStreamParser (one record per file, key =
filename), BeFileInputReader consume-then-archive/delete
(BeFileInputReader.java:179-306).

Spark-native: ``spark.read.json`` handles JSON (split-packing of many small
files is built-in bin-packing — replaces UpdatedCombineFileInputFormat's
805 lines). XML has no built-in source in this container, so parsing runs
as an Arrow-batched pandas pass over ``binaryFile`` rows — per-file
parallelism, no driver loop. Archive/delete is a post-commit file move,
partitioned by ingest time group (the streaming path gets this for free
via ``cleanSource=archive``).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
from dataclasses import dataclass
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_inbox(
    spark: SparkSession,
    path: str,
    schema=None,
    test_record_limit: int | None = None,
) -> DataFrame:
    """S2: newline-delimited/concatenated JSON objects → records, with the
    source filename kept as key (reference key = filename,
    BeFileInputReader.getCurrentKey:325-327). S6: optional test limit."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path).withColumn("__source_file", F.input_file_name())
    if test_record_limit is not None:
        df = df.limit(test_record_limit)
    return df


def read_csv_inbox(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    sep: str = ",",
    test_record_limit: int | None = None,
) -> DataFrame:
    """S2 (CSV flavor): delimited files → records with the source filename
    kept as key, matching read_json_inbox's contract. With no explicit
    schema the reader infers one (an extra pass — pass a schema on large
    inboxes, same guidance as JSON)."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path).withColumn("__source_file", F.input_file_name())
    if test_record_limit is not None:
        df = df.limit(test_record_limit)
    return df


@dataclass(frozen=True)
class XmlConfig:
    """Reference BeFileInputConfigBean.XML options (BeXmlParser.java:48-80)."""

    root_fields: Sequence[str] = ()  # element names that delimit records
    attribute_prefix: str = "@"
    preserve_case: bool = True
    id_field: str | None = None  # promote this field to _id
    set_id_from_content: bool = False


def _xml_records(data: bytes, cfg: XmlConfig) -> list[dict]:
    """Parse one XML file into flat records per BeXmlParser semantics:
    each occurrence of a ``root_fields`` element is one record; attributes
    get ``attribute_prefix``; nested elements flatten to dotted paths;
    repeated leaves become lists."""
    import xml.etree.ElementTree as ET

    def norm(tag: str) -> str:
        tag = tag.split("}", 1)[-1]  # strip namespace
        return tag if cfg.preserve_case else tag.lower()

    def put(out: dict, key: str, value) -> None:
        if key in out:
            cur = out[key]
            out[key] = (cur if isinstance(cur, list) else [cur]) + [value]
        else:
            out[key] = value

    def flatten(elem, prefix: str, out: dict) -> None:
        name = norm(elem.tag)
        path = f"{prefix}{name}" if prefix == "" else f"{prefix}.{name}"
        for k, v in elem.attrib.items():
            put(out, f"{path}.{cfg.attribute_prefix}{norm(k)}", v)
        children = list(elem)
        if children:
            for ch in children:
                flatten(ch, path, out)
        else:
            text = (elem.text or "").strip()
            put(out, path, text)

    roots = {r if cfg.preserve_case else r.lower() for r in cfg.root_fields}
    records: list[dict] = []
    try:
        tree = ET.fromstring(data)
    except ET.ParseError:
        return records

    def walk(elem):
        if norm(elem.tag) in roots or (not roots and elem is tree):
            rec: dict = {}
            for k, v in elem.attrib.items():
                rec[cfg.attribute_prefix + norm(k)] = v
            for ch in list(elem):
                flatten(ch, "", rec)
            # repeated leaves → JSON-encoded array (string schema friendly)
            import json as _json

            rec = {k: (_json.dumps(v) if isinstance(v, list) else v) for k, v in rec.items()}
            if cfg.id_field and cfg.id_field in rec:
                # promote the configured field to the record id (reference
                # BeXmlParser id handling; set_id_from_content keeps both)
                rec["_id"] = rec[cfg.id_field]
                if not cfg.set_id_from_content:
                    rec.pop(cfg.id_field)
            records.append(rec)
            return
        for ch in list(elem):
            walk(ch)

    walk(tree)
    return records


def read_xml_inbox(
    spark: SparkSession,
    path: str,
    cfg: XmlConfig,
    output_schema: str | None = None,
    schema_sample_files: int | None = None,
) -> DataFrame:
    """S3: XML files → records. Files are distributed via binaryFile and
    parsed in an Arrow-batched pandas pass (per-file parallelism).

    When no ``output_schema`` is given, discovery runs DISTRIBUTED: each
    executor parses its files and emits only the distinct column names it
    saw, so the driver receives a handful of strings — never file contents
    (the naive collect() of the whole inbox melts the driver on a large
    deployment). ``schema_sample_files`` optionally bounds discovery to the
    first N files (faster, but can miss columns that appear only later —
    explicit schemas remain the one-pass production path).
    """
    files = spark.read.format("binaryFile").load(path)

    if output_schema is None:
        def discover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            seen: set[str] = set()
            for b in batches:
                for _, r in b.iterrows():
                    for rec in _xml_records(r["content"], cfg):
                        seen.update(rec)
            yield pd.DataFrame({"col": sorted(seen)})

        probe = files.select("path", "content")
        if schema_sample_files is not None:
            probe = probe.limit(schema_sample_files)
        names = probe.mapInPandas(discover, schema="col string").distinct().collect()
        cols = sorted({r["col"] for r in names} | {"__source_file"})
        output_schema = ", ".join(f"`{c}` string" for c in cols)

    from pyspark.sql.types import _parse_datatype_string

    schema_cols = [f.name for f in _parse_datatype_string(output_schema).fields]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                for rec in _xml_records(r["content"], cfg):
                    rec["__source_file"] = r["path"]
                    rows.append(rec)
            if rows:
                # align every batch to the full schema: records missing a
                # column (it only appears in other files) yield nulls, and
                # columns outside the schema are dropped
                pdf = pd.DataFrame(rows).reindex(columns=schema_cols)
                yield pdf.astype(object).where(pd.notna(pdf), None)

    return files.mapInPandas(parse, schema=output_schema)


def read_binary_inbox(spark: SparkSession, path: str) -> DataFrame:
    """S4: raw passthrough — one record per file, key = filename."""
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.col("path").alias("__source_file"),
            F.col("length"),
            F.col("content"),
        )
    )


def consume_inbox(
    inbox_path: str,
    archive_root: str | None,
    mode: str = "archive",
    time_group: str = "month",
    now: dt.datetime | None = None,
) -> list[str]:
    """S5: post-ingest consume semantics — move processed files to a
    time-grouped archive (or delete). Mirrors BeFileInputReader's
    lock-rename then archive-by-time-group (:249-306)."""
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    fmt = {"day": "%Y-%m-%d", "month": "%Y-%m", "year": "%Y"}[time_group]
    moved = []
    for name in sorted(os.listdir(inbox_path)):
        src = os.path.join(inbox_path, name)
        if not os.path.isfile(src):
            continue
        if mode == "delete":
            os.remove(src)
            moved.append(name)
            continue
        dest_dir = os.path.join(archive_root, now.strftime(fmt))
        os.makedirs(dest_dir, exist_ok=True)
        # lock-rename for atomicity: rename within the same fs then move
        locked = src + ".lock"
        os.rename(src, locked)
        shutil.move(locked, os.path.join(dest_dir, name))
        moved.append(name)
    return moved
