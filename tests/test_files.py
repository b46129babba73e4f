"""File-ingest source tests (SURVEY S1-S6, FIXTURES.md §4)."""

import json
import os

import pytest

from aleph2_contrib_spark.sources.files import (
    XmlConfig,
    consume_inbox,
    read_binary_inbox,
    read_json_inbox,
    read_xml_inbox,
)

XML_DOC = b"""<?xml version="1.0"?>
<feed>
  <meta>ignored</meta>
  <record id="1">
    <name>alpha</name>
    <tag>x</tag>
    <tag>y</tag>
    <detail><score>10</score></detail>
  </record>
  <record id="2">
    <name>beta</name>
    <tag>z</tag>
    <detail><score>20</score></detail>
  </record>
</feed>
"""


@pytest.fixture()
def inbox(tmp_path):
    d = tmp_path / "inbox_json"
    d.mkdir()
    with open(d / "a.json", "w") as f:
        f.write(json.dumps({"id": 1, "v": "x"}) + "\n" + json.dumps({"id": 2, "v": "y"}) + "\n")
    with open(d / "b.json", "w") as f:
        f.write(json.dumps({"id": 3, "v": "z"}) + "\n")
    return str(d)


def test_read_json_inbox(spark, inbox):
    df = read_json_inbox(spark, inbox)
    rows = df.collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 3]
    assert all(r["__source_file"].endswith(".json") for r in rows)


def test_json_test_record_limit(spark, inbox):
    assert read_json_inbox(spark, inbox, test_record_limit=2).count() == 2


def test_read_xml_inbox(spark, tmp_path):
    d = tmp_path / "inbox_xml"
    d.mkdir()
    (d / "f.xml").write_bytes(XML_DOC)
    cfg = XmlConfig(root_fields=("record",), attribute_prefix="@")
    df = read_xml_inbox(spark, str(d), cfg)
    rows = {r["@id"]: r.asDict() for r in df.collect()}
    assert rows["1"]["name"] == "alpha"
    assert rows["1"]["detail.score"] == "10"
    assert rows["2"]["name"] == "beta"
    # repeated leaf becomes a list (stringified to fit the string schema)
    assert "x" in str(rows["1"]["tag"]) and "y" in str(rows["1"]["tag"])


def test_xml_preserve_case_off(spark, tmp_path):
    d = tmp_path / "inbox_xml2"
    d.mkdir()
    (d / "f.xml").write_bytes(b"<Feed><Rec Id='9'><NAME>q</NAME></Rec></Feed>")
    cfg = XmlConfig(root_fields=("rec",), attribute_prefix="@", preserve_case=False)
    rows = read_xml_inbox(spark, str(d), cfg).collect()
    assert rows[0]["@id"] == "9" and rows[0]["name"] == "q"


def test_xml_id_field_promotion(spark, tmp_path):
    d = tmp_path / "inbox_xml3"
    d.mkdir()
    (d / "f.xml").write_bytes(b"<feed><record><key>k9</key><v>1</v></record></feed>")
    cfg = XmlConfig(root_fields=("record",), id_field="key")
    rows = read_xml_inbox(spark, str(d), cfg).collect()
    assert rows[0]["_id"] == "k9"


def test_read_binary_inbox(spark, tmp_path):
    d = tmp_path / "inbox_bin"
    d.mkdir()
    (d / "blob1.bin").write_bytes(b"\x00\x01\x02")
    (d / "blob2.bin").write_bytes(b"hello")
    df = read_binary_inbox(spark, str(d))
    rows = {os.path.basename(r["__source_file"]): bytes(r["content"]) for r in df.collect()}
    assert rows["blob1.bin"] == b"\x00\x01\x02" and rows["blob2.bin"] == b"hello"


def test_consume_inbox_archive(tmp_path):
    import datetime as dt

    inbox = tmp_path / "in"
    inbox.mkdir()
    (inbox / "f1.json").write_text("{}")
    (inbox / "f2.json").write_text("{}")
    arch = tmp_path / "archive"
    moved = consume_inbox(str(inbox), str(arch), mode="archive", time_group="month", now=dt.datetime(2020, 5, 2))
    assert moved == ["f1.json", "f2.json"]
    assert sorted(os.listdir(arch / "2020-05")) == ["f1.json", "f2.json"]
    assert os.listdir(inbox) == []


def test_consume_inbox_delete(tmp_path):
    inbox = tmp_path / "in2"
    inbox.mkdir()
    (inbox / "f.bin").write_bytes(b"x")
    consume_inbox(str(inbox), None, mode="delete")
    assert os.listdir(inbox) == []


def test_xml_schema_discovery_distributed_and_sampled(spark, tmp_path):
    # schema discovery must see columns from EVERY file (distributed
    # name-only aggregation, no whole-inbox collect); the optional
    # schema_sample_files bound restricts which files are probed
    d = tmp_path / "inbox_many"
    d.mkdir()
    for i in range(20):
        extra = f"<extra{i}>v</extra{i}>" if i == 17 else ""
        (d / f"f{i:02d}.xml").write_text(
            f'<records><record id="{i}"><name>n{i}</name>{extra}</record></records>'
        )
    cfg = XmlConfig(root_fields=("record",), attribute_prefix="@")
    df = read_xml_inbox(spark, str(d), cfg)
    assert "extra17" in df.columns  # full discovery saw the rare column
    assert df.count() == 20
    # sampled discovery reads few files: rare column may be absent, but the
    # schema stays consistent and the parse still returns every record
    df2 = read_xml_inbox(spark, str(d), cfg, schema_sample_files=3)
    assert df2.count() == 20


def test_csv_inbox_roundtrip(spark, tmp_path):
    from aleph2_contrib_spark.sources.files import read_csv_inbox

    d = tmp_path / "csv_in"
    d.mkdir()
    (d / "a.csv").write_text("id,name,score\n1,alpha,0.5\n2,beta,1.5\n")
    (d / "b.csv").write_text("id,name,score\n3,gamma,2.5\n")
    got = read_csv_inbox(spark, str(d), schema="id INT, name STRING, score DOUBLE")
    rows = {r.id: (r.name, r.score) for r in got.collect()}
    assert rows == {1: ("alpha", 0.5), 2: ("beta", 1.5), 3: ("gamma", 2.5)}
    assert all(r["__source_file"].endswith(".csv") for r in got.collect())
    # test record limit honored
    assert read_csv_inbox(spark, str(d), schema="id INT, name STRING, score DOUBLE",
                          test_record_limit=2).count() == 2
