"""Cross-source record linkage (operators/linkage.py): blocked candidate
generation + weighted field scoring vs a brute-force replica and the
DuckDB oracle."""

import pytest

from aleph2_contrib_spark.operators.linkage import (
    LinkField,
    linked_pairs,
    linked_pairs_oracle_sql,
)
from pyspark.sql import functions as F


LEFT = [
    (1, "acme  Steel corp", "us"),
    (2, "global widgets ltd", "de"),
    (3, "blue sky traders", "us"),
    (4, "solo name", "fr"),
]
RIGHT = [
    (10, "acme steel corporation", "us"),
    (11, "global widget ltd", "de"),
    (12, "blue sky trading co", "uk"),
    (13, "unrelated business", "us"),
]


def _norm(s):
    return " ".join(s.lower().split())


def _brute(min_score):
    out = {}
    for lid, lname, lc in LEFT:
        for rid, rname, rc in RIGHT:
            lt, rt = _norm(lname).split(" "), _norm(rname).split(" ")
            if lt[0] != rt[0]:
                continue
            ls, rs = set(lt), set(rt)
            jac = 1_000_000 * len(ls & rs) // len(ls | rs)
            ex = 1_000_000 if _norm(lc) == _norm(rc) else 0
            score = (3 * jac + 1 * ex) // 4
            if score >= min_score:
                out[(lid, rid)] = score
    return out


@pytest.fixture()
def sides(spark):
    l = spark.createDataFrame(LEFT, "lid long, name string, country string")
    r = spark.createDataFrame(RIGHT, "rid long, name string, country string")
    return l, r


def _first_tok(col):
    return F.element_at(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " ")), " "), 1
    )


def test_linked_pairs_matches_brute_force(sides):
    l, r = sides
    fields = [
        LinkField("name", "name", 3, "jaccard"),
        LinkField("country", "country", 1, "exact"),
    ]
    for min_score in (0, 400_000, 700_000):
        got = {
            (row["lid"], row["rid"]): row["score_f6"]
            for row in linked_pairs(
                l, r, "lid", "rid",
                _first_tok("name"), _first_tok("name"),
                fields, min_score_f6=min_score,
            ).collect()
        }
        assert got == _brute(min_score)


def test_linked_pairs_oracle_matches(sides, spark):
    import duckdb

    l, r = sides
    fields = [
        LinkField("name", "name", 3, "jaccard"),
        LinkField("country", "country", 1, "exact"),
    ]
    got = {
        tuple(row)
        for row in linked_pairs(
            l, r, "lid", "rid",
            _first_tok("name"), _first_tok("name"),
            fields, min_score_f6=400_000,
        ).collect()
    }
    lv = ", ".join(f"({a}, '{b}', '{c}')" for a, b, c in LEFT)
    rv = ", ".join(f"({a}, '{b}', '{c}')" for a, b, c in RIGHT)
    bk = "string_split(trim(regexp_replace(lower(name), '\\s+', ' ', 'g')), ' ')[1]"
    sql = linked_pairs_oracle_sql(
        f"SELECT c1 AS lid, {bk} AS bk, name AS f0, country AS f1 "
        f"FROM (VALUES {lv}) t(c1, name, country)",
        f"SELECT c1 AS rid, {bk} AS bk, name AS f0, country AS f1 "
        f"FROM (VALUES {rv}) t(c1, name, country)",
        fields, min_score_f6=400_000,
    )
    assert got == {tuple(x) for x in duckdb.sql(sql).fetchall()}


def test_linked_pairs_validation(sides):
    l, r = sides
    with pytest.raises(ValueError, match="at least one"):
        linked_pairs(l, r, "lid", "rid", "name", "name", [])
    with pytest.raises(ValueError, match="unknown field kind"):
        linked_pairs(
            l, r, "lid", "rid", "name", "name",
            [LinkField("name", "name", 1, "soundex")],
        )
    with pytest.raises(ValueError, match="positive"):
        linked_pairs(
            l, r, "lid", "rid", "name", "name",
            [LinkField("name", "name", 0, "exact")],
        )


# -- golden_record ------------------------------------------------------------


def test_golden_record_attribute_level_survivorship(spark):
    from aleph2_contrib_spark.operators.linkage import golden_record

    rows = [
        # entity 1: high-prio row missing email -> name survives from
        # prio 9, email from prio 5 (attribute-level, not row-level)
        (1, "Alice-new", None, 9, 101),
        (1, "Alice-old", "a@x.com", 5, 102),
        # entity 2: equal prio -> higher id wins
        (2, "Bob-a", "b1@x.com", 3, 201),
        (2, "Bob-b", "b2@x.com", 3, 202),
        # entity 3: all-null attribute stays null
        (3, None, None, 1, 301),
    ]
    df = spark.createDataFrame(rows, "entity long, name string, email string, prio long, rid long")
    got = {
        r["entity"]: (r["name"], r["email"])
        for r in golden_record(df, "entity", ["name", "email"], ["prio"], "rid").collect()
    }
    assert got == {
        1: ("Alice-new", "a@x.com"),
        2: ("Bob-b", "b2@x.com"),
        3: (None, None),
    }


def test_golden_record_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.linkage import (
        golden_record,
        golden_record_oracle_sql,
    )

    rnd = random.Random(11)
    rows = [
        (
            rnd.randint(1, 40),
            rnd.choice(["x", "y", "z", None]),
            rnd.choice([1.5, 2.5, None]),
            rnd.randint(1, 5),
            i,
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "entity long, a string, b double, prio long, rid long")
    p = str(tmp_path / "cand.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in golden_record(df, "entity", ["a", "b"], ["prio"], "rid").collect()}
    sql = golden_record_oracle_sql(
        f"SELECT * FROM '{p}/*.parquet'", "entity", ["a", "b"], ["prio"], "rid"
    )
    want = {tuple(x) for x in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) > 0
