"""Gate-boundary decimal discipline (functions/gate_types.py) and the
strengthened local-checker canonicalizer (tools/check_correctness.py).

Round-8 class under test: four gates emitted DECIMAL(38,0) columns that
were value-exact against the oracle yet hash-red at the driver, because
the driver's pandas canonicalizer renders wide decimals differently per
engine while the local checker's ``==``-based compare treated
``Decimal(5) == 5`` as a pass. These tests pin both halves of the fix:
decimals are stringified at the gate boundary, and a decimal that DOES
leak through now fails the local checker before the driver sees it.
"""

import decimal
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_correctness import canon, decimal_cols, normalize_cell

from aleph2_contrib_spark.functions.gate_types import (
    stringify_decimals,
    varchar_wrap,
)


def test_stringify_decimals_exact_digits(spark):
    df = spark.createDataFrame(
        [(1, decimal.Decimal(10) ** 30, decimal.Decimal(-7), 2.5)],
        "k int, wide decimal(38,0), neg decimal(38,0), f double",
    )
    out = stringify_decimals(df)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "int", "string", "string", "double",
    ]
    row = out.collect()[0]
    assert row["wide"] == "1" + "0" * 30  # plain digits, no exponent
    assert row["neg"] == "-7"
    assert row["k"] == 1 and row["f"] == 2.5


def test_stringify_decimals_null_passthrough(spark):
    df = spark.createDataFrame(
        [(None,)], "d decimal(38,0)"
    )
    assert stringify_decimals(df).collect()[0]["d"] is None


def test_varchar_wrap_matches_spark_rendering(spark):
    """The digit strings DuckDB's VARCHAR cast produces for HUGEINT /
    DECIMAL(38,0) must equal Spark's decimal-to-string rendering —
    that equality IS the gate fix."""
    wide = decimal.Decimal(10) ** 30
    sdf = stringify_decimals(
        spark.createDataFrame(
            [(wide, decimal.Decimal(-12345))], "a decimal(38,0), b decimal(38,0)"
        )
    )
    srow = sdf.collect()[0]
    sql = varchar_wrap(
        "SELECT CAST('1e30' AS HUGEINT) AS a, "
        "CAST(-12345 AS DECIMAL(38,0)) AS b",
        ["a", "b"],
        {"a", "b"},
    )
    drow = duckdb.sql(sql).fetchall()[0]
    assert (srow["a"], srow["b"]) == drow == ("1" + "0" * 30, "-12345")


def test_varchar_wrap_passthrough_columns():
    sql = varchar_wrap("SELECT 1 AS x, CAST(2 AS HUGEINT) AS y", ["x", "y"], {"y"})
    desc = duckdb.sql(f"DESCRIBE ({sql})").fetchall()
    assert [(d[0], d[1]) for d in desc] == [("x", "INTEGER"), ("y", "VARCHAR")]
    assert duckdb.sql(sql).fetchall() == [(1, "2")]


# -- strengthened local checker ----------------------------------------------


def test_normalize_cell_is_repr_typed_for_decimals():
    """Decimal(5) == 5 in Python — the exact coercion that let the
    round-8 gates pass locally while the driver hashed them red. The
    canonical renderer must distinguish them."""
    assert normalize_cell(decimal.Decimal(5)) != normalize_cell(5)
    assert normalize_cell(decimal.Decimal(5)) == normalize_cell(
        decimal.Decimal("5")
    )


def test_canon_rejects_decimal_vs_int_equality():
    sc = canon([(decimal.Decimal(5), "a")], ["n", "s"])
    dc = canon([(5, "a")], ["n", "s"])
    assert sc != dc


def test_decimal_cols_flags_first_non_null():
    rows = [(None, 1, "x"), (decimal.Decimal(3), 2, "y")]
    assert decimal_cols(["d", "i", "s"], rows) == ["d"]
    assert decimal_cols(["d", "i", "s"], []) == []
    assert decimal_cols(["i"], [(7,)]) == []


def test_round8_shape_fails_strengthened_checker(spark):
    """Regression shape: a decimal-emitting Spark result (the unfixed
    round-8 gate form) must be caught by decimal_cols — the hard check
    the checker now runs on both engines' results."""
    from aleph2_contrib_spark.operators.similarity import embedding_covariance

    df = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "embedding array<double>"
    )
    raw = embedding_covariance(df, dim=2)
    rows = [tuple(r) for r in raw.collect()]
    assert decimal_cols(raw.columns, rows) == [
        "sum_xy_fx2", "sum_x_fx", "sum_y_fx", "cov_num_fx2",
    ]
    # and the gate-boundary fix clears it
    fixed = stringify_decimals(raw)
    frows = [tuple(r) for r in fixed.collect()]
    assert decimal_cols(fixed.columns, frows) == []


def test_entry_gates_emit_no_decimals(spark):
    """The four round-8 driver-red gates, as registered, now emit only
    engine-stable types end-to-end at sf0.001."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in (
        "similarity_embedding_covariance",
        "profile_numeric_correlation",
        "graph_degree_assortativity",
        "profile_join_size",
        "graph_global_stats",
    ):
        if name not in qs:
            continue
        df = qs[name](spark, "/root/testdata/sf0.001")
        rows = [tuple(r) for r in df.limit(50).collect()]
        assert decimal_cols(df.columns, rows) == [], name
        assert not any(
            f.dataType.simpleString().startswith("decimal")
            for f in df.schema.fields
        ), name


def test_pytest_sees_driver_shape_mismatch_of_unfixed_gate():
    """The oracle side of the same class: a DECIMAL(38,0) column in a
    DuckDB result is flagged by decimal_cols too."""
    res = duckdb.sql("SELECT CAST(5 AS DECIMAL(38,0)) AS n, 'a' AS s")
    rows = res.fetchall()
    assert decimal_cols([d[0] for d in res.description], rows) == ["n"]
