"""Property-based differential testing of the query DSL compiler.

Hypothesis generates random query trees (clauses over typed fields, nested
and/or composition); each is evaluated two ways — compiled to Catalyst and
run on Spark, and interpreted by an independent pure-Python implementation
of the documented semantics (three-valued logic included). The matched-row
sets must agree. This goes beyond the reference's example-based translator
tests (TestMongoDbUtils.java) — no random/property tests exist there.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import Row

from aleph2_contrib_spark.functions.query import (
    FieldClause,
    MultiQuery,
    Q,
    SingleQuery,
    compile_query,
)

ROWS = [
    {"_id": "r0", "n": 1, "f": 0.5, "s": "alpha", "tags": ["t1", "t2"]},
    {"_id": "r1", "n": 5, "f": 2.5, "s": "beta", "tags": ["t2"]},
    {"_id": "r2", "n": 10, "f": -1.0, "s": "alpha", "tags": []},
    {"_id": "r3", "n": None, "f": 9.9, "s": None, "tags": None},
    {"_id": "r4", "n": 7, "f": 0.0, "s": "gamma", "tags": ["t3", "t1"]},
    {"_id": "r5", "n": 5, "f": 2.5, "s": "beta", "tags": ["t4"]},
]

INT_VALS = [0, 1, 5, 7, 10, -3]
FLOAT_VALS = [0.0, 0.5, 2.5, -1.0, 9.9]
STR_VALS = ["alpha", "beta", "gamma", "zzz"]
TAG_VALS = ["t1", "t2", "t3", "t4", "tx"]

FIELDS = {"n": INT_VALS, "f": FLOAT_VALS, "s": STR_VALS, "tags": TAG_VALS}


# -- reference interpreter (Kleene three-valued logic) -----------------------


def _cmp(a, op, b):
    if a is None or b is None:
        return None
    return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]


def eval_clause(c: FieldClause, row: dict):
    v = row.get(c.fld)
    is_array = c.fld == "tags"
    if c.op == "equals":
        if v is None:
            return None
        return (c.args[0] in v) if is_array else v == c.args[0]
    if c.op == "not_equals":
        if v is None:
            return True
        return (c.args[0] not in v) if is_array else v != c.args[0]
    if c.op == "any_of":
        vals = list(c.args[0])
        if v is None:
            return None
        if is_array:
            return any(x in vals for x in v)
        return v in vals
    if c.op == "all_of":
        vals = list(c.args[0])
        if v is None:
            return None
        if is_array:
            return all(x in v for x in vals)
        return all(v == x for x in vals)
    if c.op == "exists":
        return (v is not None) if c.args[0] else (v is None)
    if c.op == "range":
        lo, lo_incl, hi, hi_incl = c.args
        out = True
        if lo is not None:
            out = _k_and(out, _cmp(v, ">=" if lo_incl else ">", lo))
        if hi is not None:
            out = _k_and(out, _cmp(v, "<=" if hi_incl else "<", hi))
        return out
    raise ValueError(c.op)


def _k_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _k_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def eval_query(spec, row: dict):
    if isinstance(spec, SingleQuery):
        vals = [eval_clause(c, row) for c in spec.clauses]
    else:
        vals = [eval_query(c, row) for c in spec.components]
    if not vals:
        return True
    out = vals[0]
    for v in vals[1:]:
        out = _k_and(out, v) if spec.op == "and" else _k_or(out, v)
    return out


# -- strategies --------------------------------------------------------------


@st.composite
def clause(draw):
    fld = draw(st.sampled_from(list(FIELDS)))
    vals = FIELDS[fld]
    kind = draw(st.sampled_from(["equals", "not_equals", "any_of", "all_of", "exists", "range"]))
    if kind in ("equals", "not_equals"):
        return FieldClause(fld, kind, (draw(st.sampled_from(vals)),))
    if kind in ("any_of", "all_of"):
        n = draw(st.integers(1, 3))
        return FieldClause(fld, kind, (tuple(draw(st.sampled_from(vals)) for _ in range(n)),))
    if kind == "exists":
        return FieldClause(fld, "exists", (draw(st.booleans()),))
    if fld == "tags":  # no ranges on arrays
        return FieldClause(fld, "exists", (True,))
    lo = draw(st.one_of(st.none(), st.sampled_from(vals)))
    hi = draw(st.one_of(st.none(), st.sampled_from(vals)))
    return FieldClause(fld, "range", (lo, draw(st.booleans()), hi, draw(st.booleans())))


@st.composite
def single_query(draw):
    q = SingleQuery(op=draw(st.sampled_from(["and", "or"])))
    q.clauses = draw(st.lists(clause(), min_size=1, max_size=4))
    return q


@st.composite
def multi_query(draw):
    op = draw(st.sampled_from(["and", "or"]))
    comps = draw(st.lists(single_query(), min_size=1, max_size=3))
    return MultiQuery(op=op, components=comps)


any_query = st.one_of(single_query(), multi_query())


@pytest.fixture(scope="module")
def fuzz_df(spark):
    df = spark.createDataFrame(
        [Row(**r) for r in ROWS], schema="_id string, n long, f double, s string, tags array<string>"
    )
    df.cache().count()
    return df


@settings(max_examples=60, deadline=None)
@given(spec=any_query)
def test_compiler_matches_reference_interpreter(spec, fuzz_df):
    df = fuzz_df
    got = sorted(r["_id"] for r in df.filter(compile_query(spec, df.schema)).collect())
    exp = sorted(r["_id"] for r in ROWS if eval_query(spec, r) is True)
    assert got == exp, f"spec={spec}"
