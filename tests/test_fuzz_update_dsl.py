"""Property-based differential testing of the update DSL compiler
(SURVEY §2.2 C6-C12) — the update-side counterpart of test_fuzz_dsl.py.

Hypothesis generates random update programs (sequences of typed clauses:
increment/set/unset on scalars and nested struct paths, add/add_dedup/
remove/set/unset on arrays) against a fixed row set and one of three
match specs (some / none / all rows, incl. a NULL-predicate row). Each
program runs two ways — compiled to a Catalyst projection by
apply_update, and interpreted by an independent pure-Python
implementation of the documented semantics (Mongo $inc-on-missing
initialization, array_union/array_except dedup behavior, NULL
pass-through, pre-update predicate snapshot). Results must match row for
row. The reference has only example-based update-translator tests
(TestMongoDbUtils.java); no property tests exist there.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from aleph2_contrib_spark.functions.query import Q
from aleph2_contrib_spark.functions.update import U, apply_update

ROWS = [
    {"_id": "a", "n": 1, "s": "x", "lst": ["p", "q", "p"], "nested": {"a": 10, "b": "u"}},
    {"_id": "b", "n": 5, "s": "y", "lst": ["q"], "nested": {"a": 20, "b": "v"}},
    {"_id": "c", "n": None, "s": None, "lst": None, "nested": {"a": 30, "b": "w"}},
    {"_id": "d", "n": 7, "s": "y", "lst": [], "nested": {"a": 40, "b": "x"}},
]

SCHEMA = (
    "_id string, n bigint, s string, lst array<string>, "
    "nested struct<a: bigint, b: string>"
)

# (spec builder, pure-Python matcher) — the row with n=None must fall to
# NOT-matched under the range spec (three-valued logic → CASE WHEN false)
SPECS = [
    (lambda: Q.all_of().range_above("n", 2, inclusive=True),
     lambda r: r["n"] is not None and r["n"] >= 2),
    (lambda: Q.all_of().when("s", "nope"), lambda r: False),
    (lambda: Q.any_of().when("s", "x").when("s", "y").with_present("n"),
     lambda r: r["s"] in ("x", "y") or r["n"] is not None),
]

INTS = [-3, 0, 1, 2, 9]
STRS = ["x", "y", "zz"]
TAGS = ["p", "q", "r", "s"]


def _clause_strategy():
    tag_lists = st.lists(st.sampled_from(TAGS), min_size=1, max_size=3)
    return st.one_of(
        st.tuples(st.just("n"), st.just("increment"), st.sampled_from(INTS)),
        st.tuples(st.just("n"), st.just("set"), st.sampled_from(INTS)),
        st.tuples(st.just("n"), st.just("unset"), st.none()),
        st.tuples(st.just("s"), st.just("set"), st.sampled_from(STRS)),
        st.tuples(st.just("s"), st.just("unset"), st.none()),
        st.tuples(st.just("lst"), st.just("add"), tag_lists),
        st.tuples(st.just("lst"), st.just("add_dedup"), tag_lists),
        st.tuples(st.just("lst"), st.just("remove"), tag_lists),
        st.tuples(st.just("lst"), st.just("unset"), st.none()),
        st.tuples(st.just("nested.a"), st.just("increment"), st.sampled_from(INTS)),
        st.tuples(st.just("nested.a"), st.just("set"), st.sampled_from(INTS)),
        st.tuples(st.just("nested.a"), st.just("unset"), st.none()),
    )


def _build_update(clauses):
    u = U.update()
    for fld, op, arg in clauses:
        if op == "increment":
            u.increment(fld, arg)
        elif op == "set":
            u.set(fld, arg)
        elif op == "unset":
            u.unset(fld)
        elif op == "add":
            u.add(fld, arg)
        elif op == "add_dedup":
            u.add(fld, arg, deduplicate=True)
        elif op == "remove":
            u.remove(fld, arg)
    return u


# -- reference interpreter ---------------------------------------------------


def _ordered_dedup(vals):
    seen, out = set(), []
    for v in vals:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def _get(row, fld):
    if "." in fld:
        root, leaf = fld.split(".", 1)
        return row[root][leaf]
    return row[fld]


def _put(row, fld, value):
    if "." in fld:
        root, leaf = fld.split(".", 1)
        row[root] = dict(row[root])
        row[root][leaf] = value
    else:
        row[fld] = value


def _interpret(row, clauses):
    row = {**row, "nested": dict(row["nested"])}
    for fld, op, arg in clauses:
        cur = _get(row, fld)
        if op == "increment":
            _put(row, fld, (cur if cur is not None else 0) + arg)
        elif op == "set":
            _put(row, fld, list(arg) if isinstance(arg, list) else arg)
        elif op == "unset":
            _put(row, fld, None)
        elif op == "add":
            _put(row, fld, (cur or []) + list(arg))
        elif op == "add_dedup":
            # array_union: result deduped, first-occurrence order
            _put(row, fld, _ordered_dedup((cur or []) + list(arg)))
        elif op == "remove":
            # array_except: NULL stays NULL; result deduped
            if cur is None:
                _put(row, fld, None)
            else:
                _put(row, fld, _ordered_dedup([x for x in cur if x not in arg]))
    return row


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    clauses=st.lists(_clause_strategy(), min_size=1, max_size=5),
    spec_i=st.integers(min_value=0, max_value=len(SPECS) - 1),
)
def test_update_matches_reference_interpreter(spark, clauses, spec_i):
    spec_fn, matcher = SPECS[spec_i]
    df = spark.createDataFrame([Row(**r) for r in ROWS], SCHEMA)
    got = {
        r["_id"]: r.asDict(recursive=True)
        for r in apply_update(df, spec_fn(), _build_update(clauses)).collect()
    }
    for r in ROWS:
        want = _interpret(r, clauses) if matcher(r) else r
        g = got[r["_id"]]
        assert g["n"] == want["n"], (clauses, spec_i, r["_id"], g, want)
        assert g["s"] == want["s"], (clauses, spec_i, r["_id"], g, want)
        assert g["lst"] == want["lst"], (clauses, spec_i, r["_id"], g, want)
        assert g["nested"] == dict(want["nested"]), (clauses, spec_i, r["_id"], g, want)
