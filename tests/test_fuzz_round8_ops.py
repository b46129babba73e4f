"""Property-based testing of the round-8 geometric/interval/survivorship
operators against independent pure-Python models. Hypothesis drives the
inputs (including negative coordinates, touching interval endpoints,
all-NULL attribute groups) — the cases example tests under-sample.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


# Deadlines off: each case runs Spark jobs.
_SETTINGS = dict(max_examples=12, deadline=None)


@st.composite
def points(draw, n_max=40, lo=-150, hi=150):
    n = draw(st.integers(1, n_max))
    return [
        (i, draw(st.integers(lo, hi)), draw(st.integers(lo, hi)))
        for i in range(n)
    ]


@given(l=points(), r=points(), radius=st.integers(1, 80))
@settings(**_SETTINGS)
def test_grid_radius_join_equals_brute_force(spark, l, r, radius):
    from aleph2_contrib_spark.operators.joins import grid_radius_join

    ldf = spark.createDataFrame(l, "lid int, lx long, ly long")
    rdf = spark.createDataFrame(r, "rid int, rx long, ry long")
    got = {
        (x["lid"], x["rid"], x["dist_sq"])
        for x in grid_radius_join(
            ldf, rdf, "lid", "lx", "ly", "rid", "rx", "ry", radius
        ).collect()
    }
    want = {
        (li, ri, (rx - lx) ** 2 + (ry - ly) ** 2)
        for (li, lx, ly) in l
        for (ri, rx, ry) in r
        if (rx - lx) ** 2 + (ry - ly) ** 2 <= radius * radius
    }
    assert got == want


@st.composite
def intervals(draw):
    n = draw(st.integers(1, 50))
    out = []
    for _ in range(n):
        k = draw(st.integers(1, 3))
        s = draw(st.integers(-50, 50))
        out.append((k, s, s + draw(st.integers(0, 20))))
    return out


@given(rows=intervals())
@settings(**_SETTINGS)
def test_merge_intervals_invariants_and_model(spark, rows):
    from aleph2_contrib_spark.operators.events import merge_intervals

    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = sorted(
        (r["k"], r["start"], r["end"], r["n_merged"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    )

    # independent model: sweep per key
    from collections import defaultdict

    by_k = defaultdict(list)
    for k, s, e in rows:
        by_k[k].append((s, e))
    want = []
    for k, ivs in by_k.items():
        ivs.sort()
        cur_s, cur_e, n = None, None, 0
        for s, e in ivs:
            if cur_s is None:
                cur_s, cur_e, n = s, e, 1
            elif s <= cur_e:  # overlap-or-touch
                cur_e = max(cur_e, e)
                n += 1
            else:
                want.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        want.append((k, cur_s, cur_e, n))
    assert got == sorted(want)
    # invariants: islands per key are disjoint and non-touching, and
    # merged counts add up to the input count per key
    for k in by_k:
        isl = [(s, e) for kk, s, e, _ in got if kk == k]
        for (s1, e1), (s2, e2) in zip(isl, isl[1:]):
            assert e1 < s2 - 0  # strictly before, no touch left unmerged
        assert sum(n for kk, _, _, n in got if kk == k) == len(by_k[k])


@st.composite
def candidates(draw):
    n = draw(st.integers(1, 40))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.integers(1, 6)),                    # entity
                draw(st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))),
                draw(st.integers(1, 4)),                    # priority
                i,                                          # unique id
            )
        )
    return rows


@given(rows=candidates())
@settings(**_SETTINGS)
def test_golden_record_equals_python_model(spark, rows):
    from aleph2_contrib_spark.operators.linkage import golden_record

    df = spark.createDataFrame(rows, "entity long, attr string, prio long, rid long")
    got = {
        r["entity"]: r["attr"]
        for r in golden_record(df, "entity", ["attr"], ["prio"], "rid").collect()
    }
    want = {}
    for ent in {e for e, *_ in rows}:
        cand = [(a is not None, p, i, a) for e, a, p, i in rows if e == ent]
        want[ent] = max(cand)[3]
    assert got == want
