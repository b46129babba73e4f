"""operators/events.py: ordered funnel semantics."""

import datetime as dt

import pytest
from pyspark.sql import Row

from aleph2_contrib_spark.operators.events import funnel_counts, funnel_times


def _ev(spark):
    T = dt.datetime
    rows = [
        # u1: full funnel in order
        Row(user_id=1, ts=T(2024, 1, 1, 10), event_type="view"),
        Row(user_id=1, ts=T(2024, 1, 1, 11), event_type="click"),
        Row(user_id=1, ts=T(2024, 1, 1, 12), event_type="purchase"),
        # u2: purchase BEFORE click — chain breaks at purchase
        Row(user_id=2, ts=T(2024, 1, 1, 10), event_type="view"),
        Row(user_id=2, ts=T(2024, 1, 1, 9), event_type="purchase"),
        Row(user_id=2, ts=T(2024, 1, 1, 11), event_type="click"),
        # u3: view only
        Row(user_id=3, ts=T(2024, 1, 1, 10), event_type="view"),
        # u4: click/purchase but never viewed — not in funnel at all
        Row(user_id=4, ts=T(2024, 1, 1, 10), event_type="click"),
        Row(user_id=4, ts=T(2024, 1, 1, 11), event_type="purchase"),
        # u5: simultaneous view+click (inclusive >=) then purchase
        Row(user_id=5, ts=T(2024, 1, 1, 10), event_type="view"),
        Row(user_id=5, ts=T(2024, 1, 1, 10), event_type="click"),
        Row(user_id=5, ts=T(2024, 1, 1, 11), event_type="purchase"),
    ]
    return spark.createDataFrame(rows)


def test_funnel_times_chain_semantics(spark):
    t = {r.user_id: r for r in funnel_times(_ev(spark), "user_id", "ts", "event_type",
                                            ["view", "click", "purchase"]).collect()}
    assert t[1].t_0 and t[1].t_1 and t[1].t_2
    assert t[2].t_0 is not None and t[2].t_1 is not None and t[2].t_2 is None
    assert t[3].t_1 is None and t[3].t_2 is None
    assert t[4].t_0 is None and t[4].t_1 is None  # no view → no chain
    assert t[5].t_1 == t[5].t_0  # inclusive same-timestamp ordering


def test_funnel_counts(spark):
    out = {r.step: r.n_users for r in funnel_counts(
        _ev(spark), "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()}
    assert out == {"view": 4, "click": 3, "purchase": 2}


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError):
        funnel_times(_ev(spark), "user_id", "ts", "event_type", [])


def test_funnel_repeated_step_requires_distinct_events(spark):
    """view -> view: one event must not satisfy both steps; two views at
    strictly increasing times do."""
    T = dt.datetime
    one = spark.createDataFrame([Row(user_id=1, ts=T(2024, 1, 1, 10), event_type="view")])
    out = {r.step_idx: r.n_users for r in funnel_counts(
        one, "user_id", "ts", "event_type", ["view", "view"]).collect()}
    assert out == {0: 1, 1: 0}
    two = spark.createDataFrame([
        Row(user_id=1, ts=T(2024, 1, 1, 10), event_type="view"),
        Row(user_id=1, ts=T(2024, 1, 1, 11), event_type="view"),
    ])
    out2 = {r.step_idx: r.n_users for r in funnel_counts(
        two, "user_id", "ts", "event_type", ["view", "view"]).collect()}
    assert out2 == {0: 1, 1: 1}


# ------------------------------------------------- SCD2 intervals


def test_scd2_intervals_runs_and_versions(spark):
    from aleph2_contrib_spark.operators.events import scd2_intervals

    d = dt.date
    rows = [
        # key 1: A,A,B,A -> three runs
        Row(k=1, a="A", ts=d(2024, 1, 1), id=1),
        Row(k=1, a="A", ts=d(2024, 1, 5), id=2),
        Row(k=1, a="B", ts=d(2024, 2, 1), id=3),
        Row(k=1, a="A", ts=d(2024, 3, 1), id=4),
        # key 2: single observation
        Row(k=2, a="X", ts=d(2024, 1, 1), id=5),
    ]
    out = scd2_intervals(spark.createDataFrame(rows), "k", "a", "ts", "id").collect()
    by = {(r.key, r.version): r for r in out}
    assert len(by) == 4
    r11 = by[(1, 1)]
    assert (r11.attr, r11.valid_from, r11.valid_to, r11.n_obs) == ("A", d(2024, 1, 1), d(2024, 2, 1), 2)
    r12 = by[(1, 2)]
    assert (r12.attr, r12.valid_to) == ("B", d(2024, 3, 1))
    r13 = by[(1, 3)]
    assert (r13.attr, r13.valid_to) == ("A", None)      # open (current) interval
    assert by[(2, 1)].valid_to is None


def test_scd2_same_day_tiebreak_and_nulls(spark):
    """Same-timestamp rows order by the tiebreak id; NULL attr compares
    null-safe (consecutive NULLs are ONE run, not many)."""
    from aleph2_contrib_spark.operators.events import scd2_intervals

    d = dt.date
    rows = [
        Row(k=1, a="A", ts=d(2024, 1, 1), id=2),
        Row(k=1, a="B", ts=d(2024, 1, 1), id=1),   # earlier id → B first
        Row(k=1, a=None, ts=d(2024, 1, 2), id=3),
        Row(k=1, a=None, ts=d(2024, 1, 3), id=4),
    ]
    out = scd2_intervals(spark.createDataFrame(rows), "k", "a", "ts", "id").collect()
    seq = [r.attr for r in sorted(out, key=lambda r: r.version)]
    assert seq == ["B", "A", None]
    assert sorted(r.n_obs for r in out) == [1, 1, 2]


def test_scd2_single_exchange(spark):
    """All windows + the groupBy share one hash exchange on the key."""
    from aleph2_contrib_spark.operators.events import scd2_intervals

    d = dt.date
    rows = [Row(k=i % 3, a="A", ts=d(2024, 1, 1 + i % 5), id=i) for i in range(20)]
    plan = (
        scd2_intervals(spark.createDataFrame(rows), "k", "a", "ts", "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 1, plan


# ------------------------------------------------- basket pair lift


def test_basket_pair_lift_hand_case(spark):
    from aleph2_contrib_spark.operators.events import basket_pair_lift

    rows = [
        # a,b always together (2 baskets); c everywhere (4); d alone once
        Row(b=1, i="a"), Row(b=1, i="b"), Row(b=1, i="c"),
        Row(b=2, i="a"), Row(b=2, i="b"), Row(b=2, i="c"),
        Row(b=3, i="c"), Row(b=3, i="d"),
        Row(b=4, i="c"), Row(b=4, i="a"),  # duplicate entry below too
        Row(b=4, i="a"),
    ]
    out = basket_pair_lift(
        spark.createDataFrame(rows), "b", "i", top_n=10, min_pair_support=2
    ).collect()
    by = {(r.item_a, r.item_b): r for r in out}
    # n_baskets=4; c(a)=3 (dup collapsed), c(b)=2, c(ab)=2
    assert by[("a", "b")].pair_cnt == 2
    assert by[("a", "b")].lift_f6 == 1000000 * 2 * 4 // (3 * 2)
    # c appears in all 4 baskets: lift(a,c)=1e6*3*4//(3*4)=1e6
    assert by[("a", "c")].lift_f6 == 1000000
    # ranking: lift desc — (a,b) ≈1.33e6 first
    assert out[0].item_a == "a" and out[0].item_b == "b"


def test_basket_pair_lift_min_support_and_determinism(spark):
    from aleph2_contrib_spark.operators.events import basket_pair_lift

    rows = [Row(b=i, i=x) for i in range(6) for x in ("p", "q")] + [
        Row(b=99, i="p"), Row(b=99, i="z")
    ]
    df = spark.createDataFrame(rows)
    out = basket_pair_lift(df, "b", "i", top_n=5, min_pair_support=2).collect()
    assert [(r.item_a, r.item_b) for r in out] == [("p", "q")]   # (p,z) support 1
    out2 = basket_pair_lift(df.repartition(7), "b", "i", top_n=5, min_pair_support=2).collect()
    assert [(r.item_a, r.item_b, r.lift_f6) for r in out] == [
        (r.item_a, r.item_b, r.lift_f6) for r in out2
    ]


# ------------------------------------------------- SCD2 property test


def test_scd2_property_vs_python_reference(spark):
    """Hypothesis: random observation streams — scd2_intervals must equal
    an independent run-length-encoding reference, for every key, under
    any partitioning."""
    from hypothesis import given, settings, strategies as st

    from aleph2_contrib_spark.operators.events import scd2_intervals

    obs = st.lists(
        st.tuples(
            st.integers(0, 2),                     # key
            st.sampled_from(["A", "B", None]),     # attr
            st.integers(0, 6),                     # ts (day ordinal)
        ),
        min_size=1,
        max_size=14,
    )

    @settings(max_examples=25, deadline=None)
    @given(obs)
    def run(events):
        rows = [
            {"k": k, "a": a, "ts": t, "id": i}
            for i, (k, a, t) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows, "k int, a string, ts int, id int"
        ).repartition(3)
        got = {
            (r.key, r.version): (r.attr, r.valid_from, r.valid_to, r.n_obs)
            for r in scd2_intervals(df, "k", "a", "ts", "id").collect()
        }
        # reference: sort per key by (ts, id), RLE on attr
        want = {}
        bykey = {}
        for r in sorted(rows, key=lambda r: (r["ts"], r["id"])):
            bykey.setdefault(r["k"], []).append(r)
        for k, seq in bykey.items():
            runs = []
            for r in seq:
                if runs and runs[-1]["attr"] == r["a"]:
                    runs[-1]["n"] += 1
                else:
                    runs.append({"attr": r["a"], "from": r["ts"], "n": 1})
            for v, run_ in enumerate(runs, 1):
                nxt = runs[v]["from"] if v < len(runs) else None
                want[(k, v)] = (run_["attr"], run_["from"], nxt, run_["n"])
        assert got == want

    run()


def test_retention_cohorts_hand_case(spark):
    """Two cohorts; offsets count distinct users per later week, multiple
    same-week events collapse to one."""
    from aleph2_contrib_spark.operators.events import retention_cohorts

    T = dt.datetime
    rows = [
        # user 1: first event week of 2024-01-01 (Mon), active wk0 + wk1
        Row(user_id=1, ts=T(2024, 1, 2, 10)),
        Row(user_id=1, ts=T(2024, 1, 3, 9)),   # same week, must not double count
        Row(user_id=1, ts=T(2024, 1, 9, 8)),   # next week
        # user 2: same cohort, active wk0 only
        Row(user_id=2, ts=T(2024, 1, 4, 12)),
        # user 3: cohort of 2024-01-08, active wk0 + wk2
        Row(user_id=3, ts=T(2024, 1, 8, 0)),
        Row(user_id=3, ts=T(2024, 1, 22, 5)),
    ]
    out = {
        (r["cohort"].isoformat(), r["offset_weeks"]): r["n_users"]
        for r in retention_cohorts(spark.createDataFrame(rows)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }


def test_retention_cohorts_partition_invariant(spark):
    """Cohort matrix is independent of input partitioning."""
    from aleph2_contrib_spark.operators.events import retention_cohorts

    T = dt.datetime
    rows = [
        Row(user_id=u, ts=T(2024, 1, 1 + (u * 7 + i * 3) % 25, 8))
        for u in range(1, 30)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    a = sorted(map(tuple, retention_cohorts(df).collect()))
    b = sorted(map(tuple, retention_cohorts(df.repartition(11)).collect()))
    assert a == b and len(a) > 3


def _ev_rows(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, user_id=u, ts=dt.datetime(2024, 1, 1, 0, m), event_type=t)
            for i, (u, m, t) in enumerate(rows)
        ]
    )


def test_path_ngrams_hand_case(spark):
    from aleph2_contrib_spark.operators.events import path_ngrams

    # user 1: a b c b c  -> trigrams a>b>c, b>c>b, c>b>c
    # user 2: a b c      -> trigram  a>b>c
    df = _ev_rows(
        spark,
        [(1, 0, "a"), (1, 1, "b"), (1, 2, "c"), (1, 3, "b"), (1, 4, "c"),
         (2, 0, "a"), (2, 1, "b"), (2, 2, "c")],
    )
    out = {(r["path"], r["cnt"]) for r in path_ngrams(df, "user_id", "ts", "event_type", "event_id").collect()}
    assert out == {("a>b>c", 2), ("b>c>b", 1), ("c>b>c", 1)}


def test_path_ngrams_never_crosses_users(spark):
    from aleph2_contrib_spark.operators.events import path_ngrams

    # two users with < n events each: no trigram may span the boundary
    df = _ev_rows(spark, [(1, 0, "a"), (1, 1, "b"), (2, 2, "c"), (2, 3, "d")])
    assert path_ngrams(df, "user_id", "ts", "event_type", "event_id").count() == 0


def test_path_ngrams_simultaneous_events_stable(spark):
    from aleph2_contrib_spark.operators.events import path_ngrams

    # equal timestamps: order falls back to event_id, so the path is the
    # insertion order regardless of partitioning
    df = _ev_rows(spark, [(1, 0, "x"), (1, 0, "y"), (1, 0, "z")])
    a = [tuple(r) for r in path_ngrams(df.repartition(1), "user_id", "ts", "event_type", "event_id").collect()]
    b = [tuple(r) for r in path_ngrams(df.repartition(8), "user_id", "ts", "event_type", "event_id").collect()]
    assert a == b == [("x>y>z", 1)]


def test_touch_attribution_last_and_first(spark):
    from aleph2_contrib_spark.operators.events import touch_attribution

    # user 1: view click purchase  -> last=click, first=view
    # user 2: purchase             -> (none)
    # user 3: click view purchase purchase -> both purchases credit view (last)
    df = _ev_rows(
        spark,
        [(1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
         (2, 0, "purchase"),
         (3, 0, "click"), (3, 1, "view"), (3, 2, "purchase"), (3, 3, "purchase")],
    )
    last = {
        (r["touch"], r["conversions"])
        for r in touch_attribution(
            df, "user_id", "ts", "event_type", "event_id", "purchase", ["click", "view"], "last"
        ).collect()
    }
    assert last == {("click", 1), ("(none)", 1), ("view", 2)}
    first = {
        (r["touch"], r["conversions"])
        for r in touch_attribution(
            df, "user_id", "ts", "event_type", "event_id", "purchase", ["click", "view"], "first"
        ).collect()
    }
    assert first == {("view", 1), ("(none)", 1), ("click", 2)}


def test_touch_attribution_touch_must_strictly_precede(spark):
    from aleph2_contrib_spark.operators.events import touch_attribution

    # the conversion row itself is outside the frame: a purchase with a
    # simultaneous click (later event_id) is NOT credited to it
    df = _ev_rows(spark, [(1, 0, "purchase"), (1, 0, "click")])
    out = {(r["touch"], r["conversions"]) for r in touch_attribution(
        df, "user_id", "ts", "event_type", "event_id", "purchase", ["click"], "last"
    ).collect()}
    assert out == {("(none)", 1)}


def test_touch_attribution_rejects_bad_model(spark):
    from aleph2_contrib_spark.operators.events import touch_attribution

    df = _ev_rows(spark, [(1, 0, "purchase")])
    with pytest.raises(ValueError, match="model"):
        touch_attribution(df, "user_id", "ts", "event_type", "event_id", "purchase", ["click"], "linear")


def test_ewma_hand_case_and_first_event(spark):
    from aleph2_contrib_spark.operators.events import ewma_smooth

    df = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=dt.datetime(2024, 1, 1, 0, 0), value=1.0),
            Row(event_id=2, user_id=1, ts=dt.datetime(2024, 1, 1, 0, 1), value=3.0),
        ]
    )
    out = {r["event_id"]: r["ewma_f6"] for r in ewma_smooth(df, "user_id", "ts", "event_id", "value").collect()}
    # first event: only its own value
    assert out[1] == 1_000_000
    # second: (3e6*128 + 1e6*64) div 192 = 448e6/192
    assert out[2] == 448_000_000 // 192


def test_ewma_window_truncation(spark):
    from aleph2_contrib_spark.operators.events import ewma_smooth

    # 10 events; at the last event only the trailing 8 participate, so a
    # huge value at position 0 must not influence it
    rows = [Row(event_id=i, user_id=1, ts=dt.datetime(2024, 1, 1, 0, i), value=(1e6 if i == 0 else 2.0)) for i in range(10)]
    out = {r["event_id"]: r["ewma_f6"] for r in ewma_smooth(spark.createDataFrame(rows), "user_id", "ts", "event_id", "value").collect()}
    assert out[9] == 2_000_000  # constant tail -> exactly the value


def test_ewma_partition_invariant_and_keys_isolated(spark):
    from aleph2_contrib_spark.operators.events import ewma_smooth

    rows = [
        Row(event_id=i, user_id=i % 5, ts=dt.datetime(2024, 1, 1, 0, i % 60), value=float((i * 7) % 23))
        for i in range(200)
    ]
    df1 = spark.createDataFrame(rows).repartition(1)
    df2 = spark.createDataFrame(rows).repartition(16)
    a = sorted(map(tuple, ewma_smooth(df1, "user_id", "ts", "event_id", "value").collect()))
    b = sorted(map(tuple, ewma_smooth(df2, "user_id", "ts", "event_id", "value").collect()))
    assert a == b


# ---------------------------------------------------------- autocorrelation


def _brute_acf_ppm(xs: list[int], lag: int) -> int | None:
    n = len(xs)
    if n <= lag:
        return None
    s = sum(xs)
    sxx = sum(v * v for v in xs)
    den = n * n * sxx - n * s * s
    if den == 0:
        return None
    sprod = sum(xs[i] * xs[i + lag] for i in range(n - lag))
    head = sum(xs[: n - lag])
    tail = sum(xs[lag:])
    num = n * n * sprod - n * s * (head + tail) + (n - lag) * s * s
    # the operator computes floor((1e6*(num+den))/den) - 1e6: num+den >= 0
    # by Cauchy-Schwarz, so floor == truncate in every engine
    return (1_000_000 * (num + den)) // den - 1_000_000


def test_autocorrelation_matches_reference_series(spark):
    from aleph2_contrib_spark.operators.events import autocorrelation

    series = {
        "up": [1, 2, 3, 4, 5, 6, 7, 8],            # strong positive acf
        "alt": [5, 1, 5, 1, 5, 1, 5, 1, 5],        # lag-1 negative, lag-2 positive
        "const": [4, 4, 4, 4],                      # zero variance: dropped
        "short": [7, 9],                            # n <= lag for lag >= 2
        "noisy": [3, 7, 2, 9, 4, 6, 1, 8, 5, 5, 2], # arbitrary
    }
    rows = [(k, i, v) for k, xs in series.items() for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, t int, x int")
    got = {
        (r["k"], r["lag"]): (r["n"], r["acf_ppm"])
        for r in autocorrelation(df, "k", "t", "x", max_lag=3).collect()
    }
    for k, xs in series.items():
        for lag in (1, 2, 3):
            want = _brute_acf_ppm(xs, lag)
            if want is None:
                assert (k, lag) not in got
            else:
                assert got[(k, lag)] == (len(xs), want), (k, lag)
    # sanity on signs: monotone series highly autocorrelated, alternating
    # series anti-correlated at lag 1 and correlated at lag 2
    assert got[("up", 1)][1] > 500_000
    assert got[("alt", 1)][1] < -500_000
    assert got[("alt", 2)][1] > 500_000


def test_autocorrelation_validation(spark):
    from aleph2_contrib_spark.operators.events import autocorrelation

    df = spark.createDataFrame([("a", 1, 1)], "k string, t int, x int")
    with pytest.raises(ValueError, match="max_lag"):
        autocorrelation(df, "k", "t", "x", max_lag=0)


# ------------------------------------------------------------------- CUSUM


def _brute_cusum_alarms(series: dict[str, list[int]], threshold: int, slack: int):
    out = set()
    for k, xs in series.items():
        n, s = len(xs), sum(xs)
        cur = 0
        for t, x in enumerate(xs):
            cur = max(0, cur + (n * x - s - n * slack))
            if cur > n * threshold:
                out.add((k, t, x, cur, n))
    return out


@pytest.mark.parametrize("threshold,slack", [(0, 0), (3, 0), (2, 1)])
def test_cusum_matches_recursion(spark, threshold, slack):
    from aleph2_contrib_spark.operators.events import cusum_alarms

    series = {
        "shift": [5, 5, 5, 5, 9, 9, 9, 9],   # upward level shift mid-series
        "flat": [4, 4, 4, 4, 4],             # never alarms
        "spike": [3, 3, 30, 3, 3],           # single spike, then decays
        "ramp": [1, 2, 3, 4, 5, 6, 7],
    }
    rows = [(k, t, x) for k, xs in series.items() for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, t int, x int")
    got = {
        (r["k"], r["t"], r["x"], r["cusum_num"], r["n"])
        for r in cusum_alarms(df, "k", "t", "x", threshold, slack).collect()
    }
    assert got == _brute_cusum_alarms(series, threshold, slack)


def test_cusum_partition_invariant(spark):
    from aleph2_contrib_spark.operators.events import cusum_alarms

    rows = [("a", t, (t * 37) % 11) for t in range(200)]
    df = spark.createDataFrame(rows, "k string, t int, x int")
    r1 = set(map(tuple, cusum_alarms(df, "k", "t", "x", 1).collect()))
    r2 = set(
        map(tuple, cusum_alarms(df.repartition(13), "k", "t", "x", 1).collect())
    )
    assert r1 == r2 and r1


# -------------------------------------------------------------- trend slope


def _brute_trend(series: dict[str, list[tuple[int, int]]]):
    out = {}
    for k, pts in series.items():
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        N = n * sxy - sx * sy
        D = n * sxx - sx * sx
        if D == 0:
            continue
        a = 1_000_000 * N
        q = abs(a) // abs(D)
        slope = q if (a >= 0) == (D >= 0) else -q  # truncate like div / //
        out[k] = (n, slope, sy * D - N * sx, n * D)
    return out


def test_trend_slope_exact(spark):
    from aleph2_contrib_spark.operators.events import trend_slope

    series = {
        "up": [(i, 3 * i + 7) for i in range(10)],            # slope exactly 3
        "down": [(i, 100 - 2 * i) for i in range(8)],          # negative slope
        "frac": [(0, 0), (1, 0), (2, 1)],                      # slope 1/2 -> floor
        "negfrac": [(0, 1), (1, 1), (2, 0)],                   # slope -1/2 -> floors to -500000
        "degenerate": [(5, 1), (5, 9)],                        # D = 0: dropped
        "noisy": [(t, (t * 13) % 7 + t) for t in range(20)],
    }
    rows = [(k, x, y) for k, pts in series.items() for x, y in pts]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    got = {
        r["k"]: (r["n"], r["slope_ppm"], r["intercept_num"], r["intercept_den"])
        for r in trend_slope(df, "k", "x", "y").collect()
    }
    assert got == _brute_trend(series)
    assert got["up"][1] == 3_000_000
    assert got["down"][1] == -2_000_000
    assert got["frac"][1] == 500_000
    # floor, not truncate: -0.5 -> -500000 exactly here, but check a true
    # floor case: slope -1/3
    tri = spark.createDataFrame([("t", 0, 1), ("t", 1, 1), ("t", 2, 0), ("t", 3, 0)],
                                "k string, x int, y int")
    r = trend_slope(tri, "k", "x", "y").collect()[0]
    # N = 4*1 - 6*2 = ... compute: sxy=0*1+1*1+2*0+3*0=1; sx=6; sy=2; n=4
    # N = 4 - 12 = -8; D = 4*14 - 36 = 20; slope = -0.4 -> floor(-400000)
    assert r["slope_ppm"] == -400_000
    # intercept = (sy*D - N*sx) / (n*D) = (40 + 48) / 80 = 1.1
    assert (r["intercept_num"], r["intercept_den"]) == (88, 80)


def test_trend_slope_oracle_matches(spark):
    import duckdb

    from aleph2_contrib_spark.operators.events import (
        trend_slope,
        trend_slope_oracle_sql,
    )

    rows = [("a", t, (t * 31) % 11) for t in range(50)] + [
        ("b", t, 200 - 3 * t) for t in range(30)
    ]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    got = {tuple(r) for r in trend_slope(df, "k", "x", "y").collect()}
    vals = ", ".join(f"('{k}', {x}, {y})" for k, x, y in rows)
    sql = trend_slope_oracle_sql(
        f"SELECT c1 AS k, c2 AS x, c3 AS y FROM (VALUES {vals}) t(c1, c2, c3)", "k"
    )
    assert got == {tuple(r) for r in duckdb.sql(sql).fetchall()}


# -- sequential_patterns ---------------------------------------------------


def _brute_seq_patterns(streams, min_support, max_len):
    """streams: {user: [type, ...]} in order. Exhaustive subsequence check."""
    import itertools

    def has_subseq(seq, pat):
        it = iter(seq)
        return all(any(x == want for x in it) for want in pat)

    types = sorted({t for s in streams.values() for t in s})
    out = {}
    for ln in range(1, max_len + 1):
        for pat in itertools.product(types, repeat=ln):
            sup = sum(1 for s in streams.values() if has_subseq(s, pat))
            if sup >= min_support:
                out[(">".join(pat), ln)] = sup
    return out


def test_sequential_patterns_matches_brute_force(spark):
    import random

    from aleph2_contrib_spark.operators.events import sequential_patterns

    rnd = random.Random(13)
    streams = {
        u: [rnd.choice("abcd") for _ in range(rnd.randint(0, 12))]
        for u in range(25)
    }
    rows = [
        (u, t, i, u * 1000 + i)
        for u, seq in streams.items()
        for i, t in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "user long, typ string, ts long, eid long")
    got = {
        (r["pattern"], r["length"]): r["support"]
        for r in sequential_patterns(
            df, "user", "ts", "typ", "eid", min_support=2, max_len=3
        ).collect()
    }
    assert got == _brute_seq_patterns(streams, 2, 3)


def test_sequential_patterns_oracle_matches(spark):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.events import (
        sequential_patterns,
        sequential_patterns_oracle_sql,
    )

    rnd = random.Random(29)
    rows = [
        (u, rnd.choice(["x", "y", "z"]), i, u * 100 + i)
        for u in range(12)
        for i in range(rnd.randint(1, 9))
    ]
    df = spark.createDataFrame(rows, "user long, typ string, ts long, eid long")
    got = {
        tuple(r)
        for r in sequential_patterns(
            df, "user", "ts", "typ", "eid", min_support=3, max_len=3
        ).collect()
    }
    vals = ", ".join(f"({u}, '{t}', {ts}, {e})" for u, t, ts, e in rows)
    sql = sequential_patterns_oracle_sql(
        f"SELECT c1 AS u, c2 AS t, c3 AS ts, c4 AS eid "
        f"FROM (VALUES {vals}) v(c1, c2, c3, c4)",
        min_support=3,
    )
    assert got == {tuple(r) for r in duckdb.sql(sql).fetchall()}


def test_sequential_patterns_validation(spark):
    from aleph2_contrib_spark.operators.events import sequential_patterns

    df = spark.createDataFrame([(1, "a", 1, 1)], "u long, t string, ts long, e long")
    with pytest.raises(ValueError, match="max_len"):
        sequential_patterns(df, "u", "ts", "t", "e", max_len=4)


# -- markov_transitions ----------------------------------------------------


def test_markov_transitions_exact(spark):
    from aleph2_contrib_spark.operators.events import markov_transitions

    rows = [
        (1, "a", 1, 1), (1, "b", 2, 2), (1, "a", 3, 3), (1, "b", 4, 4),
        (2, "a", 1, 5), (2, "c", 2, 6),
    ]
    df = spark.createDataFrame(rows, "u long, t string, ts long, e long")
    got = {
        (r["from_type"], r["to_type"]): (r["cnt"], r["p_ppm"])
        for r in markov_transitions(df, "u", "ts", "t", "e").collect()
    }
    # from 'a': a>b twice, a>c once; from 'b': b>a once
    assert got == {
        ("a", "b"): (2, 666_666),
        ("a", "c"): (1, 333_333),
        ("b", "a"): (1, 1_000_000),
    }


def test_markov_transitions_oracle_matches(spark):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.events import (
        markov_transitions,
        markov_transitions_oracle_sql,
    )

    rnd = random.Random(31)
    rows = [
        (u, rnd.choice(["x", "y", "z", "w"]), i, u * 100 + i)
        for u in range(15)
        for i in range(rnd.randint(1, 12))
    ]
    df = spark.createDataFrame(rows, "u long, t string, ts long, e long")
    got = {
        tuple(r)
        for r in markov_transitions(df, "u", "ts", "t", "e", min_count=2).collect()
    }
    vals = ", ".join(f"({u}, '{t}', {ts}, {e})" for u, t, ts, e in rows)
    sql = markov_transitions_oracle_sql(
        f"SELECT c1 AS u, c2 AS t, c3 AS ts, c4 AS eid "
        f"FROM (VALUES {vals}) v(c1, c2, c3, c4)",
        min_count=2,
    )
    assert got == {tuple(r) for r in duckdb.sql(sql).fetchall()}


# -- funnel_counts_windowed ------------------------------------------------


def _brute_windowed_funnel(streams, steps, w):
    """streams: {user: [(type, sec), ...]}. Exists-chain check."""
    def completes(evs, upto):
        evs = sorted(set(evs), key=lambda x: x[1])
        anchors = [s for t, s in evs if t == steps[0]]
        for a in anchors:
            prev = a
            ok = True
            for step in steps[1:upto + 1]:
                cand = [s for t, s in evs if t == step and s > prev and s <= a + w]
                if not cand:
                    ok = False
                    break
                prev = min(cand)
            if ok:
                return True
        return False

    return [
        sum(1 for evs in streams.values() if completes(evs, i))
        for i in range(len(steps))
    ]


def test_funnel_windowed_anchor_iteration(spark):
    from aleph2_contrib_spark.operators.events import funnel_counts_windowed

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    rows = [
        # u1: first anchor too early; the SECOND anchor completes
        (1, "A", ts(0)), (1, "A", ts(950)), (1, "B", ts(1000)),
        # u2: only an early anchor — B is outside its window
        (2, "A", ts(0)), (2, "B", ts(1000)),
        # u3: full in-window chain
        (3, "A", ts(0)), (3, "B", ts(50)),
    ]
    df = spark.createDataFrame(rows, "u long, t string, ts timestamp")
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts_windowed(
            df, "u", "ts", "t", ["A", "B"], window_seconds=100
        ).collect()
    }
    assert got == {"A": 3, "B": 2}  # u2 must NOT convert


def test_funnel_windowed_matches_brute_force_and_oracle(spark):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.events import (
        funnel_counts_windowed,
        funnel_windowed_oracle_sql,
    )

    rnd = random.Random(43)
    streams = {
        u: [
            (rnd.choice(["s", "m", "p", "x"]), rnd.randint(0, 2000))
            for _ in range(rnd.randint(0, 15))
        ]
        for u in range(30)
    }
    rows = [
        (u, t, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
        for u, evs in streams.items()
        for t, s in evs
    ]
    if not rows:
        rows = [(0, "s", dt.datetime(2024, 1, 1))]
    df = spark.createDataFrame(rows, "u long, t string, ts timestamp")
    steps = ["s", "m", "p"]
    w = 500
    got = [
        r["n_users"]
        for r in funnel_counts_windowed(df, "u", "ts", "t", steps, w)
        .orderBy("step_idx")
        .collect()
    ]
    micro = {
        u: [(t, s * 1_000_000) for t, s in evs] for u, evs in streams.items()
    }
    assert got == _brute_windowed_funnel(micro, steps, w * 1_000_000)

    vals = ", ".join(
        f"({u}, '{t}', {s * 1_000_000})"
        for u, evs in streams.items()
        for t, s in evs
    )
    sql = funnel_windowed_oracle_sql(
        f"SELECT c1 AS u, c2 AS t, c3 AS s FROM (VALUES {vals}) v(c1, c2, c3)",
        steps,
        w,
    )
    want = {
        (r[0], r[1]): r[2] for r in duckdb.sql(sql).fetchall()
    }
    assert [want[(i, s)] for i, s in enumerate(steps)] == got


def test_funnel_windowed_validation(spark):
    from aleph2_contrib_spark.operators.events import funnel_counts_windowed

    df = spark.createDataFrame([(1, "a", dt.datetime(2024, 1, 1))], "u long, t string, ts timestamp")
    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts_windowed(df, "u", "ts", "t", [], 10)
    with pytest.raises(ValueError, match="at most 5"):
        funnel_counts_windowed(df, "u", "ts", "t", list("abcdef"), 10)
    with pytest.raises(ValueError, match="positive"):
        funnel_counts_windowed(df, "u", "ts", "t", ["a"], 0)


# -- rfm_segments ----------------------------------------------------------


def test_rfm_segments_exact_and_tiebreaks(spark):
    from aleph2_contrib_spark.operators.events import rfm_segments

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    rows = [
        (1, ts(100), 10.0), (1, ts(200), 5.0),     # freq 2, mon 15.00, last 200
        (2, ts(300), 1.0),                          # most recent, mon 1.00
        (3, ts(50), 100.0), (3, ts(60), 1.0),       # high monetary, stale
        (4, ts(10), 2.0),                           # stalest
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    got = {r["user"]: r.asDict() for r in rfm_segments(df, "u", "ts", "v", n_tiles=2).collect()}
    assert got[2]["r"] == 1 and got[4]["r"] == 2          # recency ordering
    assert got[1]["f"] == 1 and got[3]["f"] == 1          # both freq-2 users in tile 1
    assert got[3]["m"] == 1 and got[2]["m"] == 2          # monetary ordering
    assert got[3]["monetary_c"] == 10100                  # exact cents
    assert got[2]["recency_us"] == 0
    assert got[1]["segment"] == f"{got[1]['r']}{got[1]['f']}{got[1]['m']}"


def test_rfm_segments_oracle_matches(spark):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.events import (
        rfm_segments,
        rfm_segments_oracle_sql,
    )

    rnd = random.Random(53)
    rows = [
        (rnd.randint(0, 20), rnd.randint(0, 10_000), round(rnd.uniform(0, 50), 2))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [
            (u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v)
            for u, s, v in rows
        ],
        "u long, ts timestamp, v double",
    )
    got = {tuple(r) for r in rfm_segments(df, "u", "ts", "v").collect()}
    vals = ", ".join(f"({u}, {s * 1_000_000}, {v})" for u, s, v in rows)
    base_us = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    sql = rfm_segments_oracle_sql(
        f"SELECT c1 AS u, CAST(c2 AS BIGINT) + {base_us} AS s, c3 AS v "
        f"FROM (VALUES {vals}) t(c1, c2, c3)"
    )
    assert got == {tuple(r) for r in duckdb.sql(sql).fetchall()}


# -- concurrency_timeline ----------------------------------------------------


def _brute_concurrency(intervals):
    pts = sorted({t for lo, hi in intervals for t in (lo, hi) if hi > lo})
    out = {}
    for t, nxt in zip(pts, pts[1:]):
        c = sum(1 for lo, hi in intervals if lo <= t < hi)
        if c > 0:
            dur, n = out.get(c, (0, 0))
            out[c] = (dur + nxt - t, n + 1)
    return out


def test_concurrency_timeline_matches_brute_force(spark):
    import random

    from aleph2_contrib_spark.operators.events import concurrency_timeline

    rnd = random.Random(59)
    ivs = [
        (a, a + rnd.randint(-2, 40))
        for a in (rnd.randint(0, 300) for _ in range(120))
    ]
    ivs += [(5, 5), (7, 3)]  # empty + inverted: must contribute nothing
    df = spark.createDataFrame(ivs, "lo long, hi long")
    for nparts in (1, 4, 16):
        got = {
            r["concurrency"]: (r["total_duration"], r["n_segments"])
            for r in concurrency_timeline(df, "lo", "hi", nparts).collect()
        }
        assert got == _brute_concurrency(ivs), f"nparts={nparts}"


def test_concurrency_timeline_oracle_matches(spark):
    import duckdb

    from aleph2_contrib_spark.operators.events import (
        concurrency_timeline,
        concurrency_timeline_oracle_sql,
    )

    ivs = [(0, 10), (5, 15), (5, 15), (20, 21), (14, 22)]
    df = spark.createDataFrame(ivs, "lo long, hi long")
    got = {tuple(r) for r in concurrency_timeline(df, "lo", "hi").collect()}
    vals = ", ".join(f"({a}, {b})" for a, b in ivs)
    sql = concurrency_timeline_oracle_sql(
        f"SELECT c1 AS lo, c2 AS hi FROM (VALUES {vals}) t(c1, c2)"
    )
    assert got == {tuple(r) for r in duckdb.sql(sql).fetchall()}


def test_funnel_oracle_sql_escapes_quoted_steps():
    """Step names containing single quotes must not break or inject into
    the generated DuckDB oracle SQL (ADVICE r7)."""
    import duckdb

    from aleph2_contrib_spark.operators.events import funnel_windowed_oracle_sql

    sql = funnel_windowed_oracle_sql(
        "SELECT 'u1' AS u, 'it''s' AS t, 1000000 AS s", ["it's", "o'k"], 60
    )
    rows = duckdb.sql(sql).fetchall()
    assert [(r[0], r[1], r[2]) for r in rows] == [(0, "it's", 1), (1, "o'k", 0)]


def test_exact_ntile_formula_matches_sql_ntile(spark):
    """_exact_ntile_from_idx must reproduce SQL ntile() bit-for-bit for
    every (total, n_tiles) shape — uneven buckets, total < n, n = 1."""
    from aleph2_contrib_spark.operators.events import _exact_ntile_from_idx

    for total, n in [(10, 4), (7, 3), (3, 5), (12, 1), (1, 4), (100, 7)]:
        df = spark.createDataFrame([(i,) for i in range(total)], "idx long")
        got = {
            r["idx"]: r["t"]
            for r in df.select("idx", _exact_ntile_from_idx("idx", total, n).alias("t")).collect()
        }
        want = {
            r["idx"]: r["t"]
            for r in spark.sql(
                f"SELECT idx, ntile({n}) OVER (ORDER BY idx) AS t "
                f"FROM (SELECT explode(sequence(0, {total - 1})) AS idx)"
            ).collect()
        }
        assert got == want, (total, n)


def test_rfm_segments_distributed_path_matches_single(spark):
    """The multi-partition two-phase rank path must produce identical
    tiles to the 1-partition fast path (VERDICT r7: no unpartitioned
    ntile window anywhere)."""
    import random

    from aleph2_contrib_spark.operators.events import rfm_segments

    rnd = random.Random(7)
    rows = [
        (f"u{i%37}", f"2024-01-{1 + i % 28:02d} 00:00:{i % 60:02d}", rnd.uniform(0, 50))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "u string, ts string, v double")
    one = sorted(tuple(r) for r in rfm_segments(df, "u", "ts", "v", num_partitions=1).collect())
    many = sorted(tuple(r) for r in rfm_segments(df, "u", "ts", "v", num_partitions=6).collect())
    assert one == many


def test_rfm_segments_plan_has_no_unpartitioned_window(spark):
    from aleph2_contrib_spark.operators.events import rfm_segments

    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", 1.0), ("u2", "2024-01-02 00:00:00", 2.0)],
        "u string, ts string, v double",
    )
    plan = rfm_segments(df, "u", "ts", "v")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window [" in line:
            assert "__pid" in line, f"unpartitioned window:\n{line}"
    assert "ntile" not in plan


def test_hopping_window_agg_membership_and_oracle(spark, tmp_path):
    import duckdb

    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.events import (
        hopping_window_agg,
        hopping_window_oracle_sql,
    )

    # events at epoch 0s, 10s, 25s, 59s, 60s — window 60s, slide 20s
    rows = [(0, 1.0), (10_000_000, 2.0), (25_000_000, 4.0),
            (59_000_000, 8.0), (60_000_000, 16.0)]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "us long, v double"
    ).select(F.timestamp_micros(F.col("us")).alias("ts"), "v")
    got = {r["window_start_us"]: (r["n"], r["sum_v_c"])
           for r in hopping_window_agg(df, "ts", "v", 60, 20).collect()}
    # event at t=0 belongs to windows starting -40, -20, 0; t=60 to 20, 40, 60
    assert got[0] == (4, 1500)           # 0,10,25,59
    assert got[-40_000_000] == (2, 300)  # 0, 10
    assert got[20_000_000] == (3, 2800)  # 25, 59, 60
    assert got[60_000_000] == (1, 1600)  # 60 only
    # oracle parity on positive epochs (the documented domain)
    pos = spark.createDataFrame(
        [(86_400_000_000 + r[0], r[1]) for r in rows], "us long, v double"
    )
    p = str(tmp_path / "e.parquet")
    pos.coalesce(1).write.parquet(p)
    sdf = pos.select(F.timestamp_micros(F.col("us")).alias("ts"), "v")
    got2 = {tuple(r) for r in hopping_window_agg(sdf, "ts", "v", 60, 20).collect()}
    sql = hopping_window_oracle_sql(f"SELECT us AS t, v FROM '{p}/*.parquet'", 60, 20)
    want = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got2 == want


def test_survival_table_exact_and_oracle(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.events import (
        survival_table,
        survival_table_oracle_sql,
    )

    # durations: 2(ev),2(cens),3(ev),3(ev),5(cens),7(ev), NULL dropped
    rows = [(2, 1), (2, 0), (3, 1), (3, 1), (5, 0), (7, 1), (None, 1)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    got = {r["t"]: (r["n_at_risk"], r["n_events"], r["n_censored"])
           for r in survival_table(df, "dur", "ev").collect()}
    # at t=2: all 6 at risk; t=3: 4 remain; t=7: 1 remains
    assert got == {2: (6, 1, 1), 3: (4, 2, 0), 7: (1, 1, 0)}
    # censored-only times (5) emit no row but still count at risk upstream
    p = str(tmp_path / "s.parquet")
    df.coalesce(1).write.parquet(p)
    want = {tuple(r) for r in duckdb.sql(
        survival_table_oracle_sql(f"SELECT dur, ev FROM '{p}/*.parquet'")
    ).fetchall()}
    assert {tuple(r) for r in survival_table(df, "dur", "ev").collect()} == want


# -- activity_streaks ---------------------------------------------------------


def test_activity_streaks_hand_worked(spark):
    import datetime as dt

    from aleph2_contrib_spark.operators.events import activity_streaks

    def t(day, hour=0):
        return dt.datetime(1970, 1, day, hour)

    rows = [
        # user 1: days 1,2,3 then 5 -> streaks (0,3) and (4,1); repeats
        # within a day collapse
        (1, t(1)), (1, t(1, 12)), (1, t(2)), (1, t(3)), (1, t(5)),
        # user 2: single day
        (2, t(10)),
        # NULL user / NULL ts dropped
        (None, t(1)), (3, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"], r["streak_start_day"], r["streak_days"])
        for r in activity_streaks(df, "user_id", "ts").collect()
    }
    assert got == {(1, 0, 3), (1, 4, 1), (2, 9, 1)}


def test_activity_streaks_oracle_matches(spark, tmp_path):
    import datetime as dt
    import random

    import duckdb

    from aleph2_contrib_spark.operators.events import (
        activity_streaks,
        activity_streaks_oracle_sql,
    )

    rnd = random.Random(3)
    rows = [
        (rnd.randint(1, 12),
         dt.datetime(2024, 1, 1) + dt.timedelta(days=rnd.randint(0, 40),
                                                seconds=rnd.randint(0, 86399)))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    p = str(tmp_path / "ev.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in activity_streaks(df, "user_id", "ts").collect()}
    sql = activity_streaks_oracle_sql(
        f"SELECT user_id AS \"user\", ts FROM '{p}/*.parquet'", "user_id"
    )
    want = {tuple(x) for x in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) > 0


# -- peak_detection -----------------------------------------------------------


def test_peak_detection_hand_worked(spark):
    from aleph2_contrib_spark.operators.events import peak_detection

    rows = [
        # series u1 over ts 1..6: 1, 5, 2, 2, 7, 3 -> peaks at ts2 (5) and ts5 (7)
        (1, 1, 1.0), (1, 2, 5.0), (1, 3, 2.0), (1, 4, 2.0), (1, 5, 7.0), (1, 6, 3.0),
        # u2: monotone -> no interior peak; boundaries never peak
        (2, 1, 1.0), (2, 2, 2.0), (2, 3, 3.0),
        # u3: single point -> nothing
        (3, 9, 4.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    got = {(r["k"], r["ts"]): (r["v"], r["prev_value"], r["next_value"])
           for r in peak_detection(df, "k", "ts", "v").collect()}
    assert got == {(1, 2): (5.0, 1.0, 2.0), (1, 5): (7.0, 2.0, 3.0)}


def test_peak_detection_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.events import (
        peak_detection,
        peak_detection_oracle_sql,
    )

    rnd = random.Random(3)
    rows = [(rnd.randint(1, 6), t, rnd.randint(0, 9)) for t in range(500)]
    df = spark.createDataFrame(rows, "k long, ts long, v long")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in peak_detection(df, "k", "ts", "v").collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            peak_detection_oracle_sql(f"SELECT k, ts, v FROM '{p}/*.parquet'", "k", "ts", "v")
        ).fetchall()
    }
    assert got == want and len(got) > 0


# -- rolling_active_users -----------------------------------------------------


def test_rolling_active_users_hand_worked(spark):
    import datetime as dt

    import pytest

    from aleph2_contrib_spark.operators.events import rolling_active_users

    def t(day):
        return dt.datetime(1970, 1, day)

    rows = [
        (1, t(1)), (1, t(1)),   # u1 active day 0 (dup collapses)
        (2, t(2)),              # u2 active day 1
        (1, t(4)),              # u1 again day 3
        (None, t(1)), (3, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day"]: r["n_active"] for r in rolling_active_users(df, "user_id", "ts", 3).collect()}
    # day 0: {u1}; day 1: {u1,u2}; day 2: {u1,u2}; day 3: {u2,u1}
    # (days 4,5 would still cover u1's day-3 activity but are past
    # max(day)=3 and cut)
    assert got == {0: 1, 1: 2, 2: 2, 3: 2}
    with pytest.raises(ValueError, match="window_days"):
        rolling_active_users(df, "user_id", "ts", 0)


def test_rolling_active_users_oracle_matches(spark, tmp_path):
    import datetime as dt
    import random

    import duckdb

    from aleph2_contrib_spark.operators.events import (
        rolling_active_users,
        rolling_active_users_oracle_sql,
    )

    rnd = random.Random(13)
    rows = [
        (rnd.randint(1, 20),
         dt.datetime(2024, 3, 1) + dt.timedelta(days=rnd.randint(0, 25)))
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    p = str(tmp_path / "ev.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in rolling_active_users(df, "user_id", "ts", 7).collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            rolling_active_users_oracle_sql(
                f"SELECT user_id AS \"user\", ts FROM '{p}/*.parquet'", 7
            )
        ).fetchall()
    }
    assert got == want and len(got) > 0


# -- merge_intervals ----------------------------------------------------------


def test_merge_intervals_hand_worked(spark):
    from aleph2_contrib_spark.operators.events import merge_intervals

    rows = [
        # key 1: [1,5],[4,8] overlap; [8,9] touches -> one island [1,9];
        # [20,22] separate
        (1, 1, 5), (1, 4, 8), (1, 8, 9), (1, 20, 22),
        # contained interval [2,3] inside [1,9]
        (1, 2, 3),
        # key 2: invalid (e < s) dropped, single valid island
        (2, 10, 9), (2, 10, 12),
        # NULLs dropped
        (3, None, 5), (3, 4, None),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {(r["k"], r["start"], r["end"]): r["n_merged"]
           for r in merge_intervals(df, "k", "s", "e").collect()}
    assert got == {(1, 1, 9): 4, (1, 20, 22): 1, (2, 10, 12): 1}


def test_merge_intervals_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.events import (
        merge_intervals,
        merge_intervals_oracle_sql,
    )

    rnd = random.Random(23)
    rows = []
    for i in range(500):
        s = rnd.randint(0, 300)
        rows.append((rnd.randint(1, 8), s, s + rnd.randint(0, 25)))
    df = spark.createDataFrame(rows, "k long, s long, e long")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in merge_intervals(df, "k", "s", "e").collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            merge_intervals_oracle_sql(f"SELECT k, s, e FROM '{p}/*.parquet'", "k")
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_merge_intervals_float_bounds_floored_on_both_engines(spark, tmp_path):
    # regression for the documented bounds contract: float-typed bounds are
    # FLOORED explicitly on both engines — never an engine cast, because
    # Spark's long cast truncates toward zero while DuckDB's rounds
    # half-even, and that divergence silently changes which intervals touch.
    import duckdb

    from aleph2_contrib_spark.operators.events import (
        merge_intervals,
        merge_intervals_oracle_sql,
    )

    rows = [
        (1, 0.9, 2.5),    # floors to [0, 2]
        (1, 2.5, 4.1),    # floors to [2, 4] — touches -> merges with above
        (1, 5.5, 5.9),    # floors to [5, 5] — single point island
        (1, 7.99, 7.01),  # floors to [7, 7] — valid AFTER flooring (e >= s)
        (2, 0.5, 0.4),    # floors to [0, 0] — also valid after flooring
        (2, 2.4, 1.6),    # floors to [2, 1] — invalid: dropped
        (2, 3.5, 10.49),  # floors to [3, 10] (cast-rounding would give 4/10)
    ]
    df = spark.createDataFrame(rows, "k long, s double, e double")
    got = {
        tuple(r)
        for r in merge_intervals(df, "k", "s", "e").collect()
    }
    assert got == {
        (1, 0, 4, 2),
        (1, 5, 5, 1),
        (1, 7, 7, 1),
        (2, 0, 0, 1),
        (2, 3, 10, 1),
    }
    p = str(tmp_path / "fi.parquet")
    df.coalesce(1).write.parquet(p)
    want = {
        tuple(r)
        for r in duckdb.sql(
            merge_intervals_oracle_sql(f"SELECT k, s, e FROM '{p}/*.parquet'", "k")
        ).fetchall()
    }
    assert got == want


# -- time_weighted_avg --------------------------------------------------------


def test_time_weighted_avg_hand_worked(spark):
    from aleph2_contrib_spark.operators.events import time_weighted_avg

    rows = [
        # key 1: v=2.0 holds [0,10), v=4.0 holds [10,30) -> twa = (2*10+4*20)/30
        (1, 0, 2.0), (1, 10, 4.0), (1, 30, 6.0),
        # key 2: single point -> zero duration -> NULL
        (2, 5, 9.0),
        # key 3: duplicate ts: only the run's last gets weight
        (3, 0, 1.0), (3, 0, 3.0), (3, 10, 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = {r["k"]: (r["n_points"], r["dur_us"], r["twa_f6"])
           for r in time_weighted_avg(df, "k", "t", "v").collect()}
    assert got[1] == (3, 30, (2_000_000 * 10 + 4_000_000 * 20) // 30)
    assert got[2] == (1, 0, None)
    # key 3: v=1 weight 0, v=3 holds [0,10) -> twa = 3.0
    assert got[3] == (3, 10, 3_000_000)


def test_time_weighted_avg_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.events import (
        time_weighted_avg,
        time_weighted_avg_oracle_sql,
    )

    rnd = random.Random(53)
    rows = [
        (rnd.randint(1, 9), rnd.randint(0, 10_000_000), round(rnd.uniform(-5, 5), 4))
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in time_weighted_avg(df, "k", "t", "v").collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            time_weighted_avg_oracle_sql(f"SELECT k, t, v FROM '{p}/*.parquet'", "k")
        ).fetchall()
    }
    assert got == want and len(got) == 9


def test_changepoint_single_step_series(spark):
    from aleph2_contrib_spark.operators.events import changepoint_single

    rows = [Row(k="a", x=i, y=v) for i, v in enumerate([1, 1, 1, 9, 9, 9])]
    out = {r.k: r for r in changepoint_single(
        spark.createDataFrame(rows), "k", "x", "y").collect()}
    r = out["a"]
    # split exactly at the step: left [1,1,1], right [9,9,9], both SSE 0
    assert r.split_x == 3
    assert r.best_sse_f3 == 0
    # total SSE = sum((y - 5)^2) = 6*16 = 96 -> f3 = 96000
    assert r.total_sse_f3 == 96_000
    assert r.gain_f3 == 96_000
    assert r.n == 6


def test_changepoint_tie_break_and_min_n(spark):
    from aleph2_contrib_spark.operators.events import changepoint_single

    rows = [Row(k="flat", x=i, y=5) for i in range(4)]
    rows += [Row(k="single", x=0, y=7)]
    out = {r.k: r for r in changepoint_single(
        spark.createDataFrame(rows), "k", "x", "y").collect()}
    # all splits of a flat series cost 0 -> deterministic smallest split_x
    assert out["flat"].split_x == 1
    assert out["flat"].gain_f3 == 0
    # n=1 has no admissible split -> dropped
    assert "single" not in out


def test_changepoint_matches_bruteforce(spark):
    from aleph2_contrib_spark.operators.events import changepoint_single

    ys = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]

    def sse_f3(seg):
        m, s, q = len(seg), sum(seg), sum(v * v for v in seg)
        return (q * m - s * s) * 1000 // m  # non-negative -> floor==trunc

    # exact replay of the operator's f3 contract
    def cost_f3(t):
        L, R = ys[:t], ys[t:]
        mL, sL, qL = len(L), sum(L), sum(v * v for v in L)
        mR, sR, qR = len(R), sum(R), sum(v * v for v in R)
        num = (qL * mL - sL * sL) * mR + (qR * mR - sR * sR) * mL
        return num * 1000 // (mL * mR)

    exp_cost, exp_t = min((cost_f3(t), t) for t in range(1, len(ys)))
    rows = [Row(k="s", x=i, y=v) for i, v in enumerate(ys)]
    r = changepoint_single(spark.createDataFrame(rows), "k", "x", "y").collect()[0]
    assert (r.best_sse_f3, r.split_x) == (exp_cost, exp_t)
    assert r.total_sse_f3 == sse_f3(ys)
    assert r.gain_f3 == r.total_sse_f3 - r.best_sse_f3


def test_changepoint_property_vs_bruteforce(spark):
    """Hypothesis: random integer series — the operator's (split, costs)
    must equal an independent brute-force replay of the documented f3
    contract for every series, including negative values and ties."""
    from hypothesis import given, settings, strategies as st

    from aleph2_contrib_spark.operators.events import changepoint_single

    series = st.lists(st.integers(-50, 50), min_size=2, max_size=12)

    @settings(max_examples=20, deadline=None)
    @given(series)
    def run(ys):
        def cost_f3(t):
            L, R = ys[:t], ys[t:]
            mL, sL, qL = len(L), sum(L), sum(v * v for v in L)
            mR, sR, qR = len(R), sum(R), sum(v * v for v in R)
            num = (qL * mL - sL * sL) * mR + (qR * mR - sR * sR) * mL
            return num * 1000 // (mL * mR)

        exp_cost, exp_t = min((cost_f3(t), t) for t in range(1, len(ys)))
        m, s, q = len(ys), sum(ys), sum(v * v for v in ys)
        exp_total = (q * m - s * s) * 1000 // m
        rows = [Row(k="h", x=i, y=v) for i, v in enumerate(ys)]
        r = changepoint_single(
            spark.createDataFrame(rows), "k", "x", "y"
        ).collect()[0]
        assert (r.best_sse_f3, r.split_x, r.total_sse_f3) == (
            exp_cost,
            exp_t,
            exp_total,
        )

    run()


def test_seasonal_index_flat_and_spiked(spark):
    import datetime as dtm

    from aleph2_contrib_spark.operators.events import seasonal_index

    base = dtm.datetime(2024, 1, 1)  # a Monday
    rows = [Row(k="flat", ts=base + dtm.timedelta(days=i)) for i in range(14)]
    rows += [Row(k="spike", ts=base)] * 6 + [Row(k="spike", ts=base + dtm.timedelta(days=1))]
    out = {(r.k, r.dow): r for r in seasonal_index(
        spark.createDataFrame(rows), "k", "ts").collect()}
    # flat: every weekday twice -> share 2/14, index exactly 1e6
    flat = [v for (k, _), v in out.items() if k == "flat"]
    assert len(flat) == 7
    assert all(v.cnt == 2 and v.index_ppm == 1_000_000 for v in flat)
    # spike: Monday (Spark dow=2) has 6 of 7 events
    s = out[("spike", 2)]
    assert s.cnt == 6
    assert s.share_ppm == 6 * 1_000_000 // 7
    assert s.index_ppm == 6 * 7 * 1_000_000 // 7


def test_sequential_rules_hand_confidence(spark):
    import datetime as dtm

    from aleph2_contrib_spark.operators.events import sequential_rules

    T = dtm.datetime
    rows = []
    # 3 users view; 2 of them later purchase; 1 purchases BEFORE viewing
    for u, types in enumerate(
        [["view", "purchase"], ["view", "purchase"], ["view"],
         ["purchase", "view"]]
    ):
        for i, t in enumerate(types):
            rows.append(Row(user_id=u, ts=T(2024, 1, 1, i), event_type=t,
                            event_id=u * 10 + i))
    out = {(r.antecedent, r.consequent): r for r in sequential_rules(
        spark.createDataFrame(rows), "user_id", "ts", "event_type",
        "event_id", min_support=2).collect()}
    r = out[("view", "purchase")]
    # 4 users saw 'view'; 2 had a purchase strictly after first view
    assert r.support == 2 and r.support_ante == 4
    assert r.conf_ppm == 2 * 1_000_000 // 4
    # the reversed rule: 3 users with purchase; only u=3 views after
    assert ("purchase", "view") not in out  # support 1 < min_support


def test_allen_ladder_exclusive_and_exhaustive():
    """Every ordered bound combination lands in exactly one ladder arm
    (well-formed intervals): the CASE is a partition of the pair space."""
    import itertools

    from aleph2_contrib_spark.operators.events import _ALLEN_LADDER

    def matches(xs, xe, ys, ye):
        env = {"xs": xs, "xe": xe, "ys": ys, "ye": ye}
        hits = []
        for name, pred in _ALLEN_LADDER:
            py = (
                pred.format(xs="xs", xe="xe", ys="ys", ye="ye")
                .replace("AND", "and")
                .replace("=", "==")
                .replace("<==", "<=")
                .replace(">==", ">=")
            )
            if eval(py, {}, env):  # noqa: S307 - test-local arithmetic
                hits.append(name)
        return hits

    # enumerate all interval pairs over a 5-point domain (incl. points)
    for xs, xe in itertools.combinations_with_replacement(range(5), 2):
        for ys, ye in itertools.combinations_with_replacement(range(5), 2):
            hits = matches(xs, xe, ys, ye)
            assert len(hits) >= 1, (xs, xe, ys, ye)
            # first-match-wins makes the ladder deterministic even where
            # degenerate point intervals satisfy several predicates; for
            # PROPER intervals the match must be unique
            if xs < xe and ys < ye:
                assert len(hits) == 1, (xs, xe, ys, ye, hits)


def test_allen_census_counts_and_shares(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.events import allen_relation_census

    rows = [
        Row(xs=1, xe=2, ys=3, ye=4),   # precedes
        Row(xs=1, xe=3, ys=3, ye=4),   # meets
        Row(xs=1, xe=3, ys=2, ye=4),   # overlaps
        Row(xs=2, xe=3, ys=1, ye=4),   # during
        Row(xs=1, xe=4, ys=1, ye=4),   # equals
        Row(xs=5, xe=6, ys=1, ye=2),   # preceded_by
        Row(xs=None, xe=1, ys=0, ye=2),  # NULL bound -> dropped
    ]
    out = {
        r.relation: (r.n, r.share_ppm)
        for r in allen_relation_census(
            spark.createDataFrame(rows), "xs", "xe", "ys", "ye"
        ).collect()
    }
    assert out == {
        "precedes": (1, 166666),
        "meets": (1, 166666),
        "overlaps": (1, 166666),
        "during": (1, 166666),
        "equals": (1, 166666),
        "preceded_by": (1, 166666),
    }


def test_cep_strict_sequence_contiguity_and_window(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.events import cep_strict_sequence

    rows = [
        # u1: clean click->view->purchase inside window
        Row(k="u1", ts=100, typ="click", i=1),
        Row(k="u1", ts=200, typ="view", i=2),
        Row(k="u1", ts=300, typ="purchase", i=3),
        # u2: interleaved error breaks strict contiguity
        Row(k="u2", ts=100, typ="click", i=4),
        Row(k="u2", ts=200, typ="error", i=5),
        Row(k="u2", ts=300, typ="view", i=6),
        Row(k="u2", ts=400, typ="purchase", i=7),
        # u3: contiguous but span exceeds the window
        Row(k="u3", ts=100, typ="click", i=8),
        Row(k="u3", ts=200, typ="view", i=9),
        Row(k="u3", ts=5000, typ="purchase", i=10),
    ]
    df = spark.createDataFrame(rows).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "typ", "i"
    )
    out = {
        r.key: r.n_matches
        for r in cep_strict_sequence(
            df, "k", "ts", "typ", "i", ["click", "view", "purchase"], 1000
        ).collect()
    }
    assert out == {"u1": 1}


def test_diff_in_diff_exact_cells_and_null_policy(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.events import diff_in_diff

    rows = [
        # treat pre: 1.00, 2.00 -> mean 150c ; treat post: 4.00 -> 400c
        Row(treat=True, post=False, value=1.0),
        Row(treat=True, post=False, value=2.0),
        Row(treat=True, post=True, value=4.0),
        # ctrl pre: 1.00 -> 100c ; ctrl post: 1.50, NULL -> 150c (null out)
        Row(treat=False, post=False, value=1.0),
        Row(treat=False, post=True, value=1.5),
        Row(treat=False, post=True, value=None),
    ]
    r = diff_in_diff(
        spark.createDataFrame(rows), "treat", "post", "value"
    ).collect()[0]
    assert (r.n_treat_pre, r.mean_treat_pre_c) == (2, 150)
    assert (r.n_treat_post, r.mean_treat_post_c) == (1, 400)
    assert (r.n_ctrl_pre, r.mean_ctrl_pre_c) == (1, 100)
    assert (r.n_ctrl_post, r.mean_ctrl_post_c) == (1, 150)
    # DiD = (400-150) - (150-100) = 200
    assert r.did_cents == 200
    # empty cell -> NULL mean and NULL DiD, not zero
    r2 = diff_in_diff(
        spark.createDataFrame(rows[:2] + rows[3:]), "treat", "post", "value"
    ).collect()[0]
    assert r2.n_treat_post == 0 and r2.mean_treat_post_c is None
    assert r2.did_cents is None


def test_shapley_attribution_worked_example_and_efficiency(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.events import shapley_attribution

    # 3 converters: u1 touched {A}, u2 touched {A,B}, u3 touched {B},
    # u4 converts with no touches (leaves the game), u5 never converts
    rows = []
    def ev(u, t, ty):
        rows.append(Row(u=u, t=t, ty=ty))
    ev("u1", 10, "A"); ev("u1", 100, "buy")
    ev("u2", 10, "A"); ev("u2", 20, "B"); ev("u2", 100, "buy")
    ev("u3", 10, "B"); ev("u3", 100, "buy")
    ev("u4", 100, "buy"); ev("u4", 200, "A")   # touch AFTER conversion
    ev("u5", 10, "A")
    df = spark.createDataFrame(rows).select(
        "u", F.col("t").cast("timestamp").alias("t"), "ty"
    )
    out = {
        r.channel: (r.phi_nf, r.n_factorial, r.v_full, r.share_ppm)
        for r in shapley_attribution(df, "u", "t", "ty", "buy", ["A", "B"]).collect()
    }
    # v({A})=1 (u1), v({B})=1 (u3), v({A,B})=3; n=2, n!=2
    # φ_A·2 = 1!(v(A)-v(∅)) ... sizes: |S|=0 w=1, |S|=1 w=1
    # φ_A·2 = (v(A)-v(∅)) + (v(AB)-v(B)) = 1 + 2 = 3
    # φ_B·2 = (v(B)-v(∅)) + (v(AB)-v(A)) = 1 + 2 = 3
    assert out == {
        "A": (3, 2, 3, 500_000),
        "B": (3, 2, 3, 500_000),
    }
    # efficiency: Σ φ_nf = n! · v(full)
    assert sum(v[0] for v in out.values()) == 2 * 3


def test_ohlc_bars_order_and_null_policy(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.events import ohlc_bars

    rows = [
        Row(k="x", t=10, i=1, v=5.00),
        Row(k="x", t=20, i=2, v=9.00),
        Row(k="x", t=20, i=3, v=1.00),   # same second: id breaks the tie
        Row(k="x", t=30, i=4, v=None),   # NULL excluded entirely
        Row(k="x", t=3700, i=5, v=7.00),  # next hour bucket
    ]
    df = spark.createDataFrame(rows).select(
        "k", F.col("t").cast("timestamp").alias("t"), "i", "v"
    )
    out = {
        (r.k, r.bucket_start): (r.n, r.open_c, r.high_c, r.low_c, r.close_c, r.vol_c)
        for r in ohlc_bars(df, "k", "t", "i", "v", 3600).collect()
    }
    assert out[("x", 0)] == (3, 500, 900, 100, 100, 1500)
    assert out[("x", 3600)] == (1, 700, 700, 700, 700, 700)


def test_max_drawdown_worked_example(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.events import max_drawdown

    rows = [
        # series: 10, 8, 12, 4, 9 -> running max 10,10,12,12,12
        # drawdowns 0,2,0,8,3 -> max dd 8 (800c), trough value 4
        Row(k="a", o=i, v=float(x))
        for i, x in enumerate([10, 8, 12, 4, 9])
    ] + [
        Row(k="up", o=i, v=float(x)) for i, x in enumerate([1, 2, 3])
    ] + [Row(k="a", o=99, v=None)]
    out = {
        r.k: (r.n, r.peak_c, r.max_drawdown_c, r.trough_after_peak_c)
        for r in max_drawdown(
            spark.createDataFrame(rows), "k", "o", "v"
        ).collect()
    }
    assert out["a"] == (5, 1200, 800, 400)
    # monotone series -> zero drawdown, trough = first attaining row
    assert out["up"] == (3, 300, 0, 100)
