"""As-of join operator tests (union+window formulation)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aleph2_contrib_spark.operators.joins import asof_join


def ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", t=ts(0), px=10.0),
            Row(sym="A", t=ts(10), px=11.0),
            Row(sym="A", t=ts(20), px=12.0),
            Row(sym="B", t=ts(5), px=100.0),
        ]
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", t=ts(4), qty=1),    # matches px=10 @0
            Row(sym="A", t=ts(10), qty=2),   # inclusive: px=11 @10
            Row(sym="A", t=ts(99), qty=3),   # latest: px=12 @20
            Row(sym="B", t=ts(1), qty=4),    # before any quote -> null
            Row(sym="C", t=ts(1), qty=5),    # key never quoted -> null
        ]
    )


def test_asof_backward_inclusive(spark, trades, quotes):
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="t", value_cols=["px"])
    got = {(r["sym"], r["qty"]): r["px"] for r in out.collect()}
    assert got == {("A", 1): 10.0, ("A", 2): 11.0, ("A", 3): 12.0, ("B", 4): None, ("C", 5): None}
    assert out.count() == trades.count()  # left-preserving


def test_asof_tolerance(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        value_cols=["px"], tolerance=F.expr("INTERVAL 15 SECONDS"),
    )
    got = {(r["sym"], r["qty"]): r["px"] for r in out.collect()}
    # qty=3 trade at t=99 is 79s after the px=12 quote -> nulled by tolerance
    assert got[("A", 3)] is None
    assert got[("A", 1)] == 10.0


def test_asof_matched_ts_exposed(spark, trades, quotes):
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", value_cols=[])
    row = {r["qty"]: r["matched_ts"] for r in out.collect()}
    assert row[3] == ts(20)
    assert row[4] is None
