"""Apriori frequent-itemset mining (operators/itemsets.py) — exact
equivalence against a brute-force subset enumeration on small data, plus
validation and pruning behavior."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from aleph2_contrib_spark.operators.itemsets import frequent_itemsets


def _brute_force(baskets: dict[int, set[str]], minsup: int, max_size: int):
    out = set()
    for k in range(1, max_size + 1):
        counts: dict[tuple, int] = {}
        for items in baskets.values():
            for combo in combinations(sorted(items), k):
                counts[combo] = counts.get(combo, 0) + 1
        for combo, n in counts.items():
            if n >= minsup:
                padded = combo + (None,) * (3 - k)
                out.add((k, *padded, n))
    return out


def _rows(df):
    return {
        (r["size"], r["i1"], r["i2"], r["i3"], r["support"]) for r in df.collect()
    }


@pytest.fixture(scope="module")
def baskets():
    # 12 transactions, deliberately overlapping item sets
    return {
        1: {"a", "b", "c"},
        2: {"a", "b", "c", "d"},
        3: {"a", "b"},
        4: {"a", "c"},
        5: {"b", "c"},
        6: {"a", "b", "c"},
        7: {"d", "e"},
        8: {"a", "d"},
        9: {"b", "d"},
        10: {"a", "b", "d"},
        11: {"c"},
        12: {"e"},
    }


def _df(spark, baskets):
    rows = [(t, i) for t, items in baskets.items() for i in items]
    # add duplicate (txn, item) rows: set semantics must collapse them
    rows += rows[:5]
    return spark.createDataFrame(rows, "txn_id int, item string")


@pytest.mark.parametrize("minsup,max_size", [(2, 3), (3, 3), (4, 2), (1, 1)])
def test_matches_brute_force(spark, baskets, minsup, max_size):
    df = _df(spark, baskets)
    got = _rows(
        frequent_itemsets(df, "txn_id", "item", minsup=minsup, max_size=max_size)
    )
    assert got == _brute_force(baskets, minsup, max_size)


def test_itemsets_are_canonical(spark, baskets):
    out = frequent_itemsets(_df(spark, baskets), "txn_id", "item", minsup=2)
    for r in out.collect():
        if r["size"] >= 2:
            assert r["i1"] < r["i2"]
        if r["size"] == 3:
            assert r["i2"] < r["i3"]
        if r["size"] < 3:
            assert r["i3"] is None
        if r["size"] < 2:
            assert r["i2"] is None


def test_high_minsup_prunes_everything(spark, baskets):
    out = frequent_itemsets(_df(spark, baskets), "txn_id", "item", minsup=100)
    assert out.count() == 0


def test_validation(spark, baskets):
    df = _df(spark, baskets)
    with pytest.raises(ValueError, match="minsup"):
        frequent_itemsets(df, "txn_id", "item", minsup=0)
    with pytest.raises(ValueError, match="max_size"):
        frequent_itemsets(df, "txn_id", "item", max_size=4)


def _brute_rules(baskets: dict[int, set[str]], minsup: int, min_conf_ppm: int = 0):
    n = len(baskets)
    sup: dict[tuple, int] = {}
    for k in (1, 2, 3):
        for items in baskets.values():
            for combo in combinations(sorted(items), k):
                sup[combo] = sup.get(combo, 0) + 1
    freq = {c: s for c, s in sup.items() if s >= minsup}
    out = set()
    for combo, s in freq.items():
        if len(combo) < 2:
            continue
        for asize in range(1, len(combo)):
            for ante in combinations(combo, asize):
                cons = tuple(i for i in combo if i not in ante)
                sa, sc = freq.get(ante), freq.get(cons)
                if sa is None or sc is None:
                    continue  # downward closure means this never fires
                conf = 1_000_000 * s // sa
                lift = 1_000_000 * n * s // (sa * sc)
                if conf >= min_conf_ppm:
                    out.add((",".join(ante), ",".join(cons), s, sa, sc, conf, lift))
    return out


@pytest.mark.parametrize("minsup,min_conf", [(2, 0), (3, 0), (2, 500_000)])
def test_association_rules_match_brute_force(spark, baskets, minsup, min_conf):
    from aleph2_contrib_spark.operators.itemsets import association_rules

    got = {
        (
            r["antecedent"],
            r["consequent"],
            r["sup_rule"],
            r["sup_ante"],
            r["sup_cons"],
            r["conf_ppm"],
            r["lift_ppm"],
        )
        for r in association_rules(
            _df(spark, baskets), "txn_id", "item", minsup=minsup, min_conf_ppm=min_conf
        ).collect()
    }
    assert got == _brute_rules(baskets, minsup, min_conf)


def test_association_rules_lift_sanity(spark, baskets):
    from aleph2_contrib_spark.operators.itemsets import association_rules

    rows = association_rules(_df(spark, baskets), minsup=2).collect()
    assert rows
    for r in rows:
        # confidence is a probability: 0 < conf <= 1
        assert 0 < r["conf_ppm"] <= 1_000_000
        # P(A∪C) <= min(P(A), P(C))
        assert r["sup_rule"] <= min(r["sup_ante"], r["sup_cons"])


def test_frequent_itemsets_driver_matches_distributed(spark):
    import random

    from aleph2_contrib_spark.operators.itemsets import frequent_itemsets

    rng = random.Random(17)
    rows = [
        (t, f"item_{rng.randrange(8)}")
        for t in range(30)
        for _ in range(rng.randrange(1, 6))
    ]
    df = spark.createDataFrame(rows, "txn_id int, item string")
    for minsup, max_size in ((1, 3), (2, 3), (3, 2), (2, 1)):
        fast = {
            tuple(r)
            for r in frequent_itemsets(df, minsup=minsup, max_size=max_size).collect()
        }
        slow = {
            tuple(r)
            for r in frequent_itemsets(
                df, minsup=minsup, max_size=max_size, driver_cap_rows=0
            ).collect()
        }
        assert fast == slow, (minsup, max_size)
    # empty input
    empty = spark.createDataFrame([], "txn_id int, item string")
    assert frequent_itemsets(empty, minsup=2).count() == 0
