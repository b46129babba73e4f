"""Pipeline engine tests (SURVEY §2.4), modeled on the reference's
TestEnrichmentPipelineService / grouping e2e shape
(TestHadoopTechnologyService_grouping.java:187-202 — grouped stage with and
without ungrouped 'bookend' stages)."""

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aleph2_contrib_spark.plans.pipeline import (
    EnrichmentModule,
    PassthroughModule,
    Pipeline,
    Stage,
)


class AddOne(EnrichmentModule):
    def on_object_batch(self, batch):
        out = batch.copy()
        out["n"] = out["n"] + 1
        return out


class SumPerKey(EnrichmentModule):
    def on_stage_initialize(self, grouping_key=None):
        self.key = grouping_key or {}
        self.total = 0
        self.count = 0

    def on_object_batch(self, batch):
        self.total += int(batch["n"].sum())
        self.count += len(batch)
        return None

    def on_stage_complete(self):
        return pd.DataFrame({"k": [self.key.get("k")], "total": [self.total], "cnt": [self.count]})


class TailEmitter(EnrichmentModule):
    """Checks lifecycle: emits one marker row from on_stage_complete."""

    def on_stage_initialize(self, grouping_key=None):
        self.seen = 0

    def on_object_batch(self, batch):
        self.seen += len(batch)
        return batch

    def on_stage_complete(self):
        return pd.DataFrame({"k": ["__tail__"], "n": [self.seen]})


@pytest.fixture()
def data(spark):
    return spark.createDataFrame(
        [Row(k="a", n=1), Row(k="a", n=2), Row(k="b", n=3), Row(k="b", n=4), Row(k="c", n=5)]
    )


def test_map_stage(spark, data):
    pipe = Pipeline([Stage(name="m", module=AddOne())])
    out = pipe.run(spark, {"in": data})["m"]
    assert sorted(r["n"] for r in out.collect()) == [2, 3, 4, 5, 6]


def test_stage_chaining_terminal_only(spark, data):
    pipe = Pipeline(
        [
            Stage(name="m1", module=AddOne()),
            Stage(name="m2", dependencies=("m1",), module=AddOne()),
        ]
    )
    outs = pipe.run(spark, {"in": data})
    # P12: only the terminal stage is emitted
    assert set(outs) == {"m2"}
    assert sorted(r["n"] for r in outs["m2"].collect()) == [3, 4, 5, 6, 7]


def test_grouped_stage_clone_per_key(spark, data):
    pipe = Pipeline(
        [
            Stage(
                name="g",
                module=SumPerKey(),
                grouping_fields=("k",),
                output_schema="k string, total bigint, cnt bigint",
            )
        ]
    )
    out = {r["k"]: (r["total"], r["cnt"]) for r in pipe.run(spark, {"in": data})["g"].collect()}
    assert out == {"a": (3, 2), "b": (7, 2), "c": (5, 1)}


def test_grouping_with_bookend_stages(spark, data):
    """Reference e2e shape: ungrouped map → grouped reduce → ungrouped map."""
    pipe = Pipeline(
        [
            Stage(name="pre", module=AddOne()),
            Stage(
                name="g",
                dependencies=("pre",),
                module=SumPerKey(),
                grouping_fields=("k",),
                output_schema="k string, total bigint, cnt bigint",
            ),
            Stage(
                name="post",
                dependencies=("g",),
                transform=lambda df: df.withColumn("total", F.col("total") * 10),
            ),
        ]
    )
    out = {r["k"]: r["total"] for r in pipe.run(spark, {"in": data})["post"].collect()}
    assert out == {"a": 50, "b": 90, "c": 60}


def test_multi_input_union_and_dollar_inputs(spark, data):
    other = spark.createDataFrame([Row(k="z", n=100)])
    pipe = Pipeline([Stage(name="m", dependencies=("$inputs",), module=PassthroughModule())])
    out = pipe.run(spark, {"a": data, "b": other})["m"]
    assert out.count() == 6  # P8: $inputs = union of all inputs


def test_dag_two_branches_union(spark, data):
    """P7: a stage with two stage dependencies unions them."""
    pipe = Pipeline(
        [
            Stage(name="b1", module=AddOne()),
            Stage(name="b2", transform=lambda df: df.filter(F.col("k") == "a")),
            Stage(name="join", dependencies=("b1", "b2"), module=PassthroughModule()),
        ]
    )
    out = pipe.run(spark, {"in": data})
    assert set(out) == {"join"}
    assert out["join"].count() == 7  # 5 + 2


def test_sql_stage(spark, data):
    pipe = Pipeline(
        [
            Stage(name="src", module=AddOne()),
            Stage(
                name="agg",
                dependencies=("src",),
                sql="SELECT k, sum(n) AS s FROM src GROUP BY k",
            ),
        ]
    )
    out = {r["k"]: r["s"] for r in pipe.run(spark, {"in": data})["agg"].collect()}
    assert out == {"a": 5, "b": 9, "c": 6}


def test_lifecycle_on_stage_complete(spark, data):
    pipe = Pipeline([Stage(name="t", module=TailEmitter())])
    rows = pipe.run(spark, {"in": data})["t"].collect()
    tails = [r for r in rows if r["k"] == "__tail__"]
    # one tail marker per partition-task that saw rows; total seen == 5
    assert sum(r["n"] for r in tails) == 5
    assert len([r for r in rows if r["k"] != "__tail__"]) == 5


def test_sampling_and_test_limit(spark, data):
    pipe = Pipeline([Stage(name="m", module=PassthroughModule(), test_record_limit=2)])
    assert pipe.run(spark, {"in": data})["m"].count() == 2


def test_unresolvable_dependency_raises(spark, data):
    pipe = Pipeline([Stage(name="m", dependencies=("nope",), module=PassthroughModule())])
    with pytest.raises(ValueError, match="unresolvable"):
        pipe.run(spark, {"in": data})


def test_observe_stats(spark, data):
    pipe = Pipeline([Stage(name="m", module=AddOne())])
    out = pipe.run(spark, {"in": data}, observe_stats=True)["m"]
    assert out.count() == 5


class PartialSum(EnrichmentModule):
    """Combiner/reducer pair for P6: emits one (k, n) partial per key group;
    folding partials of partials is associative, so reduce(combine(x)) ==
    reduce(x)."""

    def on_object_batch(self, batch):
        return pd.DataFrame({"k": [batch["k"].iloc[0]], "n": [int(batch["n"].sum())]})


def test_combiner_partial_agg_matches_direct(spark, data):
    schema = "k string, n long"

    def build(with_combiner):
        return Pipeline(
            [
                Stage(
                    name="sum",
                    module=PartialSum(),
                    combine_module=PartialSum() if with_combiner else None,
                    combine_schema=schema if with_combiner else None,
                    grouping_fields=["k"],
                    output_schema=schema,
                )
            ]
        )

    direct = {r["k"]: r["n"] for r in build(False).run(spark, {"in": data})["sum"].collect()}
    combined = {r["k"]: r["n"] for r in build(True).run(spark, {"in": data})["sum"].collect()}
    assert direct == combined == {"a": 3, "b": 7, "c": 5}


def test_combiner_reduces_shuffle_rows(spark):
    # 1000 rows, 2 keys, many partitions: the combiner's map-side output is
    # at most (partitions x keys) partial rows, far fewer than the input.
    df = spark.range(1000).select(
        (F.col("id") % 2).cast("string").alias("k"), F.lit(1).alias("n")
    ).repartition(8)
    schema = "k string, n long"
    seen = df.sparkSession.sparkContext.accumulator(0)

    class CountingCombiner(PartialSum):
        def on_object_batch(self, batch):
            seen.add(len(batch))
            return super().on_object_batch(batch)

    pipe = Pipeline(
        [
            Stage(
                name="sum",
                module=PartialSum(),
                combine_module=CountingCombiner(),
                combine_schema=schema,
                grouping_fields=["k"],
                output_schema=schema,
            )
        ]
    )
    out = {r["k"]: r["n"] for r in pipe.run(spark, {"in": df})["sum"].collect()}
    assert out == {"0": 500, "1": 500}
    assert seen.value == 1000  # combiner saw every input row map-side


class NeedsKeyModule(PassthroughModule):
    def validate_module(self, stage):
        if not stage.grouping_fields:
            return ["requires grouping_fields"]
        return []


def test_validate_module_fails_before_execution(spark, data):
    pipe = Pipeline([Stage(name="m", module=NeedsKeyModule())])
    with pytest.raises(ValueError, match="requires grouping_fields"):
        pipe.run(spark, {"in": data})


def test_validate_module_passes_with_key(spark, data):
    pipe = Pipeline(
        [Stage(name="m", module=NeedsKeyModule(), grouping_fields=["k"])]
    )
    assert "m" in pipe.run(spark, {"in": data})
