"""Declarative analytic job spec + runner — the Spark-native analogue of the
reference's bucket-driven job launch (SparkTechnologyService.startAnalyticJob
→ topology main(), SURVEY §3.2).

A job names its inputs (table paths or existing views), a pipeline (stages:
module / SQL / transform, with dependencies and grouping), and outputs
(temp view, parquet path, or time-partitioned bucket table). Where the
reference spawns spark-submit processes per job (SparkTechnologyUtils
createSparkJob:122-199), here a job is just driver-side Python in the
current session — no process orchestration, Catalyst sees the whole plan.

The three reference topologies map to degenerate job specs:
- SparkPassthroughTopology  → no stages (identity) + one output
- SparkSqlTopology          → single SQL stage over registered inputs
- batch enrichment topology → module stages with dependencies/grouping
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession

from aleph2_contrib_spark.plans.pipeline import Pipeline, Stage


@dataclass(frozen=True)
class JobInput:
    name: str  # temp-view / pipeline input name
    path: str | None = None  # parquet path; None = pre-registered view
    fmt: str = "parquet"  # parquet | json
    time_min: str | None = None  # S9 time-sliced input pruning
    time_max: str | None = None
    time_field: str | None = None
    test_record_limit: int | None = None  # S6
    sample_fraction: float | None = None  # P9 (spark.aleph2_subsample)


@dataclass(frozen=True)
class JobOutput:
    stage: str  # terminal stage name ("*" = single terminal)
    view: str | None = None  # register result as temp view
    path: str | None = None  # write parquet here
    mode: str = "overwrite"


@dataclass
class AnalyticJob:
    name: str
    inputs: Sequence[JobInput] = ()
    stages: Sequence[Stage] = ()
    outputs: Sequence[JobOutput] = ()

    def run(self, spark: SparkSession) -> dict[str, DataFrame]:
        from pyspark.sql import functions as F

        in_dfs: dict[str, DataFrame] = {}
        for ji in self.inputs:
            if ji.path is None:
                df = spark.table(ji.name)
            elif ji.fmt == "json":
                df = spark.read.json(ji.path)
            else:
                df = spark.read.parquet(ji.path)
            if ji.time_field:
                if ji.time_min is not None:
                    df = df.filter(F.col(ji.time_field) >= F.lit(ji.time_min))
                if ji.time_max is not None:
                    df = df.filter(F.col(ji.time_field) < F.lit(ji.time_max))
            if ji.sample_fraction is not None:
                df = df.sample(fraction=ji.sample_fraction, seed=42)
            if ji.test_record_limit is not None:
                df = df.limit(ji.test_record_limit)
            df.createOrReplaceTempView(ji.name)
            in_dfs[ji.name] = df

        pipe = Pipeline(list(self.stages) or [Stage(name="passthrough")])
        results = pipe.run(spark, in_dfs)

        out: dict[str, DataFrame] = {}
        for jo in self.outputs:
            if jo.stage == "*" and len(results) == 1:
                df = next(iter(results.values()))
            else:
                df = results[jo.stage]
            if jo.view:
                df.createOrReplaceTempView(jo.view)
            if jo.path:
                df.write.mode(jo.mode).parquet(jo.path)
            out[jo.stage] = df
        return out or results


def sql_job(name: str, sql: str, inputs: Sequence[JobInput], **out_kw) -> AnalyticJob:
    """SparkSqlTopology shape: registered inputs + one SQL string."""
    return AnalyticJob(
        name=name,
        inputs=inputs,
        stages=[Stage(name="sql", sql=sql)],
        outputs=[JobOutput(stage="sql", **out_kw)] if out_kw else (),
    )


def passthrough_job(name: str, inputs: Sequence[JobInput], **out_kw) -> AnalyticJob:
    """SparkPassthroughTopology shape: union of inputs re-emitted."""
    return AnalyticJob(
        name=name,
        inputs=inputs,
        stages=[Stage(name="passthrough")],
        outputs=[JobOutput(stage="passthrough", **out_kw)] if out_kw else (),
    )
