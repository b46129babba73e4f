"""U2 JS-job shim: real Arrow/lifecycle plumbing, injected engine."""

import pandas as pd
import pytest
from pyspark.sql import Row

from aleph2_contrib_spark.functions.js_jobs import JsEnrichmentModule
from aleph2_contrib_spark.plans.pipeline import Pipeline, Stage

SCRIPT = """
function transform(rec) {
    if (rec.value <= 1) return null;
    rec.flagged = true;
    return rec;
}
"""


def fake_js_evaluator(script, records, entry_point):
    """Deterministic stand-in for an embedded JS engine, applying the
    semantics of SCRIPT above (drop value<=1, add flagged). Marked fake:
    tests exercise the module plumbing, not a JS parser."""
    assert f"function {entry_point}" in script  # engine gets source + name
    out = []
    for r in records:
        if r["value"] is None or r["value"] <= 1:
            continue
        out.append({**r, "flagged": True})
    return out


def _events(spark):
    return spark.createDataFrame(
        [Row(event_id=i, value=float(i % 4)) for i in range(40)]
    )


def test_js_module_in_pipeline(spark):
    mod = JsEnrichmentModule({"script": SCRIPT}, evaluator=fake_js_evaluator)
    pipe = Pipeline(
        [
            Stage(
                name="js",
                dependencies=("$inputs",),
                module=mod,
                output_schema="event_id long, value double, flagged boolean",
            )
        ]
    )
    out = pipe.run(spark, {"events": _events(spark)})["js"]
    rows = out.collect()
    assert len(rows) == 20  # values 2.0 and 3.0 survive
    assert all(r.flagged for r in rows)
    assert all(r.value > 1 for r in rows)


def test_js_module_validation(spark):
    bad = JsEnrichmentModule({}, evaluator=fake_js_evaluator)
    stage = Stage(name="js", module=bad, output_schema=None)
    errs = bad.validate_module(stage)
    assert any("script" in e for e in errs) and any("output_schema" in e for e in errs)


def test_js_module_default_engine_fails_with_guidance(spark):
    mod = JsEnrichmentModule({"script": SCRIPT})
    with pytest.raises(NotImplementedError, match="JavaScript engine"):
        mod.on_object_batch(pd.DataFrame([{"value": 5.0}]))


def test_js_records_see_real_nulls_not_nan(spark):
    """Arrow nulls decode to pandas NaN; scripts ported from the
    reference test `rec.field == null` — the module must marshal NaN/NaT
    back to None before handing records to the engine."""
    def classify(script, records, entry_point):
        # runs on executors — report what the engine SAW through the output
        return [
            {
                "event_id": r["event_id"],
                "saw_none": r["value"] is None,
                "saw_nan": isinstance(r["value"], float) and r["value"] != r["value"],
            }
            for r in records
        ]

    mod = JsEnrichmentModule({"script": SCRIPT}, evaluator=classify)
    pipe = Pipeline([
        Stage(name="js", dependencies=("$inputs",), module=mod,
              output_schema="event_id long, saw_none boolean, saw_nan boolean")
    ])
    df = spark.createDataFrame([(1, 2.0), (2, None)], "event_id long, value double")
    got = {r.event_id: (r.saw_none, r.saw_nan) for r in pipe.run(spark, {"e": df})["js"].collect()}
    assert got == {1: (False, False), 2: (True, False)}


def test_ported_script_adapter_matches_js_semantics(spark):
    """U2 migration path: SCRIPT ported line-for-line to Python through
    ported_script_evaluator produces exactly what the JS engine would —
    same drops, same added field, same pipeline wiring."""
    from aleph2_contrib_spark.functions.js_jobs import ported_script_evaluator

    def transform(rec):  # the Python port of SCRIPT
        if rec["value"] is None or rec["value"] <= 1:
            return None
        return {**rec, "flagged": True}

    mod = JsEnrichmentModule(
        {"script": SCRIPT}, evaluator=ported_script_evaluator(transform)
    )
    pipe = Pipeline(
        [
            Stage(
                name="js",
                dependencies=("$inputs",),
                module=mod,
                output_schema="event_id long, value double, flagged boolean",
            )
        ]
    )
    out = pipe.run(spark, {"events": _events(spark)})["js"]
    rows = out.collect()
    assert len(rows) == 20 and all(r.flagged and r.value > 1 for r in rows)


def test_ported_script_module_direct(spark):
    """PortedScriptModule needs no placeholder script: the record function
    IS the module; nulls arrive as real None (the JS contract)."""
    from aleph2_contrib_spark.functions.js_jobs import PortedScriptModule

    def transform(rec):
        if rec["value"] is None:
            return {"event_id": rec["event_id"], "value": -1.0}
        return {"event_id": rec["event_id"], "value": rec["value"] * 10}

    mod = PortedScriptModule(transform)
    pipe = Pipeline(
        [
            Stage(
                name="p",
                dependencies=("$inputs",),
                module=mod,
                output_schema="event_id long, value double",
            )
        ]
    )
    df = spark.createDataFrame([(1, 2.0), (2, None)], "event_id long, value double")
    got = {r.event_id: r.value for r in pipe.run(spark, {"e": df})["p"].collect()}
    assert got == {1: 20.0, 2: -1.0}
    clone = mod.clone_for_new_grouping()
    assert clone is not mod and clone.fn is transform
    errs = mod.validate_module(Stage(name="p", module=mod, output_schema=None))
    assert errs and "output_schema" in errs[0]
