"""U2 JavaScript jobs — the reference's script-engine extension point,
re-expressed as an EnrichmentModule with an INJECTED JS engine.

The reference runs user JavaScript inside the JVM via Nashorn
(SparkJsInterpreterTopology.java:123-160: the script defines functions,
the topology evaluates them per record and emits the returned objects).
This container ships no JS engine, so — exactly like the multimodal
codec stubs — the Spark-side plumbing is REAL and tested (Arrow
batching, lifecycle, schema contract, record marshalling to/from plain
dicts) while the engine itself is a constructor-injected callable::

    evaluator(script_source: str, records: list[dict]) -> list[dict]

Production wiring: pass an evaluator backed by any embeddable JS engine
(e.g. a V8 binding — py-mini-racer / quickjs — or a sidecar process);
the evaluator receives the script once per task batch and must apply the
script's ``entry_point`` function to every record. Deployments that
cannot embed JS keep the module but port scripts to Python
(EnrichmentModule is the first-class API; JS is the compatibility shim).

Records cross the boundary as plain dicts (the reference hands Nashorn
``LinkedHashMap``s — same shape), so scripts see the familiar
object-per-record model regardless of engine.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

from aleph2_contrib_spark.plans.pipeline import EnrichmentModule

Evaluator = Callable[[str, list[dict], str], list[dict]]


def nashorn_unavailable(script: str, records: list[dict], entry_point: str) -> list[dict]:
    """Default evaluator: fail fast with wiring guidance (no JS engine is
    baked into this environment — inject one)."""
    raise NotImplementedError(
        "No JavaScript engine is available in this environment. Inject an "
        "evaluator(script, records) backed by an embeddable JS engine "
        "(py-mini-racer, quickjs, a sidecar V8 process, ...) into "
        "JsEnrichmentModule(evaluator=...), or port the script to a Python "
        "EnrichmentModule (the primary extension API)."
    )


def ported_script_evaluator(fn: Callable[[dict], dict | None]) -> Evaluator:
    """U2 migration adapter: wrap a Python function carrying the
    reference's per-record JS contract — ``fn(record) -> record | None``,
    ``None`` drops the record (SparkJsInterpreterTopology.java:123-160) —
    into an :data:`Evaluator`. A script ported line-for-line from JS to
    Python runs through the SAME ``JsEnrichmentModule`` batching,
    lifecycle, and null-marshalling with a one-line pipeline change
    (``evaluator=ported_script_evaluator(my_fn)``); nothing else in the
    job spec moves. This is the documented migration path for deployments
    that cannot embed a JS engine."""

    def evaluator(script: str, records: list[dict], entry_point: str) -> list[dict]:
        out = []
        for r in records:
            res = fn(r)
            if res is not None:
                out.append(res)
        return out

    return evaluator


class PortedScriptModule(EnrichmentModule):
    """The migration adapter packaged as a module: construct directly from
    the ported per-record function (no placeholder script needed)::

        Stage(name="xform",
              module=PortedScriptModule(my_record_fn),
              output_schema="...")

    Same record contract as the JS original (dict in, dict-or-None out,
    real ``None`` for nulls — never NaN), same Arrow batching underneath.
    """

    def __init__(self, fn: Callable[[dict], dict | None], config: dict[str, Any] | None = None):
        super().__init__(config)
        self.fn = fn
        self._impl = JsEnrichmentModule(
            {"script": "(ported)", **(config or {})}, evaluator=ported_script_evaluator(fn)
        )

    def clone_for_new_grouping(self) -> "PortedScriptModule":
        return type(self)(self.fn, self.config)

    def validate_module(self, stage) -> list[str]:
        if stage.output_schema is None:
            return [
                f"stage {stage.name}: ported-script module requires an explicit "
                "output_schema (record functions are untyped; the pipeline is not)"
            ]
        return []

    def on_object_batch(self, batch: pd.DataFrame) -> pd.DataFrame | None:
        return self._impl.on_object_batch(batch)


class JsEnrichmentModule(EnrichmentModule):
    """Batch module running a user JS script over each Arrow batch.

    config:
      - ``script``: the JS source (must define ``entry_point``; contract
        mirrors the reference: function(record) -> record | null, null
        drops the record).
      - ``entry_point``: function name, default "transform" — passed as
        the evaluator's third argument so an engine can invoke the named
        function after evaluating the script.
    """

    def __init__(self, config: dict[str, Any] | None = None, evaluator: Evaluator = nashorn_unavailable):
        super().__init__(config)
        self.evaluator = evaluator

    def clone_for_new_grouping(self) -> "JsEnrichmentModule":
        return type(self)(self.config, self.evaluator)

    def validate_module(self, stage) -> list[str]:
        errs = []
        if not self.config.get("script"):
            errs.append(f"stage {stage.name}: js module requires config['script']")
        if stage.output_schema is None:
            errs.append(
                f"stage {stage.name}: js module requires an explicit "
                "output_schema (scripts are untyped; the pipeline is not)"
            )
        return errs

    def on_object_batch(self, batch: pd.DataFrame) -> pd.DataFrame | None:
        # Arrow nulls decode to pandas NaN/NaT; the reference hands
        # Nashorn real nulls (LinkedHashMap values), and ported scripts
        # test `rec.field == null` — marshal back to None so that
        # contract holds (array-valued cells pass through untouched).
        def clean(v):
            try:
                return None if pd.isna(v) else v
            except (TypeError, ValueError):
                return v

        records = [
            {k: clean(v) for k, v in r.items()} for r in batch.to_dict("records")
        ]
        out = self.evaluator(
            self.config["script"], records, self.config.get("entry_point", "transform")
        )
        if not out:
            return None
        return pd.DataFrame(out)
