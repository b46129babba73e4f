"""Stateful streaming operators — cross-micro-batch module state.

The reference pools module instances across micro-batches (streaming
enrichment never calls onStageComplete and reuses instances per service —
EnrichmentPipelineService.java:177-178,629-631), which is how a module
carries state between batches. Structured Streaming's equivalent is
``applyInPandasWithState``: state is keyed, checkpointed, and survives
restarts — strictly stronger than the reference's in-process pooling
(SURVEY §2.7: replicate with applyInPandasWithState only where a module
needs cross-batch state).

At scale: state lives in the state store partitioned by key — no driver
involvement; a skewed key holds one partition's state, not the job.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


class StatefulModule:
    """Per-key stateful module protocol: ``update(key, batches, state_dict)``
    returns (rows_out, new_state). Subclass or pass functions."""

    def init_state(self) -> dict[str, Any]:
        return {}

    def update(
        self, key: tuple, batch: pd.DataFrame, state: dict[str, Any]
    ) -> tuple[pd.DataFrame | None, dict[str, Any]]:
        raise NotImplementedError


def apply_stateful(
    stream_df: DataFrame,
    key_cols: list[str],
    module: StatefulModule,
    output_schema: str,
    state_schema: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Run a StatefulModule per key over a streaming DataFrame.

    ``state_schema`` is a DDL struct describing the state dict's fields
    (state is stored as a single struct row)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = dict(zip([f.split()[0] for f in state_schema.split(",")], state.get))
        else:
            st = module.init_state()
        for pdf in pdfs:
            out, st = module.update(key, pdf, st)
            if out is not None and len(out):
                yield out
        state.update(tuple(st[f.strip().split()[0]] for f in state_schema.split(",")))

    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


class RunningCountModule(StatefulModule):
    """Reference-shaped example: cumulative per-key counters that survive
    across micro-batches (the module-pool semantics, made durable)."""

    def init_state(self) -> dict[str, Any]:
        return {"total": 0}

    def update(self, key, batch, state):
        state = {"total": int(state.get("total", 0)) + len(batch)}
        out = pd.DataFrame({"key": [key[0]], "running_total": [state["total"]]})
        return out, state
