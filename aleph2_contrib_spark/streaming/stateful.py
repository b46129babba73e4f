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
    returns (rows_out, new_state). Subclass or pass functions.

    Modules used with a timeout (``apply_stateful(timeout=...)``) may
    override ``on_timeout`` — called when a key's state expires with no
    new data (session end, idle-key flush): return (rows_to_emit,
    new_state); a None new_state REMOVES the key's state (the session is
    closed). ``timeout_ms`` is re-armed after every update/timeout."""

    #: processing-time timeout re-armed after each invocation (only used
    #: when apply_stateful is called with timeout="ProcessingTimeTimeout")
    timeout_ms: int = 60_000

    def init_state(self) -> dict[str, Any]:
        return {}

    def update(
        self, key: tuple, batch: pd.DataFrame, state: dict[str, Any]
    ) -> tuple[pd.DataFrame | None, dict[str, Any]]:
        raise NotImplementedError

    def on_timeout(
        self, key: tuple, state: dict[str, Any]
    ) -> tuple[pd.DataFrame | None, dict[str, Any] | None]:
        """Default: emit nothing, drop the state."""
        return None, None


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

    fields = [f.strip().split()[0] for f in state_schema.split(",")]
    use_timeout = timeout == "ProcessingTimeTimeout"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = dict(zip(fields, state.get))
        else:
            st = module.init_state()
        if getattr(state, "hasTimedOut", False):
            # expiry invocation: no data for this key — let the module
            # flush (close the session) and decide whether state lives on
            out, new_st = module.on_timeout(key, st)
            if out is not None and len(out):
                yield out
            if new_st is None:
                state.remove()
            else:
                state.update(tuple(new_st[f] for f in fields))
                if use_timeout:
                    state.setTimeoutDuration(int(module.timeout_ms))
            return
        for pdf in pdfs:
            out, st = module.update(key, pdf, st)
            if out is not None and len(out):
                yield out
        state.update(tuple(st[f] for f in fields))
        if use_timeout:
            state.setTimeoutDuration(int(module.timeout_ms))

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


class SessionWindowModule(StatefulModule):
    """Idle-timeout sessionization, stateful form: events accumulate into
    the key's open session; when the key goes idle for ``timeout_ms`` the
    session CLOSES — ``on_timeout`` emits one summary row
    (key, n_events, v_min, v_max) and removes the state, so the next
    event opens a fresh session. The streaming counterpart of the batch
    ``events_sessionize`` gap rule, with the gap enforced by the state
    store's processing-time clock. Use with
    ``apply_stateful(..., timeout="ProcessingTimeTimeout")``."""

    def __init__(self, value_col: str = "value", timeout_ms: int = 5_000):
        self.value_col = value_col
        self.timeout_ms = timeout_ms

    def init_state(self) -> dict[str, Any]:
        return {"n": 0, "v_min": None, "v_max": None}

    def update(self, key, batch, state):
        vals = batch[self.value_col].dropna()
        n = int(state.get("n") or 0) + len(batch)
        lo = min([v for v in [state.get("v_min"), vals.min() if len(vals) else None] if v is not None], default=None)
        hi = max([v for v in [state.get("v_max"), vals.max() if len(vals) else None] if v is not None], default=None)
        return None, {"n": n, "v_min": lo, "v_max": hi}

    def on_timeout(self, key, state):
        out = pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [int(state.get("n") or 0)],
                "v_min": [state.get("v_min")],
                "v_max": [state.get("v_max")],
            }
        )
        return out, None
