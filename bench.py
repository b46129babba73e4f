"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The round-1 harness could not parse the line because the per-query dict
pushed it past the captured tail, so: totals come FIRST in the line,
per-query values are 2-decimal, and the full-precision result (plus
row counts) is written to BENCH_full.json as a separate artifact.

Methodology: per-query MIN over (default) two passes in one session
(pass 2 re-times the slowest queries first under a fixed budget; see inline) —
steady-state engine cost, excluding first-use JIT/codegen and transient
host noise (identical code has measured 120s vs 270s totals under
neighbor load). The SQL cache is CLEARED between passes so pass 2
re-executes every plan instead of re-reading pass 1's persisted
intermediates (minhash family) from the block store — without the clear,
the MIN silently mixes cold executions with cache-hit scans and
understates real per-query cost. Per-pass totals are recorded in
BENCH_full.json ("pass_totals") so the residual warm-JVM effect stays
visible rather than folded into the headline number.

Host-load provenance (round-10): os.getloadavg()[0] is sampled at start,
after warmup, at each pass boundary, and at end ("load_avg_1m"), and each
pass's full per-query dict is kept separately ("per_pass_queries") — so a
regressed total can be decomposed into plan change vs neighbor load from
the committed artifact alone (the r9 381 s vs r8 316 s delta needed a
separate solo artifact to prove environmental).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aleph2_contrib_spark.session import get_spark

import __spark_entry__ as entrymod


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_samples: dict[str, float] = {"start": round(os.getloadavg()[0], 2)}
    spark = get_spark("bench")

    # Warm the JVM so per-query numbers measure the engine, not session
    # startup or first-use JIT: one real query plus tiny queries covering
    # the major codegen shapes (hash agg, sort-merge + broadcast join,
    # window, explode) at the smallest SF. Untimed.
    entrymod.entry(spark).collect()
    warm_dir = "/root/testdata/sf0.001"
    for shape in (
        "q3_shipping_priority",      # SMJ + broadcast + agg + sort
        "window_lag_lead_delta",     # window functions
        "explode_top_tokens",        # generate/explode + agg
    ):
        fn = entrymod.queries().get(shape)
        if fn is not None:
            try:
                fn(spark, warm_dir).collect()
            except Exception:
                pass

    # One-time state builds, untimed: dedup_incremental's signature store
    # is daily-maintenance state (built once, reused by every batch), so
    # the timed passes measure the steady-state per-batch cost — the
    # number that scales with production use — not the amortized build.
    # (VERDICT r4 item 4: split build from per-batch query.)
    # similarity_codebook_topk's CodebookStore is the same shape: train +
    # assign once (maintenance), query O(probe) per call.
    for state_q in ("dedup_incremental", "similarity_codebook_topk"):
        fn = entrymod.queries().get(state_q)
        if fn is not None:
            try:
                fn(spark, sf_dir).collect()
            except Exception:
                pass

    # Host-noise robustness: wall-clock on this box can vary 2-3x with
    # neighbor load (observed identical code at 120s and 340s). Run the
    # set twice and keep the per-query MIN — noise is bursty, so the
    # second pass usually rescues the queries the first pass mis-timed.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    # Pass 2+ re-times the SLOWEST pass-1 queries first, under a fixed
    # wall-clock budget: the slowest-first ordering means noise-moved
    # multi-second queries are always rescued even if the budget runs out
    # on the sub-second tail. The default budget (r10: 450 s, was 150 s)
    # covers the FULL registry's warm second pass at the current size, so
    # the committed artifact normally carries min-of-2 for every query —
    # the cap only bites if the registry grows far past ~260 queries or
    # the host is badly loaded, and total bench time stays bounded at
    # pass-1 + budget either way.
    rerun_budget = float(os.environ.get("SPARK_GRAFT_BENCH_RERUN_BUDGET", "450"))
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    pass_totals: list[float] = []
    per_pass_queries: list[dict[str, float]] = []
    for p in range(max(1, passes)):
        if p == 0:
            plan = list(entrymod.queries().items())
            budget = float("inf")
        else:
            # Drop persisted intermediates so this pass measures execution,
            # not block-store reads of the previous pass's cache.
            spark.catalog.clearCache()
            # Force a full JVM GC between passes: Spark's ContextCleaner
            # only reclaims shuffle files / broadcast state when the JVM
            # collects, and a long-lived bench session with a 100+ GB
            # heap may not GC for the whole run — measured as pass 2
            # running SLOWER than pass 1 (396 s → 451 s, round-10 final)
            # while a fresh session covered the same registry 10% faster.
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            qmap = entrymod.queries()
            plan = [
                (k, qmap[k]) for k in sorted(timings, key=lambda k: -timings[k])
            ]
            budget = rerun_budget
        if p == 0:
            load_samples["after_warm"] = round(os.getloadavg()[0], 2)
        pass_total = 0.0
        pass_timings: dict[str, float] = {}
        for qi, (name, fn) in enumerate(plan):
            if pass_total > budget:
                break
            if qi and qi % 64 == 0:
                # periodic GC, untimed (maintenance between queries, same
                # rationale as the between-pass GC above)
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
            # Drop the previous query's leaked persists, untimed: every
            # query is self-contained, but iterative operators leave
            # their (now unreferenced) persisted state to the context
            # cleaner, which only runs on JVM GC — measured 1-19 cached
            # RDDs left per heavy query, enough to crowd the unified
            # region and evict mid-query between the every-64 GCs.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            pass_total += dt
            pass_timings[name] = round(dt, 4)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            rows[name] = len(out)
        pass_totals.append(round(pass_total, 2))
        per_pass_queries.append(pass_timings)
        load_samples[f"pass{p + 1}_end"] = round(os.getloadavg()[0], 2)
        if p == 0 and pass_total > 420.0:
            # Pass 1 ran hot (host contention) — that is precisely when the
            # per-query-MIN rescue pass matters most, so NEVER skip it
            # (the round-6 driver artifact was a single 1419 s cold pass
            # because an earlier guard broke here). Instead widen the
            # rescue budget proportionally: pass 2 stays wall-clock
            # bounded, and a loaded host gets a longer retry window to
            # re-time the multi-second outliers.
            rerun_budget = max(rerun_budget, min(0.3 * pass_total, 600.0))
    total = sum(timings.values())

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "total_query_wall_sec",
        "value": round(total, 4),
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "rows": rows,
        "pass_totals": pass_totals,
        "per_pass_queries": per_pass_queries,
        "load_avg_1m": load_samples,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)

    # Keep the printed line well under the harness's captured-stdout tail
    # (~2 KB; the round-1 full-dict line was truncated and parsed as null):
    # totals + the 20 slowest queries only, full dict in BENCH_full.json.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    compact = {
        "metric": "total_query_wall_sec",
        "value": round(total, 2),
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "load_avg_1m": load_samples,
        "queries": {k: round(v, 2) for k, v in slowest.items()},
        "full": "BENCH_full.json",
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
