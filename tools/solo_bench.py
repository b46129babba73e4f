"""Solo steady-state re-measure of named gates at sf0.1 → BENCH_solo_r{N}.json.

Promotes the README bench-watch prose into a machine-readable artifact
(VERDICT r7 item 8): for each named query, min of K steady-state runs in
one session (spark.catalog.clearCache() between runs), the 1-minute load
average before each query, and a stable digest of the executed plan so a
judge can verify "plan unchanged" mechanically.

Usage: python tools/solo_bench.py --round 8 [--runs 3] [--sf DIR] name...
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aleph2_contrib_spark.session import get_spark

import __spark_entry__ as entrymod


def plan_digest(df) -> str:
    """md5 of the executed plan with volatile tokens (ids, temp paths,
    exchange reuse numbering, codegen ids) normalized out."""
    s = df._jdf.queryExecution().executedPlan().toString()
    s = re.sub(r"#\d+[A-Za-z]*", "#x", s)
    s = re.sub(r"\[id=#?\d+\]", "[id=x]", s)
    s = re.sub(r"/tmp/\S+", "/tmp/x", s)
    s = re.sub(r"\[plan_id=\d+\]", "[plan_id=x]", s)
    s = re.sub(r"cachedrdd-\d+", "cachedrdd-x", s)
    return hashlib.md5(s.encode()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("solo-bench")
    qs = entrymod.queries()
    out = {}
    for name in args.names:
        fn = qs[name]
        fn(spark, args.sf).collect()  # untimed warm (JIT, state builds)
        runs, loads = [], []
        digest = None
        for _ in range(args.runs):
            spark.catalog.clearCache()
            loads.append(round(os.getloadavg()[0], 2))
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.collect()
            runs.append(round(time.perf_counter() - t0, 2))
            digest = plan_digest(df)
        out[name] = {
            "min_sec": min(runs),
            "runs_sec": runs,
            "load_avg_1m": loads,
            "plan_digest": digest,
        }
        print(name, out[name], flush=True)
    path = f"BENCH_solo_r{args.round:02d}.json"
    payload = {"sf_dir": args.sf, "runs_per_query": args.runs, "results": out}
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f).get("results", {})
    existing.update(out)
    payload["results"] = existing
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
