"""Full-registry local correctness run, chunked (VERDICT r6 item 8).

Runs every ``queries()`` entry through tools/check_correctness.py in
sequential chunks — one Spark session per chunk, so no single JVM run
brushes the sandbox job timeout — and merges the per-chunk JSON into one
committed artifact (CORRECTNESS_local_r{N}.json) that now records
per-chunk wall time alongside per-query results.

Tiering policy (documented here, enforced by --round): the registry
keeps growing, so permanently-stable function-family gates
(STABLE_TIER: string/date/math/regexp surface gates whose SQL and
operators have not changed since round 3 and are plain single-pass
Catalyst expressions) are verified in EVEN rounds only. In odd rounds
they are recorded as ``stable_tier_skipped`` with a pointer to this
policy — the driver's own 50-query window still rotates them through
real driver checks on its own schedule, so skipping the LOCAL re-run in
alternate rounds trades nothing but redundancy.

Usage:
  python tools/run_local_correctness.py --round 7 [--sf /root/testdata/sf0.01]
      [--chunk-size 50] [--out CORRECTNESS_local_r07.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STABLE_TIER = ("string_funcs", "date_funcs", "math_funcs", "regexp_funcs")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--chunk-size", type=int, default=50)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or f"CORRECTNESS_local_r{args.round:02d}.json"

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    skipped = []
    if args.round % 2 == 1:
        skipped = [n for n in names if n in STABLE_TIER]
        names = [n for n in names if n not in STABLE_TIER]

    chunks = [
        names[i : i + args.chunk_size]
        for i in range(0, len(names), args.chunk_size)
    ]
    results: dict[str, dict] = {}
    chunk_meta = []
    here = os.path.dirname(os.path.abspath(__file__))
    for ci, chunk in enumerate(chunks):
        tmp = tempfile.mktemp(suffix=".json")
        t0 = time.time()
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(here, "check_correctness.py"),
                args.sf,
                *chunk,
                "--json",
                tmp,
            ],
            capture_output=True,
            text=True,
        )
        wall = round(time.time() - t0, 1)
        if not os.path.exists(tmp):
            print(f"chunk {ci} crashed (rc={proc.returncode}):")
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            return 1
        with open(tmp) as f:
            payload = json.load(f)
        os.unlink(tmp)
        results.update(payload["results"])
        chunk_meta.append(
            {"chunk": ci, "n_queries": len(chunk), "wall_sec": wall}
        )
        print(
            f"chunk {ci}: {payload['n_pass']} pass, {payload['n_fail']} fail "
            f"({wall}s)"
        )
    for n in skipped:
        results[n] = {
            "status": "stable_tier_skipped",
            # machine-readable provenance (VERDICT r9 item 2): the most
            # recent even round is the last local full check by policy
            "last_verified_round": args.round - 1 if args.round % 2 == 1 else args.round,
            "note": "function-family gate verified in even rounds only "
            "(tools/run_local_correctness.py tiering policy)",
        }
    n_pass = sum(1 for r in results.values() if r.get("status") == "pass")
    n_fail = sum(1 for r in results.values() if r.get("status") == "fail")
    artifact = {
        "sf_dir": args.sf,
        "round": args.round,
        "n_queries": len(results),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_rows_only": sum(
            1 for r in results.values() if r.get("status") == "rows_only"
        ),
        "n_stable_tier_skipped": len(skipped),
        "chunks": chunk_meta,
        "note": "full registry in sequential chunks (one Spark session "
        "each) with per-chunk wall time; stable-tier function-family "
        "gates re-verified in even rounds only — same differential "
        "harness as the driver gate",
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(
        f"\n{n_pass} pass, {n_fail} fail, {len(skipped)} stable-tier "
        f"skipped -> {out_path}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
