"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
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
    spark = get_spark("bench")

    # Warm the JVM/codegen path once so per-query numbers measure the
    # engine, not session startup.
    entrymod.entry(spark).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
