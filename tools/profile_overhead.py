"""Per-gate overhead profiler (optimization round 12, guide §1).

For each headline gate, splits wall time into:
  * build_sec  — Python query construction (includes any eager actions the
    gate performs internally: kmeans fits, threshold collects, index builds)
  * plan_sec   — Catalyst analysis+optimization+physical planning of the
    returned DataFrame (explain with no execution)
  * exec_sec   — the terminal action (collect, warm: 2nd run reported)

Run AFTER a warm-up so JIT/codegen caches don't pollute gate 1.

Usage: python tools/profile_overhead.py [name ...]   (default: full HEADLINE)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Writes tools/bench_snapshots/profile_overhead.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from strava_vector_search_spark.benchmarks import LEAN_BENCH  # noqa: E402
from strava_vector_search_spark.queries import QUERIES  # noqa: E402
from strava_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1:]
    names = only or HEADLINE
    spark = get_spark("profile-overhead")
    spark.sparkContext.setLogLevel("FATAL")

    from strava_vector_search_spark.io.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    out: dict[str, dict] = {}
    for name in names:
        fn = LEAN_BENCH.get(name) or QUERIES.get(name)
        if fn is None:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            # rep 1: absorb codegen/compile like the bench's median does
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.collect()
            t3 = time.time()
            # rep 2 (warm): what the bench median actually reports
            t4 = time.time()
            df2 = fn(spark, sf_dir)
            t5 = time.time()
            df2._jdf.queryExecution().executedPlan()
            t6 = time.time()
            df2.collect()
            t7 = time.time()
            out[name] = {
                "build_sec": round(t5 - t4, 3),
                "plan_sec": round(t6 - t5, 3),
                "exec_sec": round(t7 - t6, 3),
                "total_warm": round(t7 - t4, 3),
                "total_cold": round(t3 - t0, 3),
                "cold_build": round(t1 - t0, 3),
            }
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
        print(name, json.dumps(out[name]), flush=True)

    snap = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bench_snapshots",
        "profile_overhead.json",
    )
    tot = {
        k: round(sum(v.get(k, 0.0) for v in out.values() if "err" not in v), 1)
        for k in ("build_sec", "plan_sec", "exec_sec", "total_warm")
    }
    payload = {"sf_dir": sf_dir, "totals": tot, "gates": out}
    with open(snap, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print("TOTALS", json.dumps(tot), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
