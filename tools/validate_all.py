"""One-shot validation: tests → oracle gate → plan audit → bench → demo.

Usage: python tools/validate_all.py   (~7 min)
Prints a one-page PASS/FAIL summary; exit code 0 iff everything passed.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
    ("oracle gate (sf0.01)", [sys.executable, "tools/check_correctness.py"]),
    ("plan audit", [sys.executable, "tools/dump_plans.py"]),
    ("bench (sf0.1)", [sys.executable, "bench.py"]),
    ("demo", [sys.executable, "examples/workout_cache_demo.py"]),
    (
        "curation demo",
        [sys.executable, "examples/training_data_pipeline_demo.py"],
    ),
]


def main() -> int:
    results = []
    for name, cmd in STEPS:
        t0 = time.time()
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=1800
        )
        ok = proc.returncode == 0
        tail = (proc.stdout or proc.stderr).strip().splitlines()[-1:] or [""]
        results.append((name, ok, time.time() - t0, tail[0][:100]))
        print(f"{'PASS' if ok else 'FAIL'}  {name:22s} {time.time()-t0:6.0f}s  {tail[0][:100]}")
    failed = [r for r in results if not r[1]]
    print(f"\n{len(STEPS) - len(failed)}/{len(STEPS)} steps passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
