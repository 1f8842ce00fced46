"""Round-over-round bench diff: compare two BENCH_r{N}.json files (or any
two files containing the bench JSON line) and flag per-query regressions.

Usage: python tools/compare_bench.py OLD.json NEW.json [threshold]
Default threshold 1.5 — a query slower by more than 1.5× (and by more
than 0.3 s absolute, to ignore sub-second jitter) is flagged.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        raw = f.read()
    # accept either the driver's wrapper JSON ({"parsed": {...}}) or the
    # bare bench line
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        line = [l for l in raw.splitlines() if l.startswith('{"metric"')][-1]
        d = json.loads(line)
    if "parsed" in d:
        d = d["parsed"]
    # normalize the round-6+ per-query record format ({"sec": s, "lean":
    # bool}) back to bare seconds for the diff
    q = d.get("queries", {})
    d["queries"] = {
        k: (v["sec"] if isinstance(v, dict) else v) for k, v in q.items()
    }
    return d


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    print(
        f"total: {old['value']:.1f}s ({len(oq)} queries) -> "
        f"{new['value']:.1f}s ({len(nq)} queries)"
    )
    regressions = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if b > a * threshold and b - a > 0.3:
            regressions.append((b / max(a, 1e-9), a, b, name))
    for ratio, a, b, name in sorted(regressions, reverse=True):
        print(f"  REGRESSION {ratio:5.2f}x  {a:6.3f}s -> {b:6.3f}s  {name}")
    added = sorted(set(nq) - set(oq))
    if added:
        print(f"new queries: {', '.join(added)}")
    removed = sorted(set(oq) - set(nq))
    if removed:
        print(f"removed queries: {', '.join(removed)}")
    if not regressions:
        print("no regressions above threshold")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
