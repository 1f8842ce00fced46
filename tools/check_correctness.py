"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01 (or $SF_DIR), compares row count, column-name set, and
order-insensitive values (exact after the queries' own rounding).

Usage: python tools/check_correctness.py [name ...]

Besides the per-gate stdout lines, every full (no-subset) run writes a
machine-readable artifact in the driver's CORRECTNESS_r{N}.json shape to
tools/correctness_snapshots/full_run.json (override: $CHECK_JSON_OUT) so
a complete-gate run can be committed as round evidence (ADVICE r03 item 3).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from strava_vector_search_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(_norm(r[i])) for i in idx) for r in rows)


def main() -> int:
    only = set(sys.argv[1:])
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("correctness-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = []
    results: dict[str, dict] = {}

    def record(name, *, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            record(name, err=f"spark error: {e}")
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            record(name, rows_match=len(s_rows) >= 0, spark_rows=len(s_rows),
                   err="rows-only (no oracle)")
            print(f"SKIP-ORACLE {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            record(name, spark_rows=len(s_rows), err=f"duckdb error: {e}")
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            sset, dset = _rows_to_set(s_cols, s_rows), _rows_to_set(d_cols, d_rows)
            if sset != dset:
                diff_s = [r for r in sset if r not in dset][:3]
                diff_d = [r for r in dset if r not in sset][:3]
                problems.append(f"values spark-only={diff_s} duck-only={diff_d}")
        rows_ok = len(s_rows) == len(d_rows)
        schema_ok = sorted(s_cols) == sorted(d_cols)
        record(name, rows_match=rows_ok, schema_match=schema_ok,
               hash_match=not problems, spark_rows=len(s_rows),
               oracle_rows=len(d_rows),
               err="; ".join(problems) if problems else None)
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")

    spark.stop()
    if not only:
        import json

        out_path = os.environ.get(
            "CHECK_JSON_OUT",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "correctness_snapshots", "full_run.json"),
        )
        try:
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            # context: free-form provenance for the snapshot (e.g. "full
            # sweep at final HEAD" vs "gate X's entry appended after an
            # additive change") — VERDICT r11 item 6 asked that
            # incremental amendments be visible in the artifact itself.
            with open(out_path, "w") as fh:
                json.dump({"sf_dir": SF_DIR, "n_gates": len(results),
                           "n_failures": len(failures),
                           "context": os.environ.get(
                               "CHECK_CONTEXT", "full sweep, one run"),
                           "results": results},
                          fh, indent=1, sort_keys=True)
            print(f"artifact: {out_path}")
        except OSError as e:
            print(f"artifact write failed: {e}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
