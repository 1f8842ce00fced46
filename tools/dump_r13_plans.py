"""Dump .explain('formatted') for the round-13-touched gates.

Usage: python tools/dump_r13_plans.py <label> [gate ...]
Writes plans/r13/<gate>_<label>.txt for each gate (label: before|after).
Run with label=before from a worktree at the pre-optimization commit and
label=after at HEAD; the judge checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strava_vector_search_spark.queries import QUERIES  # noqa: E402
from strava_vector_search_spark.session import get_spark  # noqa: E402

# default: every gate the r13 optimization round touched, grouped by change
DEFAULT_GATES = [
    # shared _minhash_pairs session kernel (claim: the LSH+verify subtree
    # becomes one Scan ExistingRDD leaf in each consumer's plan; the
    # measuring gate dd_minhash_lsh_verified keeps the full pipeline)
    "dd_connected_components",
    "dd_cluster_keep_best",
    "dd_component_stats",
    "dd_soft_dedup_weights",
    "smp_leakage_safe_split",
    "dd_minhash_lsh_verified",
    # shared bloom eval-keys/filter session kernels (claim: the filter
    # build's explode+distinct+bit_or subtree becomes Scan ExistingRDD in
    # the probe's dense-scatter subquery; probe side unchanged)
    "dd_bloom_decontaminate",
    "dd_bloom_prefilter_exact",
    "dd_bloom_sharded_decontaminate",
    # ml_confusion_metrics single-pass marginals (claim: 3 scans of the
    # checkpointed cm + full_outer/left joins -> 1 explode + 1 aggregate;
    # the cm localCheckpoint is gone)
    "ml_confusion_metrics",
    # shared _markov_transition_counts session kernel (claim: the
    # sessionize + lag + count subtree — two user-keyed window shuffles —
    # becomes one Scan ExistingRDD leaf in both markov gates' plans;
    # ev_session_paths keeps the full pipeline)
    "ev_markov_transition_matrix",
    "ev_markov_stationary",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "after"
    gates = sys.argv[2:] or DEFAULT_GATES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-r13-plans")
    spark.sparkContext.setLogLevel("FATAL")
    for name in gates:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not declared", flush=True)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building {name}: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{label}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {label} (sf_dir={sf_dir})\n\n")
            fh.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
