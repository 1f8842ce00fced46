"""Dump .explain('formatted') for the round-12-touched gates.

Usage: python tools/dump_r12_plans.py <label> [gate ...]
Writes plans/r12/<gate>_<label>.txt for each gate (label: before|after).
Run with label=before from a worktree at the pre-optimization commit and
label=after at HEAD; the judge checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strava_vector_search_spark.queries import QUERIES  # noqa: E402
from strava_vector_search_spark.session import get_spark  # noqa: E402

# default: every gate the r12 optimization round touched, grouped by change
DEFAULT_GATES = [
    # literal-array sites (claim: plan UNCHANGED, construction-time only)
    "vs_topk_filtered",
    "vs_similarity_histogram",
    "vs_hybrid_topk",
    "vs_topk_filtered_768",
    "tx_hash_classifier",
    "dm_dsir_select",
    # batch_topk -> batch_topk_blas (claim: 768-step codegen folds -> MapInPandas)
    "vs_batch_topk_768",
    # worker-side model cache (claim: plan unchanged; ArrowEvalPython stays)
    "s7_model_embed_contract",
    # localCheckpoint(eager=False) -> persist() (claim: Scan ExistingRDD ->
    # InMemoryTableScan; no extra Exchange; job/planning count down)
    "g_pagerank",
    "g_ppr",
    "ab_spearman_corr",
    "ml_confusion_metrics",
    "mm_phash_near_dup",
    "w_pareto_abc",
    "dd_cc_incremental",
    "ann_ivf_topk_768",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "after"
    gates = sys.argv[2:] or DEFAULT_GATES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-r12-plans")
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
