"""Arrow batch sizing sweep for the 768-d mapInPandas kernels (r13,
VERDICT r12 item 7; guide §4.3/§6).

At dim 768, ``spark.sql.execution.arrow.maxRecordsPerBatch`` = 10K
(the default) means each Arrow batch carries ~10K x 768 x 8 B ≈ 60 MB
of float64 after the kernel's .astype("float64") — per task, on top of
the Arrow buffer itself. This sweeps the setting over the two BLAS
lanes at the 1M x 768 scale probe (single-query brute_force_topk_blas
and 32-query batch_topk_blas) and prints a table for SCALE.md.

Methodology: the 1M x 768 corpus is materialized ONCE to parquet in
/tmp (so every setting pays the identical scan), each (kernel, batch)
cell is best-of-2 with the first run discarded into the min, and the
sweep runs the settings in interleaved order so a machine-phase drift
cannot systematically favor one setting.

Usage: python tools/arrow_batch_sweep.py   (~5-10 min on local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.search import (
    batch_topk_blas,
    brute_force_topk_blas,
)
from strava_vector_search_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
CORPUS = "/tmp/svs_arrow_sweep_emb768_1m.parquet"
BATCHES = [2048, 5000, 10000, 20000]
ROUNDS = 3  # interleaved rounds per setting; report the min


def main() -> None:
    spark = get_spark("arrow-batch-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if not os.path.exists(CORPUS):
        reps = 500
        (
            emb.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
            .select(
                (F.col("vec_id") * reps + F.col("rep")).alias("vec_id"),
                F.flatten(F.array_repeat(F.col("embedding"), 12)).alias(
                    "embedding"
                ),
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(CORPUS)
        )
    big = spark.read.parquet(CORPUS)
    n = big.count()
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ] * 12
    queries = [(i, qv) for i in range(32)]
    qdf = spark.createDataFrame(
        queries, "query_id bigint, query_vec array<double>"
    ).localCheckpoint()

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key)

    def run_single() -> None:
        brute_force_topk_blas(
            big, qv, k=10, id_col="vec_id", assume_normalized=True
        ).collect()

    def run_batch() -> None:
        batch_topk_blas(
            big, qdf, k=5, id_col="vec_id", assume_normalized=True
        ).collect()

    # warm-up (codegen, worker pool) at the default setting
    run_single()
    run_batch()

    results: dict[tuple[str, int], float] = {}
    for rnd in range(ROUNDS):
        for b in BATCHES:
            spark.conf.set(key, str(b))
            for name, fn in (("single_q", run_single), ("batch_32q", run_batch)):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                cell = (name, b)
                results[cell] = min(results.get(cell, 1e9), dt)
                print(
                    f"round {rnd} {name} batch={b}: {dt:.2f}s",
                    flush=True,
                )
    spark.conf.set(key, default)

    print(f"\n== arrow maxRecordsPerBatch sweep, {n:,} vecs x 768d "
          f"(min of {ROUNDS} interleaved rounds) ==")
    print(f"{'kernel':12s} " + " ".join(f"{b:>8d}" for b in BATCHES))
    for name in ("single_q", "batch_32q"):
        row = " ".join(f"{results[(name, b)]:8.2f}" for b in BATCHES)
        print(f"{name:12s} {row}")
    spark.stop()


if __name__ == "__main__":
    main()
