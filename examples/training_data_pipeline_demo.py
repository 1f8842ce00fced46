"""Runnable end-to-end demo: the TRAINING-DATA side of the engine — the
curation pipeline a 100 TB pretraining corpus runs, here on the sf0.001
testdata so it finishes in seconds.

  1. quality screens      (token/quality/language expressions — map-only)
  2. exact dedup          (hash-groupBy keep-first)
  3. near-dup dedup       (MinHash-LSH candidates → exact Jaccard verify →
                           connected components → keep-first per component)
  4. decontamination      (n-gram overlap vs a held-out eval set, broadcast)
  5. mixture              (temperature-smoothed domain resampling)
  6. packing              (token-budget context-window bins)
  7. quality probe        (closed-form LS training on embeddings + ROC-AUC)
  8. retrieval smoke      (brute-force cosine top-3 over the embeddings)

Every operator here is also a correctness gate in `__spark_entry__.py`
(oracle-matched against DuckDB); this script just shows them composed.

Usage: python examples/training_data_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_vector_search_spark.functions.text import (
    lang_id,
    quality_score,
    token_count,
)
from strava_vector_search_spark.io.tables import load_table
from strava_vector_search_spark.operators import linear as L
from strava_vector_search_spark.operators.dedup import (
    decontaminate,
    dedup_by_near_dup_groups,
    exact_dedup,
    minhash_dedup_verified,
)
from strava_vector_search_spark.operators.sampling import (
    pack_sequences,
    temperature_resample,
)
from strava_vector_search_spark.operators.search import brute_force_topk
from strava_vector_search_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark(
        "training-data-pipeline-demo", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    funnel: dict[str, int] = {}

    docs = load_table(spark, sf_dir, "documents").cache()
    funnel["ingested"] = docs.count()
    print(f"\n[1] ingested {funnel['ingested']} documents")

    # quality screens: pure expressions, one map-only pass
    screened = (
        docs.withColumn("n_tokens", token_count(F.col("text")))
        .withColumn("quality", quality_score(F.col("text")))
        .withColumn("lang_pred", lang_id(F.col("text")))
        # the synthetic testdata is uniformly clean (quality_score == 1.0
        # throughout), so the visible screen here is the length floor
        .filter((F.col("n_tokens") >= 20) & (F.col("quality") > 0.2))
    ).cache()
    funnel["quality_pass"] = screened.count()
    print(f"[1] quality screens keep {funnel['quality_pass']}")

    # exact dedup (keep lowest doc_id per identical text)
    exact = exact_dedup(screened, ["text"], "doc_id").cache()
    funnel["exact_deduped"] = exact.count()
    print(f"[2] exact dedup -> {funnel['exact_deduped']}")

    # near-dup: LSH candidates, exact-verified, componentized, keep-first
    pairs = minhash_dedup_verified(exact, "doc_id", "text", threshold=0.5)
    with_comp = dedup_by_near_dup_groups(exact, pairs.select("id1", "id2"), "doc_id")
    survivors = with_comp.filter(F.col("comp") == F.col("doc_id")).cache()
    funnel["near_deduped"] = survivors.count()
    print(f"[3] near-dup dedup -> {funnel['near_deduped']}")

    # decontamination vs a pretend eval set (the 5 lowest doc_ids)
    eval_set = docs.orderBy("doc_id").limit(5).select("doc_id", "text")
    flagged = decontaminate(survivors, eval_set, "doc_id", "text")
    clean = (
        survivors.join(
            flagged.filter(F.col("contaminated")).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    ).cache()
    funnel["decontaminated"] = clean.count()
    print(f"[4] decontamination -> {funnel['decontaminated']}")

    # temperature mixture across sources (upweight scarce domains)
    mixed = temperature_resample(clean, "doc_id", "source", alpha=0.5).cache()
    funnel["mixed"] = mixed.count()
    print(f"[5] temperature mix (alpha=0.5) -> {funnel['mixed']}")

    # pack into 512-token context windows
    packed = pack_sequences(mixed, "doc_id", "n_tokens", budget=512)
    n_bins = packed.agg(F.countDistinct("bin")).collect()[0][0]
    funnel["bins"] = n_bins
    print(f"[6] packed into {n_bins} x 512-token bins")

    # train the quality probe on the embeddings table + exact AUC
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    feats = L.feature_frame(
        emb,
        F.col("embedding")[0],
        F.col("embedding")[1],
        (F.col("label") == 0).cast("int"),
    )
    model = L.fit_and_score(feats).collect()[0]
    print(
        f"[7] probe: n={model['n_train']} acc={model['train_acc']}"
        f" r2={model['r2']}"
    )

    # retrieval smoke: top-3 neighbors of vector 0
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    hits = brute_force_topk(
        emb, qv, k=3, id_col="vec_id", assume_normalized=True
    ).collect()
    print(f"[8] top-3 neighbors of vec 0: {[r['vec_id'] for r in hits]}")

    print("\nfunnel:", " -> ".join(f"{k}={v}" for k, v in funnel.items()))
    return funnel


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
