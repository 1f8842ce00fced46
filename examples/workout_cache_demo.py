"""Runnable end-to-end demo: the reference's complete workflow
(aryeung0/strava_vector_search) on this engine.

Walks the same path as the reference scripts:
  1. typed CSV ingest                (01_method1_cortex_search.sql:111-142)
  2. distribution report + count     (01:145-155)
  3. index build (batch embedding)   (02:170-172 / 01:163-186)
  4. pct-embedded verification       (02:186-190)
  5. method-2 SQL search: filtered cosine top-k + cache decision
                                     (02:206-227, 02:301-317)
  6. method-1 service search with the JSON filter DSL (01:200-219, nb Q1-Q3)
  7. similarity histogram            (02:373-389)
  8. RAG: search → LLM modify        (nb Q4; deterministic stub here)

Usage: python examples/workout_cache_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from strava_vector_search_spark.functions.embed import hash_embedding_table
from strava_vector_search_spark.io.csv_ingest import read_csv_typed, valid_rows
from strava_vector_search_spark.operators import search as S
from strava_vector_search_spark.rag import search_and_modify
from strava_vector_search_spark.schema import WORKOUTS_SCHEMA
from strava_vector_search_spark.service import SearchService, build_request
from strava_vector_search_spark.session import get_spark
from tests.test_reference_parity import _corpus_csv

DIM = 64


def main() -> None:
    spark = get_spark("workout-cache-demo", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest ------------------------------------------------------------
    with tempfile.TemporaryDirectory() as td:
        csv_path = os.path.join(td, "workouts.csv")
        with open(csv_path, "w") as f:
            f.write(_corpus_csv())
        workouts = valid_rows(read_csv_typed(spark, csv_path, WORKOUTS_SCHEMA)).cache()
        print(f"\n[1] ingested {workouts.count()} workout documents")

        # 2. distribution report ------------------------------------------
        print("\n[2] distribution report (sport x difficulty):")
        (
            workouts.groupBy("sport_type", "difficulty")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("sport_type", "difficulty")
            .show(8, truncate=False)
        )

        # 3. index build ---------------------------------------------------
        emb = hash_embedding_table(workouts, "id", "embed_str", DIM)
        with_vectors = workouts.join(emb, "id").cache()

        # 4. pct embedded --------------------------------------------------
        pct = with_vectors.agg(
            F.round(100.0 * F.count("embedding") / F.count(F.lit(1)), 1).alias("pct")
        ).head()["pct"]
        print(f"[4] pct_embedded = {pct}%")

        # 5. method-2 search: filtered top-k + cache decision --------------
        from strava_vector_search_spark.functions.embed import hash_embed_text

        qv = hash_embed_text(spark, "run intervals workout speed", DIM)
        top = S.brute_force_topk(
            with_vectors,
            qv,
            k=3,
            id_col="id",
            predicate=F.col("sport_type") == "run",
            assume_normalized=True,
        )
        print("[5] method-2 filtered top-3 with cache decision:")
        S.with_cache_decision(top).select(
            "id", "sport_type", "difficulty", "similarity", "cache_decision"
        ).show(truncate=False)

        # 6. method-1 service search with the DSL --------------------------
        svc = SearchService(
            spark,
            workouts,
            id_col="id",
            search_col="embed_str",
            attributes=("sport_type", "difficulty", "distance_meters"),
            columns=("sport_type", "difficulty"),
            dim=DIM,
        ).build()
        request = build_request(
            "hard ride workout",
            columns=["sport_type", "difficulty"],
            filter_dsl={
                "@and": [
                    {"@eq": {"sport_type": "ride"}},
                    {
                        "@or": [
                            {"@eq": {"difficulty": "very hard"}},
                            {"@eq": {"difficulty": "very_hard"}},
                        ]
                    },
                ]
            },
            limit=3,
        )
        print(f"[6] service request: {request}")
        svc.search(request).show(truncate=False)

        # 7. similarity histogram ------------------------------------------
        print("[7] similarity histogram for the probe query:")
        S.similarity_histogram(with_vectors, qv, assume_normalized=True).show(
            truncate=False
        )

        # 8. RAG ------------------------------------------------------------
        out = search_and_modify(
            svc,
            "run intervals workout speed",
            "make it 10 minutes longer",
            text_col="embed_str",
        )
        print(f"[8] RAG modify flow -> base={out['base_id']} "
              f"sim={out['similarity']} completion={out['completion'][:60]}...")

    spark.stop()
    print("\ndemo complete.")


if __name__ == "__main__":
    main()
