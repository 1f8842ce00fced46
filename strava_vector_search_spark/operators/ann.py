"""Approximate nearest-neighbor search — the reference's prescribed scale
path ("1M+ documents: consider approximate search or dedicated vector db",
``02_method2_manual_vector_embedding.sql:438-442``; BASELINE.json: "MLlib
for batch indexing").

Three regimes, mirroring the reference's own thresholds:
* ≤10K docs — brute force (operators/search.py), exact;
* ~100K — partition pruning on a metadata column (write-layout decision);
* 1M+ — IVF coarse quantization or LSH bucketing, both here.

IVF (inverted-file) design, Spark-first:
* **build**: assign every vector to a coarse cluster (MLlib KMeans at scale;
  any precomputed assignment column works), compute centroids as elementwise
  means — one partial-agg shuffle — and write the embeddings table
  partitioned by cluster id. Centroid table is tiny (k × dim).
* **search**: score query↔centroids (k rows — driver-trivial), pick the
  top-``nprobe`` clusters, then brute-force only those partitions. With the
  table partitioned by cluster, Catalyst partition-prunes the scan: at 100 TB
  a nprobe/k fraction of the data is read, everything else untouched.

Determinism: centroid means route through DECIMAL so the IVF pipeline is
oracle-checkable end-to-end when cluster assignments are deterministic (the
testdata's ``label`` column; KMeans builds get pytest-only checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.vector import cosine_similarity_rounded
from strava_vector_search_spark.operators.search import brute_force_topk


def compute_centroids(
    emb: DataFrame,
    cluster_col: str = "label",
    vector_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """(cluster, centroid array<double>) — elementwise mean per cluster.

    posexplode → partial-agg per (cluster, dim) → reassemble ordered array.
    Sums run in DECIMAL(28,10) so the result is independent of partition
    order (and matches the SQL oracle bit-for-bit after rounding).
    """
    exploded = emb.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(F.col(vector_col).cast("array<double>")).alias("pos", "v"),
    )
    per_dim = exploded.groupBy("cluster", "pos").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1)),
            scale,
        ).alias("c")
    )
    return per_dim.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    cluster_col: str = "label",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF search: probe the nprobe nearest clusters, brute-force inside.

    The centroid ranking is a k-row computation (broadcast-trivial); the
    candidate scan is an equi-filter on the cluster column — partition
    pruning when the table is written partitioned by it. Ties in centroid
    distance break by cluster id; final top-k ties break by vector id.
    """
    if centroids is None:
        centroids = compute_centroids(emb, cluster_col, vector_col)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    probed = (
        centroids.withColumn(
            "cdist", cosine_similarity_rounded(F.col("centroid"), qcol)
        )
        .orderBy(F.desc("cdist"), F.asc("cluster"))
        .limit(nprobe)
        .select("cluster")
    )
    cand = emb.join(
        F.broadcast(probed), emb[cluster_col] == probed["cluster"], "left_semi"
    )
    return brute_force_topk(
        cand, query_vec, k=k, vector_col=vector_col, id_col=id_col
    )


def write_ivf_index(
    emb: DataFrame, path: str, cluster_col: str = "label"
) -> None:
    """Persist the embeddings partitioned by cluster — the physical layout
    that turns ivf_topk's candidate filter into partition pruning."""
    emb.write.mode("overwrite").partitionBy(cluster_col).parquet(path)


# ---------------------------------------------------------------------------
# KMeans coarse quantizer + MLlib LSH (the 1M+ regime builders)


def kmeans_assign(
    emb: DataFrame,
    num_clusters: int = 16,
    vector_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Add a KMeans 'cluster' column (MLlib batch indexing). Deterministic
    given the seed, but not oracle-SQL-expressible — validated in pytest by
    recall against brute force."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    with_vec = emb.withColumn(
        "_features", array_to_vector(F.col(vector_col).cast("array<double>"))
    )
    model = KMeans(
        k=num_clusters, seed=seed, featuresCol="_features", predictionCol="cluster"
    ).fit(with_vec)
    return model.transform(with_vec).drop("_features")


def lsh_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    max_distance: float = 1.1,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs via MLlib BucketedRandomProjectionLSH.

    Unit-normalized vectors make euclidean distance monotone in cosine
    (d² = 2 - 2cos), so a euclidean LSH join at distance d equals a cosine
    threshold join at cos = 1 - d²/2. Returns (id1, id2, cosine).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    with_vec = emb.select(
        F.col(id_col).alias("_id"),
        array_to_vector(F.col(vector_col).cast("array<double>")).alias("_features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(with_vec)
    joined = model.approxSimilarityJoin(
        with_vec, with_vec, max_distance, distCol="_dist"
    )
    return (
        joined.select(
            F.col("datasetA._id").alias("id1"),
            F.col("datasetB._id").alias("id2"),
            F.round(1.0 - (F.col("_dist") * F.col("_dist")) / 2.0, 6).alias("cosine"),
        )
        .filter(F.col("id1") < F.col("id2"))
        .distinct()
    )
