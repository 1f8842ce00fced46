from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.io.tables import corpus_with_vectors, load_table
from strava_vector_search_spark.operators import search as S


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return corpus_with_vectors(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def qvec(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]


def test_topk_returns_k_sorted(corpus, qvec):
    rows = S.brute_force_topk(corpus, qvec, k=5).collect()
    assert len(rows) == 5
    sims = [r["similarity"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_topk_self_is_best_hit(corpus, qvec):
    # vec_id 0's own document must rank first with similarity ~1.0
    top = S.brute_force_topk(corpus, qvec, k=1).head()
    assert top["doc_id"] == 0
    assert top["similarity"] == pytest.approx(1.0, abs=1e-4)


def test_topk_respects_predicate(corpus, qvec):
    rows = S.brute_force_topk(
        corpus, qvec, k=5, predicate=F.col("lang") == "en"
    ).collect()
    assert all(r["lang"] == "en" for r in rows)


def test_topk_tiebreak_deterministic(spark):
    # identical embeddings -> tie must break by id ascending (SURVEY §7 risk 5)
    df = spark.createDataFrame(
        [(10, [1.0, 0.0]), (2, [1.0, 0.0]), (7, [0.0, 1.0])],
        "doc_id int, embedding array<double>",
    )
    rows = S.brute_force_topk(df, [1.0, 0.0], k=2).collect()
    assert [r["doc_id"] for r in rows] == [2, 10]


def test_cache_decision_labels(spark):
    df = spark.createDataFrame(
        [(1, 0.95), (2, 0.75), (3, 0.5)], "doc_id int, similarity double"
    )
    rows = {r["doc_id"]: r["cache_decision"] for r in S.with_cache_decision(df).collect()}
    assert rows[1].startswith("CACHE HIT - Excellent")
    assert rows[2].startswith("CACHE HIT - Good")
    assert rows[3].startswith("CACHE MISS")


def test_similarity_histogram_covers_corpus(corpus, qvec):
    hist = S.similarity_histogram(corpus, qvec).collect()
    assert sum(r["n_docs"] for r in hist) == corpus.count()


def test_batch_topk_per_query_k(spark, corpus, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.batch_topk(corpus.select("doc_id", "embedding"), queries, k=4).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2}
    for q, rows in per_q.items():
        assert len(rows) == 4
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3, 4]
        # self-hit first (the query vectors come from the corpus itself)
        assert sorted(rows, key=lambda r: r["rank"])[0]["doc_id"] == q


def test_topk_plan_uses_take_ordered(corpus, qvec):
    # guard: top-k must compile to TakeOrderedAndProject, not a full sort
    plan = (
        S.brute_force_topk(corpus, qvec, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_blas_topk_matches_expression(corpus, qvec):
    expr_rows = [
        (r["doc_id"], r["similarity"])
        for r in S.brute_force_topk(
            corpus, qvec, k=8, assume_normalized=True,
            predicate=F.col("lang") == "en",
        ).collect()
    ]
    blas_rows = sorted(
        (
            (r["doc_id"], r["similarity"])
            for r in S.brute_force_topk_blas(
                corpus, qvec, k=8, predicate=F.col("lang") == "en",
                assume_normalized=True,
            ).collect()
        ),
        key=lambda t: (-t[1], t[0]),
    )
    assert blas_rows == expr_rows


def test_batch_topk_blas_matches_expression(spark, sf_dir):
    from strava_vector_search_spark.operators.search import batch_topk, batch_topk_blas

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.selectExpr("vec_id AS doc_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    expr = {
        (r["query_id"], r["doc_id"], r["similarity"], r["rank"])
        for r in batch_topk(corpus, queries, k=5, assume_normalized=True)
        .select("query_id", "doc_id", "similarity", "rank")
        .collect()
    }
    blas = {
        (r["query_id"], r["doc_id"], r["similarity"], r["rank"])
        for r in batch_topk_blas(corpus, queries, k=5)
        .select("query_id", "doc_id", "similarity", "rank")
        .collect()
    }
    assert expr == blas


def test_batch_topk_blas_full_cosine_bit_identical_on_integer_vecs(spark):
    """assume_normalized=False (r12 optimization: vs_batch_topk_768 rides
    this lane): on integer-valued vectors the matmul+einsum full cosine
    must be BIT-identical to the expression lane — same exactness
    argument as brute_force_topk_blas, now pinned for the batch kernel."""
    import random

    from strava_vector_search_spark.operators.search import (
        batch_topk,
        batch_topk_blas,
    )

    rng = random.Random(42)
    rows = [
        (i, [float(rng.randint(0, 9999)) for _ in range(32)])
        for i in range(120)
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, embedding array<double>")
    queries = corpus.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    expr = {
        (r["query_id"], r["doc_id"], r["similarity"], r["rank"])
        for r in batch_topk(corpus, queries, k=7, assume_normalized=False)
        .select("query_id", "doc_id", "similarity", "rank")
        .collect()
    }
    blas = {
        (r["query_id"], r["doc_id"], r["similarity"], r["rank"])
        for r in batch_topk_blas(
            corpus, queries, k=7, assume_normalized=False
        )
        .select("query_id", "doc_id", "similarity", "rank")
        .collect()
    }
    assert expr == blas


def test_batch_topk_blas_full_cosine_refuses_zero_norm_query(spark):
    import pytest

    from strava_vector_search_spark.operators.search import batch_topk_blas

    corpus = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "doc_id bigint, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(9, [0.0, 0.0])], "query_id bigint, query_vec array<double>"
    )
    with pytest.raises(ValueError, match="zero-norm query"):
        batch_topk_blas(corpus, queries, k=2, assume_normalized=False)


def test_blas_kernels_accept_string_ids(spark, sf_dir):
    """Output schemas derive from the input id type — string doc ids must
    round-trip (regression: the schema was once hardcoded to long)."""
    from strava_vector_search_spark.operators.search import (
        batch_topk_blas,
        brute_force_topk,
        brute_force_topk_blas,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.selectExpr(
        "concat('doc-', lpad(vec_id, 6, '0')) AS doc_id", "embedding"
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]

    blas = brute_force_topk_blas(corpus, qvec, k=5, assume_normalized=True)
    expr = brute_force_topk(corpus, qvec, k=5, assume_normalized=True).select(
        "doc_id", F.round("similarity", 6).alias("similarity")
    )
    b = [(r["doc_id"], r["similarity"]) for r in
         blas.select("doc_id", "similarity")
         .orderBy(F.desc("similarity"), F.asc("doc_id")).collect()]
    e = [(r["doc_id"], r["similarity"]) for r in
         expr.orderBy(F.desc("similarity"), F.asc("doc_id")).collect()]
    assert b == e and isinstance(b[0][0], str)

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.concat(F.lit("q-"), F.col("vec_id")).alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    bt = batch_topk_blas(corpus, queries, k=3)
    rows = bt.select("query_id", "doc_id", "rank").collect()
    assert len(rows) == 6
    assert all(r["doc_id"].startswith("doc-") for r in rows)


def test_blas_topk_tie_break_is_id_ascending(spark):
    """>k rows tying at the k-th score within ONE batch must keep the lowest
    ids — the global (score DESC, id ASC) contract (regression: argpartition
    alone broke boundary ties arbitrarily)."""
    from strava_vector_search_spark.operators.search import (
        batch_topk_blas,
        brute_force_topk_blas,
    )

    # 40 identical vectors (all tie at similarity 1.0) + 10 orthogonal
    rows = [(i, [1.0, 0.0]) for i in range(40)] + [(100 + i, [0.0, 1.0]) for i in range(10)]
    corpus = spark.createDataFrame(
        rows, "doc_id long, embedding array<double>"
    ).coalesce(1)  # one partition -> one Arrow batch -> local prune must tie-break
    out = brute_force_topk_blas(corpus, [1.0, 0.0], k=5)
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [0, 1, 2, 3, 4]

    queries = spark.createDataFrame(
        [(7, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    bt = batch_topk_blas(corpus, queries, k=5)
    assert sorted(r["doc_id"] for r in bt.collect()) == [0, 1, 2, 3, 4]


def test_matryoshka_equals_brute_force_when_candidates_cover(spark):
    """With candidates >= corpus size the funnel is exact: the final top-k
    must equal full-vector brute force."""
    from strava_vector_search_spark.operators.search import (
        brute_force_topk,
        matryoshka_topk,
    )

    import math

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [
        (i, unit([(i * 7 + j * 3) % 11 - 5.0 for j in range(8)]))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    q = rows[5][1]
    exact = brute_force_topk(df, q, k=5, assume_normalized=True).select(
        "doc_id", "similarity"
    ).collect()
    mat = matryoshka_topk(df, q, prefix_dims=4, candidates=40, k=5).select(
        "doc_id", "similarity"
    ).collect()
    assert [(r["doc_id"], r["similarity"]) for r in mat] == [
        (r["doc_id"], r["similarity"]) for r in exact
    ]


def test_matryoshka_coarse_stage_prunes(spark):
    """A doc whose PREFIX is orthogonal to the query must be dropped by the
    coarse stage even though its full vector matches well — the documented
    recall/cost trade of the funnel."""
    from strava_vector_search_spark.operators.search import matryoshka_topk

    import math

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    q = unit([1.0, 1.0, 0.0, 0.0])
    good_prefix = unit([1.0, 0.9, 0.1, 0.0])
    decoy = unit([0.0, 0.0, 1.0, 1.0])  # prefix-orthogonal in dims 1-2
    filler = [unit([0.5, -0.5, (i % 3) * 0.3 + 0.1, 0.2]) for i in range(8)]
    rows = [(1, good_prefix), (2, decoy)] + [
        (10 + i, v) for i, v in enumerate(filler)
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    got = matryoshka_topk(df, q, prefix_dims=2, candidates=3, k=3).collect()
    ids = [r["doc_id"] for r in got]
    assert 1 in ids and 2 not in ids


def test_matryoshka_prefix_col_matches_slice_path(spark):
    """The materialized-prefix fast path must return exactly what the
    slice-at-query-time path returns."""
    from strava_vector_search_spark.operators.search import matryoshka_topk

    import math

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [
        (i, unit([(i * 5 + j * 7) % 13 - 6.0 for j in range(8)]))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    pre = df.withColumn("p4", F.slice(F.col("embedding"), 1, 4))
    q = rows[9][1]
    a = matryoshka_topk(df, q, prefix_dims=4, candidates=10, k=5).select(
        "doc_id", "coarse", "similarity"
    ).collect()
    b = matryoshka_topk(
        pre, q, prefix_dims=4, candidates=10, k=5, prefix_col="p4"
    ).select("doc_id", "coarse", "similarity").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_binary_pack_sign_words_known_pattern(spark):
    # dims 0 and 33 positive -> bit 0 of word 0, bit 1 of word 1
    vec = [0.0] * 64
    vec[0] = 0.5
    vec[33] = 0.1
    vec[2] = -0.7  # negative: bit stays 0 (strict x > 0 rule)
    assert S.pack_sign_words(vec) == [1, 2]
    df = spark.createDataFrame([(vec,)], "v array<double>")
    w = df.select(
        *[c.alias(f"w{i}") for i, c in enumerate(S.binary_sign_words(F.col("v"), 64))]
    ).head()
    assert [w["w0"], w["w1"]] == [1, 2]


def test_binary_topk_matches_brute_force_when_candidates_cover(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 5).head()["embedding"]]
    exact = S.brute_force_topk(
        emb, qv, k=10, id_col="vec_id", predicate=F.col("vec_id") != 5
    ).select("vec_id").collect()
    # candidates = whole corpus -> the Hamming stage prunes nothing and the
    # exact rerank must reproduce brute force
    approx = S.binary_topk(
        emb, qv, candidates=n, k=10, id_col="vec_id",
        predicate=F.col("vec_id") != 5,
    ).select("vec_id").collect()
    assert [r["vec_id"] for r in approx] == [r["vec_id"] for r in exact]


def test_binary_topk_recall_at_50(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 5).head()["embedding"]]
    exact = {
        r["vec_id"]
        for r in S.brute_force_topk(
            emb, qv, k=10, id_col="vec_id", predicate=F.col("vec_id") != 5
        ).select("vec_id").collect()
    }
    got = {
        r["vec_id"]
        for r in S.binary_topk(
            emb, qv, candidates=150, k=10, id_col="vec_id",
            predicate=F.col("vec_id") != 5,
        ).collect()
    }
    # 1-bit signatures at dim 64 are coarse (each bit flips with prob
    # ~angle/pi): Hamming top-150-of-500 keeps 0.9 of the true top-10
    # (measured across 4 query ids: 0.9-1.0); assert with margin
    assert len(exact & got) / 10 >= 0.7


def test_binary_index_roundtrip_matches_inline(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    path = str(tmp_path / "bidx")
    S.write_binary_index(emb, path, dim=len(qv), id_col="vec_id")
    inline = S.binary_topk(emb, qv, candidates=60, k=10, id_col="vec_id").collect()
    indexed = S.binary_topk_indexed(
        spark, path, qv, candidates=60, k=10, id_col="vec_id"
    ).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in inline]
    # the candidate scan over the index must read only (id, words) — the
    # narrow-scan contract that makes the layout worth writing
    df = spark.read.parquet(path)
    wcols = [c for c in df.columns if c.startswith("bw")]
    h = None
    for c in wcols:
        t = F.bit_count(F.col(c).bitwiseXOR(F.lit(0).cast("long")))
        h = t if h is None else h + t
    plan = (
        df.select("vec_id", h.alias("hamming"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    readschema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert readschema and "embedding" not in readschema[0]


def test_binary_pack_randomized_parity_spark_vs_python(spark):
    """50 pseudo-random vectors (fixed seed): the Spark sign-pack
    expression must equal the driver-side twin bit-for-bit, including
    zeros (strict x > 0), negatives, and partial last words (dim 70)."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(50):
        dim = 70  # exercises a 6-bit partial third word
        v = [rng.choice([-1.0, 0.0, 0.5, 1e-12, -1e-12]) for _ in range(dim)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "i long, v array<double>")
    words = S.binary_sign_words(F.col("v"), dim=70)
    got = {
        r["i"]: [r[f"w{j}"] for j in range(3)]
        for r in df.select(
            "i", *[c.alias(f"w{j}") for j, c in enumerate(words)]
        ).collect()
    }
    for i, v in rows:
        assert got[i] == S.pack_sign_words(v), f"row {i}"


def test_blas_cosine_lane_bit_identical_to_expression_lane(spark):
    """assume_normalized=False BLAS scoring must be BIT-identical to the
    expression cosine on integer-valued embeddings (the md5 parity
    kernel): dot/norm-squared terms are exact below 2^53 and IEEE
    sqrt/mul/div are correctly rounded — the argument that lets the
    768-d flagship gate ride the BLAS lane under its value-hash oracle."""
    from pyspark.sql import functions as F

    from strava_vector_search_spark.functions.embed import (
        md5_embedding_table,
    )
    from strava_vector_search_spark.io.tables import load_table
    from strava_vector_search_spark.operators.search import (
        brute_force_topk,
        brute_force_topk_blas,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = md5_embedding_table(
        docs.filter(F.col("doc_id") != 0), "doc_id", "text", dim=768
    ).localCheckpoint(eager=False)
    qv = [
        float(x)
        for x in md5_embedding_table(
            docs.filter(F.col("doc_id") == 0), "doc_id", "text", dim=768
        ).head()["embedding"]
    ]
    expr = brute_force_topk(corpus, qv, k=25, assume_normalized=False)
    blas = brute_force_topk_blas(
        corpus, qv, k=25, assume_normalized=False, payload=False
    )
    got_e = [
        (r["doc_id"], r["similarity"])
        for r in expr.select("doc_id", "similarity").collect()
    ]
    got_b = [(r["doc_id"], r["similarity"]) for r in blas.collect()]
    assert got_e == got_b  # bit-identical scores, identical order


def test_blas_full_cosine_refuses_zero_norm_vectors(spark):
    """The expression lane raises DIVIDE_BY_ZERO (ANSI) on a zero-norm
    vector; the BLAS lane must fail just as loudly instead of yielding
    batch-order-dependent NaN ranks (NaN sorts first in Spark desc but
    last in the kernel's pandas prune — silent divergent top-k)."""
    from strava_vector_search_spark.operators.search import (
        brute_force_topk_blas,
    )

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.6, 0.8])],
        "doc_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="zero-norm corpus"):
        brute_force_topk_blas(corpus, [1.0, 0.0], k=2).collect()
    ok = corpus.filter(F.col("doc_id") != 1)
    with pytest.raises(Exception, match="zero-norm query"):
        brute_force_topk_blas(ok, [0.0, 0.0], k=2).collect()
    # and the default is FULL COSINE, matching brute_force_topk: an
    # unnormalized corpus must rank by angle, not magnitude
    big = spark.createDataFrame(
        [(1, [10.0, 0.1]), (2, [0.0, 0.5])],
        "doc_id long, embedding array<double>",
    )
    top = brute_force_topk_blas(big, [0.0, 1.0], k=1).collect()
    assert top[0]["doc_id"] == 2  # dot ranking would pick doc 2 too, but
    # similarity must be cosine (1.0), not the raw dot (0.5)
    assert top[0]["similarity"] == 1.0
