"""Brute-force filtered cosine top-k — the reference's "method 2"
(``02_method2_manual_vector_embedding.sql:206-227``) and its variants:
threshold filtering + cache-decision labels (``02:301-317``), top-k-then-
join-back (``02:324-348``), similarity histogram (``02:373-389``), and the
batch multi-query extension the reference prescribes in prose (``02:421``
"Batch multiple user queries together").

Execution shape (verified via .explain): parquet scan with metadata
predicates **pushed to the scan** → cosine as a codegen'd expression →
``TakeOrderedAndProject`` for the top-k (per-partition heap + driver merge,
no full sort, no shuffle). At 100 TB the metadata filter is the work-saver —
exactly the manual optimization the reference prescribes
(``02:406`` "use metadata filters to reduce search space") — which Catalyst
applies for free as long as the cosine stays an expression, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.vector import (
    lit_double_array,
    lit_long_array,
    lit_string_array,
    similarity,
)

# Reference similarity rubric (README.md:86-90) and the enacted cutoffs
# (02:309-315): >0.80 excellent hit, >0.70 good hit, else miss.
EXCELLENT_CUTOFF = 0.80
GOOD_CUTOFF = 0.70


def _local_topk_ties(s, ids, k):
    """Indices of the local top-k under (score DESC, id ASC).

    argpartition alone breaks ties at the k-th (rounded) score arbitrarily,
    which can locally drop a row the global id-ascending tie-break would
    keep. Two phases keep it cheap AND deterministic: O(n) argpartition
    finds the k-th score, then only the >=k-th candidate set (usually
    exactly k rows) is sorted by (score DESC, id ASC). Works for numeric
    and string id dtypes alike (pandas sort on the tiny candidate frame).
    """
    import numpy as np
    import pandas as pd

    n = len(s)
    if n <= k:
        cand = np.arange(n)
    else:
        part = np.argpartition(-s, k - 1)[:k]
        kth = s[part].min()
        cand = np.flatnonzero(s >= kth)
    order = (
        pd.DataFrame({"_i": cand, "_s": s[cand], "_id": ids[cand]})
        .sort_values(["_s", "_id"], ascending=[False, True], kind="mergesort")
        .head(k)["_i"]
        .to_numpy()
    )
    return order


def brute_force_topk(
    corpus: DataFrame,
    query_vec: list[float] | Column,
    k: int = 5,
    vector_col: str = "embedding",
    id_col: str = "doc_id",
    predicate: Column | None = None,
    similarity_col: str = "similarity",
    assume_normalized: bool = False,
) -> DataFrame:
    """Filter → score → top-k, the EP1 lifecycle (SURVEY §3).

    ``query_vec`` as a Python list compiles to a literal array — the Spark
    equivalent of the reference's 1-row ``query_embedding`` CTE cross join
    (``02:220``) without any join at all. Ties broken by id ascending for
    determinism (reference top-k is tie-unstable; SURVEY §7 risk 5).
    """
    if isinstance(query_vec, list):
        query_vec = lit_double_array(query_vec)
    df = corpus
    if predicate is not None:
        df = df.filter(predicate)
    df = df.filter(F.col(vector_col).isNotNull())
    scored = df.withColumn(
        similarity_col,
        similarity(F.col(vector_col), query_vec, assume_normalized),
    )
    return scored.orderBy(F.desc(similarity_col), F.asc(id_col)).limit(k)


def with_cache_decision(
    scored: DataFrame, similarity_col: str = "similarity"
) -> DataFrame:
    """Cache-decision CASE labels at 0.80/0.70 (reference ``02:309-313``)."""
    s = F.col(similarity_col)
    return scored.withColumn(
        "cache_decision",
        F.when(s > EXCELLENT_CUTOFF, "CACHE HIT - Excellent Match")
        .when(s > GOOD_CUTOFF, "CACHE HIT - Good Match")
        .otherwise("CACHE MISS - Generate New"),
    )


def similarity_histogram(
    corpus: DataFrame,
    query_vec: list[float] | Column,
    vector_col: str = "embedding",
    assume_normalized: bool = False,
) -> DataFrame:
    """Bucket all similarities into the rubric's 5 labeled ranges and count —
    the reference's embedding-space sanity check (``02:373-389``).
    GROUP BY over a computed CASE alias; Catalyst runs it as a partial+final
    hash aggregate on 5 keys (no skew possible).
    """
    if isinstance(query_vec, list):
        query_vec = lit_double_array(query_vec)
    s = similarity(F.col(vector_col), query_vec, assume_normalized)
    bucket = (
        F.when(s >= 0.90, "0.90+ (Excellent)")
        .when(s >= 0.80, "0.80-0.89 (Likely hit)")
        .when(s >= 0.70, "0.70-0.79 (Consider)")
        .when(s >= 0.50, "0.50-0.69 (Weak)")
        .otherwise("< 0.50 (Miss)")
    )
    return (
        corpus.filter(F.col(vector_col).isNotNull())
        .select(bucket.alias("similarity_range"))
        .groupBy("similarity_range")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("similarity_range"))
    )


def topk_join_back(
    corpus_meta: DataFrame,
    scored_topk: DataFrame,
    id_col: str = "doc_id",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Join top-k hits back to the full table for the heavy payload column —
    reference ``02:324-348`` (top-3 CTE then join for RAW_JSON_STR). The
    hits side is k rows → Catalyst broadcast-hash-joins it against the
    corpus; the payload column is only read for k rows (column pruning keeps
    it out of the similarity scan entirely).
    """
    payload = corpus_meta.select(
        id_col, *(payload_cols or [c for c in corpus_meta.columns if c != id_col])
    )
    return F.broadcast(scored_topk).join(payload, id_col, "inner")


def batch_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vector_col: str = "embedding",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    assume_normalized: bool = False,
) -> DataFrame:
    """Many queries in one job: broadcast the query table against the corpus
    and take top-k per query with a ranking window partitioned by query —
    the reference's prescribed batching optimization (``02:421``) expressed
    as one Spark job. The window shuffle partitions by query_id, so it
    scales with the number of queries, and each partition holds only one
    query's scored rows.
    """
    scored = corpus.filter(F.col(vector_col).isNotNull()).join(
        F.broadcast(queries), how="cross"
    )
    scored = scored.withColumn(
        "similarity",
        similarity(F.col(vector_col), F.col(query_vec_col), assume_normalized),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("similarity"), F.asc(id_col)
    )
    return (
        # bigint rank: matches the width ROW_NUMBER() has in ANSI engines
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .drop(query_vec_col, vector_col)
    )


def batch_topk_blas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vector_col: str = "embedding",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    meta_cols: list[str] | None = None,
    assume_normalized: bool = True,
) -> DataFrame:
    """BLAS kernel for :func:`batch_topk`: the (small, by definition)
    query table is collected into a Q matrix, each Arrow batch of the
    corpus is scored with ONE ``Q @ V.T`` matmul, and only the per-batch
    per-query top-k survive into the global window rank — nq*k rows per
    batch instead of nq*|batch|.

    ``assume_normalized`` DEFAULTS to True (the lane's historical
    contract: pre-normalized corpora, dot == cosine). Pass False for
    unnormalized corpora: full cosine via einsum row norms + query
    norms, exactly :func:`brute_force_topk_blas`'s formula — on
    integer-valued embeddings (the md5 parity kernel) it is
    BIT-IDENTICAL to the expression lane by the same exact-below-2^53
    argument, so value-hash oracles carry over unchanged.

    Same results as the expression form (scores round to 6 dp — the
    vs_topk_blas-proven contract); one corpus scan total. ``meta_cols``
    are joined back broadcast-style for the final (per-query top-k) rows
    only, keeping payload columns out of the scored scan."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id_col, query_vec_col).collect()
    qids = np.array([r[query_id_col] for r in qrows])
    qmat = np.stack([np.asarray(r[query_vec_col], dtype="float64") for r in qrows])
    nq = len(qids)
    qnorms = np.sqrt(np.einsum("ij,ij->i", qmat, qmat))
    if not assume_normalized and (qnorms == 0.0).any():
        raise ValueError(
            "batch_topk_blas: zero-norm query vector(s), e.g. query_id="
            f"{qids[qnorms == 0.0][0]!r} — cosine is undefined (the "
            "expression lane raises DIVIDE_BY_ZERO under ANSI mode)"
        )
    id_type = corpus.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()

    from strava_vector_search_spark.operators.util import rebalance_for_kernel

    narrow = rebalance_for_kernel(
        corpus.filter(F.col(vector_col).isNotNull()).select(
            F.col(id_col).alias("_id"), F.col(vector_col).alias("_vec")
        )
    )

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            mat = np.stack(pdf["_vec"].to_numpy()).astype("float64")
            dots = qmat @ mat.T  # nq x nb
            if assume_normalized:
                scores = np.round(dots, 6)
            else:
                rn = np.sqrt(np.einsum("ij,ij->i", mat, mat))
                if (rn == 0.0).any():
                    raise ValueError(
                        "batch_topk_blas: zero-norm corpus vector(s), "
                        f"e.g. id={ids[rn == 0.0][0]!r} — cosine is "
                        "undefined (the expression lane raises "
                        "DIVIDE_BY_ZERO under ANSI mode); filter them "
                        "out before scoring"
                    )
                scores = np.round(dots / (qnorms[:, None] * rn[None, :]), 6)
            nb = scores.shape[1]
            take = min(k, nb)
            # Per-query local top-k. The local prune must never drop a row
            # the global (similarity DESC, id ASC) rank would keep, so ties
            # at the k-th score are resolved by id ascending: argpartition
            # (O(nb)) finds the k-th score, then only the tied candidate
            # set (usually exactly k rows) is sorted.
            out_q, out_i, out_s = [], [], []
            for qi in range(nq):
                s = scores[qi]
                cand = _local_topk_ties(s, ids, take)
                out_q.append(np.repeat(qids[qi], len(cand)))
                out_i.append(ids[cand])
                out_s.append(s[cand])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    "_id": np.concatenate(out_i),
                    "similarity": np.concatenate(out_s),
                }
            )

    local = narrow.mapInPandas(
        _score, f"{query_id_col} {qid_type}, _id {id_type}, similarity double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("similarity"), F.asc("_id"))
    top = (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("_id", id_col)
    )
    if meta_cols:
        meta = corpus.select(id_col, *meta_cols)
        top = F.broadcast(top).join(meta, id_col, "inner")
    return top


def brute_force_topk_blas(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vector_col: str = "embedding",
    id_col: str = "doc_id",
    predicate: Column | None = None,
    similarity_col: str = "similarity",
    assume_normalized: bool = False,
    payload: bool = True,
) -> DataFrame:
    """Exact top-k with a dense BLAS inner kernel: each Arrow batch is
    scored with one float64 numpy matvec and reduced to its local top-k
    (argpartition) inside mapInPandas; the surviving k-per-batch rows go
    through the normal TakeOrderedAndProject merge.

    ``assume_normalized`` DEFAULTS to False — full cosine, the same
    default as :func:`brute_force_topk` — so switching lanes without the
    flag cannot silently turn cosine ranking into magnitude-biased dot
    products. Pass True only for pre-normalized corpora (dot == cosine;
    skips the per-row norms).

    Same result as :func:`brute_force_topk` (modulo last-ulp float
    differences — scores round to 6 dp); ~10x faster per core at dim>=64 on
    large corpora because the dot product runs at SIMD speed instead of one
    codegen lambda iteration per element. Use for the 1M+ regime; the
    expression form remains the default (no Python in the plan, pushdown
    guaranteed).

    ``assume_normalized=False`` scores FULL cosine — dot / (norm_doc ·
    norm_query), the expression lane's exact formula with matvec +
    einsum row norms. On integer-valued embeddings (the md5 parity
    kernel) every dot/norm² term is exact below 2^53, and IEEE
    sqrt/mul/div are correctly rounded, so this lane is BIT-IDENTICAL
    to the expression lane (pinned in tests/test_search.py) — which is
    why the 768-d flagship gate can ride it and keep its value-hash
    oracle green.
    """
    import numpy as np
    import pandas as pd

    df = corpus
    if predicate is not None:
        df = df.filter(predicate)
    df = df.filter(F.col(vector_col).isNotNull())
    from strava_vector_search_spark.operators.util import rebalance_for_kernel

    narrow = rebalance_for_kernel(
        df.select(F.col(id_col).alias("_id"), F.col(vector_col).alias("_vec"))
    )
    q = None
    qn = None

    id_type = corpus.schema[id_col].dataType.simpleString()

    def _score(batches):
        nonlocal q, qn
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if q is None:
                q = np.asarray(query_vec, dtype="float64")
                qn = float(np.sqrt(q @ q))
                if not assume_normalized and qn == 0.0:
                    raise ValueError(
                        "brute_force_topk_blas: zero-norm query vector — "
                        "cosine is undefined (the expression lane raises "
                        "DIVIDE_BY_ZERO under ANSI mode; this lane "
                        "matches it loudly instead of yielding "
                        "batch-order-dependent NaN ranks)"
                    )
            ids = pdf["_id"].to_numpy()
            mat = np.stack(pdf["_vec"].to_numpy()).astype("float64")
            d = mat @ q
            if assume_normalized:
                s = np.round(d, 6)
            else:
                rn = np.sqrt(np.einsum("ij,ij->i", mat, mat))
                if (rn == 0.0).any():
                    raise ValueError(
                        "brute_force_topk_blas: zero-norm corpus "
                        f"vector(s), e.g. id={ids[rn == 0.0][0]!r} — "
                        "cosine is undefined (the expression lane raises "
                        "DIVIDE_BY_ZERO under ANSI mode); filter them "
                        "out before scoring"
                    )
                s = np.round(d / (rn * qn), 6)
            idx = _local_topk_ties(s, ids, k)
            yield pd.DataFrame({"_id": ids[idx], similarity_col: s[idx]})

    local = narrow.mapInPandas(
        _score, f"_id {id_type}, {similarity_col} double"
    )
    top = local.orderBy(F.desc(similarity_col), F.asc("_id")).limit(k)
    top = top.withColumnRenamed("_id", id_col)
    if not payload:
        # (id, similarity) only — callers joining their own metadata skip
        # the corpus join-back (and the second consumption of its lineage)
        return top
    # join back for the full rows (k-row broadcast)
    return F.broadcast(top).join(df, id_col, "inner")


def hybrid_topk(
    corpus: DataFrame,
    query_vec: list[float],
    query_terms: list[str],
    k: int = 10,
    vector_weight: float = 0.5,
    vector_col: str = "embedding",
    text_col: str = "text",
    id_col: str = "doc_id",
    predicate: Column | None = None,
    assume_normalized: bool = False,
) -> DataFrame:
    """Hybrid retrieval: weighted fusion of semantic (vector) and keyword
    (term-overlap) scores — the shape managed search services (incl. the
    reference's Cortex) serve under the hood.

    keyword = |query_terms ∩ doc_tokens| / |query_terms| (both distinct);
    final = vector_weight * vec + (1-vector_weight) * keyword, both rounded
    at 6 dp before fusion for cross-engine determinism. All expressions —
    the keyword leg is an array_intersect over the tokenized scan, no
    inverted index needed for scoring (at serving scale, pre-tokenize at
    write time the way embeddings are pre-computed).
    """
    from strava_vector_search_spark.functions.vector import similarity

    terms = F.array_distinct(lit_string_array([t.lower() for t in query_terms]))
    qcol = lit_double_array(query_vec)
    df = corpus
    if predicate is not None:
        df = df.filter(predicate)
    df = df.filter(F.col(vector_col).isNotNull())
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    )
    kw = F.round(
        F.size(F.array_intersect(toks, terms)) / F.size(terms), 6
    )
    vec = similarity(F.col(vector_col), qcol, assume_normalized)
    scored = df.withColumn("keyword_score", kw).withColumn(
        "vector_score", vec
    ).withColumn(
        "score",
        F.round(
            F.lit(vector_weight) * F.col("vector_score")
            + F.lit(1.0 - vector_weight) * F.col("keyword_score"),
            6,
        ),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def matryoshka_topk(
    corpus: DataFrame,
    query_vec: list[float] | Column,
    prefix_dims: int,
    candidates: int,
    k: int = 5,
    vector_col: str = "embedding",
    id_col: str = "doc_id",
    predicate: Column | None = None,
    prefix_col: str | None = None,
) -> DataFrame:
    """Coarse-to-fine retrieval over nested (matryoshka) embedding
    prefixes: rank by the RENORMALIZED first ``prefix_dims`` dimensions,
    keep ``candidates`` survivors, rerank them exactly with the full
    vector. With an MRL-trained embedder the prefix preserves ranking
    quality at a fraction of the arithmetic; with any embedder this is the
    standard two-stage funnel (cheap score → exact rerank).

    Pass ``prefix_col`` (a pre-materialized ``array<double>`` prefix
    column, written at index-build time) to skip the per-row slice: the
    coarse scan then reads and folds ONLY the narrow column — this is the
    configuration where the funnel beats brute force (see SCALE.md); the
    slice-at-query-time fallback exists for ad-hoc use but pays an array
    copy per row.

    Scale shape: the full-corpus pass touches only ``prefix_dims`` floats
    per row (at 768-dim vectors and a 32-dim prefix, 24× less arithmetic
    and — with the prefix materialized as its own narrow column/table —
    24× less I/O); both stages are ``TakeOrderedAndProject`` (per-partition
    heap, no shuffle of losers), and the exact rerank reads full vectors
    for ``candidates`` rows only. The prefix must be renormalized (a
    prefix of a unit vector is not unit); the full-vector rerank relies on
    the write-time L2 normalization, so fine score = dot.

    Approximate by design: a true top-k row whose prefix score falls
    outside the top ``candidates`` is lost — the recall/cost dial every
    multi-stage retriever exposes.
    """
    from strava_vector_search_spark.functions.vector import (
        dot_product,
        l2_norm,
    )

    qp_norm_lit = None
    if isinstance(query_vec, list):
        qf = [float(x) for x in query_vec]
        q_full = lit_double_array(qf)
        q_pref = lit_double_array(qf[:prefix_dims])
        # fold the query-prefix norm on the driver: a literal, not a
        # per-row aggregate expression (Catalyst does not constant-fold
        # the higher-order fold)
        import math

        qp_norm_lit = math.sqrt(sum(x * x for x in qf[:prefix_dims]))
    else:
        q_full = query_vec
        q_pref = F.slice(query_vec, 1, prefix_dims)
    df = corpus
    if predicate is not None:
        df = df.filter(predicate)
    df = df.filter(F.col(vector_col).isNotNull())
    if prefix_col is not None:
        pref = F.col(prefix_col).cast("array<double>")
    else:
        pref = F.slice(F.col(vector_col).cast("array<double>"), 1, prefix_dims)
    qp = q_pref.cast("array<double>")
    qn = F.lit(qp_norm_lit) if qp_norm_lit is not None else l2_norm(qp)
    # zero-norm guard: a truncated vector CAN be all-zero even when the
    # full vector is unit (mass outside the prefix) — score it NULL, which
    # sorts last under DESC in both engines, instead of tripping ANSI
    # divide-by-zero
    norms = l2_norm(pref) * qn
    coarse = F.round(
        F.when(norms > 0, dot_product(pref, qp) / norms), 6
    )
    cand = (
        df.withColumn("coarse", coarse)
        .orderBy(F.desc("coarse"), F.asc(id_col))
        .limit(candidates)
    )
    return (
        cand.withColumn(
            "similarity",
            similarity(F.col(vector_col), q_full, assume_normalized=True),
        )
        .orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(k)
    )


def binary_sign_words(
    vec: Column, dim: int, word_bits: int = 32
) -> list[Column]:
    """Pack the sign bits of a ``dim``-dimensional vector into
    ``ceil(dim/word_bits)`` BIGINT words (bit i of word w set iff
    ``vec[w*word_bits + i] > 0``).

    32-bit words in a 64-bit lane keep every value non-negative, so the
    packing is identical across engines regardless of signed-shift
    semantics. Each word is ONE fold over its bit positions against a
    literal mask table — not an unrolled sum of 32 CASE terms per word,
    which at 768 dims (24 words × 32 whens) overflows the JVM's 64 KB
    method limit and silently drops whole-stage codegen to the
    interpreter. The fold keeps generated code size constant in ``dim``.
    """
    v = vec.cast("array<double>")
    masks = lit_long_array([1 << i for i in range(word_bits)])

    def word_fold(w: int) -> Column:
        def step(acc, i):
            return acc + F.when(
                F.element_at(v, i + w + 1) > 0, F.element_at(masks, i + 1)
            ).otherwise(F.lit(0).cast("long"))

        n_bits = min(word_bits, dim - w)
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(n_bits - 1)),
            F.lit(0).cast("long"),
            step,
        )

    return [word_fold(w) for w in range(0, dim, word_bits)]


def binary_hamming(words: list[Column], query_words: list[int]) -> Column:
    """Hamming distance between a packed signature and a literal query
    signature: Σ bit_count(word XOR query_word) — one popcount per 32
    dims, the cheapest similarity proxy there is."""
    h = None
    for wcol, qw in zip(words, query_words):
        t = F.bit_count(wcol.bitwiseXOR(F.lit(int(qw)).cast("long")))
        h = t if h is None else h + t
    return h.cast("int")


def pack_sign_words(vec: list[float], word_bits: int = 32) -> list[int]:
    """Driver-side twin of :func:`binary_sign_words` for the query vector."""
    out = []
    for w in range(0, len(vec), word_bits):
        word = 0
        for i, x in enumerate(vec[w : w + word_bits]):
            if x > 0:
                word |= 1 << i
        out.append(word)
    return out


def binary_topk(
    corpus: DataFrame,
    query_vec: list[float],
    candidates: int = 50,
    k: int = 10,
    vector_col: str = "embedding",
    id_col: str = "doc_id",
    predicate: Column | None = None,
) -> DataFrame:
    """Binary-quantization retrieval: sign-bit signatures → Hamming
    candidate scan → exact cosine rerank of the survivors.

    The asymmetric two-stage shape every binary-quantized vector store
    uses: the coarse pass costs 1 bit/dim (a 768-dim float32 corpus scans
    32× less data once signatures are materialized in their own narrow
    column — see ``write_srp_index`` for the same materialization recipe)
    and ranks by ``popcount(xor)``; only ``candidates`` rows are re-scored
    exactly. Both stages end in ``TakeOrderedAndProject`` (per-partition
    heap, no shuffle of losers) and the rerank joins the tiny candidate
    set BROADCAST back to the corpus, so the full vectors of non-survivors
    are never materialized.

    Deterministic end-to-end: bit rule is strictly ``x > 0``, candidate
    ties break (hamming ASC, id ASC), rerank ties (cosine DESC, id ASC) —
    bit-reproducible against the DuckDB oracle. Approximate by design:
    recall is the ``candidates`` dial, like every binary-quantized index.
    """
    qf = [float(x) for x in query_vec]
    qwords = pack_sign_words(qf)
    df = corpus
    if predicate is not None:
        df = df.filter(predicate)
    df = df.filter(F.col(vector_col).isNotNull())
    if len(qf) < 128:
        # narrow dims: pure-expression pack, stays in codegen
        words = binary_sign_words(F.col(vector_col), dim=len(qf))
        scored = df.select(
            F.col(id_col), binary_hamming(words, qwords).alias("hamming")
        )
    else:
        # wide dims: Arrow BLAS pack (expression fold measured ~750 µs/row
        # at 768d), Hamming still a codegen'd popcount over the words
        packed = binary_sign_table_blas(
            df.select(id_col, vector_col), dim=len(qf), vector_col=vector_col
        )
        wcols = [F.col(f"bw{i}") for i in range(len(qwords))]
        scored = packed.select(
            F.col(id_col), binary_hamming(wcols, qwords).alias("hamming")
        )
    cand = (
        scored.orderBy(F.asc("hamming"), F.asc(id_col)).limit(candidates)
    )
    q_full = lit_double_array(qf)
    return (
        df.join(F.broadcast(cand), id_col)
        .withColumn("similarity", similarity(F.col(vector_col), q_full))
        .orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(k)
        .select(id_col, "hamming", "similarity")
    )


def write_binary_index(
    emb: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> None:
    """Materialize sign-bit signature words (bw0..bwN, one BIGINT per 32
    dims) next to the vectors. The Hamming candidate scan over this layout
    reads ONLY (id, words) — at 768 dims that is 24 bytes/row instead of
    3 KB/row of float32, a 128× scan-volume cut (column pruning does the
    work; verify with .explain ReadSchema). One-off build cost, map-only.
    NULL-vector rows are dropped (unsearchable). Wide dims pack via the
    Arrow BLAS kernel, narrow dims via codegen expressions."""
    _sign_wide(emb, dim, vector_col).write.mode("overwrite").parquet(path)


def _sign_wide(emb: DataFrame, dim: int, vector_col: str) -> DataFrame:
    base = emb.filter(F.col(vector_col).isNotNull())
    if dim < 128:
        words = binary_sign_words(F.col(vector_col), dim=dim)
        return base.select(
            "*", *[w.alias(f"bw{i}") for i, w in enumerate(words)]
        )
    return binary_sign_table_blas(base, dim=dim, vector_col=vector_col)


def binary_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    candidates: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """binary_topk over a write_binary_index layout: the candidate stage
    projects only the stored signature words (narrow columnar scan, no
    signature computation at query time), then the exact rerank joins the
    broadcast candidate set back and decodes full vectors for those rows
    only."""
    qf = [float(x) for x in query_vec]
    qwords = pack_sign_words(qf)
    df = spark.read.parquet(path)
    wcols = [F.col(f"bw{i}") for i in range(len(qwords))]
    h = None
    for wcol, qw in zip(wcols, qwords):
        t = F.bit_count(wcol.bitwiseXOR(F.lit(int(qw)).cast("long")))
        h = t if h is None else h + t
    cand = (
        df.select(F.col(id_col), h.cast("int").alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(candidates)
    )
    q_full = lit_double_array(qf)
    return (
        df.join(F.broadcast(cand), id_col)
        .withColumn("similarity", similarity(F.col(vector_col), q_full))
        .orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(k)
        .select(id_col, "hamming", "similarity")
    )


def append_to_binary_index(
    new_emb: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> None:
    """Incremental maintenance of a write_binary_index layout: sign-pack
    the NEW rows only (map-only) and append their files — O(delta), no
    rebuild, the same freshness pattern as ``append_to_srp_index``. A
    query after the append sees old + new rows in one scan."""
    _sign_wide(new_emb, dim, vector_col).write.mode("append").parquet(path)


def binary_sign_table_blas(
    df: DataFrame,
    dim: int,
    vector_col: str = "embedding",
    word_bits: int = 32,
) -> DataFrame:
    """All input columns + sign-bit words (bw0..bwN) via a vectorized
    Arrow kernel: one ``(batch × dim) > 0`` compare and one matvec against
    the bit-weight vector per word — the wide-dim packing path.

    The expression fold (``binary_sign_words``) is the right shape at
    narrow dims, but ArrayAggregate pays per-step interpreter overhead:
    at 768 dims that is ~750 µs/row (measured), vs microseconds here.
    Same bit semantics (strictly ``x > 0``), so kernels interchange
    freely with the expression form and the SQL oracle. Rows with a NULL
    vector must be filtered upstream (they are unsearchable anyway).
    """
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    n_words = (dim + word_bits - 1) // word_bits
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(f"bw{i}", LongType(), True) for i in range(n_words)]
    )

    def _pack(batches):
        for pdf in batches:
            if len(pdf) == 0:
                for w in range(n_words):
                    pdf[f"bw{w}"] = []
                yield pdf
                continue
            m = np.stack(pdf[vector_col].to_numpy())
            bits = m > 0
            for w in range(n_words):
                seg = bits[:, w * word_bits : (w + 1) * word_bits]
                weights = 1 << np.arange(seg.shape[1], dtype=np.int64)
                pdf[f"bw{w}"] = seg.astype(np.int64) @ weights
            yield pdf

    return df.mapInPandas(_pack, out_schema)
