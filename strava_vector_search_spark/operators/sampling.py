"""Deterministic sampling / splitting / mixture / packing operators for
training-data pipelines.

Everything here is driven by the portable 60-bit md5 hash
(:func:`~strava_vector_search_spark.operators.dedup.md5_int`), NOT by RNG
state: the same row lands in the same split/sample/mix on every engine,
every run, any partitioning, any cluster size. That is the property a
100 TB pipeline needs — re-running a failed stage or adding executors must
not reshuffle the train/val membership.

Scale notes:
- splits/samples/mixes are map-only filters over a hash of the key column —
  no shuffle at all; they compose with parquet scans so Catalyst keeps
  pushable predicates in the scan.
- ``weighted_mix`` needs one tiny aggregate (rows-per-domain: |domains|
  rows) which is broadcast back — no fact-side shuffle.
- ``pack_sequences`` is one window shuffle per partition key (the same
  shuffle the downstream "write one file per bin-range" layout would need
  anyway) and uses chunked-concat semantics (bin by starting offset), the
  standard LLM-pretraining packing that needs no sequential state.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.dedup import md5_int

# split/sample decisions quantize the hash to this many buckets; 10^4 gives
# 0.01% rate granularity while staying far under the 60-bit hash space
BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from a key column."""
    return F.pmod(md5_int(key.cast("string")), F.lit(buckets))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Sequence[tuple[str, float]],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Assign every row to a named split by hash of its key.

    ``splits`` is an ordered list of (name, weight); weights must sum to 1.
    The assignment is a pure map-side CASE over the hash bucket — adding a
    row never moves any other row between splits, and the same key always
    lands in the same split (the reproducibility contract a train/val/test
    split must keep across pipeline re-runs).
    """
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(F.col(key_col), buckets)
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        cond = b < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    ``rates`` maps stratum value → keep fraction in [0, 1]; unlisted strata
    use ``default_rate``. Map-only: the per-stratum threshold compiles to a
    CASE, the keep decision to one hash compare — the plan is a single
    Filter over the scan, so Catalyst still pushes other predicates down.
    """
    b = hash_bucket(F.col(key_col), buckets)
    thresh = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == stratum
        lim = int(round(rate * buckets))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    thresh = (
        F.lit(int(round(default_rate * buckets)))
        if thresh is None
        else thresh.otherwise(int(round(default_rate * buckets)))
    )
    return df.filter(b < thresh)


def weighted_mix(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    target: Mapping[str, float],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Downsample domains toward a target mixture, keeping as much data as
    possible.

    Given target proportions p_d (summing to 1 over the listed domains;
    unlisted domains are dropped), the feasible output size is bounded by
    the scarcest domain: T = min_d(n_d / p_d). Each domain then keeps
    ~T * p_d rows via a hash threshold a_d = T * p_d / n_d ∈ (0, 1] — the
    scarcest domain keeps everything, abundant domains shed rows.

    Plan shape: one |domains|-row aggregate, joined back broadcast; the
    keep decision is map-side. The mix is hash-binomial (each domain's
    admitted count concentrates around T * p_d), which is the right
    trade at scale: exact per-domain quotas would need a global sort or
    per-domain top-N shuffle for no practical gain.

    Emits ``mix_threshold`` (the admitted domain's acceptance fraction,
    rounded to 6 dp) alongside the surviving rows.
    """
    total = sum(target.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target proportions must sum to 1, got {total}")
    tgt = F.create_map(
        *[x for d, p in sorted(target.items()) for x in (F.lit(d), F.lit(p))]
    )
    counts = (
        df.filter(F.col(domain_col).isin(*target.keys()))
        .groupBy(F.col(domain_col).alias("_dom"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_p", tgt[F.col("_dom")])
    )
    feasible = counts.agg(F.min(F.col("_n") / F.col("_p")).alias("_t"))
    rates = counts.join(F.broadcast(feasible)).select(
        "_dom",
        F.round(
            F.least(F.lit(1.0), F.col("_t") * F.col("_p") / F.col("_n")), 6
        ).alias("mix_threshold"),
    )
    b = hash_bucket(F.col(key_col), buckets)
    return (
        df.join(F.broadcast(rates), df[domain_col] == F.col("_dom"))
        .filter(b < (F.col("mix_threshold") * buckets).cast("bigint"))
        .drop("_dom")
    )


def temperature_resample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    alpha: float,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Resample domains toward temperature-smoothed proportions
    q_d ∝ n_d^alpha (alpha in (0, 1]; alpha=1 keeps the natural mix,
    alpha→0 approaches uniform) — the standard low-resource upweighting
    used for multilingual / multi-domain LLM pretraining mixtures.

    Downsampling-only: the feasible output size is bounded by the domain
    whose natural share falls shortest of its smoothed share,
    T = min_d(n_d / q_d); each domain keeps rate r_d = min(1, T·q_d/n_d)
    via the deterministic hash threshold. With alpha < 1 the scarcest
    domain keeps everything and abundant domains shed rows.

    Plan shape: one |domains|-row aggregate broadcast back onto the fact
    side; the keep decision is map-only, so the only fact-side work is the
    scan + filter no matter the corpus size. Emits ``mix_threshold``
    (rounded to 6 dp) like :func:`weighted_mix`.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    # q_d = n_d^alpha / sum(n^alpha); the N^alpha normalizer cancels in
    # n_d / q_d so feasibility only needs the smoothed weights
    smoothed = counts.withColumn(
        "_q", F.pow(F.col("_n").cast("double"), F.lit(alpha))
    )
    denom = smoothed.agg(F.sum("_q").alias("_z"))
    shares = smoothed.join(F.broadcast(denom)).withColumn(
        "_p", F.col("_q") / F.col("_z")
    )
    feasible = shares.agg(F.min(F.col("_n") / F.col("_p")).alias("_t"))
    rates = shares.join(F.broadcast(feasible)).select(
        "_dom",
        F.round(
            F.least(F.lit(1.0), F.col("_t") * F.col("_p") / F.col("_n")), 6
        ).alias("mix_threshold"),
    )
    b = hash_bucket(F.col(key_col), buckets)
    return (
        df.join(F.broadcast(rates), df[domain_col] == F.col("_dom"))
        .filter(b < (F.col("mix_threshold") * buckets).cast("bigint"))
        .drop("_dom")
    )


def length_bucketed_batches(
    df: DataFrame,
    key_col: str,
    token_col: str,
    batch_size: int,
) -> DataFrame:
    """Group documents into power-of-two length buckets and fixed-size
    batches within each bucket — the bucketed-batching layout that keeps
    padding waste bounded (≤2× within a bucket) when forming training
    batches from variable-length sequences.

    ``bucket`` = floor(log2(tokens)), computed via the binary-digit count
    (``length(bin(n)) - 1``) so the boundary at exact powers of two cannot
    drift with platform log() rounding. ``batch`` = 0-based index within
    the bucket in ``key_col`` order. One window shuffle on the bucket key;
    rows with tokens < 1 are dropped (nothing to batch).
    """
    src = df.filter(F.col(token_col) >= 1)
    bucket = (
        (F.length(F.bin(F.col(token_col).cast("bigint"))) - 1)
        .cast("bigint")
        .alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy(key_col)
    return (
        src.select("*", bucket)
        .withColumn(
            "batch",
            F.floor((F.row_number().over(w) - 1) / F.lit(batch_size)).cast("bigint"),
        )
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign documents to fixed-token-budget bins (context windows) with
    chunked-concatenation semantics: docs are laid out in key order and a
    doc belongs to the bin its FIRST token falls in (``floor(start/budget)``
    of its running-offset). The standard concat-then-chunk packing used for
    LLM pretraining — deterministic, one window shuffle, no sequential
    driver state. A doc may straddle its bin boundary into the next; the
    reported ``bin_tokens`` is the sum of whole docs assigned to the bin.

    Output: input columns + ``bin`` (0-based within each partition group).
    """
    w = Window.partitionBy(*partition_cols).orderBy(key_col)
    start = F.coalesce(
        F.sum(F.col(token_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return df.withColumn("bin", F.floor(start / F.lit(budget)).cast("bigint"))


def weighted_sample_topk(
    df: DataFrame,
    key: Column | str,
    weight: Column | str,
    k: int,
    seed: str = "ws",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    each row draws a deterministic uniform u from a salted hash of its key
    and competes with sort key u^(1/w); the top-k sort keys ARE the sample,
    with inclusion probability proportional to weight.

    Spark-first shape: the draw and the power are map-only expressions,
    the selection is a global top-k (``TakeOrderedAndProject`` — no full
    sort, no shuffle of losers). Deterministic: same key + seed → same
    sample on any engine, any partitioning, any cluster size — the
    property that makes a 100 TB sample reproducible after a stage retry.

    Rows with weight <= 0 or NULL never qualify. Adds ``ws_key`` (rounded
    to 12 dp so float formatting can't leak engine differences).
    """
    kc = F.col(key) if isinstance(key, str) else key
    wc = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    # u in (0, 1]: (h + 1) / 2^60 over the 60-bit hash space
    u = (md5_int(F.concat(F.lit(seed), F.lit(":"), kc.cast("string"))) + 1) / F.lit(
        float(1 << 60)
    )
    ws = F.round(F.pow(u, F.lit(1.0) / wc), 12)
    return (
        df.filter(wc > 0)
        .withColumn("ws_key", ws)
        .orderBy(F.desc("ws_key"), kc.asc())
        .limit(k)
    )


def hard_negative_pairs(
    emb: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    per_anchor: int = 3,
    dup_ceiling: float = 0.95,
    bits: int = 64,
    bands: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the hardest non-duplicate negatives — highest-cosine candidates drawn
    from the anchor's SRP-LSH buckets (semantically close by construction,
    unlike the uniform hash draws of ``negative_pairs``), with near-dups
    excluded above ``dup_ceiling`` so positives never leak into the
    negative set.

    Scale shape: candidate generation is the SRP band join (map-only
    signatures, one band-key shuffle restricted to the anchor rows);
    exact scoring touches only the candidates; per-anchor selection is a
    rank window over candidate rows. Never all-pairs. Assumes normalized
    embeddings (dot == cosine, the engine-wide convention).
    """
    from pyspark.sql import Window

    from strava_vector_search_spark.operators.ann import srp_band_rows_blas

    # BLAS signature kernel (bit-identical to the expression form, pinned
    # in test_ann) and a lineage cut so the corpus signature stage runs
    # once, not once per downstream join side
    rows_all = srp_band_rows_blas(
        emb, id_col, vector_col, bits, bands, dim
    ).localCheckpoint(eager=False)
    rows_anchor = srp_band_rows_blas(anchors, id_col, vector_col, bits, bands, dim)
    cand = (
        rows_anchor.select(
            F.col("_id").alias("anchor_id"), "band", "key"
        )
        .join(rows_all.select(F.col("_id").alias("neg_id"), "band", "key"),
              ["band", "key"])
        .filter(F.col("anchor_id") != F.col("neg_id"))
        .select("anchor_id", "neg_id")
        .distinct()
    )
    va = emb.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vector_col).cast("array<double>").alias("_va"),
    )
    vb = emb.select(
        F.col(id_col).alias("neg_id"),
        F.col(vector_col).cast("array<double>").alias("_vb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(va, "anchor_id")
        .join(vb, "neg_id")
        .select("anchor_id", "neg_id", F.round(dot, 6).alias("cosine"))
        .filter(F.col("cosine") < dup_ceiling)
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_anchor)
        .select("anchor_id", "neg_id", "cosine", "rn")
    )
