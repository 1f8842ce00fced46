"""Deduplication operators for large-scale training-data pipelines.

The reference's cache-hit rubric is itself a near-duplicate test ("is this
query similar enough to a stored workout", README.md:86-90); these operators
generalize it to corpus-level dedup, the standard LLM-pipeline suite:

* exact dedup — hash-groupBy, keep-first;
* n-gram (shingle) Jaccard — inverted-index self-join, exact;
* MinHash + LSH — signature → bands → bucket join, approximate, linear-ish;
* SimHash — bitwise fingerprint for hamming-based near-dup;
* embedding cosine near-dup — exact self-join (small) / LSH-bucketed (scale).

Determinism: every hash routes through md5 → first 15 hex chars → int
(60 bits), which both Spark (``conv(substr(md5(x),1,15),16,10)``) and DuckDB
(``('0x'||substr(md5(x),1,15))::BIGINT``) compute identically, so even the
MinHash signatures are oracle-checkable. MinHash permutations are
``h_i(x) = (a_i * (x mod P) + b_i) mod P`` with P = 2^31-1; a*x stays under
2^62 so bigint arithmetic never overflows in either engine.

Scale notes (100 TB):
* the shingle inverted-index join shuffles on shingle — frequent shingles
  skew; ``max_shingle_df`` drops stop-shingles (standard practice) and AQE
  skew-join splits the rest;
* MinHash LSH is the scale path: signatures are MAP-ONLY (per-row array
  expressions, no shuffle at all); the only shuffle is the band join on
  (band, band-signature) whose groups are tiny by construction;
* pair generation within a bucket is quadratic per bucket but buckets are
  capped by construction (near-identical documents); catastrophic buckets
  (e.g. empty docs) are guarded by ``max_bucket_size``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MINHASH_P = 2_147_483_647  # 2^31 - 1, prime


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the MinHash permutations — the single
    source of truth shared by the Spark implementation and the generated
    oracle SQL."""
    out = []
    for i in range(num_hashes):
        a = (2_654_435_761 * (i + 1) + 913) % MINHASH_P
        b = (40_503 * (i + 1) + 17) % MINHASH_P
        out.append((a or 1, b))
    return out


def md5_int(col: Column) -> Column:
    """Portable 60-bit integer hash (identical in Spark and DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# Canonical tokenizer lives in functions.text; re-exported here because
# every dedup kernel (shingles, span windows, the shared _token_arrays
# session kernel) is defined in terms of it. ONE definition — a silent
# divergence would split tokenizer semantics between the dedup gates and
# the text gates (tests/test_dedup.py pins the re-export identity).
from strava_vector_search_spark.functions.text import tokens  # noqa: E402,F401


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-token shingles of a text column (word n-grams)."""
    toks = tokens(text)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(_id, s) exploded distinct shingles — the shared first stage of every
    text near-dup operator.

    Tokenization is materialized into a column BEFORE shingling: referencing
    the token expression 4x inside one projection makes codegen re-run the
    regex split per reference (measured 8x slower at sf0.1).
    """
    tok = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_ts")
    )
    ts = F.col("_ts")
    sh_arr = F.array_distinct(
        F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ts) - n),
                lambda i: F.array_join(F.slice(ts, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(ts, " ")))
    )
    return tok.select("_id", F.explode(sh_arr).alias("s"))


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact key (hash-groupBy dedup).

    One shuffle on the raw key columns. Partitioning on the columns
    themselves (not a derived digest) is both correct and free: Spark's
    shuffle routes by an internal hash of the partition expressions, so a
    precomputed digest would not shrink the shuffle — and a truncated
    digest as the *correctness* key would merge distinct keys on collision
    (at billions of rows, 60-bit birthday collisions are expected) and
    conflate NULL with empty string under separator-joined concat.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.asc(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dup_groups(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Report duplicate groups: key → n_copies, surviving (min) id."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All pairs with shingle-Jaccard ≥ threshold, via inverted-index join.

    Exact: J(a,b) = |A∩B| / (|A|+|B|-|A∩B|) with the intersection counted by
    grouping the shingle-level self-join. ``max_shingle_df`` drops shingles
    appearing in more than that many docs (stop-shingle skew guard; changes
    semantics from exact to filtered-exact, so off by default).
    """
    # materialize the shingle relation once: the size aggregate and BOTH
    # self-join sides read it, and the tokenize+shingle kernel is the
    # dominant scan cost (measured 1.5× at sf0.1 vs recomputing)
    sh = shingle_rows(df, id_col, text_col, n).localCheckpoint(eager=False)
    size = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is not None:
        keep = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") <= max_shingle_df
        )
        sh = sh.join(keep.select("s"), "s")
    a = sh.select(F.col("_id").alias("id1"), "s")
    b = sh.select(F.col("_id").alias("id2"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz1 = size.select(F.col("_id").alias("id1"), F.col("n_sh").alias("n1"))
    sz2 = size.select(F.col("_id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(sz1, "id1")
        .join(sz2, "id2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "inter", "n1", "n2", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All pairs with shingle CONTAINMENT ≥ threshold — the asymmetric
    near-dup measure C = |A∩B| / min(|A|,|B|) that catches a short document
    embedded inside a long one, which symmetric Jaccard structurally misses
    (a 50-shingle doc fully contained in a 5000-shingle doc has J ≈ 0.01
    but C = 1.0). The standard screen for quote/excerpt/boilerplate
    duplication in pretraining corpora.

    Same inverted-index plan as :func:`ngram_jaccard_pairs` (shuffle on the
    8-byte-ish shingle key, never the documents): candidate pairs are only
    those sharing ≥1 shingle, so cost is bounded by shared-shingle mass,
    not |docs|². Emits ``contained_id`` — the smaller-shingle-set side
    (lower id on ties), i.e. the row a keep-longest dedup policy drops.
    """
    # shared-scan materialization: size aggregate + both join sides (see
    # ngram_jaccard_pairs — same measured 1.5× win)
    sh = shingle_rows(df, id_col, text_col, n).localCheckpoint(eager=False)
    size = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("_id").alias("id1"), "s")
    b = sh.select(F.col("_id").alias("id2"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz1 = size.select(F.col("_id").alias("id1"), F.col("n_sh").alias("n1"))
    sz2 = size.select(F.col("_id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(sz1, "id1")
        .join(sz2, "id2")
        .withColumn(
            "containment",
            F.round(F.col("inter") / F.least("n1", "n2"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .withColumn(
            "contained_id",
            F.when(F.col("n1") <= F.col("n2"), F.col("id1")).otherwise(
                F.col("id2")
            ),
        )
        .select("id1", "id2", "inter", "n1", "n2", "containment", "contained_id")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate near-dup, the scale path)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) MinHash signatures over shingles.

    Computed entirely as array expressions per row — shingle array → one
    md5-hash pass (materialized once in its own projection) → array_min per
    permutation. MAP-ONLY: no explode, no shuffle; 2.3x faster than the
    explode+groupBy formulation at sf0.1 and shuffle-free at any scale.
    Values identical to the fold definition (verified bit-for-bit).
    """
    coeffs = minhash_coeffs(num_hashes)
    tok = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_ts")
    )
    ts = F.col("_ts")
    sh_arr = F.array_distinct(
        F.when(
            F.size(ts) >= shingle_n,
            F.transform(
                F.sequence(F.lit(0), F.size(ts) - shingle_n),
                lambda i: F.array_join(F.slice(ts, i + 1, shingle_n), " "),
            ),
        ).otherwise(F.array(F.array_join(ts, " ")))
    )
    with_x = tok.select(
        "_id",
        F.transform(sh_arr, lambda s: F.pmod(md5_int(s), F.lit(MINHASH_P))).alias("_xs"),
    )
    xs = F.col("_xs")

    def perm(a: int, b: int):
        return F.array_min(
            F.transform(xs, lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(MINHASH_P)))
        )

    return with_x.select(
        F.col("_id").alias(id_col),
        F.array(*[perm(a, b) for a, b in coeffs]).alias("sig"),
    )


def minhash_band_rows_kernel(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(_id, band, bkey) MinHash band rows via a fused Python kernel —
    bit-identical to the expression pipeline (tokenize → shingle → md5 →
    permutation mins → band-slice md5, same constants), but one
    ``mapInPandas`` pass instead of a chain of higher-order array
    expressions, which Spark evaluates interpreted (no codegen for HOFs).
    Measured ~2.5x on the 50K-doc probe; parity asserted in tests and by
    the dd_minhash_lsh_verified oracle gate."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    coeffs = minhash_coeffs(num_hashes)
    a_arr = np.array([a for a, _ in coeffs], dtype="int64").reshape(-1, 1)
    b_arr = np.array([b for _, b in coeffs], dtype="int64").reshape(-1, 1)
    r = num_hashes // bands
    tok_re = re.compile(r"[^a-z0-9]+")

    def _md5i(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

    def _rows(batches):
        for pdf in batches:
            out_id, out_band, out_key = [], [], []
            for _id, text in zip(pdf["_id"], pdf["_t"]):
                toks = [t for t in tok_re.split((text or "").lower()) if t]
                if len(toks) >= shingle_n:
                    sh = {
                        " ".join(toks[i : i + shingle_n])
                        for i in range(len(toks) - shingle_n + 1)
                    }
                else:
                    sh = {" ".join(toks)}
                xs = np.array([_md5i(s) % MINHASH_P for s in sh], dtype="int64")
                sig = ((a_arr * xs + b_arr) % MINHASH_P).min(axis=1)
                for band in range(bands):
                    key = _md5i(",".join(str(v) for v in sig[band * r : (band + 1) * r]))
                    out_id.append(_id)
                    out_band.append(band)
                    out_key.append(key)
            yield pd.DataFrame({"_id": out_id, "band": out_band, "bkey": out_key})

    from strava_vector_search_spark.operators.util import rebalance_for_kernel

    id_type = df.schema[id_col].dataType.simpleString()
    src = rebalance_for_kernel(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    )
    return src.mapInPandas(_rows, f"_id {id_type}, band int, bkey bigint")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
    kernel: str = "pandas",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band bucket.

    Bands of r = num_hashes/bands rows each; two docs collide in a band iff
    their signatures agree on all r rows, P(collide) = j^r per band. The
    band join shuffles on (band_idx, band_key) — an 8-byte md5 of the band
    slice — and ``max_bucket_size`` drops degenerate buckets.

    ``kernel='pandas'`` (default) computes band rows via the fused Python
    kernel (minhash_band_rows_kernel); ``'expr'`` uses the pure-expression
    signature pipeline — same bits, kept as the dependency-free reference
    the dd_minhash_signatures oracle mirrors.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    if kernel == "pandas":
        band_rows = minhash_band_rows_kernel(
            df, id_col, text_col, num_hashes, bands, shingle_n
        )
    else:
        sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
        band_rows = sig.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        md5_int(
                            F.array_join(
                                F.transform(
                                    F.slice(F.col("sig"), b * r + 1, r),
                                    lambda v: v.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bkey"),
                    ),
                )
            ).alias("bb"),
        ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    sized = band_rows.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "bkey"))
    ).filter(F.col("bucket_n") <= max_bucket_size)
    a = sized.select("band", "bkey", F.col("_id").alias("id1"))
    b = sized.select("band", "bkey", F.col("_id").alias("id2"))
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def minhash_dedup_verified(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidates → exact Jaccard verification ≥ threshold.

    The production dedup pipeline: LSH prunes the pair space from O(N²) to
    near-linear, exact Jaccard on the survivors removes false positives.
    """
    # materialize the shingle table once: both the LSH candidate generation
    # and the verification joins read it, and Spark would otherwise recompute
    # the tokenize+shingle lineage per branch (at scale: write it to parquet)
    sh = shingle_rows(df, id_col, text_col, shingle_n).localCheckpoint(eager=False)
    cands = minhash_lsh_pairs(df, id_col, text_col, num_hashes, bands, shingle_n)
    size = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # candidate-DRIVEN intersection: start from the (small) candidate pair
    # set and join shingles per side, instead of the full shingle self-join.
    # With a small shingle vocabulary the self-join explodes quadratically;
    # this path scales with |candidates| x shingles-per-doc.
    inter = (
        cands.join(sh.select(F.col("_id").alias("id1"), "s"), "id1")
        .join(sh.select(F.col("_id").alias("id2"), "s"), ["id2", "s"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(size.select(F.col("_id").alias("id1"), F.col("n_sh").alias("n1")), "id1")
        .join(size.select(F.col("_id").alias("id2"), F.col("n_sh").alias("n2")), "id2")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash_kernel(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """Fused Python kernel for :func:`simhash` — bit-identical fingerprints
    (same tokenize/md5/threshold pipeline), one ``mapInPandas`` pass instead
    of explode + groupBy + 2*bits conditional aggregates. Each distinct
    token's ±1 bit vector is computed once per batch (cached by token), so
    work scales with vocabulary + token instances, not bits × instances.
    No shuffle at all (the expression form shuffles on (id, token))."""
    import hashlib
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd

    tok_re = re.compile(r"[^a-z0-9]+")
    jays = np.arange(bits, dtype="int64")
    weights = (np.int64(1) << jays)

    def _fp(batches):
        cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            out_id, out_fp = [], []
            for _id, text in zip(pdf["_id"], pdf["_t"]):
                counts = Counter(
                    t for t in tok_re.split((text or "").lower()) if t
                )
                if not counts:
                    continue  # parity: explode of an empty token array
                    # emits no rows, so the expression form drops the doc
                acc = np.zeros(bits, dtype="int64")
                for t, w in counts.items():
                    pm = cache.get(t)
                    if pm is None:
                        h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                        pm = np.where((h >> jays) & 1 == 1, 1, -1).astype("int64")
                        cache[t] = pm
                    acc += pm * w
                out_id.append(_id)
                out_fp.append(int(((acc > 0).astype("int64") * weights).sum()))
            yield pd.DataFrame({"_id": out_id, "fp": out_fp})

    from strava_vector_search_spark.operators.util import rebalance_for_kernel

    id_type = df.schema[id_col].dataType.simpleString()
    src = rebalance_for_kernel(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    )
    return src.mapInPandas(_fp, f"_id {id_type}, fp bigint").select(
        F.col("_id").alias(id_col), F.col("fp").alias("simhash")
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, kernel: str = "pandas"
) -> DataFrame:
    """(id, simhash: bigint) — token-frequency-weighted SimHash fingerprint.

    Bit j of the fingerprint is 1 iff sum over tokens of
    count(token) * (bit j of md5int(token) ? +1 : -1) > 0. Near-dups have
    small hamming distance. ``kernel='pandas'`` (default) runs the fused
    shuffle-free kernel; ``'expr'`` is the pure-expression reference the
    dd_simhash oracle mirrors: explode → groupBy(id, token) count →
    per-bit conditional sums → bit assembly.
    """
    if kernel == "pandas":
        return simhash_kernel(df, id_col, text_col, bits)
    tok = df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("t"))
    cnt = tok.groupBy("_id", "t").agg(F.count(F.lit(1)).alias("w"))
    h = md5_int(F.col("t"))
    per_bit = cnt.select(
        "_id",
        *[
            (
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.col("w"))
                .otherwise(-F.col("w"))
            ).alias(f"b{j}")
            for j in range(bits)
        ],
    )
    agg = per_bit.groupBy("_id").agg(
        *[F.sum(f"b{j}").alias(f"b{j}") for j in range(bits)]
    )
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, j)
        fp = term if fp is None else fp + term
    return agg.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash_pairs(
    sig: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, bits: int = 64, chunks: int = 4
) -> DataFrame:
    """Near-dup pairs by hamming distance ≤ max_hamming over simhash.

    Scale path: split the fingerprint into ``chunks`` equal bit-slices; any
    pair within hamming d < chunks must agree exactly on ≥1 slice
    (pigeonhole), so candidates come from ONE equi-join on (chunk, slice)
    over the exploded slices — no O(N²), and both join sides canonicalize
    to the same exchange, so the signature subtree (the text-hash kernel)
    computes once, not once per side per chunk.

    No candidate ``distinct()`` is needed: a pair agreeing on several
    slices is emitted only from its FIRST agreeing slice — decidable
    row-locally because the joined row carries both full fingerprints
    (every earlier slice of s1 XOR s2 must be nonzero). Cuts the
    8-scan + wide-distinct plan of the naive per-chunk union to one
    shuffle and a codegen filter.
    """
    width = bits // chunks
    mask = (1 << width) - 1
    # Materialize the narrow (id, simhash) projection before self-joining:
    # the fingerprint kernel upstream is a Python stage whose subtree does
    # not canonicalize for exchange reuse, so without this both join sides
    # would recompute it. 16 bytes/row — at 1B docs this is a 16 GB
    # cluster-wide checkpoint, far cheaper than re-hashing the corpus.
    sig = sig.select(F.col(id_col).alias("_id"), "simhash").localCheckpoint()
    rows = sig.select(
        "_id",
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select(
        "_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key")
    )
    a = rows.select(
        "chunk", "key", F.col("_id").alias("id1"), F.col("simhash").alias("s1")
    )
    b = rows.select(
        "chunk", "key", F.col("_id").alias("id2"), F.col("simhash").alias("s2")
    )
    x = F.col("s1").bitwiseXOR(F.col("s2"))
    first_agreeing = F.lit(True)
    for c in range(chunks - 1):
        first_agreeing = first_agreeing & (
            (F.col("chunk") <= c)
            | (F.shiftright(x, c * width).bitwiseAND(F.lit(mask)) != 0)
        )
    return (
        a.join(b, ["chunk", "key"])
        .filter((F.col("id1") < F.col("id2")) & first_agreeing)
        .withColumn("hamming", F.bit_count(x))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.4,
    assume_normalized: bool = False,
) -> DataFrame:
    """Exact cosine near-dup pairs via self cross-join — correct at any N,
    quadratic cost: the ≤10K-docs regime the reference calls "brute force is
    fine" (02:438-442). Above that use LSH bucketing (ann.lsh_near_dup) or
    IVF-partitioned self-join."""
    from strava_vector_search_spark.functions.vector import similarity

    a = emb.select(F.col(id_col).alias("id1"), F.col(vector_col).alias("v1"))
    b = emb.select(F.col(id_col).alias("id2"), F.col(vector_col).alias("v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .withColumn(
            "cosine", similarity(F.col("v1"), F.col("v2"), assume_normalized)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def embedding_near_dup_blocked(
    emb: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.4,
    block_size: int = 2048,
) -> DataFrame:
    """All-pairs cosine near-dup via block-nested-loop with a dense BLAS
    inner kernel — the scalable exact formulation.

    Vectors are packed into id-range blocks; the (upper-triangular) cross of
    blocks is scored with one float64 numpy matmul per block pair inside
    mapInPandas, emitting only pairs >= threshold. Work is O(N^2 * dim) like
    the naive cross join, but executes at BLAS speed (~100x the per-row
    expression fold) and parallelizes over block pairs; memory per task is
    two blocks + one block_size^2 score tile. Assumes L2-normalized vectors
    (dot == cosine), which the write path guarantees.
    """
    import numpy as np
    import pandas as pd

    packed = (
        emb.select(
            F.floor(F.col(id_col) / block_size).cast("long").alias("blk"),
            F.struct(
                F.col(id_col).cast("long").alias("i"),
                F.col(vector_col).cast("array<double>").alias("v"),
            ).alias("r"),
        )
        .groupBy("blk")
        .agg(F.collect_list("r").alias("rows"))
    )
    a = packed.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = packed.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    block_pairs = a.crossJoin(b).filter(F.col("blk_a") <= F.col("blk_b"))

    def _score(batches):
        for pdf in batches:
            out_i, out_j, out_c = [], [], []
            for _, row in pdf.iterrows():
                ids_a = np.array([r["i"] for r in row["rows_a"]])
                mat_a = np.stack([r["v"] for r in row["rows_a"]]).astype("float64")
                ids_b = np.array([r["i"] for r in row["rows_b"]])
                mat_b = np.stack([r["v"] for r in row["rows_b"]]).astype("float64")
                scores = np.round(mat_a @ mat_b.T, 6)
                ii, jj = np.where(scores >= threshold)
                keep = ids_a[ii] < ids_b[jj]
                out_i.extend(ids_a[ii][keep])
                out_j.extend(ids_b[jj][keep])
                out_c.extend(scores[ii, jj][keep])
            yield pd.DataFrame({"id1": out_i, "id2": out_j, "cosine": out_c})

    return block_pairs.mapInPandas(_score, "id1 long, id2 long, cosine double")


def connected_components(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 20,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(id, comp) connected components over an undirected pair set —
    iterative min-label propagation, the step that turns near-dup PAIRS into
    dedup GROUPS (comp = the minimum member id = the canonical survivor).

    Each iteration joins labels to the symmetric edge list and takes the
    elementwise min; convergence in O(component diameter) rounds (dup
    clusters are near-cliques, so 2-3 rounds in practice). Lineage is
    truncated per round (localCheckpoint) so the plan doesn't grow with the
    iteration count — the standard Spark pattern for iterative algorithms.
    """
    # materialize the pair set BEFORE the symmetric union — both union
    # branches read it, and an un-checkpointed lineage (e.g. the whole
    # MinHash pipeline) would otherwise compute twice
    edges = pairs.select(
        F.col(id1).alias("a"), F.col(id2).alias("b")
    ).localCheckpoint(eager=False)

    # adaptive small-graph path: near-dup pair sets are tiny relative to the
    # corpus (they ARE the duplicates); below the threshold a driver-side
    # union-find replaces R rounds of join+aggregate actions — the same
    # size-based switch Catalyst makes for broadcast joins. Identical output.
    # output schema follows the input id type (long/int/string ids all
    # work), matching the type-generic distributed path below
    id_type = pairs.schema[id1].dataType.simpleString()
    out_schema = f"id {id_type}, comp {id_type}"

    if driver_threshold and edges.count() <= driver_threshold:
        import pandas as pd

        parent: dict = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # Arrow both ways: toPandas()/createDataFrame(pandas) move columnar
        # batches instead of pickled Row lists — at the 100-250K threshold
        # the py4j round trip, not the union-find, dominated the wall clock
        edf = edges.toPandas()
        for a, b in zip(edf["a"].tolist(), edf["b"].tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        out = pd.DataFrame(
            {"id": list(parent), "comp": [find(n) for n in parent]}
        )
        spark = pairs.sparkSession
        return spark.createDataFrame(out, out_schema)

    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_by_near_dup_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Assign every row its near-dup component (singletons keep their own
    id) — the complete corpus-dedup output: filter ``comp == id`` for the
    surviving canonical rows, or group by comp for cluster inspection."""
    cc = connected_components(pairs)
    return df.join(cc, df[id_col] == cc["id"], "left").select(
        df["*"], F.coalesce(F.col("comp"), df[id_col]).alias("comp")
    )


def cdc_chunk_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking (Rabin/FastCDC family, token granularity):
    a chunk boundary falls AFTER token i whenever the hash of the
    ``window``-token context ending at i is ≡ 0 mod ``divisor`` — so
    boundaries are a function of CONTENT, not position, and an insertion
    early in a document shifts at most one chunk instead of re-aligning
    every fixed-stride span (the failure mode of positional span dedup).

    Emits (_id, chunk_idx, chunk, n_tokens) — one row per chunk, expected
    chunk length ≈ ``divisor`` tokens. Entirely map-only: tokenize →
    boundary scan → slice, all array expressions inside one projection; the
    only shuffle is whatever the caller aggregates next. The boundary hash
    routes through the portable md5→60-bit-int kernel, so chunking is
    bit-reproducible across engines.
    """
    w, d = window, divisor
    tok = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_ts")
    )
    ts = F.col("_ts")
    # one md5 per TOKEN, then the window hash is a polynomial over the
    # token hashes — arithmetic per position instead of a string-join +
    # md5 per position (measured 2.3× at 50K docs). Same constants as
    # rolling_fingerprint (P = 2^31−1, a = 1000003), portable to SQL.
    P, A = 2_147_483_647, 1_000_003
    th = F.transform(ts, lambda t: F.pmod(md5_int(t), F.lit(P)))
    tok = tok.select("_id", "_ts", th.alias("_th"))
    hh = F.col("_th")

    def win_hash(i):
        acc = F.element_at(hh, i - (w - 1))
        for j in range(w - 2, -1, -1):
            acc = F.pmod(acc * A + F.element_at(hh, i - j), F.lit(P))
        return acc

    # boundary AFTER position i (1-indexed) where the w-token window ending
    # at i hashes to 0 mod d; the last token never needs a boundary test
    bpos = F.filter(
        F.sequence(F.lit(w), F.greatest(F.size(ts), F.lit(w))),
        lambda i: (i < F.size(ts)) & (F.pmod(win_hash(i), F.lit(d)) == 0),
    )
    starts = F.concat(F.array(F.lit(0)), bpos)
    ends = F.concat(bpos, F.array(F.size(ts)))
    spans = F.filter(
        F.zip_with(
            starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        ),
        lambda sp: sp["e"] > sp["s"],
    )
    chunks = F.transform(
        spans,
        lambda sp, j: F.struct(
            j.alias("chunk_idx"),
            F.array_join(
                F.slice(ts, sp["s"] + 1, sp["e"] - sp["s"]), " "
            ).alias("chunk"),
            (sp["e"] - sp["s"]).alias("n_tokens"),
        ),
    )
    return (
        tok.filter(F.size(ts) > 0)
        .select("_id", F.explode(chunks).alias("c"))
        .select(
            F.col("_id").alias(id_col),
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk").alias("chunk"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def cdc_repeated_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    divisor: int = 16,
    top: int = 30,
) -> DataFrame:
    """Cross-document repeated content via CDC chunks: chunks appearing in
    more than one document, ranked by document frequency. Grouping is on
    the 60-bit chunk hash (8-byte shuffle keys, not chunk payloads — the
    text rides along as a MIN aggregate); top-N ends in
    TakeOrderedAndProject."""
    ch = cdc_chunk_rows(df, id_col, text_col, window, divisor)
    return (
        ch.groupBy(md5_int(F.col("chunk")).alias("chunk_hash"))
        .agg(
            F.min("chunk").alias("chunk"),
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_total"),
            F.min(id_col).alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy(
            F.desc("n_docs"), F.desc("n_total"), F.asc("chunk_hash")
        )
        .limit(top)
    )


def semantic_dedup(
    emb: DataFrame,
    cluster_col: str,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.3,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cosine near-dup pairs are
    computed ONLY within a cluster, pair components collapse to one
    surviving representative (min id), and every row comes back labeled
    ``(comp, keep)``.

    This is the published recipe for semantic dedup at web scale (cluster
    the embeddings — here any precomputed coarse assignment: k-means via
    ``ann.kmeans_assign``, IVF lists, or a domain/topic column — then pay
    the quadratic cosine cost only inside clusters). The pair join is an
    equi-join on the cluster key, so the shuffle moves each vector once
    and the quadratic term is bounded by the largest cluster, not the
    corpus: with C balanced clusters the work drops by ~C× vs all-pairs.
    Skewed clusters are the operational risk — cap them upstream (split
    oversized k-means cells) exactly as LSH buckets are capped.
    """
    base = emb.filter(F.col(vector_col).isNotNull())
    pairs = semantic_pairs_blas(
        base, cluster_col, id_col, vector_col, threshold
    )
    labeled = dedup_by_near_dup_groups(base, pairs, id_col)
    return labeled.withColumn("keep", F.col("comp") == F.col(id_col))


def semantic_pairs_blas(
    emb: DataFrame,
    cluster_col: str,
    id_col: str,
    vector_col: str,
    threshold: float,
    block_size: int = 2048,
) -> DataFrame:
    """Within-cluster cosine pairs ≥ threshold via the dense BLAS block
    kernel (same shape as :func:`embedding_near_dup_blocked`, with the
    cluster key prepended to the block key so block pairs never cross
    clusters). One shuffle to pack (cluster, id-range) blocks, then one
    float64 matmul per block pair — ~100× the per-pair expression fold,
    which recomputes two norms per PAIR instead of one per ROW.

    Blocking-invariance caveat: the emitted pair SET is independent of
    ``block_size`` exactly when the per-pair cosine is — guaranteed for
    integer-valued embeddings (every dot/norm term exact in float64, the
    md5 lane the 768-d gates use), while real-valued embeddings can flip
    low bits across BLAS blockings and, at a razor-edge threshold, a
    borderline pair. Operationally irrelevant at any sane threshold
    margin, but the dd_semantic_dedup_768_kmeans gate's identical-set
    check is a property of the exact-integer lane, not of floats.
    """
    import numpy as np
    import pandas as pd

    id_type = emb.schema[id_col].dataType.simpleString()
    # DENSE within-cluster blocks via a rank, NOT floor(id/block_size):
    # ids are arbitrary within a cluster, and sparse id-range blocks
    # shatter a cluster into thousands of near-empty blocks whose
    # quadratic block-pair count dominates everything (measured 200×
    # slower at 200K vectors / 128 hash cells before this fix). The rank
    # window shares the cluster-key shuffle the packing needs anyway.
    wn = Window.partitionBy(F.col(cluster_col)).orderBy(F.col(id_col))
    packed = (
        emb.select(
            F.col(cluster_col).cast("string").alias("_c"),
            F.floor((F.row_number().over(wn) - 1) / block_size)
            .cast("long")
            .alias("blk"),
            F.struct(
                F.col(id_col).alias("i"),
                F.col(vector_col).cast("array<double>").alias("v"),
            ).alias("r"),
        )
        .groupBy("_c", "blk")
        .agg(F.collect_list("r").alias("rows"))
    )
    a = packed.select(
        "_c", F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a")
    )
    b = packed.select(
        "_c", F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b")
    )
    block_pairs = a.join(b, "_c").filter(F.col("blk_a") <= F.col("blk_b"))

    def _score(batches):
        for pdf in batches:
            out_i, out_j, out_c = [], [], []
            for _, row in pdf.iterrows():
                ids_a = np.array([r["i"] for r in row["rows_a"]])
                mat_a = np.stack([r["v"] for r in row["rows_a"]]).astype(
                    "float64"
                )
                ids_b = np.array([r["i"] for r in row["rows_b"]])
                mat_b = np.stack([r["v"] for r in row["rows_b"]]).astype(
                    "float64"
                )
                na = np.sqrt((mat_a * mat_a).sum(axis=1))
                nb = np.sqrt((mat_b * mat_b).sum(axis=1))
                scores = np.round(
                    (mat_a @ mat_b.T) / np.outer(na, nb), 6
                )
                ii, jj = np.where(scores >= threshold)
                keep = ids_a[ii] < ids_b[jj]
                out_i.extend(ids_a[ii][keep])
                out_j.extend(ids_b[jj][keep])
                out_c.extend(scores[ii, jj][keep])
            yield pd.DataFrame(
                {"id1": out_i, "id2": out_j, "cosine": out_c}
            )

    return block_pairs.mapInPandas(
        _score, f"id1 {id_type}, id2 {id_type}, cosine double"
    )


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality: Column,
) -> DataFrame:
    """Duplicate-cluster resolution keeping the BEST member per cluster
    (not the first): near-dup pairs → connected components → per-component
    ``max_by(id, quality)``.

    This is the policy real training pipelines use — when several near-dup
    documents survive crawl, keep the longest / highest-quality one, not the
    one with the smallest id. ``quality`` must be a deterministic,
    duplicate-free ordering expression (embed a unique-id tiebreak in it).

    Returns one row per component: (comp, keep_id, n_members, best_quality).
    Scale: components add one small join on the pair-derived label table
    (duplicates are a tiny fraction of the corpus), then a single map-side
    combinable aggregate over the labeled corpus.
    """
    labeled = dedup_by_near_dup_groups(df, pairs, id_col).withColumn(
        "__q", quality
    )
    return labeled.groupBy("comp").agg(
        F.expr(f"max_by({id_col}, __q)").alias("keep_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.max("__q").alias("best_quality"),
    )


# ---------------------------------------------------------------------------
# paragraph-level (span) exact dedup — C4-style


def _span_chunks_over(ts: Column, span_tokens: int) -> Column:
    """Consecutive non-overlapping ``span_tokens``-token chunks over an
    ALREADY-MATERIALIZED token-array column — the unit of C4-style
    span-level dedup (the public C4 pipeline dedups exact three-sentence
    spans across the whole corpus; synthetic fixtures have no sentence
    marks, so the span is a fixed token window).

    Takes a materialized column, not raw text, for the same reason as
    ``shingle_rows``: ``slice(toks, …)`` inside the transform lambda is
    evaluated per span index, so an inline tokenization expression would
    re-run the regex split once per span (measured ~8× on the shingle
    variant)."""
    n = F.ceil(F.size(ts) / F.lit(span_tokens)).cast("int")
    return F.when(
        F.size(ts) > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.array_join(
                F.slice(ts, i * span_tokens + 1, span_tokens), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 10,
) -> DataFrame:
    """Corpus-global exact span dedup: every span of every document is kept
    only at its FIRST occurrence (ordered by (id, span position)); documents
    are rebuilt from their surviving spans.

    Returns (id, n_spans, n_kept, clean_text) — one row per input document,
    ``clean_text = ''`` when every span was a repeat.

    Scale shape (100 TB): one shuffle partitioned by the raw span text for
    the global keep-first window — the span string itself is the correctness
    key (no hash-collision risk), and partition skew concentrates exactly on
    heavily-repeated boilerplate spans, which is the data the operator
    exists to delete; then one group-back shuffle on the document id.
    ``collect_list`` order is restored with ``array_sort`` on (idx, span)
    structs, so the rebuild is deterministic under any partitioning.
    """
    tok = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_ts")
    )
    ex = tok.select(
        "_id", _span_chunks_over(F.col("_ts"), span_tokens).alias("_spans")
    ).select(
        "_id",
        F.size("_spans").cast("bigint").alias("n_spans"),
        F.posexplode_outer("_spans").alias("idx", "span"),
    )
    w = Window.partitionBy("span").orderBy("_id", "idx")
    kept = ex.withColumn(
        "keep", F.col("span").isNotNull() & (F.row_number().over(w) == 1)
    )
    return (
        kept.groupBy("_id")
        .agg(
            F.max("n_spans").alias("n_spans"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("idx", "span"))
                        )
                    ),
                    lambda x: x["span"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .withColumnRenamed("_id", id_col)
    )


# ---------------------------------------------------------------------------
# benchmark decontamination — n-gram overlap against an eval set


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Flag training documents that overlap a benchmark/eval set — the
    standard pre-training decontamination pass (n-gram collision against
    held-out test sets).

    Per corpus document: the number of its distinct n-token shingles that
    also occur anywhere in ``eval_df``, the contaminated fraction, and a
    boolean flag at ``threshold``.

    Scale shape (100 TB corpus, bounded eval set): eval shingles are
    distinct-ed and BROADCAST (benchmarks are at most a few million
    n-grams), so the corpus side is a single map-only scan — shingle,
    broadcast-hash probe, partial-aggregate per document. No corpus
    shuffle other than the map-side-combined per-doc count.
    """
    # three-stage staging (tokens → shingle array → size+explode): each
    # non-cheap expression lands in its own projection so codegen computes
    # it once per row — inlining the tokenizer into the transform lambda
    # would re-run the regex split once per shingle (see shingle_rows)
    tok = corpus.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_ts")
    )
    ts = F.col("_ts")
    sh_arr = F.array_distinct(
        F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ts) - n),
                lambda i: F.array_join(F.slice(ts, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(ts, " ")))
    )
    # explode_OUTER, deliberately: the shingle array is never empty (the
    # <n-token fallback is ['']), and an inner explode over a materialized
    # array column triggers InferFiltersFromGenerate, whose size>0 filter
    # gets pushed to the scan with the whole shingle expression inlined —
    # re-tokenizing per shingle index in the filter (measured 10x slower)
    sh = tok.select("_id", sh_arr.alias("_sh")).select(
        "_id",
        F.size("_sh").cast("bigint").alias("n_sh"),
        F.explode_outer("_sh").alias("s"),
    )
    eval_sh = (
        shingle_rows(eval_df, id_col, text_col, n=n)
        .select("s")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    agg = (
        sh.join(F.broadcast(eval_sh), "s", "left")
        .groupBy("_id")
        .agg(
            F.max("n_sh").alias("n_sh"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hit"),
        )
    )
    frac = F.round(F.col("n_hit") / F.col("n_sh"), 6)
    return agg.select(
        F.col("_id").alias(id_col),
        "n_sh",
        "n_hit",
        frac.alias("contaminated_frac"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )


def cc_incremental(
    labels: DataFrame,
    new_edges: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Incrementally maintain a connected-components labeling as new edges
    arrive — the steady-state form of corpus dedup (a near-dup pair feed
    appends forever; relabeling the whole corpus per batch is the job you
    cannot afford at 100 TB).

    Only components INCIDENT to a new edge are recomputed: the untouched
    labeling is reused verbatim (anti-join), and the affected subgraph is
    rebuilt from its star edges (member -> old comp) plus the new edges —
    per batch the work is proportional to the touched components, not the
    corpus. Handles all three incremental cases: component growth (edge
    into an existing comp), creation (both endpoints unseen), and MERGES
    of multiple existing comps (relabeling every member of every merged
    comp to the new minimum). Output is bit-identical to
    ``connected_components`` over the full accumulated edge set — which is
    how the gate's oracle checks it.
    """
    # the batch edge set and the touched-endpoint labeling feed THREE
    # downstream subtrees each (star build, subgraph CC, untouched
    # anti-join); checkpoint so each is computed once, not per action
    e = new_edges.select(
        F.col(id1).alias("a"), F.col(id2).alias("b")
    ).localCheckpoint(eager=False)
    ends = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .distinct()
    )
    # endpoints -> their current comp; unseen endpoints are their own comp
    touched = (
        ends.join(labels, "id", "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("comp"))
        .localCheckpoint(eager=False)
    )
    affected = touched.select("comp").distinct()
    # full membership of every affected comp, as star edges (member, comp);
    # unseen endpoints enter via their self-comp rows in `touched`
    sub_members = (
        labels.join(affected, "comp", "leftsemi")
        .unionByName(touched.join(labels, "id", "left_anti"))
    )
    star = sub_members.select(F.col("id").alias("a"), F.col("comp").alias("b"))
    sub_new = connected_components(
        star.unionByName(e), "a", "b", driver_threshold=driver_threshold
    )
    untouched = labels.join(affected, "comp", "left_anti")
    return untouched.unionByName(sub_new.select("id", "comp"))


def cross_set_contamination(
    corpus: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    eval_id_col: str = "eval_id",
) -> DataFrame:
    """Semantic benchmark contamination screen: corpus vectors whose best
    cosine against ANY eval-set vector reaches ``threshold``, with the
    nearest eval item attached — the embedding-space complement of the
    n-gram `decontaminate` (paraphrased leakage has no shared n-grams).

    Scale shape: the eval set is SMALL BY DEFINITION (a benchmark), so it
    broadcasts as one dense matrix and the corpus pass is map-only — one
    ``V @ E.T`` per Arrow batch, one row out per contaminated doc, no
    shuffle at any corpus size. Scores round to 6 dp IN the kernel before
    the argmax so round-ties resolve to the smallest eval id (the
    deterministic tie-break the oracle replays).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from strava_vector_search_spark.operators.util import rebalance_for_kernel

    erows = (
        evalset.filter(F.col(vector_col).isNotNull())
        .select(eval_id_col, vector_col)
        .collect()
    )
    if not erows:
        # nothing to screen against: empty result, correct schema
        id_type = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, nearest_eval_id {id_type}, cosine double"
        )
    order = sorted(range(len(erows)), key=lambda i: erows[i][eval_id_col])
    eids = np.array([erows[i][eval_id_col] for i in order])
    emat = np.stack(
        [np.asarray(erows[i][vector_col], dtype="float64") for i in order]
    )
    id_type = corpus.schema[id_col].dataType.simpleString()

    narrow = rebalance_for_kernel(
        corpus.filter(F.col(vector_col).isNotNull()).select(
            F.col(id_col).alias("_id"), F.col(vector_col).alias("_vec")
        )
    )

    def _screen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            mat = np.stack(pdf["_vec"].to_numpy()).astype("float64")
            scores = np.round(mat @ emat.T, 6)  # nb x ne
            best = scores.argmax(axis=1)  # first max => smallest eval id
            best_s = scores[np.arange(len(ids)), best]
            keep = best_s >= threshold
            yield pd.DataFrame(
                {
                    "_id": ids[keep],
                    "nearest_eval_id": eids[best[keep]],
                    "cosine": best_s[keep],
                }
            )

    return (
        narrow.mapInPandas(
            _screen,
            f"_id {id_type}, nearest_eval_id {id_type}, cosine double",
        )
        .withColumnRenamed("_id", id_col)
        .orderBy(id_col)
    )
