"""Bloom-filter membership: a FIXED-SIZE bit-array summary of a key set.

Why this operator exists at 100 TB: decontamination / blocklist /
seen-before checks all reduce to "is this key in that reference set".
The broadcast-semi-join form (`operators/dedup.decontaminate`) ships the
reference set's distinct keys to every executor — fine for a benchmark
eval set, wrong when the reference side is itself large (a multi-billion
-row URL blocklist). A Bloom filter caps the shipped state at ``m`` bits
REGARDLESS of reference cardinality: the reference side folds into
``m / 32`` integer words with ONE map-side-combined ``bit_or`` aggregate
(bitwise OR is a monoid — partial filters from any partitioning merge
exactly), and the probe side stays map-only against the broadcast words.
The price is a bounded, quantifiable false-positive rate
(``(1 - e^{-kn/m})^k``) and zero false negatives — the right trade for
admission-control-style filtering, with the exact semi-join kept for the
final verify pass when one is needed.

Determinism contract: the ``k`` bit positions come from the repo's
portable 60-bit md5 idiom (`operators/dedup.md5_int`) salted with the
hash index, so Spark and the DuckDB oracle compute bit-identical filters
and bit-identical membership verdicts — false positives included. Words
are 32-bit values carried in BIGINT (bit 63 two's-complement wrap is the
one cross-engine shift hazard; 32-bit words never reach it).

Reference scope: none — engine completion beyond
`aryeung0/strava_vector_search` (SURVEY §2 training-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.dedup import md5_int

M_BITS = 16_384  # filter size in bits (demo default; size to n at deploy)
N_HASHES = 4  # k
WORD_BITS = 32  # 32-bit words in BIGINT: shifts never touch the sign bit


def _positioned(df: DataFrame, key: Column, m_bits: int) -> DataFrame:
    """Explode each key into its ``N_HASHES`` (word_idx, mask) probes.

    The salted-hash expression text matches the oracle byte-for-byte:
    ``md5(key || '#' || i) % m`` (md5_int is non-negative, so ``pmod``
    and plain ``%`` agree across engines).
    """
    exploded = df.withColumn(
        "_bf_i", F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1)))
    ).withColumn(
        "_bf_pos",
        F.pmod(
            md5_int(
                F.concat(key, F.lit("#"), F.col("_bf_i").cast("string"))
            ),
            F.lit(m_bits),
        ),
    )
    return exploded.withColumn(
        "_bf_widx", F.expr(f"_bf_pos DIV {WORD_BITS}")
    ).withColumn(
        # F.shiftleft only takes a literal shift — the SQL form accepts a
        # column (shift < 32, so the BIGINT sign bit is never touched)
        "_bf_mask",
        F.expr(
            f"shiftleft(1L, cast(pmod(_bf_pos, {WORD_BITS}) as int))"
        ),
    )


def build_filter(
    keys: DataFrame, key_col: str, m_bits: int = M_BITS
) -> DataFrame:
    """Fold a key set into Bloom-filter words: ``(word_idx, word)`` rows,
    at most ``m_bits / 32`` of them, via one map-side-combined ``bit_or``
    aggregate. The result is the broadcastable constant-size summary —
    words absent from the output are all-zero.
    """
    pos = _positioned(keys.select(F.col(key_col).alias("_bf_key")),
                      F.col("_bf_key"), m_bits)
    return (
        pos.groupBy(F.col("_bf_widx").alias("word_idx"))
        .agg(F.expr("bit_or(_bf_mask)").alias("word"))
    )


def probe_membership(
    pairs: DataFrame,
    key_col: str,
    filt: DataFrame,
    m_bits: int = M_BITS,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Map-only membership probe: for each input row, true iff ALL k bit
    positions of ``key_col`` are set in ``filt`` (broadcast). No false
    negatives; false positives at the filter's designed rate. All other
    columns of ``pairs`` pass through.
    """
    cols = [c for c in pairs.columns]
    pos = _positioned(pairs, F.col(key_col), m_bits)
    probed = pos.join(
        F.broadcast(filt), pos["_bf_widx"] == filt["word_idx"], "left"
    ).withColumn(
        "_bf_hit",
        F.coalesce(F.col("word"), F.lit(0).cast("bigint"))
        .bitwiseAND(F.col("_bf_mask"))
        == F.col("_bf_mask"),
    )
    return probed.groupBy(*[F.col(c) for c in cols]).agg(
        F.expr("bool_and(_bf_hit)").alias(out_col)
    )
