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
exactly), and the probe side is GENUINELY map-only: the words fold into
one broadcast map row and every row's k bit tests are pure expressions —
no explode, no shuffle, no regroup (PLANS.md asserts the probe plan).
The price is a bounded, quantifiable false-positive rate
(``(1 - e^{-kn/m})^k``) and zero false negatives — the right trade for
admission-control-style filtering, with the exact semi-join kept for the
final verify pass when one is needed.

Determinism contract: the ``k`` bit positions come from the repo's
portable 60-bit md5 idiom (`operators/dedup.md5_int`) salted with the
hash index, so Spark and the DuckDB oracle compute bit-identical filters
and bit-identical membership verdicts — false positives included. A NULL
key probes NULL everywhere and resolves to ``false`` (not a member), the
same verdict the oracle's CASE-guarded sum produces. Words are 32-bit
values carried in BIGINT (bit 63 two's-complement wrap is the one
cross-engine shift hazard; 32-bit words never reach it).

Reference scope: none — engine completion beyond
`aryeung0/strava_vector_search` (SURVEY §2 training-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.dedup import md5_int

M_BITS = 16_384  # filter size in bits (demo default; size with m_bits_for)
N_HASHES = 4  # k
WORD_BITS = 32  # 32-bit words in BIGINT: shifts never touch the sign bit

# Practical ceiling for the single-row dense probe array (words, not bits):
# the probe folds the filter into ONE broadcast row holding an
# array<bigint> of m/32 elements (8 bytes each on the wire), so m_bits =
# 2^31 already means a 512 MiB row — near Spark's broadcast comfort zone
# and far past the point where per-executor heap notices. Beyond this,
# shard the KEY SPACE into independent filters: build_sharded_filter /
# probe_sharded_membership (one dense row PER SHARD, same map-only plan
# shape; each row stays under this ceiling).
MAX_DENSE_WORDS = 1 << 26  # 64M words = 2^31 bits = 512 MiB per row

# Above this, the dense-scatter join drops its broadcast HINT: forcing a
# multi-million-row hash relation onto the driver OOMs long before the
# dense-row ceiling, and the scatter is a one-off |words|-row stage where
# a planner-chosen join is fine (the PROBE side stays map-only either way).
_BROADCAST_HINT_WORDS = 1 << 20


def m_bits_for(n: int, fpr: float, k: int = N_HASHES) -> int:
    """Smallest WORD_BITS-aligned filter size whose predicted
    false-positive rate for ``n`` keys under ``k`` hashes is ≤ ``fpr``.

    Inverts the standard Bloom FP model ``p = (1 - e^{-k·n/m})^k`` at the
    module's FIXED ``k`` (the portable-hash count the oracles mirror):
    ``m = k·n / -ln(1 - p^{1/k})``. With k pinned rather than optimized,
    the required m is modestly larger than the textbook optimal-k sizing
    (-n·ln p / ln²2) for very small p — honesty over flattery; the pytest
    twin plants a key set and checks the MEASURED rate against ``fpr``.
    """
    import math

    if not 0.0 < fpr < 1.0:
        raise ValueError(f"fpr must be in (0, 1), got {fpr}")
    if n <= 0:
        return WORD_BITS
    m = k * n / -math.log1p(-(fpr ** (1.0 / k)))
    return max(WORD_BITS, int(math.ceil(m / WORD_BITS)) * WORD_BITS)


def _pow2() -> Column:
    """2^j lookup array so a column-valued shift needs no shiftleft
    (whose pyspark wrapper takes only literal shifts). Built lazily —
    Column construction needs an active SparkContext, which import time
    (pytest collection) does not have."""
    from strava_vector_search_spark.functions.vector import lit_long_array

    return lit_long_array([1 << j for j in range(WORD_BITS)])


def _position(key: Column, i: int, m_bits: int) -> Column:
    """Bit position of hash ``i`` for ``key`` — the expression text the
    oracle mirrors: ``md5(key || '#i') % m`` (md5_int is non-negative, so
    ``pmod`` and plain ``%`` agree across engines)."""
    return F.pmod(md5_int(F.concat(key, F.lit(f"#{i}"))), F.lit(m_bits))


def _check_aligned(m_bits: int, k: int = N_HASHES) -> None:
    """Non-word-aligned m silently drops the tail word from the dense
    probe array (positions past the last full word probe NULL→false:
    FALSE NEGATIVES) — refuse it at both build and probe entry. k < 1 is
    refused too: a k=0 build writes an empty filter whose k=0 probe
    vacuously reports EVERY key a member, sentinels agreeing."""
    if m_bits <= 0 or m_bits % WORD_BITS:
        raise ValueError(
            f"m_bits must be a positive multiple of {WORD_BITS}, got "
            f"{m_bits}; size with m_bits_for(n, fpr)"
        )
    if k < 1:
        raise ValueError(f"k (hash count) must be >= 1, got {k}")


def build_filter(
    keys: DataFrame, key_col: str, m_bits: int = M_BITS, k: int = N_HASHES
) -> DataFrame:
    """Fold a key set into Bloom-filter words: ``(word_idx, word)`` rows,
    at most ``m_bits / 32`` of them, via one map-side-combined ``bit_or``
    aggregate. The result is the broadcastable constant-size summary —
    words absent from the output are all-zero. Row form (not a packed
    array) so streaming maintenance can OR-merge partial filters
    (streaming/bloom_stream.py). NULL keys are dropped up front (they
    probe to false by contract, and their rows would otherwise persist a
    junk NULL word through streaming state). ``k`` must match the probe's
    (and ``m_bits_for``'s) — bit positions come from the SAME
    ``_position`` expression the probe evaluates, so build and probe
    cannot drift apart.

    The LAST word (index ``m_bits/32 - 1``) is always materialized, with
    an OR-identity 0 contribution if no key touched it: the filter's max
    word_idx then equals its built size exactly, so a probe at ANY other
    m_bits — larger or smaller — fails the equality sentinel instead of
    silently producing false negatives. The built ``k`` is encoded the
    same way, as a marker row at ``word_idx = -1`` carrying ``word = k``
    (negative indexes never join the dense scatter, and OR-merging
    partial filters of the SAME k keeps the marker fixed — ``k | k =
    k``): a probe at a different k — fewer hashes (excess false
    positives) or more (false NEGATIVES on bits the build never set) —
    fails the same equality sentinel instead of silently mis-probing."""
    _check_aligned(m_bits, k)
    spark = keys.sparkSession
    exploded = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("_bf_key"))
        .select(
            F.explode(
                F.array(
                    *[
                        _position(F.col("_bf_key"), i, m_bits)
                        for i in range(k)
                    ]
                )
            ).alias("_bf_pos")
        )
    )
    seed = spark.createDataFrame(
        [(m_bits // WORD_BITS - 1, 0), (-1, k)],
        "word_idx bigint, word bigint",
    )
    return (
        exploded.select(
            F.expr(f"_bf_pos DIV {WORD_BITS}").alias("word_idx"),
            F.element_at(
                _pow2(), F.pmod(F.col("_bf_pos"), F.lit(WORD_BITS)).cast("int") + 1
            ).alias("_bf_mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(_bf_mask)").alias("word"))
        .unionByName(seed)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )


def stamp_filter_k(filt: DataFrame, k: int) -> DataFrame:
    """Migration helper for LEGACY (pre-k-marker) filters: return the same
    filter with the build-k marker row stamped in, so every subsequent
    probe validates k from the filter itself and ``allow_legacy=True``
    stays a ONE-TIME escape hatch instead of a standing per-probe
    assertion.

    BEHAVIOR-CHANGE NOTE for holders of persisted filters: probes now
    REFUSE marker-less filters by default (they used to run at the
    caller's k silently — the exact silent-false-negative hole the marker
    closes). A filter persisted before the marker existed must either be
    REBUILT (preferred — the build re-derives k from code, no human
    assertion) or stamped ONCE via this helper with the k it was
    genuinely built at. The stamped k is caller-asserted exactly like
    ``allow_legacy``'s, but the assertion happens once at a named
    migration step and every later probe checks the stored marker instead
    of trusting its own call site.

    Refuses a filter already carrying a DIFFERENT k marker (stamping
    cannot fix a wrong filter — rebuild it); re-stamping the same k is an
    idempotent no-op. Works on both the plain ``(word_idx, word)`` and
    sharded ``(shard, word_idx, word)`` layouts (the marker rides
    ``word_idx = -1`` in both)."""
    if k < 1:
        raise ValueError(f"k (hash count) must be >= 1, got {k}")
    existing = filt.filter(F.col("word_idx") < 0).select("word").head()
    if existing is not None:
        if int(existing["word"]) != k:
            raise ValueError(
                "stamp_filter_k: filter already carries a k="
                f"{int(existing['word'])} marker; refusing to re-stamp "
                f"with k={k} — rebuild the filter if its marker is wrong"
            )
        return filt
    spark = filt.sparkSession
    if "shard" in filt.columns:
        marker = spark.createDataFrame(
            [(-1, -1, k)], "shard bigint, word_idx bigint, word bigint"
        )
    else:
        marker = spark.createDataFrame(
            [(-1, k)], "word_idx bigint, word bigint"
        )
    return filt.unionByName(marker)


def probe_membership(
    pairs: DataFrame,
    key_col: str,
    filt: DataFrame,
    m_bits: int = M_BITS,
    out_col: str = "maybe_member",
    k: int = N_HASHES,
    allow_legacy: bool = False,
) -> DataFrame:
    """Map-only membership probe: true iff ALL k bit positions of
    ``key_col`` are set in ``filt``. The sparse word rows fold into ONE
    broadcast map row; each input row evaluates k pure bit-test
    expressions — no explode, no shuffle, no regroup. NULL keys probe to
    false. No false negatives; false positives at the filter's designed
    rate. All other columns pass through unchanged.

    Legacy filters (persisted before the k marker existed) are REFUSED by
    default; ``allow_legacy=True`` runs the probe at the caller's ``k``
    as a short-lived escape hatch — the assertion is unvalidated, so
    migrate by rebuilding the filter or stamping it once with
    :func:`stamp_filter_k` (see its behavior-change note).
    """
    # DENSE word array, not a map: Spark MapData is array-backed, so
    # element_at on a map is a LINEAR scan — catastrophic at large m
    # (measured 148 s for 3M probes against a 512K-word map; the dense
    # array's O(1) element_at took 3 s). The scatter is a |words|-row
    # range join, one-off.
    spark = filt.sparkSession
    _check_aligned(m_bits, k)
    if "shard" in filt.columns:
        # A SHARDED filter would sail past the (m_bits, k) sentinels —
        # every shard materializes its last word and the k marker rides
        # shard -1 — while the dense scatter collects n_shards rows per
        # word_idx into one oversized array: silently garbled verdicts,
        # INCLUDING false negatives. Refuse by schema instead.
        raise ValueError(
            "probe_membership got a sharded filter (it has a 'shard' "
            "column) — probe it with probe_sharded_membership(..., "
            "n_shards=<the build's n_shards>)"
        )
    n_words = m_bits // WORD_BITS
    if n_words > MAX_DENSE_WORDS:
        raise ValueError(
            f"m_bits={m_bits} needs {n_words} dense words — past the "
            f"single-broadcast-row ceiling ({MAX_DENSE_WORDS} words = "
            "512 MiB). Use build_sharded_filter / "
            "probe_sharded_membership to shard the key space instead."
        )
    # Mismatch sentinel: build_filter always materializes the filter's
    # LAST word, so its max word_idx equals its built n_words - 1 exactly.
    # A probe at any OTHER m_bits — larger OR smaller — would re-derive
    # positions mod the wrong m (silent false negatives); the equality
    # check folds from the filter itself (|words| rows, no join) and
    # raise_errors at action time instead. The dense scatter stays a
    # broadcast left join below the hint ceiling (no merge join on the
    # probe path — PLANS.md asserts it); at very large n_words the hint
    # is dropped (a forced multi-GB broadcast hash relation would OOM
    # long before the dense-row ceiling) and the planner picks the join —
    # the scatter is a one-off |words|-row stage, not the probe hot path.
    sent = filt.groupBy().agg(
        F.max("word_idx").alias("_bf_maxidx"),
        F.max(
            F.when(F.col("word_idx") < 0, F.col("word"))
        ).alias("_bf_k"),
    )
    # k mismatch: a LEGACY filter (persisted before the k marker existed,
    # so no word_idx=-1 row -> _bf_k NULL) is REFUSED unless the caller
    # passes allow_legacy=True, asserting the filter was built at the k
    # they are probing with. build_filter has always taken a k parameter,
    # so "marker-less implies default k" is not an invariant — silently
    # assuming it would probe a non-default-k legacy filter at k=4 and
    # produce false negatives, the one Bloom failure mode that must never
    # happen. With the opt-in, the probe runs at the caller's k.
    k_mismatch = F.when(
        F.col("_bf_k").isNull(), F.lit(not allow_legacy)
    ).otherwise(F.col("_bf_k") != F.lit(k))
    scatter_src = filt if n_words > _BROADCAST_HINT_WORDS else F.broadcast(filt)
    dense = (
        spark.range(n_words)
        .join(scatter_src, F.col("id") == F.col("word_idx"), "left")
        .select(
            "id", F.coalesce(F.col("word"), F.lit(0).cast("bigint")).alias("w")
        )
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("id", "w"))),
                lambda s: s["w"],
            ).alias("_bf_w_raw")
        )
        .crossJoin(F.broadcast(sent))
        .select(
            F.when(
                (F.col("_bf_maxidx") != F.lit(n_words - 1)) | k_mismatch,
                F.raise_error(
                    F.lit(
                        "bloom build/probe mismatch: the filter's "
                        f"sentinels disagree with (m_bits={m_bits}, "
                        f"k={k}) — probe with the (m_bits, k) the filter "
                        "was built with; a pre-k-marker filter needs "
                        "allow_legacy=True plus the k it was built at"
                    )
                ),
            )
            .otherwise(F.col("_bf_w_raw"))
            .alias("_bf_words")
        )
    )
    out = pairs.crossJoin(F.broadcast(dense))
    cond = F.lit(True)
    for i in range(k):
        pos = _position(F.col(key_col), i, m_bits)
        word = F.element_at(
            F.col("_bf_words"),
            F.floor(pos / F.lit(WORD_BITS)).cast("int") + 1,
        )
        mask = F.element_at(
            _pow2(), F.pmod(pos, F.lit(WORD_BITS)).cast("int") + 1
        )
        cond = cond & (word.bitwiseAND(mask) == mask)
    return out.withColumn(
        out_col, F.coalesce(cond, F.lit(False))
    ).drop("_bf_words")


def _shard_of(key: Column, n_shards: int) -> Column:
    """Key-space shard id — the sharding prescription MAX_DENSE_WORDS
    points at, as an expression both build and probe share."""
    return F.pmod(md5_int(key), F.lit(n_shards))


def build_sharded_filter(
    keys: DataFrame,
    key_col: str,
    n_shards: int,
    m_bits: int = M_BITS,
    k: int = N_HASHES,
) -> DataFrame:
    """Key-space-sharded Bloom build: shard = md5(key) % n_shards, each
    shard an INDEPENDENT m_bits filter over its own keys — the scale
    path past the single-row dense ceiling. Output ``(shard, word_idx,
    word)`` rows via the same one map-side-combined ``bit_or`` aggregate
    (still a monoid per (shard, word_idx): streaming OR-merge unchanged).
    Total state = n_shards x m_bits; each shard's PROBE array stays under
    MAX_DENSE_WORDS, which is the limit that actually binds. Bit
    positions reuse ``_position`` verbatim, so per-shard verdicts are
    bit-identical to an unsharded filter of the same m_bits built over
    just that shard's keys (pinned in tests). Every shard's LAST word is
    materialized (OR-identity 0), so max(shard) and max(word_idx) encode
    the built (n_shards, m_bits) exactly, the built ``k`` rides a
    ``(shard=-1, word_idx=-1, word=k)`` marker row (as in build_filter),
    and a probe at any other (m_bits, n_shards, k) fails the equality
    sentinels instead of silently missing members."""
    _check_aligned(m_bits, k)
    spark = keys.sparkSession
    key = F.col(key_col)
    exploded = keys.filter(key.isNotNull()).select(
        _shard_of(key, n_shards).alias("shard"),
        F.explode(
            F.array(*[_position(key, i, m_bits) for i in range(k)])
        ).alias("_bf_pos"),
    )
    seed = spark.createDataFrame(
        [(s, m_bits // WORD_BITS - 1, 0) for s in range(n_shards)]
        + [(-1, -1, k)],
        "shard bigint, word_idx bigint, word bigint",
    )
    return (
        exploded.select(
            "shard",
            F.expr(f"_bf_pos DIV {WORD_BITS}").alias("word_idx"),
            F.element_at(
                _pow2(), F.pmod(F.col("_bf_pos"), F.lit(WORD_BITS)).cast("int") + 1
            ).alias("_bf_mask"),
        )
        .groupBy("shard", "word_idx")
        .agg(F.expr("bit_or(_bf_mask)").alias("word"))
        .unionByName(seed)
        .groupBy("shard", "word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )


def probe_sharded_membership(
    pairs: DataFrame,
    key_col: str,
    filt: DataFrame,
    n_shards: int,
    m_bits: int = M_BITS,
    out_col: str = "maybe_member",
    k: int = N_HASHES,
    allow_legacy: bool = False,
) -> DataFrame:
    """Map-only probe against a sharded filter: the words fold into ONE
    dense array PER SHARD (n_shards broadcast rows, each under the
    MAX_DENSE_WORDS ceiling), each input row broadcast-hash-joins its own
    shard's row on ``md5(key) % n_shards`` and evaluates the same k bit
    tests — still no shuffle of the probe side. NULL keys miss the join
    and resolve to false, as in the unsharded probe.

    Memory story: the single-row probe caps at MAX_DENSE_WORDS (512 MiB);
    sharding lifts that PER-ROW cap, while the broadcast TOTAL
    (n_shards x m_bits / 8 bytes) remains bounded by executor memory —
    size n_shards so total state fits comfortably (a 4 GiB blocklist
    filter = 8 shards x 2^32 bits). Past broadcastable total state,
    repartition BOTH sides by shard and sort-merge join instead — one
    probe-side shuffle buys unbounded filter state; that variant is a
    one-line join-hint change documented here rather than a third code
    path. A filter built with larger m_bits or a different n_shards
    raise_errors at action time (word_idx / shard-id sentinels)."""
    _check_aligned(m_bits, k)
    if "shard" not in filt.columns:
        # the unsharded build has no 'shard' column; without this check
        # the grid join below fails with a column-resolution error that
        # names internal aliases instead of the actual mistake
        raise ValueError(
            "probe_sharded_membership got an UNSHARDED filter (no "
            "'shard' column) — probe it with probe_membership, or build "
            "with build_sharded_filter"
        )
    n_words = m_bits // WORD_BITS
    if n_words > MAX_DENSE_WORDS:
        raise ValueError(
            f"per-shard m_bits={m_bits} needs {n_words} dense words — past "
            f"the single-row ceiling ({MAX_DENSE_WORDS}); raise n_shards "
            "instead of the per-shard size"
        )
    spark = filt.sparkSession
    grid = (
        spark.range(n_shards)
        .select(F.col("id").alias("gshard"))
        .crossJoin(spark.range(n_words).select(F.col("id").alias("wid")))
    )
    scatter_src = (
        filt
        if n_shards * n_words > _BROADCAST_HINT_WORDS
        else F.broadcast(filt)
    )
    per_shard = (
        grid.join(
            scatter_src,
            (grid["gshard"] == filt["shard"])
            & (grid["wid"] == filt["word_idx"]),
            "left",
        )
        .select(
            F.col("gshard").alias("shard"),
            "wid",
            F.coalesce(F.col("word"), F.lit(0).cast("bigint")).alias("w"),
        )
        .groupBy("shard")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wid", "w"))),
                lambda s: s["w"],
            ).alias("_bf_w_raw")
        )
    )
    # Mismatch sentinels fold from the FILTER itself (|shards x words|
    # rows, one tiny aggregate, no join): they must trip even for shards
    # the probe keys never touch. build_sharded_filter materializes every
    # shard's last word, so max(shard) and max(word_idx) encode the BUILT
    # (n_shards, m_bits) exactly — equality catches a mismatch in EITHER
    # direction (a smaller build would otherwise silently probe all-zero
    # shards / re-derive positions mod the wrong m: false negatives).
    flags = filt.groupBy().agg(
        F.max("word_idx").alias("_gmx"),
        F.max("shard").alias("_gms"),
        F.max(
            F.when(F.col("word_idx") < 0, F.col("word"))
        ).alias("_gk"),
    )
    # legacy (pre-k-marker) filters: refused unless allow_legacy=True,
    # as in probe_membership (the caller asserts the build k)
    k_mismatch = F.when(
        F.col("_gk").isNull(), F.lit(not allow_legacy)
    ).otherwise(F.col("_gk") != F.lit(k))
    dense = (
        per_shard.crossJoin(F.broadcast(flags))
        .select(
            # collision-safe internal name: a plain "shard" would make
            # the final drop() remove a caller's same-named column too
            F.col("shard").alias("_bf_shard"),
            F.when(
                (F.col("_gmx") != F.lit(n_words - 1))
                | (F.col("_gms") != F.lit(n_shards - 1))
                | k_mismatch,
                F.raise_error(
                    F.lit(
                        "bloom sharded build/probe mismatch: filter "
                        f"sentinels disagree with ({n_words} words, "
                        f"{n_shards} shards, k={k}) — probe with the "
                        "(m_bits, n_shards, k) the filter was built "
                        "with; a pre-k-marker filter needs "
                        "allow_legacy=True plus the k it was built at"
                    )
                ),
            )
            .otherwise(F.col("_bf_w_raw"))
            .alias("_bf_words"),
        )
    )
    out = pairs.join(
        F.broadcast(dense),
        _shard_of(F.col(key_col), n_shards) == F.col("_bf_shard"),
        "left",
    )
    cond = F.lit(True)
    for i in range(k):
        pos = _position(F.col(key_col), i, m_bits)
        word = F.element_at(
            F.col("_bf_words"),
            F.floor(pos / F.lit(WORD_BITS)).cast("int") + 1,
        )
        mask = F.element_at(
            _pow2(), F.pmod(pos, F.lit(WORD_BITS)).cast("int") + 1
        )
        cond = cond & (word.bitwiseAND(mask) == mask)
    return out.withColumn(
        out_col, F.coalesce(cond, F.lit(False))
    ).drop("_bf_shard", "_bf_words")
