"""Bloom sizing honesty: m_bits_for(n, fpr) must predict the MEASURED
false-positive rate of a filter built at that size (within 2x), never
produce false negatives, and the dense-probe ceiling must refuse sizes
past the single-broadcast-row limit with the sharding prescription."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.bloom import (
    MAX_DENSE_WORDS,
    N_HASHES,
    WORD_BITS,
    build_filter,
    m_bits_for,
    probe_membership,
)


def predicted_fpr(n: int, m: int, k: int = N_HASHES) -> float:
    return (1.0 - math.exp(-k * n / m)) ** k


def test_m_bits_for_inverts_the_fp_model():
    for n in (100, 10_000, 5_000_000):
        for fpr in (0.10, 0.01, 0.001):
            m = m_bits_for(n, fpr)
            assert m % WORD_BITS == 0
            # sized m meets the target...
            assert predicted_fpr(n, m) <= fpr * (1 + 1e-9)
            # ...and is not wastefully large: one word fewer would miss it
            if m > WORD_BITS:
                assert predicted_fpr(n, m - WORD_BITS) > fpr


def test_m_bits_for_edge_cases():
    assert m_bits_for(0, 0.01) == WORD_BITS
    with pytest.raises(ValueError):
        m_bits_for(100, 0.0)
    with pytest.raises(ValueError):
        m_bits_for(100, 1.5)


def test_measured_fpr_within_2x_of_predicted(spark):
    """Plant 2000 keys at a 5% design rate; probe 4000 NON-members.
    Expected FPs ~= 200 (sd ~14), so [fpr/2, 2*fpr] is a >6-sigma band —
    deterministic in practice for the fixed md5 hash family."""
    n, fpr = 2000, 0.05
    m = m_bits_for(n, fpr)
    members = spark.range(n).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    filt = build_filter(members, "k", m_bits=m)
    non_members = spark.range(100_000, 104_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    probed = probe_membership(non_members, "k", filt, m_bits=m)
    fp = probed.filter(F.col("maybe_member")).count()
    measured = fp / 4000.0
    assert measured <= 2 * fpr, f"measured FP rate {measured} > 2x design {fpr}"
    assert measured >= fpr / 2, f"measured FP rate {measured} < half design {fpr}"
    # zero false negatives: every planted key must probe true
    hits = probe_membership(members, "k", filt, m_bits=m)
    assert hits.filter(~F.col("maybe_member")).count() == 0


def test_probe_refuses_past_dense_ceiling(spark):
    one = spark.range(1).select(F.col("id").cast("string").alias("k"))
    filt = build_filter(one, "k")
    with pytest.raises(ValueError, match="[Ss]hard"):
        probe_membership(
            one, "k", filt, m_bits=(MAX_DENSE_WORDS + 1) * WORD_BITS
        )


def test_rejects_unaligned_m_bits(spark):
    one = spark.range(1).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="multiple"):
        build_filter(one, "k", m_bits=100)
    filt = build_filter(one, "k")
    with pytest.raises(ValueError, match="multiple"):
        probe_membership(one, "k", filt, m_bits=100)


def test_probe_with_smaller_m_than_build_raises(spark):
    """A filter built at 2^20 bits probed at the 16K default must FAIL
    loudly, not silently drop words and produce false negatives."""
    keys = spark.range(100).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    filt = build_filter(keys, "k", m_bits=1 << 20)
    probed = probe_membership(keys, "k", filt)  # default 16_384 bits
    with pytest.raises(Exception, match="build/probe mismatch"):
        probed.collect()


def test_null_keys_dropped_at_build_and_probe_false(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "k string"
    )
    filt = build_filter(df, "k")
    # no junk NULL word row persisted
    assert filt.filter(F.col("word_idx").isNull()).count() == 0
    probed = {
        r["k"]: r["maybe_member"]
        for r in probe_membership(df, "k", filt).collect()
    }
    assert probed["a"] and probed["b"] and probed[None] is False


# --------------------------------------------------------------------------
# Sharded lane: the scale path past the single-row dense ceiling.


def test_sharded_verdicts_match_per_shard_unsharded(spark):
    """Each shard must behave as an independent unsharded filter over its
    own keys: build both ways, probe a mixed member/non-member set, and
    require bit-identical verdicts (same m_bits -> same _position bits)."""
    from strava_vector_search_spark.operators.bloom import (
        _shard_of,
        build_sharded_filter,
        probe_sharded_membership,
    )

    n_shards, m = 4, 4096
    members = spark.range(500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    probes = spark.range(300, 900).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    filt = build_sharded_filter(members, "k", n_shards, m_bits=m)
    got = {
        r["k"]: r["maybe_member"]
        for r in probe_sharded_membership(
            probes, "k", filt, n_shards, m_bits=m
        ).collect()
    }
    # reference: per shard, an unsharded filter over that shard's keys
    want = {}
    for s in range(n_shards):
        mem_s = members.filter(_shard_of(F.col("k"), n_shards) == s)
        pro_s = probes.filter(_shard_of(F.col("k"), n_shards) == s)
        f_s = build_filter(mem_s, "k", m_bits=m)
        for r in probe_membership(pro_s, "k", f_s, m_bits=m).collect():
            want[r["k"]] = r["maybe_member"]
    assert got == want
    # zero false negatives across the sharded path
    hits = probe_sharded_membership(members, "k", filt, n_shards, m_bits=m)
    assert hits.filter(~F.col("maybe_member")).count() == 0


def test_sharded_null_keys_probe_false(spark):
    from strava_vector_search_spark.operators.bloom import (
        build_sharded_filter,
        probe_sharded_membership,
    )

    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    filt = build_sharded_filter(df, "k", 4)
    assert filt.filter(F.col("shard").isNull()).count() == 0
    probed = {
        r["k"]: r["maybe_member"]
        for r in probe_sharded_membership(df, "k", filt, 4).collect()
    }
    assert probed["a"] and probed["b"] and probed[None] is False


def test_sharded_mismatch_raises(spark):
    from strava_vector_search_spark.operators.bloom import (
        build_sharded_filter,
        probe_sharded_membership,
    )

    keys = spark.range(200).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    # built with larger per-shard m than probed
    f_big = build_sharded_filter(keys, "k", 4, m_bits=1 << 20)
    with pytest.raises(Exception, match="mismatch"):
        probe_sharded_membership(keys, "k", f_big, 4).collect()
    # built with more shards than probed (orphan shard ids)
    f_many = build_sharded_filter(keys, "k", 16)
    with pytest.raises(Exception, match="mismatch"):
        probe_sharded_membership(keys, "k", f_many, 4).collect()


def test_probe_with_larger_m_than_build_raises(spark):
    """The REVERSE mismatch (probe m > build m) used to be undetectable —
    the last-word seed makes the equality sentinel catch it too."""
    keys = spark.range(100).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    filt = build_filter(keys, "k")  # default 16_384 bits
    probed = probe_membership(keys, "k", filt, m_bits=1 << 20)
    with pytest.raises(Exception, match="build/probe mismatch"):
        probed.collect()


def test_sharded_fewer_shards_build_raises(spark):
    from strava_vector_search_spark.operators.bloom import (
        build_sharded_filter,
        probe_sharded_membership,
    )

    keys = spark.range(200).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    f_few = build_sharded_filter(keys, "k", 2)
    with pytest.raises(Exception, match="mismatch"):
        probe_sharded_membership(keys, "k", f_few, 4).collect()


def test_probe_with_different_k_than_build_raises(spark):
    """k now rides the filter as a word_idx=-1 marker row: a probe at
    fewer hashes (excess FPs) or more (false negatives) must fail the
    equality sentinel in BOTH directions, unsharded and sharded."""
    from strava_vector_search_spark.operators.bloom import (
        build_sharded_filter,
        probe_sharded_membership,
    )

    keys = spark.range(100).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    filt3 = build_filter(keys, "k", k=3)
    with pytest.raises(Exception, match="build/probe mismatch"):
        probe_membership(keys, "k", filt3, k=4).collect()
    filt5 = build_filter(keys, "k", k=5)
    with pytest.raises(Exception, match="build/probe mismatch"):
        probe_membership(keys, "k", filt5, k=4).collect()
    # matching non-default k still probes clean (zero false negatives)
    ok = probe_membership(keys, "k", filt3, k=3)
    assert ok.filter(~F.col("maybe_member")).count() == 0

    sh3 = build_sharded_filter(keys, "k", n_shards=4, k=3)
    with pytest.raises(Exception, match="build/probe mismatch"):
        probe_sharded_membership(
            keys, "k", sh3, n_shards=4, k=4
        ).collect()
    ok = probe_sharded_membership(keys, "k", sh3, n_shards=4, k=3)
    assert ok.filter(~F.col("maybe_member")).count() == 0


def test_sharded_probe_preserves_caller_shard_column(spark):
    """The probe's internal join key is _bf_shard-aliased: a caller whose
    pairs table already carries a 'shard' column must get it back
    untouched (a plain drop(\"shard\") used to remove BOTH)."""
    from strava_vector_search_spark.operators.bloom import (
        build_sharded_filter,
        probe_sharded_membership,
    )

    keys = spark.range(50).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    filt = build_sharded_filter(keys, "k", n_shards=4)
    pairs = keys.withColumn("shard", F.col("k").substr(5, 2).cast("int"))
    out = probe_sharded_membership(pairs, "k", filt, n_shards=4)
    assert "shard" in out.columns
    got = {r["k"]: r["shard"] for r in out.collect()}
    want = {r["k"]: r["shard"] for r in pairs.collect()}
    assert got == want
    assert out.filter(~F.col("maybe_member")).count() == 0


def test_probe_refuses_wrong_lane_filters(spark):
    """Lane crossing must fail LOUDLY at call time: a sharded filter fed
    to the unsharded probe passes the (m_bits, k) sentinels — every shard
    materializes its last word and the k marker rides shard -1 — while
    the dense scatter collects n_shards rows per word_idx into one
    garbled oversized array (false negatives included). The reverse
    direction used to die in column resolution naming internal aliases."""
    from strava_vector_search_spark.operators.bloom import (
        build_sharded_filter,
        probe_sharded_membership,
    )

    keys = spark.range(50).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    sharded = build_sharded_filter(keys, "k", 4)
    with pytest.raises(ValueError, match="sharded filter"):
        probe_membership(keys, "k", sharded)
    plain = build_filter(keys, "k")
    with pytest.raises(ValueError, match="UNSHARDED"):
        probe_sharded_membership(keys, "k", plain, 4)


def test_k_below_one_refused_everywhere(spark):
    """k=0 would build an empty filter whose k=0 probe vacuously calls
    EVERY key a member with sentinels agreeing — refuse at entry."""
    from strava_vector_search_spark.operators.bloom import (
        build_sharded_filter,
        probe_sharded_membership,
    )

    keys = spark.range(5).select(F.col("id").cast("string").alias("k"))
    filt = build_filter(keys, "k")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="hash count"):
            build_filter(keys, "k", k=bad)
        with pytest.raises(ValueError, match="hash count"):
            probe_membership(keys, "k", filt, k=bad)
        with pytest.raises(ValueError, match="hash count"):
            build_sharded_filter(keys, "k", 4, k=bad)
    sharded = build_sharded_filter(keys, "k", 4)
    with pytest.raises(ValueError, match="hash count"):
        probe_sharded_membership(keys, "k", sharded, 4, k=0)


def test_legacy_filter_without_k_marker_needs_explicit_opt_in(spark):
    """Filters persisted before the k marker existed (no word_idx=-1 row)
    are REFUSED by default — build_filter has always taken a k parameter,
    so the probe cannot know the build k and silently assuming the module
    default risks false negatives. With allow_legacy=True the caller
    asserts the build k and the probe runs at the k they pass."""
    from strava_vector_search_spark.operators.bloom import (
        build_sharded_filter,
        probe_sharded_membership,
    )

    keys = spark.range(100).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    legacy = build_filter(keys, "k").filter(F.col("word_idx") >= 0)
    with pytest.raises(Exception, match="allow_legacy"):
        probe_membership(keys, "k", legacy).collect()
    hits = probe_membership(keys, "k", legacy, allow_legacy=True)
    assert hits.filter(~F.col("maybe_member")).count() == 0
    # built at k=2, probed with the asserted k=2: no false negatives
    legacy_k2 = build_filter(keys, "k", k=2).filter(F.col("word_idx") >= 0)
    hits_k2 = probe_membership(keys, "k", legacy_k2, k=2, allow_legacy=True)
    assert hits_k2.filter(~F.col("maybe_member")).count() == 0

    legacy_sh = build_sharded_filter(keys, "k", 4).filter(
        F.col("word_idx") >= 0
    )
    with pytest.raises(Exception, match="allow_legacy"):
        probe_sharded_membership(keys, "k", legacy_sh, 4).collect()
    sh_hits = probe_sharded_membership(
        keys, "k", legacy_sh, 4, allow_legacy=True
    )
    assert sh_hits.filter(~F.col("maybe_member")).count() == 0


def test_stamp_filter_k_migrates_legacy_filters(spark):
    """The migration path that makes allow_legacy short-lived: stamp a
    pre-marker filter ONCE with its build k, and every later probe
    validates against the stored marker — no per-probe assertion left.
    Wrong-k re-stamps are refused (a wrong marker can only be fixed by
    rebuilding); same-k re-stamps are idempotent no-ops."""
    from strava_vector_search_spark.operators.bloom import (
        build_sharded_filter,
        probe_sharded_membership,
        stamp_filter_k,
    )

    keys = spark.range(100).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    legacy = build_filter(keys, "k", k=2).filter(F.col("word_idx") >= 0)
    with pytest.raises(Exception, match="allow_legacy"):
        probe_membership(keys, "k", legacy, k=2).collect()
    stamped = stamp_filter_k(legacy, 2)
    hits = probe_membership(keys, "k", stamped, k=2)
    assert hits.filter(~F.col("maybe_member")).count() == 0
    # the stamped marker now guards k like a native build: probing at the
    # module default k=4 fails the sentinel instead of mis-probing
    with pytest.raises(Exception, match="mismatch"):
        probe_membership(keys, "k", stamped).collect()
    # idempotent no-op on an already-markered filter; wrong k refused
    assert stamp_filter_k(stamped, 2) is stamped
    with pytest.raises(ValueError, match="rebuild"):
        stamp_filter_k(stamped, 4)
    with pytest.raises(ValueError, match="hash count"):
        stamp_filter_k(legacy, 0)

    legacy_sh = build_sharded_filter(keys, "k", 4, k=2).filter(
        F.col("word_idx") >= 0
    )
    stamped_sh = stamp_filter_k(legacy_sh, 2)
    sh_hits = probe_sharded_membership(keys, "k", stamped_sh, 4, k=2)
    assert sh_hits.filter(~F.col("maybe_member")).count() == 0
    with pytest.raises(Exception, match="mismatch"):
        probe_sharded_membership(keys, "k", stamped_sh, 4).collect()
