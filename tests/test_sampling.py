"""Deterministic sampling / split / mixture / packing operators
(operators/sampling.py) and PII scrubbing (functions/text.py).

The oracle gate (smp_* / dm_* / pk_* / tx_pii_scrub entries) pins engine
parity; these tests pin the operator-level invariants: determinism across
re-runs and partitionings, membership stability under inserts, mixture
feasibility, packing budget arithmetic, and scrub behavior on crafted PII.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.text import pii_counts, scrub_pii
from strava_vector_search_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    hash_split,
    pack_sequences,
    stratified_sample,
    weighted_mix,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["web", "books", "code"][i % 3], ["en", "de"][i % 2], 10 + (i * 7) % 90)
        for i in range(600)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_tok long"
    )


def test_hash_split_partitions_and_proportions(docs):
    out = hash_split(docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 600  # a partition, not a sample
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # hash proportions concentrate near the weights (binomial, n=600)
    assert 0.7 <= counts["train"] / 600 <= 0.9


def test_hash_split_membership_stable_under_insert(docs):
    """Adding rows must not move any existing row between splits."""
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    before = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.filter(F.col("doc_id") < 300), "doc_id", splits).collect()
    }
    after = {
        r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", splits).collect()
    }
    assert all(after[k] == v for k, v in before.items())


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", [("a", 0.5), ("b", 0.2)])


def test_stratified_sample_rates_and_determinism(docs):
    out = stratified_sample(docs, "doc_id", "lang", {"en": 0.5, "de": 0.1})
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.35 <= got["en"] / 300 <= 0.65
    assert got.get("de", 0) / 300 <= 0.2
    # same rows on a different partitioning
    again = stratified_sample(
        docs.repartition(13), "doc_id", "lang", {"en": 0.5, "de": 0.1}
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_stratified_default_rate_drops_unlisted(docs):
    out = stratified_sample(docs, "doc_id", "lang", {"en": 0.5})
    assert out.filter(F.col("lang") == "de").count() == 0


def test_weighted_mix_hits_target_proportions(docs):
    # sources are uniform (200 each); targets skewed — web keeps everything
    # only if it is the scarcest relative to its target
    out = weighted_mix(docs, "doc_id", "source", {"web": 0.6, "books": 0.3, "code": 0.1})
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # web is scarcest vs target (200/0.6 min) => keeps all 200
    assert counts["web"] == 200
    # others concentrate near T*p = 333*0.3, 333*0.1
    assert 70 <= counts["books"] <= 130
    assert 15 <= counts["code"] <= 55
    # every admitted row keeps its original columns
    assert {"doc_id", "source", "lang", "n_tok", "mix_threshold"} <= set(out.columns)


def test_weighted_mix_drops_unlisted_domains(docs):
    out = weighted_mix(docs, "doc_id", "source", {"web": 0.5, "books": 0.5})
    assert out.filter(F.col("source") == "code").count() == 0


def test_pack_sequences_budget_arithmetic(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(10)], "doc_id long, n_tok long"
    )
    out = pack_sequences(df, "doc_id", "n_tok", budget=300)
    bins = {r["doc_id"]: r["bin"] for r in out.collect()}
    # offsets 0,100,...,900 → bins 0,0,0,1,1,1,2,2,2,3
    assert [bins[i] for i in range(10)] == [0, 0, 0, 1, 1, 1, 2, 2, 2, 3]


def test_pack_sequences_straddle_goes_to_start_bin(spark):
    df = spark.createDataFrame(
        [(1, 250), (2, 100), (3, 10)], "doc_id long, n_tok long"
    )
    out = pack_sequences(df, "doc_id", "n_tok", budget=300)
    bins = {r["doc_id"]: r["bin"] for r in out.collect()}
    # doc 2 starts at offset 250 (< 300) so it belongs to bin 0 though it
    # straddles; doc 3 starts at 350 → bin 1
    assert bins == {1: 0, 2: 0, 3: 1}


def test_pack_sequences_partitioned_streams_independent(docs):
    out = pack_sequences(docs, "doc_id", "n_tok", budget=500, partition_cols=["lang"])
    # each lang stream starts its own bin 0
    mins = {
        r["lang"]: r["m"]
        for r in out.groupBy("lang").agg(F.min("bin").alias("m")).collect()
    }
    assert set(mins.values()) == {0}


def test_hash_bucket_range(docs):
    mm = docs.select(
        F.min(hash_bucket(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket(F.col("doc_id"))).alias("hi"),
    ).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] < BUCKETS


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice.smith+x@sub.example.co.uk today"),
            (2, "call +1 (415) 555-0134 or +44 20 7946 0958 now"),
            (3, "no pii here, just 12345 and words"),
            (4, "both bob@x.org and +33 1 23 45 67 89"),
        ],
        "id int, text string",
    )
    out = df.select(
        "id",
        scrub_pii(F.col("text")).alias("clean"),
        *[c.alias(n) for c, n in zip(pii_counts(F.col("text")), ["ne", "np"])],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert "[EMAIL]" in rows[1]["clean"] and "alice" not in rows[1]["clean"]
    assert rows[1]["ne"] == 1
    assert rows[2]["clean"].count("[PHONE]") == 2 and rows[2]["np"] == 2
    assert rows[3]["clean"] == "no pii here, just 12345 and words"
    assert rows[3]["ne"] == 0 and rows[3]["np"] == 0
    assert "[EMAIL]" in rows[4]["clean"] and "[PHONE]" in rows[4]["clean"]


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from strava_vector_search_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(i, 1.0 if i < 90 else 1000.0) for i in range(100)]
        + [(200, 0.0), (201, None)],
        "id int, w double",
    )
    s1 = [r["id"] for r in weighted_sample_topk(df, "id", "w", k=10).collect()]
    s2 = [r["id"] for r in weighted_sample_topk(df, "id", "w", k=10).collect()]
    assert s1 == s2  # deterministic, ordered identically
    # zero/NULL weights can never be sampled
    assert 200 not in s1 and 201 not in s1
    # the ten 1000x-weight rows should dominate a k=10 sample
    heavy = [i for i in s1 if i >= 90]
    assert len(heavy) >= 8
    # different seed -> different sample (same membership unlikely)
    s3 = [
        r["id"]
        for r in weighted_sample_topk(df, "id", "w", k=10, seed="other").collect()
    ]
    assert s1 != s3


def test_weighted_sample_plan_is_topk(spark):
    from strava_vector_search_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.range(1000).select(
        F.col("id").cast("int").alias("id"), F.lit(2.0).alias("w")
    )
    plan = (
        weighted_sample_topk(df, "id", "w", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_temperature_resample_upweights_scarce_domains(spark):
    from strava_vector_search_spark.operators.sampling import temperature_resample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, "doc_id", "source", alpha=0.5)
    rates = {
        r["source"]: r["thr"]
        for r in out.groupBy("source")
        .agg(F.max("mix_threshold").alias("thr"))
        .collect()
    }
    # the scarce domain keeps everything; the abundant one sheds
    assert rates["small"] == 1.0
    assert rates["big"] < 1.0
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["small"] == 100
    # post-mix shares move toward the alpha-smoothed target: sqrt(900):sqrt(100)
    # = 3:1, so big should land near 300 (hash-binomial around the threshold)
    assert 240 <= counts["big"] <= 360


def test_temperature_resample_alpha_one_is_identity(spark):
    from strava_vector_search_spark.operators.sampling import temperature_resample

    rows = [(i, ["a", "b"][i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, "doc_id", "source", alpha=1.0)
    # alpha=1 -> smoothed shares equal natural shares -> every rate is 1
    assert out.count() == 200
    assert out.agg(F.min("mix_threshold")).first()[0] == 1.0


def test_temperature_resample_rejects_bad_alpha(spark):
    from strava_vector_search_spark.operators.sampling import temperature_resample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        temperature_resample(df, "doc_id", "source", alpha=0.0)
    with pytest.raises(ValueError):
        temperature_resample(df, "doc_id", "source", alpha=1.5)


def test_length_bucketed_batches_bounds_padding(spark):
    from strava_vector_search_spark.operators.sampling import (
        length_bucketed_batches,
    )

    rows = [(i, 1 + (i * 13) % 1000) for i in range(500)] + [(9999, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = length_bucketed_batches(df, "doc_id", "n_tok", batch_size=16)
    got = out.collect()
    assert len(got) == 500  # the zero-token row is dropped
    for r in got:
        # bucket invariant: 2^bucket <= n_tok < 2^(bucket+1)
        assert (1 << r["bucket"]) <= r["n_tok"] < (1 << (r["bucket"] + 1))
    # within any (bucket, batch), max/min < 2 -> padding waste bounded
    stats = (
        out.groupBy("bucket", "batch")
        .agg(F.max("n_tok").alias("mx"), F.min("n_tok").alias("mn"),
             F.count("*").alias("n"))
        .collect()
    )
    assert all(r["mx"] / r["mn"] < 2.0 for r in stats)
    assert all(r["n"] <= 16 for r in stats)


def test_length_bucketed_batches_power_of_two_boundary(spark):
    from strava_vector_search_spark.operators.sampling import (
        length_bucketed_batches,
    )

    df = spark.createDataFrame(
        [(1, 1023), (2, 1024), (3, 1025)], "doc_id long, n_tok long"
    )
    got = {r["doc_id"]: r["bucket"] for r in
           length_bucketed_batches(df, "doc_id", "n_tok", 4).collect()}
    assert got == {1: 9, 2: 10, 3: 10}


def test_leakage_safe_split_keeps_components_together(spark, sf_dir):
    from strava_vector_search_spark.queries import smp_leakage_safe_split
    from pyspark.sql import functions as F

    out = smp_leakage_safe_split(spark, sf_dir)
    # every component maps to exactly one split
    mixed = (
        out.groupBy("comp")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert mixed == 0
    # and the split is roughly 80/20 over components (hash uniformity)
    frac = out.filter(F.col("split") == "train").count() / out.count()
    assert 0.6 < frac < 0.95


def test_hard_negatives_exclude_dups_and_rank_hardest(spark):
    """hard_negative_pairs: same-bucket candidates, near-dup ceiling, and
    hardest-first ranking pinned on a constructed embedding set."""
    import math

    from strava_vector_search_spark.operators.sampling import (
        hard_negative_pairs,
    )

    def unit(theta):
        v = [math.cos(theta), math.sin(theta)] + [0.0] * 62
        return v

    # anchor at angle 0; near-dup at ~2deg (cos>0.999); hard negatives at
    # 25deg/35deg; easy negative at 120deg (likely different buckets, and
    # if bucketed together still ranks last)
    rows = [
        (0, unit(0.0)),
        (1, unit(math.radians(2))),
        (2, unit(math.radians(25))),
        (3, unit(math.radians(35))),
        (4, unit(math.radians(120))),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    anchors = emb.filter(F.col("vec_id") == 0)
    out = hard_negative_pairs(emb, anchors, per_anchor=2, dup_ceiling=0.95)
    got = [(r["neg_id"], r["rn"]) for r in out.orderBy("rn").collect()]
    # near-dup 1 excluded by the ceiling; 2 then 3 are the hardest
    assert got == [(2, 1), (3, 2)]
    assert all(r["cosine"] < 0.95 for r in out.collect())
