"""Streaming near-duplicate rejection: incoming documents are checked
against the accumulated corpus BEFORE admission — the training-pipeline
gate that keeps a growing corpus duplicate-free (the streaming twin of the
batch dedup suite, and the natural extension of the reference's
cache-growth append stream, 02:418).

Mechanics per micro-batch (pure function :func:`admit_batch`, streaming
wiring :func:`start_dedup_stream`):

1. MinHash-sign the incoming documents (same signatures as batch dedup);
2. LSH band join against the persisted signature store — candidates only;
3. exact shingle-Jaccard verification of candidates (candidate-driven);
4. ALSO dedup the batch against itself (two dups arriving together),
   resolved against admitted refs only (matching a rejected doc rejects
   nothing);
5. write survivors + signatures under batch-id-keyed partition dirs with
   overwrite — idempotent under foreachBatch's at-least-once replay.

State is the signature store (num_hashes longs per admitted doc) — not the
corpus text — so the check scales like the LSH band join: shuffles 8-byte
band keys, reads no text for non-candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.dedup import (
    md5_int,
    minhash_signatures,
)


def _band_rows(sig: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    r = num_hashes // bands
    return sig.select(
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
    ).select("_id", "bb.band", "bb.bkey")


def admit_batch(
    new_docs: DataFrame,
    existing_signatures: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """One admission step. Returns (admitted_docs, admitted_signatures).

    A new doc is REJECTED if it verifies as a near-dup (Jaccard >= threshold)
    of any already-admitted doc, or of an ADMITTED doc earlier in the same
    batch (lower id wins within a batch — deterministic). Matching only a
    rejected doc does not reject: if A is rejected and C matches A but not
    A's surviving twin, C is admitted — resolved transitively in id order.
    """
    sig_new = minhash_signatures(
        new_docs, id_col, text_col, num_hashes, shingle_n
    ).localCheckpoint(eager=False)
    bands_new = _band_rows(sig_new, id_col, num_hashes, bands)

    # candidates vs the store AND vs the batch itself (id-ordered); tag the
    # origin — in-batch refs need admission-aware resolution below
    cand_parts = []
    if existing_signatures is not None:
        bands_old = _band_rows(existing_signatures, id_col, num_hashes, bands)
        cand_parts.append(
            bands_new.alias("n")
            .join(bands_old.alias("o"), ["band", "bkey"])
            .select(
                F.col("n._id").alias("new_id"),
                F.col("o._id").alias("ref_id"),
                F.lit(False).alias("ref_in_batch"),
            )
        )
    cand_parts.append(
        bands_new.alias("a")
        .join(bands_new.alias("b"), ["band", "bkey"])
        .filter(F.col("b._id") < F.col("a._id"))
        .select(
            F.col("a._id").alias("new_id"),
            F.col("b._id").alias("ref_id"),
            F.lit(True).alias("ref_in_batch"),
        )
    )
    cands = cand_parts[0]
    for p in cand_parts[1:]:
        cands = cands.unionByName(p)
    cands = cands.distinct()

    # exact verification needs the REFERENCE docs' shingles: for the store
    # we only kept signatures, so verification uses signature agreement
    # (estimated Jaccard = fraction of matching minhash rows) — the standard
    # streaming trade-off: signatures are the state, text is not re-read.
    sig_all = sig_new if existing_signatures is None else sig_new.unionByName(
        existing_signatures
    )
    est = (
        cands.join(
            sig_all.select(F.col(id_col).alias("new_id"), F.col("sig").alias("sig_n")),
            "new_id",
        )
        .join(
            sig_all.select(F.col(id_col).alias("ref_id"), F.col("sig").alias("sig_r")),
            "ref_id",
        )
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with(F.col("sig_n"), F.col("sig_r"), lambda a, b: a == b),
                        lambda x: x,
                    )
                )
                / num_hashes,
                6,
            ),
        )
    )
    # Resolve admission against ADMITTED refs only. A doc whose only match
    # is itself rejected (so it never entered the corpus) must be admitted —
    # greedy chain rejection would wrongly drop it. The resolution is
    # sequential in id order (lowest id wins), so it runs driver-side over
    # the VERIFIED match pairs only: ids, no payloads, and bounded by the
    # number of near-dup matches in one micro-batch (they are the rejects —
    # tiny relative to batch size by construction of a dedup gate).
    matches = (
        est.filter(F.col("est_jaccard") >= threshold)
        .select("new_id", "ref_id", "ref_in_batch")
        .collect()
    )
    rejected = {r["new_id"] for r in matches if not r["ref_in_batch"]}
    in_batch_refs: dict = {}
    for r in matches:
        if r["ref_in_batch"]:
            in_batch_refs.setdefault(r["new_id"], set()).add(r["ref_id"])
    for i in sorted(in_batch_refs):
        if i in rejected:
            continue
        # refs are always lower ids, so their fate is already decided
        if any(ref not in rejected for ref in in_batch_refs[i]):
            rejected.add(i)

    if not rejected:
        return new_docs, sig_new
    spark = new_docs.sparkSession
    id_type = new_docs.schema[id_col].dataType.simpleString()
    rej_df = F.broadcast(
        spark.createDataFrame(
            [(i,) for i in sorted(rejected)], f"{id_col} {id_type}"
        )
    )
    admitted = new_docs.join(rej_df, id_col, "left_anti")
    admitted_sigs = sig_new.join(rej_df, id_col, "left_anti")
    return admitted, admitted_sigs


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_path: str,
    signature_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> None:
    """One idempotent admission micro-batch (the foreachBatch body).

    Reads the signature store EXCLUDING this batch's own partition (so a
    replay can neither self-reject nor double-admit), runs admission, and
    overwrites both stores' ``_batch_id=<id>`` partition directories.
    Admission is deterministic, so a replayed batch rewrites identical
    content — at-least-once delivery becomes effectively exactly-once.
    """
    try:
        existing = (
            spark.read.parquet(signature_path)
            .filter(F.col("_batch_id") != batch_id)
            .drop("_batch_id")
        )
    except Exception:
        existing = None
    admitted, sigs = admit_batch(batch_df, existing, id_col, text_col, threshold)
    # signatures first: if the corpus write fails mid-batch, the replay
    # still recomputes from a store that excludes this batch's partition
    sigs.write.mode("overwrite").parquet(f"{signature_path}/_batch_id={batch_id}")
    admitted.write.mode("overwrite").parquet(f"{corpus_path}/_batch_id={batch_id}")


def start_dedup_stream(
    spark: SparkSession,
    incoming_path: str,
    corpus_path: str,
    signature_path: str,
    checkpoint_path: str,
    docs_schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    trigger_seconds: int = 60,
):
    """Wire admission as a Structured Stream over an incoming directory.

    IDEMPOTENT under at-least-once foreachBatch replay: both stores are
    written under batch-id-keyed partition directories with overwrite, so a
    replayed batch (e.g. after a crash between the two writes or before the
    checkpoint commit) rewrites its own partitions instead of appending
    duplicates. The admission check reads the signature store EXCLUDING the
    current batch's partition, so a half-committed replay can neither
    self-reject nor double-admit; admission is deterministic, so the
    rewrite is byte-stable.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(
            spark, batch_df, batch_id, corpus_path, signature_path,
            id_col, text_col, threshold,
        )

    stream = spark.readStream.schema(docs_schema).parquet(incoming_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
