from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.operators import dedup as D


@pytest.fixture(scope="module")
def dup_docs(spark):
    # 1/2 exact dups; 3 near-dup of 1 (one token changed); 4 unrelated
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = base.replace("today", "tomorrow")
    other = "completely different content about spark execution plans and shuffles everywhere"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)],
        "doc_id int, text string",
    )


def test_exact_dedup_keeps_min_id(dup_docs):
    out = D.exact_dedup(dup_docs, ["text"], "doc_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4]


def test_exact_dup_groups(dup_docs):
    groups = D.exact_dup_groups(dup_docs, ["text"], "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["n_copies"] == 2
    assert groups[0]["keep_id"] == 1


def test_shingles_short_doc_fallback(spark):
    df = spark.createDataFrame([(1, "two words")], "id int, text string")
    arr = df.select(D.shingles(F.col("text"), 3).alias("s")).head()["s"]
    assert arr == ["two words"]


def test_ngram_jaccard_finds_near_dup(dup_docs):
    pairs = D.ngram_jaccard_pairs(dup_docs, "doc_id", "text", n=3, threshold=0.5)
    got = {(r["id1"], r["id2"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # exact dup
    assert 0.5 <= got[(1, 3)] < 1.0  # near dup
    assert (1, 4) not in got and (3, 4) not in got


def test_minhash_signature_properties(dup_docs):
    sig = {r["doc_id"]: list(r["sig"]) for r in D.minhash_signatures(dup_docs, "doc_id", "text").collect()}
    assert len(sig[1]) == 16
    assert sig[1] == sig[2]  # identical docs -> identical signatures
    agree_near = sum(a == b for a, b in zip(sig[1], sig[3]))
    agree_far = sum(a == b for a, b in zip(sig[1], sig[4]))
    assert agree_near > agree_far  # signature agreement tracks jaccard


def test_minhash_lsh_verified_matches_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["id1"], r["id2"])
        for r in D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    lsh = {
        (r["id1"], r["id2"])
        for r in D.minhash_dedup_verified(docs, "doc_id", "text", threshold=0.5).collect()
    }
    # LSH-verified pairs are a subset of exact pairs (no false positives
    # after verification), with high recall at j >= 0.5 and 4x4 bands
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.8


def test_simhash_hamming_tracks_similarity(spark, dup_docs):
    sig = D.simhash(dup_docs, "doc_id", "text", bits=48)
    pairs = D.simhash_pairs(sig, "doc_id", max_hamming=48, bits=48, chunks=4)
    ham = {(r["id1"], r["id2"]): r["hamming"] for r in pairs.collect()}
    assert ham[(1, 2)] == 0
    assert ham[(1, 3)] < ham.get((1, 4), 48)


def test_embedding_near_dup_symmetric_free(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    pairs = D.embedding_near_dup_pairs(emb, threshold=0.9).collect()
    assert {(r["id1"], r["id2"]) for r in pairs} == {(1, 2)}
    assert all(r["id1"] < r["id2"] for r in pairs)


def test_connected_components_known_graph(spark):
    # components: {1,2,3} (chain), {10,11}, singleton 99 appears only in df
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    cc = {r["id"]: r["comp"] for r in D.connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    df = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
    out = {r["doc_id"]: r["comp"] for r in D.dedup_by_near_dup_groups(df, pairs, "doc_id").collect()}
    assert out[99] == 99  # singleton keeps its own id
    assert out[3] == 1 and out[11] == 10
    survivors = sorted(k for k, v in out.items() if k == v)
    assert survivors == [1, 10, 99]


def test_connected_components_long_chain_converges(spark):
    # a path graph 0-1-2-...-9: diameter 9, exercises multi-round propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id1 long, id2 long"
    )
    cc = {r["id"]: r["comp"] for r in D.connected_components(pairs).collect()}
    assert set(cc.values()) == {0}


def test_simhash_chunked_pairs_complete_within_pigeonhole_bound(spark, sf_dir):
    # max_hamming (3) < chunks (4): the chunked equi-join candidates must
    # recover EXACTLY the brute-force hamming pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = D.simhash(docs, "doc_id", "text", bits=48).cache()
    chunked = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in D.simhash_pairs(sig, "doc_id", max_hamming=3, bits=48, chunks=4).collect()
    }
    a = sig.selectExpr("doc_id AS id1", "simhash AS s1")
    b = sig.selectExpr("doc_id AS id2", "simhash AS s2")
    brute = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in a.crossJoin(b)
        .filter("id1 < id2")
        .selectExpr("id1", "id2", "bit_count(s1 ^ s2) AS hamming")
        .filter("hamming <= 3")
        .collect()
    }
    assert chunked == brute


def test_minhash_band_kernel_matches_expression(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expr = {
        tuple(r)
        for r in D.minhash_lsh_pairs(docs, "doc_id", "text", kernel="expr").collect()
    }
    pandas_k = {
        tuple(r)
        for r in D.minhash_lsh_pairs(docs, "doc_id", "text", kernel="pandas").collect()
    }
    assert expr == pandas_k


def test_simhash_kernel_matches_expression(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # include a token-less doc: both forms must drop it
    docs = docs.unionByName(
        spark.createDataFrame([(99999, "!!! ...")], "doc_id long, text string"),
        allowMissingColumns=True,
    )
    expr = {
        (r["doc_id"], r["simhash"])
        for r in D.simhash(docs, "doc_id", "text", bits=48, kernel="expr").collect()
    }
    pk = {
        (r["doc_id"], r["simhash"])
        for r in D.simhash(docs, "doc_id", "text", bits=48, kernel="pandas").collect()
    }
    assert expr == pk
    assert not any(i == 99999 for i, _ in pk)


def test_connected_components_string_ids_driver_and_distributed(spark):
    """Both the driver union-find path and the distributed path derive the
    output schema from the input id type (regression: driver path was
    hardcoded to long)."""
    from strava_vector_search_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id1 string, id2 string"
    )
    for threshold in (100_000, 0):  # driver path, then distributed path
        comp = {
            r["id"]: r["comp"]
            for r in connected_components(pairs, driver_threshold=threshold).collect()
        }
        assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_paragraph_dedup_removes_repeated_span(spark):
    # doc 1 and doc 2 share their first 10-token span; doc 2 keeps only its
    # distinct second span; doc 3 is entirely a repeat -> empty clean_text
    span_a = " ".join(f"w{i}" for i in range(10))
    span_b = " ".join(f"x{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, span_a),
            (2, span_a + " " + span_b),
            (3, span_a),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in D.paragraph_dedup(df, "doc_id", "text", 10).collect()
    }
    assert out[1]["n_kept"] == 1 and out[1]["clean_text"] == span_a
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == span_b
    assert out[3]["n_kept"] == 0 and out[3]["clean_text"] == ""


def test_paragraph_dedup_rebuild_preserves_span_order(spark):
    spans = [" ".join(f"s{j}t{i}" for i in range(10)) for j in range(4)]
    df = spark.createDataFrame(
        [(7, " ".join(spans))], "doc_id int, text string"
    )
    row = D.paragraph_dedup(df, "doc_id", "text", 10).head()
    assert row["clean_text"] == " ".join(spans)
    assert row["n_spans"] == 4 and row["n_kept"] == 4


def test_decontaminate_flags_planted_overlap(spark):
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta zeta"),  # shares 2 of 3 shingles
            (2, "totally unrelated words here now"),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in D.decontaminate(
            corpus, eval_df, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert out[1]["n_hit"] == 2 and out[1]["contaminated"]
    assert out[2]["n_hit"] == 0 and not out[2]["contaminated"]


def test_dedup_keep_best_picks_highest_quality(spark, dup_docs):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id1 int, id2 int"
    )
    docs = dup_docs.withColumn("n_chars", F.length("text"))
    quality = F.col("n_chars").cast("bigint") * 1_000_000 - F.col("doc_id")
    out = {
        r["comp"]: r
        for r in D.dedup_keep_best(docs, pairs, "doc_id", quality).collect()
    }
    # cluster {1,2,3}: doc 3 is longest ("tomorrow" vs "today")
    assert out[1]["keep_id"] == 3 and out[1]["n_members"] == 3
    # singleton keeps itself
    assert out[4]["keep_id"] == 4 and out[4]["n_members"] == 1


def test_paragraph_dedup_idempotent(spark):
    # dedup of already-deduped text keeps everything: no span repeats twice
    import random

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 35))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    once = D.paragraph_dedup(df, "doc_id", "text", 10)
    again = D.paragraph_dedup(
        once.select("doc_id", F.col("clean_text").alias("text")),
        "doc_id",
        "text",
        10,
    )
    merged = {
        r["doc_id"]: r
        for r in again.collect()
    }
    for r in once.collect():
        # every span kept the first time survives the second pass intact
        assert merged[r["doc_id"]]["n_kept"] == merged[r["doc_id"]]["n_spans"]


def test_containment_catches_excerpt_jaccard_misses(spark):
    from strava_vector_search_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    words = " ".join(f"w{i}" for i in range(400))
    excerpt = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, words), (2, excerpt), (3, "totally different text here")],
        "doc_id long, text string",
    )
    cont = containment_pairs(df, "doc_id", "text", threshold=0.8).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["id1"], row["id2"]) == (1, 2)
    assert row["containment"] == 1.0
    assert row["contained_id"] == 2  # the smaller side is the excerpt
    # symmetric Jaccard misses the same pair at any usable threshold
    jac = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert jac == []


def test_containment_ties_pick_lower_id(spark):
    from strava_vector_search_spark.operators.dedup import containment_pairs

    same = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(7, same), (9, same)], "doc_id long, text string"
    )
    row = containment_pairs(df, "doc_id", "text", threshold=0.8).first()
    assert row["containment"] == 1.0 and row["contained_id"] == 7


def test_semantic_dedup_groups_within_cluster_only(spark):
    from strava_vector_search_spark.operators.dedup import semantic_dedup

    # ids 1,2 identical vectors in cluster A -> one survivor; id 3 has the
    # SAME vector but in cluster B -> untouched (SemDeDup never compares
    # across clusters); id 4 orthogonal singleton
    rows = [
        (1, "a", [1.0, 0.0]),
        (2, "a", [1.0, 0.0]),
        (3, "b", [1.0, 0.0]),
        (4, "a", [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, c string, embedding array<double>")
    out = {
        r["vec_id"]: (r["comp"], r["keep"])
        for r in semantic_dedup(
            emb, cluster_col="c", id_col="vec_id", threshold=0.9
        ).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (1, False)   # merged into 1 (same cluster)
    assert out[3] == (3, True)    # identical vector, different cluster
    assert out[4] == (4, True)    # below threshold

def test_semantic_dedup_transitive_chain(spark):
    from strava_vector_search_spark.operators.dedup import semantic_dedup
    import math

    # chain: v1~v2 and v2~v3 above threshold but v1~v3 below -> one
    # component of all three via transitivity (connected components, not
    # pairwise-only pruning)
    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [(1, unit(0.0)), (2, unit(0.5)), (3, unit(1.0))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    emb = emb.withColumn("c", F.lit("x"))
    out = semantic_dedup(emb, cluster_col="c", id_col="vec_id", threshold=0.85)
    comps = {r["vec_id"]: r["comp"] for r in out.collect()}
    # cos(0.5)=0.878 >= 0.85, cos(1.0)=0.540 < 0.85 -> transitive merge
    assert comps == {1: 1, 2: 1, 3: 1}


def test_cdc_chunks_cover_and_are_shift_robust(spark):
    from strava_vector_search_spark.operators.dedup import cdc_chunk_rows

    base = " ".join(f"tok{i}" for i in range(200))
    shifted = "inserted " + base  # one token prepended
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    )
    ch = cdc_chunk_rows(df, "doc_id", "text").collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # chunks tile the document exactly (coverage, order, no overlap)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        rebuilt = " ".join(r["chunk"] for r in rows)
        want = base if d == 1 else shifted
        assert rebuilt == " ".join(want.lower().split())
    # content-defined boundaries: the insertion perturbs only the prefix —
    # the chunk multisets agree on all but O(1) chunks
    c1 = {r["chunk"] for r in by_doc[1]}
    c2 = {r["chunk"] for r in by_doc[2]}
    assert len(c1 & c2) >= len(c1) - 2


def test_cdc_repeated_chunks_flags_shared_content(spark):
    from strava_vector_search_spark.operators.dedup import cdc_repeated_chunks

    shared = " ".join(f"common{i}" for i in range(60))
    df = spark.createDataFrame(
        [
            (1, "alpha beta " + shared),
            (2, shared + " gamma delta"),
            (3, "unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    rep = cdc_repeated_chunks(df, "doc_id", "text", top=10).collect()
    assert rep, "shared run must produce repeated chunks"
    assert all(r["n_docs"] == 2 for r in rep)
    assert all("common" in r["chunk"] for r in rep)


def test_cdc_chunks_tile_random_texts(spark):
    """Random token streams (fixed seed): CDC chunks must always tile the
    token stream exactly — full coverage, order preserved, no overlap —
    for every length including < window."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60))))
        for i in range(40)
    ]
    from strava_vector_search_spark.operators.dedup import cdc_chunk_rows

    df = spark.createDataFrame(rows, "doc_id long, text string")
    ch = cdc_chunk_rows(df, "doc_id", "text").collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in rows:
        toks = [t for t in text.lower().split() if t]
        if not toks:
            assert i not in by_doc
            continue
        got = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert " ".join(r["chunk"] for r in got) == " ".join(toks)
        assert [r["chunk_idx"] for r in got] == list(range(len(got)))
        assert all(r["n_tokens"] >= 1 for r in got)


# -- incremental connected components ----------------------------------------


def _cc_rows(df):
    return {(r["id"], r["comp"]) for r in df.collect()}


def test_cc_incremental_merge_growth_create(spark):
    from strava_vector_search_spark.operators.dedup import (
        cc_incremental,
        connected_components,
    )

    old_e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id1 long, id2 long"
    )
    labels = connected_components(old_e)
    # batch: merge comps {1,2,3} and {10,11}; grow {20,21} with 22;
    # create brand-new {30,31}
    batch = spark.createDataFrame(
        [(3, 10), (21, 22), (30, 31)], "id1 long, id2 long"
    )
    got = cc_incremental(labels, batch)
    full = connected_components(
        old_e.unionByName(batch), "id1", "id2"
    )
    assert _cc_rows(got) == _cc_rows(full)
    by_id = dict(_cc_rows(got))
    assert by_id[11] == 1 and by_id[10] == 1  # merged comp relabeled to min
    assert by_id[22] == 20
    assert by_id[31] == 30


def test_cc_incremental_untouched_components_unchanged(spark):
    from strava_vector_search_spark.operators.dedup import (
        cc_incremental,
        connected_components,
    )

    old_e = spark.createDataFrame(
        [(1, 2), (50, 51), (60, 61)], "id1 long, id2 long"
    )
    labels = connected_components(old_e)
    batch = spark.createDataFrame([(2, 3)], "id1 long, id2 long")
    got = dict(_cc_rows(cc_incremental(labels, batch)))
    assert got[50] == 50 and got[51] == 50 and got[60] == 60 and got[61] == 60
    assert got[3] == 1


def test_cc_incremental_batch_stream_matches_rebuild(spark):
    import random

    from strava_vector_search_spark.operators.dedup import (
        cc_incremental,
        connected_components,
    )

    rng = random.Random(7)
    all_edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(120)
    ]
    batches = [all_edges[:40], all_edges[40:80], all_edges[80:]]
    labels = connected_components(
        spark.createDataFrame(batches[0], "id1 long, id2 long")
    )
    for b in batches[1:]:
        labels = cc_incremental(
            labels, spark.createDataFrame(b, "id1 long, id2 long")
        ).localCheckpoint()
    full = connected_components(
        spark.createDataFrame(all_edges, "id1 long, id2 long")
    )
    assert _cc_rows(labels) == _cc_rows(full)


def test_cc_incremental_intra_component_edge_is_noop(spark):
    from strava_vector_search_spark.operators.dedup import (
        cc_incremental,
        connected_components,
    )

    old_e = spark.createDataFrame([(1, 2), (2, 3)], "id1 long, id2 long")
    labels = connected_components(old_e)
    batch = spark.createDataFrame([(1, 3)], "id1 long, id2 long")
    assert _cc_rows(cc_incremental(labels, batch)) == _cc_rows(labels)


def test_cross_set_contamination_edges(spark):
    """Empty eval set screens nothing (empty result, correct schema);
    screening the corpus against itself flags every vector with cosine
    1.0 and itself as nearest."""
    from pyspark.sql import functions as F

    from strava_vector_search_spark.io.tables import load_table
    from strava_vector_search_spark.operators.dedup import (
        cross_set_contamination,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    empty_eval = emb.filter(F.lit(False)).select(
        F.col("vec_id").alias("eval_id"), "embedding"
    )
    out = cross_set_contamination(emb, empty_eval)
    assert out.count() == 0
    assert out.columns == ["vec_id", "nearest_eval_id", "cosine"]

    self_eval = emb.select(F.col("vec_id").alias("eval_id"), "embedding")
    hits = cross_set_contamination(emb, self_eval, threshold=0.999)
    rows = {r["vec_id"]: r for r in hits.collect()}
    assert len(rows) == emb.count()
    assert all(r["nearest_eval_id"] == vid for vid, r in rows.items())


def test_duplicate_spans_flags_misaligned_shared_passage(spark, monkeypatch):
    """dd_duplicate_spans on a crafted corpus: two docs share an
    18-token passage planted at DIFFERENT offsets — different prefix
    token counts (3 vs 7) AND char offsets differing by a non-multiple
    of 10 (17 vs 44 chars) — the exact case the r8 stride-10 char
    windows missed ~90% of the time. Token windows at stride 1 are
    alignment-free, so every one of the passage's 9 complete 10-token
    windows must match in both docs; a third unique doc gets exactly 0."""
    import strava_vector_search_spark.queries as Q

    passage = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays on and the crowd cheers"
    )  # 18 tokens -> 9 complete 10-token windows
    pre1 = "alpha beta gamma "  # 3 tokens, 17 chars
    pre2 = "one two three four five six seven "  # 7 tokens, 34 chars
    docs = spark.createDataFrame(
        [
            (1, pre1 + passage + " ending words here for one"),
            (2, pre2 + passage + " totally different tail text"),
            (3, "entirely unique content here repeated never elsewhere "
                "with many extra filler tokens to clear the minimum " * 3),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(
        Q, "load_table", lambda _s, _d, _t: docs
    )
    out = {
        r["doc_id"]: (r["n_win"], r["n_dup"], r["dup_frac"])
        for r in Q.dd_duplicate_spans(spark, "/ignored").collect()
    }
    assert out[3][1] == 0 and out[3][2] == 0.0
    # alignment-free recall: all 9 passage windows match in BOTH docs
    assert out[1][1] >= 9 and out[2][1] >= 9
    assert 0 < out[1][2] < 1 and 0 < out[2][2] < 1


def test_tokens_is_single_canonical_definition():
    """operators.dedup.tokens must BE functions.text.tokens (re-export
    identity) — two drifting definitions would silently split tokenizer
    semantics between the dedup gates and the text gates."""
    from strava_vector_search_spark.functions.text import tokens as t_text
    from strava_vector_search_spark.operators.dedup import tokens as t_dedup

    assert t_dedup is t_text
