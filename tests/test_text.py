from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.functions import text as T


@pytest.fixture(scope="module")
def samples(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs to the hills for fun"),
            (2, "der hund und die katze sind nicht mit dem ball zu spielen heute"),
            (3, "!!! ??? *** $$$ %%%"),
            (4, ""),
            (5, "el perro y el gato es una historia para los que quieren leer en casa"),
        ],
        "id int, text string",
    )


def _one(df, col_expr, id_):
    return {r["id"]: r["v"] for r in df.select("id", col_expr.alias("v")).collect()}[id_]


def test_token_count(samples):
    assert _one(samples, T.token_count(F.col("text")), 1) == 16
    assert _one(samples, T.token_count(F.col("text")), 4) == 0


def test_punct_ratio_bounds(samples):
    assert _one(samples, T.punct_ratio(F.col("text")), 1) == pytest.approx(0.0)
    r3 = _one(samples, T.punct_ratio(F.col("text")), 3)
    assert r3 > 0.5
    assert _one(samples, T.punct_ratio(F.col("text")), 4) == 0.0


def test_quality_score_ranks_sane_text_higher(samples):
    good = _one(samples, T.quality_score(F.col("text")), 1)
    junk = _one(samples, T.quality_score(F.col("text")), 3)
    assert good == 1.0
    assert junk < good


def test_lang_id(samples):
    got = {r["id"]: r["g"] for r in samples.select("id", T.lang_id(F.col("text")).alias("g")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[5] == "es"
    assert got[3] == "und"


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World! Run"), (2, "hello world RUN"), (3, "different text")],
        "id int, text string",
    )
    fp = {r["id"]: r["f"] for r in df.select("id", T.fingerprint(F.col("text")).alias("f")).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_bpe_ish_token_count_exceeds_words(samples):
    words = _one(samples, T.token_count(F.col("text")), 1)
    bpe = _one(samples, T.bpe_ish_token_count(F.col("text")), 1)
    assert bpe >= words


def test_lang_id_ngram(samples):
    got = {
        r["id"]: r["g"]
        for r in samples.select(
            "id", T.lang_id_ngram(F.col("text")).alias("g")
        ).collect()
    }
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "und"


def test_lang_id_table_matches_column_variant(spark, samples):
    col_res = {
        r["id"]: r["g"]
        for r in samples.select("id", T.lang_id(F.col("text")).alias("g")).collect()
    }
    tbl_res = {
        r["id"]: r["guessed"]
        for r in T.lang_id_table(samples, ["id"], "text", mode="token").collect()
    }
    assert col_res == tbl_res
    tri_tbl = {
        r["id"]: r["guessed"]
        for r in T.lang_id_table(samples, ["id"], "text", mode="trigram").collect()
    }
    ngram_col = {
        r["id"]: r["g"]
        for r in samples.select("id", T.lang_id_ngram(F.col("text")).alias("g")).collect()
    }
    assert tri_tbl == ngram_col


def test_repetition_stats_pinned_values(spark):
    # "a a a b": ttr 2/4, adjacent dups at 2 of 3 positions, modal bigram
    # "a a" occurs twice covering 4/4 tokens
    df = spark.createDataFrame([(1, "a a a b"), (2, "x y x y z")], ["doc_id", "text"])
    tok = df.select("doc_id", T.tokens(F.col("text")).alias("t")).withColumn(
        "n", F.size("t")
    )
    stats = T.repetition_stats(F.col("t"), F.col("n"))
    staged = tok.select(
        "doc_id", "n", stats["ttr"].alias("ttr"),
        stats["adj_dup_frac"].alias("adj"), stats["bigrams"].alias("bg"),
    )
    out = {
        r["doc_id"]: r
        for r in staged.select(
            "doc_id", "ttr", "adj", T.top_bigram_count(F.col("bg")).alias("tb")
        ).collect()
    }
    assert out[1]["ttr"] == 0.5
    assert round(out[1]["adj"], 6) == round(2 / 3, 6)
    assert out[1]["tb"] == 2
    # "x y x y z": no adjacent dups, "x y" twice
    assert out[2]["adj"] == 0.0
    assert out[2]["tb"] == 2


def test_hll_union_matches_direct_sketch(spark):
    # merging per-partition sketches must equal sketching the whole column
    df = spark.range(0, 5000).selectExpr("id % 7 AS g", "id % 900 AS u")
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("est")
    ).head()["est"]
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("u").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .head()["est"]
    )
    assert direct == merged
    assert abs(direct - 900) / 900 <= 0.05


def test_clean_markup_strips_tags_comments_entities(spark):
    df = spark.createDataFrame(
        [(1, "<div class='x'>hello <b>world</b><!-- hidden --> </div>")],
        "id int, raw string",
    )
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("raw"), "<!--.*?-->", " "),
                "<[^>]+>",
                " ",
            ),
            "\\s+",
            " ",
        )
    )
    assert df.select(cleaned.alias("c")).head()["c"] == "hello world"


def test_canonical_url_collapses_cosmetic_variants(spark):
    from strava_vector_search_spark.functions.text import canonical_url

    variants = [
        (1, "https://site.example.com/a/doc7"),
        (2, "HTTPS://WWW.SITE.EXAMPLE.COM:443/a/doc7"),
        (3, "https://site.example.com/a/doc7/?utm_source=feed"),
        (4, "https://site.example.com/a/doc7#frag"),
        (5, "http://site.example.com:80/a/doc7"),
    ]
    df = spark.createDataFrame(variants, "id long, url string")
    got = {r["id"]: r["c"] for r in
           df.select("id", canonical_url(F.col("url")).alias("c")).collect()}
    assert got[1] == "https://site.example.com/a/doc7"
    assert got[2] == got[1]  # case + www + default port
    assert got[3] == got[1]  # trailing slash + utm param
    assert got[4] == got[1]  # fragment
    assert got[5] == "http://site.example.com/a/doc7"  # :80 stripped, scheme kept


def test_canonical_url_keeps_meaningful_parts(spark):
    from strava_vector_search_spark.functions.text import canonical_url

    df = spark.createDataFrame(
        [
            (1, "https://site.example.com/a?id=3&utm_campaign=x&page=2"),
            (2, "https://site.example.com:8080/a"),
            (3, "https://other.example.com/a"),
        ],
        "id long, url string",
    )
    got = {r["id"]: r["c"] for r in
           df.select("id", canonical_url(F.col("url")).alias("c")).collect()}
    # non-utm params survive (utm dropped from the middle leaves id&page)
    assert got[1] == "https://site.example.com/a?id=3&page=2"
    assert got[2] == "https://site.example.com:8080/a"  # non-default port kept
    assert got[3] == "https://other.example.com/a"


def test_bigram_perplexity_rewards_repetitive_transitions(spark, sf_dir, tmp_path):
    """A document cycling one bigram must score far lower perplexity than a
    document whose transitions are all corpus-unique."""
    import shutil, os
    from strava_vector_search_spark.queries import QUERIES

    src = spark.createDataFrame(
        [
            (0, "a b " * 30, "en", "src0", 60),
            (1, "c d " * 30, "en", "src0", 60),
            # frequent context 'a' (60+ occurrences) but each a->X
            # transition here is corpus-unique: c12/c1 is tiny
            (2, "a q a w a e a r a t a y", "en", "src0", 24),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "bigram")
    os.makedirs(d, exist_ok=True)
    src.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in
           QUERIES["tx_bigram_perplexity"](spark, d).collect()}
    assert out[0]["n_transitions"] == 59  # n_tokens - 1
    assert out[2]["n_transitions"] == 11
    # cycling doc: a->b seen ~30x out of ~66 'a' contexts -> low ppl;
    # surprise doc: each a->X seen once out of ~66 -> ppl an order higher
    assert out[0]["ppl"] * 3 < out[2]["ppl"]


def test_hashed_linear_score_deterministic_and_bounded(spark):
    from strava_vector_search_spark.functions.text import hashed_linear_score

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, ""), (4, "zzz unique words here")],
        "id long, text string",
    )
    rows = {r["id"]: r["s"] for r in df.select("id", hashed_linear_score(F.col("text")).alias("s")).collect()}
    assert rows[1] == rows[2]          # pure function of text
    assert rows[3] == 0.5              # empty -> logit 0 -> sigmoid 0.5
    assert all(0.0 < s < 1.0 for s in rows.values())
    assert rows[1] != rows[4]          # different text, different slots


def test_pmi_pair_window_extraction(spark):
    """tx_pmi_pairs' slice-zip pair extraction: +-2 window, unordered
    canonical form, no self-join — pinned on a tiny corpus."""
    from strava_vector_search_spark.queries import QUERIES
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs = spark.createDataFrame(
            # 'a b c a b' x5 so pairs clear the c_xy >= 5 floor
            [(i, "a b c a b") for i in range(5)],
            "doc_id long, text string",
        )
        # write a minimal sf-dir with just documents.parquet
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            (r["x"], r["y"]): r["c_xy"]
            for r in QUERIES["tx_pmi_pairs"](spark, d).collect()
        }
    # per doc: off=1 -> (a,b),(b,c),(a,c),(a,b); off=2 -> (a,c),(a,b),(b,c)
    assert out[("a", "b")] == 15  # 3 per doc x 5
    assert out[("a", "c")] == 10
    assert out[("b", "c")] == 10


def test_luhn_pan_detection(spark):
    """luhn_valid / pan_candidates / luhn_pan_count on crafted text:
    4532015112830366 is Luhn-valid, 4532015112830367 is not; 12-digit
    runs are not card-shaped candidates."""
    from strava_vector_search_spark.functions.text import (
        luhn_pan_count,
        luhn_valid,
        pan_candidates,
    )

    df = spark.createDataFrame(
        [
            (1, "pay 4532015112830366 now"),             # valid PAN
            (2, "fake 4532015112830367 num"),            # bad checksum
            (3, "both 4532015112830366 and 5500005555555559 here"),
            (4, "short 123456789012 run"),               # 12 digits: no candidate
            (5, "no digits at all"),
        ],
        "id long, text string",
    )
    rows = {
        r["id"]: (r["cands"], r["valid"])
        for r in df.select(
            "id",
            F.size(pan_candidates(F.col("text"))).alias("cands"),
            luhn_pan_count(F.col("text")).alias("valid"),
        ).collect()
    }
    assert rows[1] == (1, 1)
    assert rows[2] == (1, 0)
    assert rows[3] == (2, 2)
    assert rows[4] == (0, 0)
    assert rows[5] == (0, 0)
    # scalar check: classic test number 4111111111111111
    one = spark.createDataFrame([("4111111111111111",)], "s string").select(
        luhn_valid(F.col("s")).alias("ok")
    ).head()
    assert one["ok"] is True
