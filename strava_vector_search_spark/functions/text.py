"""Text-analysis functions for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (split/regexp/aggregate) — no Python in the
hot path, so at 100 TB these run inside whole-stage codegen over the
documents scan with zero shuffles (per-row metrics) or one partial-agg
shuffle (corpus statistics).

Every function is oracle-expressible in ANSI SQL (DuckDB twin in
oracles.py) — deterministic integer/regex logic only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.vector import (
    lit_double_array,
    lit_string_array,
)

# small multilingual stopword seed lists for the lang-id heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "que", "dans"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "para", "que", "en"),
}


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace/punct token count — the cheap tokenizer."""
    return F.size(tokens(text))


BPE_ISH_PATTERN = r"[A-Z][a-z]*|[a-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-approximating token count: camel-case word pieces + letter runs +
    digit runs + individual punctuation — the standard len(regexp_tokens)
    proxy for LLM token budgeting. ~chars/4 for English; exact per-model
    counts need the model's tokenizer (out of engine scope).

    Expressed as a MATCH count (not a lookahead split) so the pattern stays
    inside the RE2 subset DuckDB supports — the oracle twin is
    ``len(regexp_extract_all(text, …))`` with the same pattern."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    total = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(total > 0, F.round(punct / total, 6)).otherwise(0.0)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    stop = lit_string_array(LANG_STOPWORDS[lang])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return F.when(F.size(toks) > 0, F.round(n_stop / F.size(toks), 6)).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """[0,1] heuristic quality score: length band + low punctuation +
    reasonable mean word length. The standard cheap pre-filter before
    expensive model-based scoring."""
    n_tok = token_count(text)
    mean_wl = F.when(
        n_tok > 0,
        F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", "")) / n_tok,
    ).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    return F.round((len_ok + punct_ok + wl_ok) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """Stopword-overlap language guess over LANG_STOPWORDS; 'und'
    (undetermined) when no list matches. Deterministic argmax with
    alphabetical tie-break (CASE cascade ⇒ first max wins in fixed order)."""
    toks = tokens(text)

    def _score(stop_words: tuple[str, ...]) -> Column:
        stop = lit_string_array(stop_words)
        # NB: the lambda must take exactly one arg — F.filter treats a
        # second arg as the element index
        return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))

    scores = {lang: _score(LANG_STOPWORDS[lang]) for lang in sorted(LANG_STOPWORDS)}
    best = None
    for lang in sorted(scores):
        best = scores[lang] if best is None else F.greatest(best, scores[lang])
    expr = F.when(best == 0, F.lit("und"))
    for lang in sorted(scores):
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def fingerprint(text: Column) -> Column:
    """60-bit content fingerprint: md5 of whitespace/case-normalized text →
    int. Normalization makes it robust to formatting-only edits — the
    exact-dedup key for 'same content, different whitespace'."""
    normalized = F.array_join(tokens(text), " ")
    return F.conv(F.substring(F.md5(normalized), 1, 15), 16, 10).cast("bigint")


# character-n-gram profiles per language: the classic n-gram lang-id
# heuristic (top trigrams incl. space-padded word boundaries). Tiny seed
# profiles; production would learn them from a labeled corpus.
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "and", "ion", "ent", " th", "he ", "er ", " of", "nd "),
    "de": ("der", "die", "und", "ein", "ich", "sch", "en ", " de", "cht", "ung"),
    "fr": ("les", "ent", "que", "our", "ait", " le", " de", "es ", "ion", "eur"),
    "es": ("que", "ent", "los", "ado", "par", " de", " la", "os ", "ión", "ara"),
}


def lang_id_ngram(text: Column) -> Column:
    """Char-trigram-overlap language guess: count occurrences of each
    language's signature trigrams in the lowercased text, argmax with
    alphabetical tie-break; 'und' when nothing matches.

    Pure expressions: one pass builds the trigram multiset; membership is
    counted against literal arrays. Complements :func:`lang_id` (stopword
    tokens) — trigram profiles also work on languages without clear token
    boundaries."""
    lowered = F.lower(text)
    padded = F.concat(F.lit(" "), lowered, F.lit(" "))
    n = F.length(padded)
    tris = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2), lambda i: F.substring(padded, i, 3)
        ),
    ).otherwise(F.array())

    def _score(profile: tuple[str, ...]) -> Column:
        sig = lit_string_array(profile)
        return F.size(F.filter(tris, lambda t: F.array_contains(sig, t)))

    scores = {lang: _score(LANG_TRIGRAMS[lang]) for lang in sorted(LANG_TRIGRAMS)}
    best = None
    for lang in sorted(scores):
        best = scores[lang] if best is None else F.greatest(best, scores[lang])
    expr = F.when(best == 0, F.lit("und"))
    for lang in sorted(scores):
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def lang_id_table(
    df,
    id_cols: list[str],
    text_col: str,
    mode: str = "token",
):
    """Corpus-scale language ID: explode the text into units (tokens or
    char-trigrams) ONCE, then count profile membership per language with a
    single partial-aggregated groupBy.

    The Column-expression variants (:func:`lang_id`, :func:`lang_id_ngram`)
    inline the unit array into every score expression — fine for a handful
    of rows, but codegen re-builds the array per reference (measured ~20x
    overhead corpus-wide). This is the one-pass formulation for tables.
    """
    from pyspark.sql import functions as F

    if mode == "token":
        profiles = LANG_STOPWORDS
        units = tokens(F.col(text_col))
    elif mode == "trigram":
        profiles = LANG_TRIGRAMS
        padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
        n = F.length(padded)
        units = F.when(
            n >= 3,
            F.transform(F.sequence(F.lit(1), n - 2), lambda i: F.substring(padded, i, 3)),
        ).otherwise(F.array())
    else:
        raise ValueError(f"unknown mode {mode!r}")

    rows = df.select(*id_cols, F.explode_outer(units).alias("u"))
    langs = sorted(profiles)
    scored = rows.groupBy(*id_cols).agg(
        *[
            F.sum(
                F.when(F.col("u").isin(*profiles[lang]), 1).otherwise(0)
            ).alias(f"_s_{lang}")
            for lang in langs
        ]
    )
    best = None
    for lang in langs:
        c = F.col(f"_s_{lang}")
        best = c if best is None else F.greatest(best, c)
    guessed = F.when(best == 0, F.lit("und"))
    for lang in langs:
        guessed = guessed.when(F.col(f"_s_{lang}") == best, F.lit(lang))
    return scored.select(*id_cols, guessed.alias("guessed"))


ROLLING_B = 1_000_003
ROLLING_P = 2_147_483_647  # 2^31 - 1


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling (polynomial) content hash over tokens:
    h = fold(tokens, 0, (h, t) -> (h*B + md5int(t)) mod P).

    Complements :func:`fingerprint` (whole-content md5): the polynomial
    form is incrementally maintainable and position-sensitive — swapped
    token order changes the value, which set-style hashing misses. Bounds:
    h < P ~ 2^31, h*B < 2^51, + token hash < 2^52 — no bigint overflow.
    """
    tok_hash = lambda t: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"),
        F.lit(ROLLING_P),
    )
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, t: F.pmod(acc * ROLLING_B + tok_hash(t), F.lit(ROLLING_P)),
    )


# PII patterns kept inside the RE2 subset (no lookaround/backrefs) so the
# DuckDB oracle can run the identical pattern with regexp_replace(…, 'g')
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE = r"\+[0-9][0-9()\- ]{6,}[0-9]"


def scrub_pii(text: Column) -> Column:
    """Redact email addresses and international-format phone numbers with
    typed placeholders — the minimum-viable PII pass a training corpus
    needs before anything leaves the curation pipeline.

    Pure codegen expressions (two regexp_replace), map-only at any scale.
    Email first: phone-shaped digit runs inside an address must be eaten
    by the email rule, not split by the phone rule.
    """
    scrubbed = F.regexp_replace(text, PII_EMAIL, "[EMAIL]")
    return F.regexp_replace(scrubbed, PII_PHONE, "[PHONE]")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts for audit reporting."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0))),
    )


def repetition_stats(tokens_col: Column, n_col: Column) -> dict[str, Column]:
    """Gopher-style repetition signals over a token array (callers precompute
    ``tokens_col``/``n_col`` as real columns so each expression evaluates the
    array once):

    * ``ttr`` — type-token ratio, distinct/total tokens (low = repetitive),
    * ``adj_dup_frac`` — fraction of adjacent positions where token[i] ==
      token[i+1] (stutter runs),
    * ``top_bigram_n`` / ``top_bigram_cover`` — occurrence count of the most
      frequent bigram and the fraction of tokens it covers (2·n/len).

    All higher-order-function codegen, shuffle-free at any corpus size. The
    top-bigram mode is O(m^2) in DOC length (distinct x filter) — right for
    typical web documents (m in the hundreds); for book-length texts use an
    explode -> groupBy(doc, bigram) twin instead, which trades one shuffle
    for linear per-doc work.

    Thresholded into a ``keep`` flag downstream, after the Gopher rules
    (Rae et al. 2021, table A1: duplicate n-gram coverage).
    """
    head = F.slice(tokens_col, F.lit(1), n_col - 1)
    tail = F.slice(tokens_col, F.lit(2), n_col - 1)
    eq_runs = F.zip_with(head, tail, lambda a, b: (a == b).cast("int"))
    bigrams = F.zip_with(head, tail, lambda a, b: F.concat_ws(" ", a, b))
    return {
        "ttr": F.round(F.size(F.array_distinct(tokens_col)) / n_col, 6),
        "adj_dup_frac": F.round(
            F.aggregate(eq_runs, F.lit(0), lambda acc, x: acc + x)
            / (n_col - 1),
            6,
        ),
        "bigrams": bigrams,
    }


def top_bigram_count(bigrams_col: Column) -> Column:
    """Occurrence count of the modal bigram: max over distinct bigrams of
    their frequency. Callers materialize ``bigrams_col`` first (a prior
    select) so the O(m) array build is not re-evaluated per outer element."""
    return F.array_max(
        F.transform(
            F.array_distinct(bigrams_col),
            lambda x: F.size(F.filter(bigrams_col, lambda y: y == x)),
        )
    ).cast("bigint")


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL for crawl-frontier / corpus dedup: lowercase
    scheme and host, strip a leading ``www.``, drop default ports (:80,
    :443), strip the fragment, drop ``utm_*`` tracking parameters, and
    remove trailing path slashes. Two URLs that differ only in these
    cosmetic ways collapse to one canonical form — the screen that runs
    before URL-level dedup in every crawl pipeline.

    Pure regexp_extract/replace chain (RE2-portable, no lookaround): one
    map-only codegen'd projection, so canonicalization composes with the
    scan at any frontier size. Not covered on purpose: query-parameter
    re-ordering (needs a sort of the param list; rare in practice because
    crawlers emit params in a stable order) and IDN/percent-encoding
    normalization.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":(80|443)$", ""
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
        r"/+$",
        "",
    )
    query = F.regexp_replace(
        F.regexp_replace(
            F.regexp_extract(url, r"\?([^#]*)", 1), r"(^|&)utm_[^&]*", ""
        ),
        r"^&",
        "",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def hashed_linear_score(text: Column, buckets: int = 1024) -> Column:
    """fastText-style hashed linear classifier score: each token hashes
    into one of ``buckets`` weight slots, the document logit is the MEAN
    slot weight, and the score is its sigmoid.

    The weight table is not stored anywhere — slot j's weight is derived
    on the fly as ``(md5('w'||j) % 2001 - 1000)/1000`` (a deterministic
    stand-in for trained weights in [-1, 1]; swap the weight expression
    for a broadcast-joined real table to serve a trained model). The whole
    classifier is ONE codegen'd fold per row — no vocabulary join, no UDF,
    no shuffle: the shape that scores a 100 TB corpus at scan speed, which
    is exactly why the hashing trick (and fastText) exists.

    Fold order is the token order in both engines, so the double
    accumulation is bit-reproducible against the DuckDB oracle.
    """
    return hashed_linear_score_tokens(tokens(text), buckets)


def hashed_linear_score_tokens(ts: Column, buckets: int = 1024) -> Column:
    """:func:`hashed_linear_score` over a pre-tokenized array column.

    Prefer this form when scoring alongside other token-derived columns:
    materialize ``tokens(text)`` into a column once and reference it —
    otherwise CollapseProject inlines the tokenizer into every reference
    (the fold + two size() checks + any sibling column) and the regex
    split runs 4× per row (same pitfall as ``shingle_rows``; measured
    there at 8×).
    """
    from strava_vector_search_spark.operators.dedup import md5_int

    wtab = lit_double_array(hashed_weight_table(buckets))

    def w(t: Column) -> Column:
        slot = F.pmod(md5_int(t), F.lit(buckets))
        return F.element_at(wtab, slot.cast("int") + 1)

    logit = F.when(
        F.size(ts) > 0,
        F.aggregate(ts, F.lit(0.0), lambda acc, t: acc + w(t)) / F.size(ts),
    ).otherwise(F.lit(0.0))
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)


def hashed_weight_table(buckets: int = 1024) -> list[float]:
    """The classifier's weight vector, materialized driver-side: slot j's
    weight is ``(md5('w'||j) % 2001 - 1000)/1000`` ∈ [-1, 1] — a
    deterministic stand-in with the exact shape of trained weights. It
    ships to executors as ONE literal array (constant, no per-row hash of
    the slot id — halves the md5 work per token vs deriving the weight
    inline), and a trained model drops in by replacing this list."""
    import hashlib

    out = []
    for j in range(buckets):
        h = int(hashlib.md5(f"w{j}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


PAN_RUN = r"[0-9]{13,19}"


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum over a digit-string column — TRUE iff the number is a
    structurally valid payment-card number. Pure expression fold (reverse,
    double every second digit, subtract 9 above 9, sum % 10 == 0): runs at
    scan speed, identical math in the DuckDB oracle."""
    ds = F.split(F.reverse(digits), "")
    ds = F.filter(ds, lambda c: c != "")
    term = lambda c, i: F.when(  # noqa: E731
        i % 2 == 1,
        F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9).otherwise(
            c.cast("int") * 2
        ),
    ).otherwise(c.cast("int"))
    total = F.aggregate(
        F.zip_with(ds, F.sequence(F.lit(0), F.size(ds) - 1), term),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return total % 10 == 0


def pan_candidates(text: Column) -> Column:
    """All 13-19-digit runs in the text (array<string>) — the candidate
    set Luhn then filters; separators are intentionally NOT matched so
    the rule stays RE2-portable and oracle-identical."""
    return F.regexp_extract_all(text, F.lit(PAN_RUN), F.lit(0))


def luhn_pan_count(text: Column) -> Column:
    """Count of Luhn-valid card-shaped numbers in the text."""
    return F.size(F.filter(pan_candidates(text), luhn_valid))
