"""Distributed BPE trainer (operators/bpe.py).

Pins the trainer against a pure-Python reference implementation with the
same (count DESC, pair ASC) tie-break and greedy-leftmost merge
application, including the self-overlap case (``aaa`` + merge (a,a) →
``[aa, a]``); checks word-count weighting, merge-table determinism, and
the min_pair_count stop condition."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.bpe import (
    apply_merge,
    char_state,
    encode_word_bpe,
    top_pair,
    train_bpe,
    word_vocab,
)


def _py_train(word_counts: dict[str, int], num_merges: int):
    """Reference BPE trainer over a word->count dict."""
    state = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, num_merges + 1):
        pc: Counter = Counter()
        for w, syms in state.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += word_counts[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, cnt))
        for w in state:
            state[w] = _py_apply(state[w], a, b)
    return merges, state


def _py_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_python_reference_end_to_end(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low new wide lower newer",
    ]
    wc = Counter(w for t in texts for w in t.split())
    expected, _ = _py_train(dict(wc), 6)
    got = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in train_bpe(_docs(spark, texts), num_merges=6)
        .orderBy("step")
        .collect()
    ]
    assert got == expected


def test_greedy_leftmost_self_overlap(spark):
    # 'aaa': merge (a,a) must consume positions 1-2, leaving [aa, a]
    docs = _docs(spark, ["aaa aaa b"])
    state = char_state(word_vocab(docs))
    assert top_pair(state)[:2] == ("a", "a")
    merged = apply_merge(state, "a", "a")
    syms = [
        r["sym"]
        for r in merged.filter(F.col("word") == "aaa").orderBy("pos").collect()
    ]
    assert syms == ["aa", "a"]
    assert encode_word_bpe("aaa", [("a", "a")]) == ["aa", "a"]
    # and the run of four: [aa, aa]
    assert encode_word_bpe("aaaa", [("a", "a")]) == ["aa", "aa"]


def test_word_count_weighting_beats_type_count(spark):
    # pair (x,y) appears in ONE word type repeated 10 times; pair (p,q) in
    # two singleton types: weighting by corpus count must pick (x,y)
    docs = _docs(spark, ["xy " * 10 + "pq pqr"])
    r = train_bpe(docs, num_merges=1).collect()[0]
    assert (r["lhs"], r["rhs"], r["pair_count"]) == ("x", "y", 10)


def test_min_pair_count_stops_early(spark):
    docs = _docs(spark, ["ab ab cd"])
    out = train_bpe(docs, num_merges=5, min_pair_count=2).collect()
    # (a,b) cnt=2 qualifies; after its merge every remaining pair is cnt=1
    assert [(r["lhs"], r["rhs"]) for r in out] == [("a", "b")]


def test_learned_merges_encode_consistently(spark):
    texts = ["banana bandana ban banana"]
    merged = train_bpe(_docs(spark, texts), num_merges=4).collect()
    merges = [(r["lhs"], r["rhs"]) for r in merged]
    # replay the merges on the trainer's own state and via the pure
    # encoder: token sequences must agree for every corpus word
    wc = Counter(w for t in texts for w in t.split())
    _, final_state = _py_train(dict(wc), 4)
    for w in wc:
        assert encode_word_bpe(w, merges) == final_state[w]


def test_encode_corpus_matches_trainer_state(spark):
    from strava_vector_search_spark.operators.bpe import (
        encode_corpus,
        train_bpe_with_state,
    )

    texts = ["low lower lowest", "new newer lowest low"]
    docs = _docs(spark, texts)
    merges, state = train_bpe_with_state(docs, num_merges=4)
    seg = {}
    for r in state.orderBy("word", "pos").collect():
        seg.setdefault(r["word"], []).append(r["sym"])
    enc = encode_corpus(docs, [(m[1], m[2]) for m in merges]).collect()
    for r, text in zip(sorted(enc, key=lambda r: r["doc_id"]), texts):
        expected = [s for w in text.split() for s in seg[w]]
        assert r["tokens_csv"].split(" ") == expected
        assert r["n_tokens"] == len(expected)
