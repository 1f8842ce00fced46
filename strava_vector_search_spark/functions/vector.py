"""Vector scalar functions — the Spark equivalent of Snowflake's
``VECTOR_COSINE_SIMILARITY`` (reference ``02_method2_manual_vector_embedding.sql:212``)
and the vector hygiene the reference gets implicitly from ``VECTOR(FLOAT, 768)``.

Two implementations, one contract:

* :func:`cosine_similarity` — a pure Catalyst column expression
  (``zip_with`` + ``aggregate``). Stays entirely JVM-side inside
  whole-stage codegen, never blocks predicate pushdown, and is the default.
* :func:`cosine_similarity_pandas` — a vectorized Arrow/NumPy Pandas UDF.
  Kept as a benchmark alternative; at very high dimensionality NumPy's SIMD
  dot can win despite the JVM↔Python Arrow hop. ``bench.py`` compares them.

Scale notes (100 TB): cosine over a scan is embarrassingly parallel — no
shuffle. The win that matters is (a) L2-normalizing embeddings **at write
time** so query-time cosine degrades to a dot product (:func:`l2_normalize`,
:func:`dot_product`), and (b) keeping embeddings in a narrow (id, vector)
table so the scan moves ``4*D`` bytes/row and nothing else.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_double_array(values) -> Column:
    """Literal ``array<double>`` column in ONE py4j round-trip.

    The naive ``F.array(*[F.lit(float(x)) for x in xs])`` issues one
    driver→JVM socket round-trip per element — measured ~680 ms of pure
    py4j chatter for a 768-dim query vector, paid at every query
    construction (and re-paid per bench rep). Rendering the array as a
    single SQL snippet hands the JVM the whole literal at once (~1.6 ms
    at dim 768, a ~400× construction-cost cut) and the parsed plan is a
    flat ``array(0.1D, ...)`` — the same CreateArray of foldable double
    literals the unrolled form produced, so values, types and downstream
    plans are identical.

    Bit-exactness: ``repr(float)`` is the shortest round-tripping decimal
    form (IEEE 754), and the SQL parser's ``Double.parseDouble`` is
    correctly rounded, so every element reconstructs the identical bits.
    Non-finite values (inf/nan) have no SQL literal spelling — those fall
    back to the unrolled form, as does the empty list (``array()`` would
    type as array<void>).
    """
    vals = [float(x) for x in values]
    if vals and all(map(math.isfinite, vals)):
        return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")
    return F.array(*[F.lit(v) for v in vals])


def lit_long_array(values) -> Column:
    """Literal ``array<bigint>`` in one py4j round-trip (see
    :func:`lit_double_array` for why).

    ``-2**63`` (LONG_MIN) has no SQL literal spelling — the lexer reads
    ``-9223372036854775808L`` as unary minus applied to an out-of-range
    bigint literal and raises a ParseException — so any value at LONG_MIN
    falls back to the unrolled ``F.lit`` form (mirroring
    :func:`lit_double_array`'s non-finite fallback). Values outside the
    signed-64-bit range are refused up front: the unrolled form would
    otherwise fail deep inside py4j with an opaque overflow."""
    vals = [int(x) for x in values]
    if not vals:
        return F.array().cast("array<bigint>")
    if any(not (-(1 << 63) <= v < (1 << 63)) for v in vals):
        raise ValueError(
            "lit_long_array: value outside signed 64-bit range: "
            f"{next(v for v in vals if not (-(1 << 63) <= v < (1 << 63)))}"
        )
    if any(v == -(1 << 63) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")


def lit_string_array(values) -> Column:
    """Literal ``array<string>`` in one py4j round-trip. Escapes
    backslashes and single quotes (the two active characters in Spark's
    default string-literal lexer); falls back to the unrolled form for
    the empty list."""
    vals = [str(v) for v in values]
    if not vals:
        return F.array(*[])
    def esc(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return F.expr("array(" + ",".join(esc(v) for v in vals) + ")")


def dot_product(a: Column, b: Column) -> Column:
    """Sum_i a[i]*b[i] as a fold — deterministic left-to-right accumulation.

    Cast inputs to array<double> upstream for cross-engine reproducibility.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two equal-length vectors, computed in float64.

    Mirrors ``VECTOR_COSINE_SIMILARITY(v1, v2)`` (reference ``02:212``).
    NULL if either vector is NULL; NaN only if a norm is zero (the reference
    guards with ``EMBEDDING IS NOT NULL``; we additionally never store
    zero vectors — see :func:`l2_normalize`).
    """
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return dot_product(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def cosine_similarity_rounded(a: Column, b: Column, scale: int = 6) -> Column:
    """Cosine rounded for deterministic cross-engine comparison (oracle parity)."""
    return F.round(cosine_similarity(a, b), scale)


def similarity(
    a: Column, b: Column, assume_normalized: bool = False, scale: int = 6
) -> Column:
    """The engine's scoring function: cosine, or — when both vectors are
    known L2-normalized — the plain dot product, which IS the cosine then
    and skips both norm computations (measured ~2× faster at dim 64).

    This is the optimization the reference prescribes by materializing
    embeddings once (02:404) and we enact by normalizing at write time
    (embed.hash_embedding_table, vector.l2_normalize): query-time scoring
    degrades to one fused multiply-add pass per vector.
    """
    if assume_normalized:
        return F.round(
            dot_product(a.cast("array<double>"), b.cast("array<double>")), scale
        )
    return F.round(cosine_similarity(a, b), scale)


def l2_normalize(a: Column) -> Column:
    """Unit-normalize; NULL for zero vectors (so downstream dot == cosine)."""
    ad = a.cast("array<double>")
    n = l2_norm(ad)
    return F.when(n > 0, F.transform(ad, lambda x: x / n))


def cosine_similarity_pandas():
    """Factory for the Pandas-UDF cosine: returns a callable(a, b) -> Column.

    Arrow-batched, NumPy-vectorized. Benchmark alternative to the expression
    form; prefer the expression unless profiling says otherwise (a UDF is a
    codegen barrier and can fence off later filter pushdown).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _cos(a, b):
        am = np.stack(a.to_numpy()).astype("float64")
        bm = np.stack(b.to_numpy()).astype("float64")
        num = (am * bm).sum(axis=1)
        den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(num / den)

    # real type objects (not strings) so Spark's hint inference works even
    # under `from __future__ import annotations`
    _cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_cos, "double")


def quantize_int8(a: Column, scale: int = 127) -> Column:
    """Symmetric int8 quantization of a unit-normalized vector:
    q[i] = round(v[i] * scale) as tinyint. 1 byte/dim at rest — 4x less
    scan/shuffle volume than float32 at 100 TB; cosine error on unit
    vectors is ~1-2% at scale 127 (measured on dim-64 testdata)."""
    return F.transform(
        a.cast("array<double>"),
        lambda x: F.round(x * scale, 0).cast("tinyint"),
    )


def dequantize_int8(q: Column, scale: int = 127) -> Column:
    return F.transform(q, lambda x: x.cast("double") / scale)


def quantized_dot(qa: Column, qb: Column, scale: int = 127) -> Column:
    """Integer dot product of two int8-quantized vectors, rescaled back to
    the unit range: sum(qa[i]*qb[i]) / scale^2. All-integer accumulation
    (exact, order-insensitive) — cross-engine deterministic by construction."""
    acc = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return acc.cast("double") / (scale * scale)
