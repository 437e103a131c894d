"""Embedding-column preparation — pure Column expressions (JVM-side).

A 100 TB embedding corpus is mostly storage and shuffle bytes; the two
standard space levers before any ANN indexing are L2 normalization (so
cosine becomes a dot product and downstream kernels skip the norms) and
scalar int8 quantization (4x smaller than float32, 8x smaller than the
float64 arrays Python round-trips produce). Both are elementwise per
vector, so they belong in whole-stage codegen as array-lambda
expressions — zero Python, no shuffle, fully pushdown-transparent.

Quantization uses symmetric per-vector max-abs scaling:
``q_i = floor(v_i * 127 / max|v| + 0.5)`` (explicit half-up, chosen over
``round()`` because engines disagree on rounding mode and the oracle
comparison needs bit-identical integers), with the scale stored alongside
for dequantization: ``v_i ~ q_i * scale``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def l2_normalize(vec) -> Column:
    """Unit-L2 vector (array<double>); zero vectors pass through as-is
    (normalizing them is undefined — and emitting NaNs would poison every
    downstream dot product)."""
    v = _col(vec).cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm == 0.0, v).otherwise(
        F.transform(v, lambda x: x / norm))


def quantize_int8(vec) -> Column:
    """Symmetric per-vector int8 quantization:
    ``struct(scale: double, q: array<tinyint>)`` with
    ``q_i = floor(v_i/scale + 0.5)`` and ``scale = max|v| / 127``.
    A zero vector quantizes to scale 0 and all-zero codes."""
    v = _col(vec).cast("array<double>")
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    q = F.when(amax == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))) \
        .otherwise(F.transform(
            v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint")))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(quantized) -> Column:
    """Inverse of :func:`quantize_int8`: ``array<double>`` within one
    quantization step of the original values."""
    s = _col(quantized)
    return F.transform(s["q"], lambda x: x.cast("double") * s["scale"])


__all__ = ["l2_normalize", "quantize_int8", "dequantize_int8"]
