"""Audio fingerprinting — multimodal dedup for the audio column.

The audio analog of pHash image dedup (q53): a ROBUST fingerprint that
is invariant to the transformations a corpus actually contains
(amplitude scaling, codec roundtrips, small noise) while separating
different content. Scheme per the public Haitsma-Kalker construction
(ISMIR 2002, "A Highly Robust Audio Fingerprinting System"), sized
down to this engine's fixture clips:

1. mono mix, amplitude-normalized (POSITIVE scaling cannot flip an
   energy-difference sign in exact arithmetic; residual bit flips
   come only from quantization jitter on near-zero differences — see
   the measured contract below);
2. Hann-windowed frames (``frame`` samples, ``hop`` step — the 1/8
   default overlap factor is what makes time-differences stable;
   coarser hops let envelope noise dominate the bits), rFFT
   energy in ``n_bands + 1`` log-spaced bands over 300 Hz .. 0.45 x
   sample rate (the perceptually busy region);
3. one bit per adjacent band pair per frame step: the sign of the
   time-difference of the band-difference
   ``(E[b,t]-E[b+1,t]) - (E[b,t-1]-E[b+1,t-1]) > 0`` — 16 bits per
   subfingerprint with the default 17 bands;
4. the fingerprint is the packed subfingerprint sequence (2 bytes per
   frame step, big-endian).

Robustness contract (measured on onset-rich fixtures): gain-scaled
copies land at <= ~0.09 Hamming fraction, G.711 roundtrips and
low-level noise below ~0.35, while DIFFERENT content sits >= ~0.42 —
so a similarity threshold in the 0.65-0.75 band separates duplicates
from distinct clips (``audio_fp_similarity``; bucket subfingerprint
bands for candidate generation at scale — the SimHash pigeonhole
pattern — and verify by Hamming, never all-pairs). Quantization
jitter on near-zero band differences means exact byte equality only
holds for byte-identical inputs; dedup on this fingerprint is a
SIMILARITY dedup, like pHash for images.

Spark-first: fingerprinting is one Arrow-batched pass per audio blob
(scan-stage, embarrassingly parallel, no shuffle);
``audio_neardup_pairs`` is the corpus-scale path — positional-gram
buckets (one exchange carrying ids + tens-of-byte fingerprints, with
the LSH family's ``max_bucket`` cap) then Hamming verification of
bucket pairs only, never all-pairs and never shuffled audio bytes.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "audio_subfingerprints",
    "pack_subfingerprints",
    "audio_fingerprint_bytes",
    "audio_fingerprint",
    "fp_hamming_fraction",
    "audio_fp_similarity",
    "audio_neardup_pairs",
]

_F_LO = 300.0     # Hz — below this, hum/DC dominates
_F_HI_FRAC = 0.45  # of the sample rate (just under Nyquist)


def audio_subfingerprints(samples: np.ndarray, rate: int,
                          frame: int = 2048, hop: int = 256,
                          n_bands: int = 16) -> np.ndarray:
    """(n_samples[, channels]) PCM -> (n_steps, n_bands) bool bits.
    Empty/short/silent input yields an empty (0, n_bands) array."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if x.size < 2 * frame:
        return np.zeros((0, n_bands), dtype=bool)
    peak = np.abs(x).max()
    if peak > 0:
        x = x / peak
    n_frames = 1 + (x.size - frame) // hop
    idx = (np.arange(frame)[None, :]
           + hop * np.arange(n_frames)[:, None])
    frames = x[idx] * np.hanning(frame)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    f_hi = _F_HI_FRAC * rate
    edges = np.exp(np.linspace(np.log(_F_LO), np.log(f_hi),
                               n_bands + 2))
    # band energies: (n_frames, n_bands + 1)
    e = np.empty((n_frames, n_bands + 1))
    for b in range(n_bands + 1):
        sel = (freqs >= edges[b]) & (freqs < edges[b + 1])
        e[:, b] = spec[:, sel].sum(axis=1) if sel.any() else 0.0
    d = e[:, :-1] - e[:, 1:]            # adjacent band differences
    return (d[1:] - d[:-1]) > 0         # time difference of that


def pack_subfingerprints(bits: np.ndarray) -> bytes:
    """(n_steps, 16) bool -> 2 bytes per step, big-endian bit order.
    Width is capped at 16 (the packed dtype) — wider bit matrices
    raise instead of silently truncating."""
    if bits.size == 0:
        return b""
    n, w = bits.shape
    if w > 16:
        raise ValueError(f"pack_subfingerprints: width {w} > 16 bits "
                         "per step does not fit the packed format")
    weights = (1 << np.arange(w - 1, -1, -1)).astype(np.uint32)
    vals = (bits.astype(np.uint32) * weights[None, :]).sum(axis=1)
    return vals.astype(">u2").tobytes()


def audio_fingerprint_bytes(data: bytes, frame: int = 2048,
                            hop: int = 256) -> bytes | None:
    """Audio container bytes (WAV / G.711 — ``decode_audio``'s
    dispatch) -> packed fingerprint; None for undecodable blobs
    (loud null, the codec-family convention)."""
    import struct

    from .audiocodec import decode_audio
    try:
        samples, rate = decode_audio(bytes(data))
    except (ValueError, NotImplementedError, struct.error):
        # struct.error: truncated RIFF headers (corrupt crawled WAVs)
        # raise it from the chunk walk — must null, not kill the scan
        return None
    return pack_subfingerprints(
        audio_subfingerprints(samples, rate, frame=frame, hop=hop))


def fp_hamming_fraction(a: bytes, b: bytes) -> float | None:
    """Fraction of DIFFERING bits over the common prefix of two packed
    fingerprints (None when either is empty/None) — 0.0 identical,
    ~0.5 unrelated (random bits)."""
    if not a or not b:
        return None
    n = min(len(a), len(b))
    av = np.frombuffer(bytes(a)[:n], dtype=np.uint8)
    bv = np.frombuffer(bytes(b)[:n], dtype=np.uint8)
    return float(np.unpackbits(av ^ bv).sum()) / (8 * n)


def audio_fingerprint(col, frame: int = 2048, hop: int = 256):
    """Column: audio blob -> packed fingerprint BINARY (None for
    undecodable rows). One Arrow pass, scan-stage; dedup by Hamming
    similarity over it (module docstring thresholds), bucketing
    subfingerprint bands for candidates."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    def fp(p):
        return pd.Series(
            [None if b is None
             else audio_fingerprint_bytes(b, frame=frame, hop=hop)
             for b in p], dtype=object)

    fp.__annotations__ = {"p": pd.Series, "return": pd.Series}
    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(fp, BinaryType())(c)


def audio_neardup_pairs(df, id_col: str, fp_col: str = "fp",
                        min_sim: float = 0.7, gram_steps: int = 2,
                        max_bucket: int = 2000):
    """Audio near-dup PAIRS at corpus scale (r15) — the banded-bucket
    path (the MinHash-LSH / SimHash-pigeonhole pattern, never
    all-pairs): explode each packed fingerprint into positional
    ``gram_steps``-subfingerprint grams, bucket by ``(position,
    gram)`` — near-duplicates share at least one EXACT gram at the
    same position with overwhelming probability (a handful of
    bit-flips cannot hit every gram), unrelated clips collide only at
    the 16x``gram_steps``-bit birthday rate — then emit each bucket's
    pairs and VERIFY by Hamming similarity (``>= min_sim``).

    Returns ``(id_a, id_b, sim)`` with ``id_a < id_b``, exact-verified.
    ``max_bucket`` caps degenerate buckets (all-silence grams etc.) the
    same way the LSH family does — dropped buckets are the
    pathological-collision case, not signal. The bucket exchange
    carries only ``(pos, gram, id)`` rows (never the fingerprints —
    a long clip would otherwise copy its fingerprint onto every gram
    row); fingerprints join back onto the SURVIVING candidate pairs
    for verification, the same shape as the MinHash-LSH family.
    Audio bytes never shuffle."""
    from pyspark.sql import functions as F

    gram_bytes = 2 * gram_steps
    fps = df.select(F.col(id_col).alias("_aid"),
                    F.col(fp_col).alias("_afp")) \
        .where(F.col("_afp").isNotNull()
               & (F.length("_afp") >= gram_bytes))
    n_pos = (F.length("_afp") / 2 - (gram_steps - 1)).cast("int")
    grams = fps.select(
        "_aid",
        F.explode(F.transform(
            F.sequence(F.lit(0), n_pos - 1),
            lambda p: F.struct(
                p.alias("pos"),
                F.substring(F.col("_afp"), p * 2 + 1, gram_bytes)
                .alias("gram")))).alias("g")) \
        .select("_aid", "g.pos", "g.gram")
    buckets = (grams.groupBy("pos", "gram")
               .agg(F.collect_list("_aid").alias("members"))
               .where((F.size("members") > 1)
                      & (F.size("members") <= max_bucket)))
    # unordered member pairs, CANONICALIZED by least/greatest — a
    # bucket whose collect_list happens to arrive descending must not
    # lose its pairs to an id_a < id_b filter
    m = F.col("members")
    pair_arr = F.flatten(F.transform(
        m, lambda a, i: F.transform(
            F.slice(m, i + 2, F.size(m)),
            lambda b: F.struct(F.least(a, b).alias("id_a"),
                               F.greatest(a, b).alias("id_b")))))
    cand = (buckets.select(F.explode(pair_arr).alias("p"))
            .select("p.id_a", "p.id_b")
            .where(F.col("id_a") != F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    fa = fps.select(F.col("_aid").alias("id_a"),
                    F.col("_afp").alias("fp_a"))
    fb = fps.select(F.col("_aid").alias("id_b"),
                    F.col("_afp").alias("fp_b"))
    pairs = cand.join(fa, "id_a").join(fb, "id_b")
    sim = audio_fp_similarity("fp_a", "fp_b")
    return (pairs.select("id_a", "id_b", sim.alias("sim"))
            .where(F.col("sim") >= float(min_sim)))


def audio_fp_similarity(a, b):
    """Column: 1 - Hamming fraction between two packed fingerprints
    (null when either side is null/empty). Verification step of the
    near-dup path; candidate generation at scale buckets
    subfingerprint bands first (the SimHash pigeonhole pattern) so
    this never runs all-pairs."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def sim(x, y):
        out = []
        for u, v in zip(x, y):
            h = fp_hamming_fraction(u, v)
            out.append(None if h is None else 1.0 - h)
        return pd.Series(out, dtype="float64")

    sim.__annotations__ = {"x": pd.Series, "y": pd.Series,
                           "return": pd.Series}
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return pandas_udf(sim, DoubleType())(ca, cb)
