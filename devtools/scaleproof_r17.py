#!/usr/bin/env python
"""r17 scale proof: the new codec paths must be O(bytes) with sane
constants — time each at 1x and 8x input and report the growth
exponent (wall ~ bytes^e; e ~ 1.0 = linear). Run:
``python devtools/scaleproof_r17.py``."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def best_of(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def report(name, t1, t8, b1, b8):
    import math
    e = math.log(t8 / t1) / math.log(b8 / b1)
    print(f"{name:28s} 1x {t1*1e3:8.1f} ms   8x {t8*1e3:8.1f} ms   "
          f"bytes x{b8/b1:.1f}   exponent {e:.2f}")
    return e


def main():
    from datasketches_spark_spark.operators.h264codec import (
        decode_h264_ipcm, encode_h264_ipcm)
    from datasketches_spark_spark.operators.mp3codec import (
        build_frame_stream, mp3_audio_hash)
    from datasketches_spark_spark.operators.pdfcodec import (
        encode_pdf_text_encrypted, pdf_text)

    results = {}

    # --- encrypted PDF (AES-256): decrypt+inflate+extract
    pages1 = ["line %d of the corpus document" % i for i in range(40)]
    blob1 = encode_pdf_text_encrypted(["\n".join(pages1)], "aes256")
    blob8 = encode_pdf_text_encrypted(
        ["\n".join(pages1)] * 8, "aes256")
    t1 = best_of(lambda: pdf_text(blob1))
    t8 = best_of(lambda: pdf_text(blob8))
    results["pdf_aes256_extract"] = report(
        "pdf aes256 extract", t1, t8, len(blob1), len(blob8))

    # --- RC4 variant (pure-python cipher: the worst constant)
    rb1 = encode_pdf_text_encrypted(["\n".join(pages1)], "rc4")
    rb8 = encode_pdf_text_encrypted(["\n".join(pages1)] * 8, "rc4")
    t1 = best_of(lambda: pdf_text(rb1))
    t8 = best_of(lambda: pdf_text(rb8))
    results["pdf_rc4_extract"] = report(
        "pdf rc4 extract", t1, t8, len(rb1), len(rb8))

    # --- H.264 I_PCM decode
    rng = np.random.default_rng(5)
    f1 = [rng.integers(0, 256, (64, 96), np.uint8) for _ in range(4)]
    h1 = encode_h264_ipcm(f1)
    f8 = [rng.integers(0, 256, (64, 96), np.uint8) for _ in range(32)]
    h8 = encode_h264_ipcm(f8)
    t1 = best_of(lambda: decode_h264_ipcm(h1))
    t8 = best_of(lambda: decode_h264_ipcm(h8))
    results["h264_ipcm_decode"] = report(
        "h264 I_PCM decode", t1, t8, len(h1), len(h8))

    # --- MP3 tag-invariant hash (frame walk)
    m1 = build_frame_stream(b"sp", 200)
    m8 = build_frame_stream(b"sp", 1600)
    t1 = best_of(lambda: mp3_audio_hash(m1))
    t8 = best_of(lambda: mp3_audio_hash(m8))
    results["mp3_audio_hash"] = report(
        "mp3_audio_hash walk", t1, t8, len(m1), len(m8))

    bad = {k: e for k, e in results.items() if e > 1.25}
    print("\nAll linear (exponent <= 1.25):" if not bad
          else f"\nSUPERLINEAR PATHS: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
