#!/usr/bin/env python
"""Generate the committed lossy-VP8 WebP fixtures (tests/data/) and
print their decoded-pixel hashes.

Encoded ONCE with the system libwebp and committed as bytes: encoders
vary by version, so the .webp bytes are frozen in-repo; VP8 DECODING is
exactly specified (RFC 6386), so the decoded-pixel md5s pinned in
tests/test_webp.py are stable across every compliant decoder.
Deterministic image content (seeded)."""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from datasketches_spark_spark.operators.webpnative import (  # noqa: E402
    webp_decode_rgb, webp_encode_rgb)


def images():
    rng = np.random.RandomState(20260815)
    grad = np.zeros((48, 64, 3), np.uint8)
    grad[:, :, 0] = np.linspace(0, 255, 64, dtype=np.uint8)[None, :]
    grad[:, :, 1] = np.linspace(255, 0, 48, dtype=np.uint8)[:, None]
    grad[:, :, 2] = 128
    yield "gradient_q80", grad, 80.0
    solid = np.full((32, 32, 3), [200, 40, 90], np.uint8)
    yield "solid_q50", solid, 50.0
    # photo-ish: smoothed noise (box blur) with structure
    noise = rng.randint(0, 256, (40, 56, 3)).astype(np.float64)
    k = np.ones((5, 5)) / 25.0
    sm = np.stack([
        np.real(np.fft.ifft2(np.fft.fft2(noise[:, :, c])
                             * np.fft.fft2(k, s=noise.shape[:2])))
        for c in range(3)], axis=2)
    photo = np.clip(sm, 0, 255).astype(np.uint8)
    yield "photo_q60", photo, 60.0


def main():
    outdir = os.path.join(HERE, "tests", "data")
    for name, img, q in images():
        blob = webp_encode_rgb(img, q)
        path = os.path.join(outdir, f"lossy_{name}.webp")
        with open(path, "wb") as fh:
            fh.write(blob)
        dec = webp_decode_rgb(blob)
        print(name, "bytes", len(blob), "shape", dec.shape,
              "px_md5", hashlib.md5(dec.tobytes()).hexdigest(),
              "maxerr", int(np.abs(dec.astype(int) - img.astype(int)).max()))


if __name__ == "__main__":
    main()
