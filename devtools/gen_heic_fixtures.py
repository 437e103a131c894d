"""Generate the committed HEIC fixtures + pinned decode hashes.

Encodes three deterministic images with the SYSTEM libheif (x265
encoder on this image) and records each stream's decoded-pixel md5 —
HEVC reconstruction is exactly specified, so any compliant decoder
reproduces these pixels bit-for-bit (the AVIF/lossy-WebP fixture
pattern). Writes tests/data/*.heic + tests/data/heic_fixtures.json.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

from datasketches_spark_spark.operators.heifnative import (
    heic_codec_support, heic_decode_rgb, heic_encode_rgb)


def _images() -> dict[str, np.ndarray]:
    solid = np.zeros((24, 32, 3), np.uint8)
    solid[:, :, 0], solid[:, :, 1], solid[:, :, 2] = 180, 90, 40
    x = np.linspace(0, 255, 48, dtype=np.uint8)
    gradient = np.dstack([
        np.tile(x, (32, 1)),
        np.tile(x[::-1], (32, 1)),
        np.full((32, 48), 128, np.uint8)])
    rng = np.random.default_rng(20260816)
    texture = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    return {"heic_solid.heic": solid,
            "heic_gradient.heic": gradient,
            "heic_texture.heic": texture}


def main() -> None:
    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    print("heif support (dec, enc):", heic_codec_support())
    table = {}
    for name, img in _images().items():
        payload = heic_encode_rgb(img, quality=90)
        out = heic_decode_rgb(payload)
        with open(os.path.join(data_dir, name), "wb") as fh:
            fh.write(payload)
        table[name] = {
            "shape": list(out.shape),
            "bytes": len(payload),
            "px_md5": hashlib.md5(out.tobytes()).hexdigest(),
        }
        print(name, table[name])
    with open(os.path.join(data_dir, "heic_fixtures.json"), "w") as fh:
        json.dump(table, fh, indent=2, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
