"""Generate the committed AVIF fixtures + pinned decode hashes.

Encodes three deterministic images with the SYSTEM libavif (aom
encoder on this image) and records each stream's decoded-pixel md5 —
AV1 reconstruction is exactly specified, so any compliant decoder
reproduces these pixels bit-for-bit (the lossy-WebP fixture pattern,
see tests/test_webp.py / demo_webp_lossy). Writes tests/data/*.avif +
tests/data/avif_fixtures.json. Rerun only to regenerate fixtures
(changes the pinned hashes only if the ENCODER changes the streams).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

from datasketches_spark_spark.operators.avifnative import (
    avif_codec_names, avif_decode_rgb, avif_encode_rgb)


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
    return {"avif_solid.avif": solid,
            "avif_gradient.avif": gradient,
            "avif_texture.avif": texture}


def main() -> None:
    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    print("codecs (dec, enc):", avif_codec_names())
    table = {}
    for name, img in _images().items():
        payload = avif_encode_rgb(img)
        out = avif_decode_rgb(payload)
        with open(os.path.join(data_dir, name), "wb") as fh:
            fh.write(payload)
        table[name] = {
            "shape": list(out.shape),
            "bytes": len(payload),
            "px_md5": hashlib.md5(out.tobytes()).hexdigest(),
        }
        print(name, table[name])
    with open(os.path.join(data_dir, "avif_fixtures.json"), "w") as fh:
        json.dump(table, fh, indent=2, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
