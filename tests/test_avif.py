"""AVIF via the system libavif (operators/avifnative.py): the
encode(aom) -> decode(dav1d) roundtrip crosses two independent AV1
implementations; committed fixtures pin decoded-pixel md5s (AV1
reconstruction is exactly specified); sniffing and the decode_image
dispatch route the container; absent-library refusals stay loud."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from datasketches_spark_spark.operators import avifnative as av

HAVE = av.libavif_available()
needs_lib = pytest.mark.skipif(not HAVE, reason="no system libavif")

DATA = os.path.join(os.path.dirname(__file__), "data")


@needs_lib
class TestRoundtrip:
    def test_two_codec_implementations(self):
        dec, enc = av.avif_codec_names()
        assert dec != "none" and enc != "none"

    def test_solid_color_survives(self):
        img = np.zeros((16, 16, 3), np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = 200, 60, 30
        payload = av.avif_encode_rgb(img)
        assert payload[4:8] == b"ftyp" and payload[8:12] == b"avif"
        out = av.avif_decode_rgb(payload)
        assert out.shape == (16, 16, 3)
        means = out.reshape(-1, 3).mean(axis=0)
        assert np.all(np.abs(means - [200, 60, 30]) <= 2.0)

    def test_gradient_survives_approximately(self):
        x = np.linspace(0, 255, 32, dtype=np.uint8)
        img = np.dstack([np.tile(x, (32, 1))] * 3)
        out = av.avif_decode_rgb(av.avif_encode_rgb(img))
        assert out.shape == (32, 32, 3)
        assert abs(float(out.mean()) - float(img.mean())) <= 3.0

    def test_rgba_decode_opaque_alpha(self):
        img = np.full((8, 8, 3), 90, np.uint8)
        out = av.avif_decode_rgba(av.avif_encode_rgb(img))
        assert out.shape == (8, 8, 4)
        assert np.all(out[:, :, 3] == 255)

    def test_determinism(self):
        img = np.full((8, 8, 3), 123, np.uint8)
        a, b = av.avif_encode_rgb(img), av.avif_encode_rgb(img)
        assert a == b
        assert (av.avif_decode_rgb(a) == av.avif_decode_rgb(b)).all()

    def test_encode_validations(self):
        with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
            av.avif_encode_rgb(np.zeros((4, 4), np.uint8))
        with pytest.raises(ValueError, match="bomb guard"):
            av._decode(b"\0" * (av.MAX_INPUT_BYTES + 1), False)

    def test_garbage_raises_valueerror(self):
        with pytest.raises(ValueError, match="libavif"):
            av.avif_decode_rgb(b"\x00\x00\x00 ftypavifgarbage" * 4)


@needs_lib
class TestDispatch:
    def test_sniff_and_decode_image(self):
        from datasketches_spark_spark.operators.imagecodec import (
            decode_image, sniff_format)
        img = np.full((8, 8, 3), 77, np.uint8)
        payload = av.avif_encode_rgb(img)
        assert sniff_format(payload) == "avif"
        out = decode_image(payload)
        assert out.shape == (8, 8, 3)
        assert abs(float(out.mean()) - 77.0) <= 2.0

    def test_detect_mime_brands(self, spark):
        from datasketches_spark_spark.functions import detect_mime
        rows = [
            ("real", av.avif_encode_rgb(
                np.full((4, 4, 3), 9, np.uint8)), "image/avif"),
            # full 0x18-byte ftyp boxes — detect_mime now enforces the
            # WHATWG box-size plausibility rule (length >= box size)
            ("heic", b"\x00\x00\x00\x18ftypheic\x00\x00\x00\x00"
                     b"heicmif1", "image/heic"),
            ("mp4", b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00"
                    b"isomavc1", "video/mp4"),
        ]
        df = spark.createDataFrame([(n, p) for n, p, _ in rows],
                                   ["name", "payload"])
        got = {r.name: r.m for r in
               df.select("name",
                         detect_mime("payload").alias("m")).collect()}
        assert got == {n: m for n, _, m in rows}


@needs_lib
class TestFixtures:
    """Committed streams decode to pinned pixel hashes — AV1
    reconstruction is bit-exact, so these hold across decoder
    versions (the lossy-WebP fixture pattern). Regenerate with
    devtools/gen_avif_fixtures.py (prints the md5 table)."""

    def test_fixture_hashes(self):
        import json
        with open(os.path.join(DATA, "avif_fixtures.json")) as fh:
            want = json.load(fh)
        assert len(want) >= 3
        for name, meta in want.items():
            with open(os.path.join(DATA, name), "rb") as fh:
                img = av.avif_decode_rgb(fh.read())
            assert list(img.shape) == meta["shape"], name
            assert hashlib.md5(img.tobytes()).hexdigest() \
                == meta["px_md5"], name


class TestRefusal:
    def test_absent_library_is_loud(self, monkeypatch):
        monkeypatch.setattr(av, "_LIB", None)
        monkeypatch.setattr(av, "_TRIED", True)
        with pytest.raises(NotImplementedError, match="libavif"):
            av.avif_decode_rgb(b"xx")
        with pytest.raises(NotImplementedError, match="libavif"):
            av.avif_encode_rgb(np.zeros((4, 4, 3), np.uint8))
        assert not av.libavif_available()


@needs_lib
class TestCrossFormatDedup:
    """The payoff of routing modern formats through decode_image: the
    SAME picture re-encoded as PNG / AVIF / HEIC collapses to one
    perceptual hash — container-independent image dedup."""

    def test_same_picture_three_containers_one_hash(self):
        from datasketches_spark_spark.operators.heifnative import (
            heic_codec_support, libheif_available)
        from datasketches_spark_spark.operators.imagecodec import (
            average_hash, decode_image)
        from datasketches_spark_spark.operators.pngcodec import (
            encode_png)
        img = np.full((32, 32, 3), 40, np.uint8)
        img[8:24, :, :] = 210          # bright band: structured hash
        payloads = [bytes(encode_png(img)), av.avif_encode_rgb(img)]
        if libheif_available() and heic_codec_support()[1]:
            from datasketches_spark_spark.operators.heifnative import (
                heic_encode_rgb)
            payloads.append(heic_encode_rgb(img, quality=90))
        hashes = {average_hash(decode_image(p)) for p in payloads}
        assert len(hashes) == 1
        assert len(payloads) >= 2
