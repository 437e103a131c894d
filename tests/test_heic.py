"""HEIC via the system libheif (operators/heifnative.py): the
encode(x265) -> decode(libde265) roundtrip crosses two independent
HEVC implementations; committed fixtures pin decoded-pixel md5s (HEVC
reconstruction is exactly specified); sniffing/dispatch route the
container; absent-library refusals stay loud."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from datasketches_spark_spark.operators import heifnative as hf

HAVE = hf.libheif_available()
CAN_ENCODE = HAVE and hf.heic_codec_support()[1]
needs_lib = pytest.mark.skipif(not HAVE, reason="no system libheif")
needs_enc = pytest.mark.skipif(not CAN_ENCODE,
                               reason="no HEVC encoder plugin")

DATA = os.path.join(os.path.dirname(__file__), "data")


@needs_enc
class TestRoundtrip:
    def test_solid_color_survives(self):
        img = np.zeros((32, 32, 3), np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = 180, 90, 40
        payload = hf.heic_encode_rgb(img, quality=90)
        assert payload[4:8] == b"ftyp" and payload[8:12] == b"heic"
        out = hf.heic_decode_rgb(payload)
        assert out.shape == (32, 32, 3)
        means = out.reshape(-1, 3).mean(axis=0)
        assert np.all(np.abs(means - [180, 90, 40]) <= 2.0)

    def test_gradient_survives_approximately(self):
        x = np.linspace(0, 255, 32, dtype=np.uint8)
        img = np.dstack([np.tile(x, (32, 1))] * 3)
        out = hf.heic_decode_rgb(hf.heic_encode_rgb(img, quality=95))
        assert out.shape == (32, 32, 3)
        assert abs(float(out.mean()) - float(img.mean())) <= 3.0

    def test_rgba_decode_opaque_alpha(self):
        img = np.full((16, 16, 3), 90, np.uint8)
        out = hf.heic_decode_rgba(hf.heic_encode_rgb(img))
        assert out.shape == (16, 16, 4)
        assert np.all(out[:, :, 3] == 255)

    def test_determinism(self):
        img = np.full((16, 16, 3), 123, np.uint8)
        a = hf.heic_encode_rgb(img)
        b = hf.heic_encode_rgb(img)
        assert a == b
        assert (hf.heic_decode_rgb(a) == hf.heic_decode_rgb(b)).all()

    def test_encode_validations(self):
        with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
            hf.heic_encode_rgb(np.zeros((4, 4), np.uint8))
        with pytest.raises(ValueError, match="bomb guard"):
            hf._decode(b"\0" * (hf.MAX_INPUT_BYTES + 1), False)

    def test_garbage_raises_valueerror(self):
        with pytest.raises(ValueError, match="libheif"):
            hf.heic_decode_rgb(b"\x00\x00\x00\x18ftypheicjunk" * 4)


@needs_enc
class TestDispatch:
    def test_sniff_and_decode_image(self):
        from datasketches_spark_spark.operators.imagecodec import (
            decode_image, sniff_format)
        img = np.full((16, 16, 3), 77, np.uint8)
        payload = hf.heic_encode_rgb(img)
        assert sniff_format(payload) == "heic"
        out = decode_image(payload)
        assert out.shape == (16, 16, 3)
        assert abs(float(out.mean()) - 77.0) <= 2.0


@needs_lib
class TestFixtures:
    """Committed streams decode to pinned pixel hashes (HEVC
    reconstruction is exactly specified). Regenerate with
    devtools/gen_heic_fixtures.py."""

    def test_fixture_hashes(self):
        import json
        with open(os.path.join(DATA, "heic_fixtures.json")) as fh:
            want = json.load(fh)
        assert len(want) >= 3
        for name, meta in want.items():
            with open(os.path.join(DATA, name), "rb") as fh:
                img = hf.heic_decode_rgb(fh.read())
            assert list(img.shape) == meta["shape"], name
            assert hashlib.md5(img.tobytes()).hexdigest() \
                == meta["px_md5"], name


class TestRefusal:
    def test_absent_library_is_loud(self, monkeypatch):
        monkeypatch.setattr(hf, "_LIB", None)
        monkeypatch.setattr(hf, "_TRIED", True)
        with pytest.raises(NotImplementedError, match="libheif"):
            hf.heic_decode_rgb(b"xx")
        with pytest.raises(NotImplementedError, match="libheif"):
            hf.heic_encode_rgb(np.zeros((4, 4, 3), np.uint8))
        assert not hf.libheif_available()
