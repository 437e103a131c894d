"""System-libzstd binding (operators/zstdnative.py, r15).

Mirror of tests/test_brotli.py: live roundtrips against the reference
coder that ships in the OS image, plus the honest-refusal contract for
a genuinely library-less host.
"""

import gzip

import pytest

from datasketches_spark_spark.operators import zstdnative as zn


pytestmark = pytest.mark.skipif(
    not zn.zstd_available(), reason="no system libzstd")


class TestRoundtrip:
    def test_roundtrip_text(self):
        msg = "sphinx of black quartz judge my vow — ζ ξ".encode() * 300
        enc = zn.zstd_encode(msg)
        assert len(enc) < len(msg)
        assert zn.zstd_decode(enc) == msg

    def test_roundtrip_empty(self):
        assert zn.zstd_decode(zn.zstd_encode(b"")) == b""

    def test_roundtrip_binary_incompressible(self):
        import hashlib
        blob = b"".join(hashlib.sha256(bytes([i])).digest()
                        for i in range(256))
        assert zn.zstd_decode(zn.zstd_encode(blob)) == blob

    def test_levels(self):
        msg = b"level test " * 500
        for lvl in (1, 9, 19):
            assert zn.zstd_decode(zn.zstd_encode(msg, level=lvl)) == msg

    def test_multi_frame_concatenation(self):
        """RFC 8878: a zstd payload may be several frames back to
        back — all decode in sequence."""
        two = zn.zstd_encode(b"first.") + zn.zstd_encode(b"second.")
        assert zn.zstd_decode(two) == b"first.second."

    def test_truncated_stream_yields_prefix(self):
        msg = b"truncate me " * 2000
        enc = zn.zstd_encode(msg, level=3)
        for cut in (4, len(enc) // 4, len(enc) // 2, len(enc) - 1):
            got = zn.zstd_decode(enc[:cut])
            assert msg.startswith(got)

    def test_bomb_guard(self):
        enc = zn.zstd_encode(b"\x00" * (8 << 20), level=3)
        assert len(enc) < 64 << 10
        with pytest.raises(ValueError, match="bomb"):
            zn.zstd_decode(enc, max_out=1 << 20)
        assert zn.zstd_decode(enc, max_out=16 << 20) == \
            b"\x00" * (8 << 20)


class TestFailureModes:
    def test_corrupt_stream_raises(self):
        with pytest.raises(ValueError):
            zn.zstd_decode(b"\x01\x02\x03garbage-not-zstd" * 4)

    def test_gzip_bytes_are_not_zstd(self):
        with pytest.raises(ValueError):
            zn.zstd_decode(gzip.compress(b"wrong codec"))

    def test_refusal_when_library_absent(self, monkeypatch):
        monkeypatch.setattr(zn, "_load", lambda: None)
        assert not zn.zstd_available()
        with pytest.raises(NotImplementedError, match="libzstd"):
            zn.zstd_decode(b"\x28\xb5\x2f\xfd")
        with pytest.raises(NotImplementedError, match="libzstd"):
            zn.zstd_encode(b"x")
        from datasketches_spark_spark.functions.http import _inflate
        with pytest.raises(ValueError, match="libzstd"):
            _inflate(b"\x28\xb5\x2f\xfd", "zstd")
