"""System-libbrotli binding (operators/brotlinative.py, r15).

The container ships libbrotlidec.so.1 / libbrotlienc.so.1, so the
roundtrip tests run live against the reference coder; the refusal test
simulates a genuinely library-less host by patching the loader and
pins the honest-refusal contract (NotImplementedError with guidance,
surfacing as a loud null row through http_decode_body).
"""

import gzip

import pytest

from datasketches_spark_spark.operators import brotlinative as bn


pytestmark = pytest.mark.skipif(
    not bn.brotli_available(), reason="no system libbrotlidec")

needs_enc = pytest.mark.skipif(
    not bn.brotli_encoder_available(), reason="no system libbrotlienc")


@needs_enc
class TestRoundtrip:
    def test_roundtrip_text(self):
        msg = "Pack my box with five dozen liquor jugs — φ πλ".encode() * 200
        enc = bn.brotli_encode(msg)
        assert len(enc) < len(msg)
        assert bn.brotli_decode(enc) == msg

    def test_roundtrip_empty(self):
        assert bn.brotli_decode(bn.brotli_encode(b"")) == b""

    def test_roundtrip_binary_incompressible(self):
        import hashlib
        blob = b"".join(hashlib.sha256(bytes([i])).digest()
                        for i in range(256))
        assert bn.brotli_decode(bn.brotli_encode(blob)) == blob

    def test_quality_levels(self):
        msg = b"level test " * 500
        for q in (1, 5, 11):
            assert bn.brotli_decode(bn.brotli_encode(msg, quality=q)) == msg

    def test_truncated_stream_yields_prefix(self):
        """Crawl-capture leniency: a cut-off stream decodes to a prefix
        of the original (possibly empty), never raises."""
        msg = b"truncate me " * 2000
        enc = bn.brotli_encode(msg, quality=5)
        for cut in (1, len(enc) // 4, len(enc) // 2, len(enc) - 1):
            got = bn.brotli_decode(enc[:cut])
            assert msg.startswith(got)

    def test_bomb_guard(self):
        enc = bn.brotli_encode(b"\x00" * (8 << 20), quality=5)
        assert len(enc) < 64 << 10          # it IS a bomb
        with pytest.raises(ValueError, match="bomb"):
            bn.brotli_decode(enc, max_out=1 << 20)
        assert bn.brotli_decode(enc, max_out=16 << 20) == b"\x00" * (8 << 20)


class TestFailureModes:
    def test_corrupt_stream_raises(self):
        with pytest.raises(ValueError):
            bn.brotli_decode(b"\xff\xff\xff\xffnot brotli at all" * 4)

    def test_gzip_bytes_are_not_brotli(self):
        data = gzip.compress(b"wrong codec")
        try:
            got = bn.brotli_decode(data)
        except ValueError:
            return                           # loud — the preferred path
        # some gzip prefixes happen to parse as a truncated brotli
        # stream; the lenient-prefix contract then requires EMPTY or
        # garbage-free output, never the gzip bytes themselves
        assert data not in (got or b"x")

    def test_refusal_when_library_absent(self, monkeypatch):
        """A genuinely library-less host refuses loudly with guidance
        (the webpnative convention), and http._inflate surfaces that
        as ValueError -> null row."""
        monkeypatch.setattr(bn, "_load_dec", lambda: None)
        assert not bn.brotli_available()
        with pytest.raises(NotImplementedError, match="libbrotlidec"):
            bn.brotli_decode(b"\x0b\x00\x80hi\x03")
        from datasketches_spark_spark.functions.http import _inflate
        with pytest.raises(ValueError, match="libbrotlidec"):
            _inflate(b"\x0b\x00\x80hi\x03", "br")

    def test_encoder_refusal_when_absent(self, monkeypatch):
        monkeypatch.setattr(bn, "_load_enc", lambda: None)
        with pytest.raises(NotImplementedError, match="libbrotlienc"):
            bn.brotli_encode(b"x")
