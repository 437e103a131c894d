"""Pure-numpy codec for RIFF/WAVE audio: PCM (8/16/32-bit integer,
32/64-bit float, any channel count) plus ITU-T G.711 mu-law / A-law
telephony companding (format tags 7/6, both directions, bit-exact
against the stdlib audioop reference).

Like ``imagecodec``, this gives the multimodal suite a REAL audio
decode -> transform -> feature path without native libraries: WAV is a
chunked header over raw sample frames, so numpy ``frombuffer`` is a
complete decoder. Compressed audio (MP3/AAC/Opus/FLAC) stays honestly
stubbed — ``decode_wav`` resolves WAVE_FORMAT_EXTENSIBLE through its
SubFormat GUID and raises ``NotImplementedError`` for non-PCM/non-float
format tags, and unknown containers fail in ``sniff_format``-aware
callers.

No counterpart in the reference (it has no multimodal surface).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "audio_content_hash",
    "decode_wav",
    "encode_wav",
    "audio_features",
    "resample_nearest",
    "g711_ulaw_to_linear",
    "g711_alaw_to_linear",
    "g711_linear_to_ulaw",
    "g711_linear_to_alaw",
]

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}
_FLOAT_DTYPES = {32: np.float32, 64: np.float64}

# ------------------------------------------------------------- G.711
# ITU-T G.711 mu-law / A-law companding (WAV format tags 7 / 6) — the
# telephony codecs a crawled-audio population actually contains beside
# PCM. Pure segment/mantissa bit math (no normative tables), validated
# bit-exact against the stdlib audioop reference over all 256 codes
# (decode) and the full 16-bit domain (encode) in tests/test_g711.py.


def g711_ulaw_to_linear(u: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 linear (Sun/CCITT ulaw2linear rule)."""
    u = (~np.asarray(u).astype(np.uint8)).astype(np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def g711_alaw_to_linear(a: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear (Sun/CCITT alaw2linear rule)."""
    a = np.asarray(a).astype(np.uint8).astype(np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    v = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108,
                          (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, v, -v).astype(np.int16)


def g711_linear_to_ulaw(pcm: np.ndarray) -> np.ndarray:
    """int16 linear -> mu-law bytes (14-bit segment search)."""
    p = np.asarray(pcm).astype(np.int32) >> 2
    mask = np.where(p < 0, 0x7F, 0xFF)
    p = np.minimum(np.abs(p), 8159) + 33
    seg = np.searchsorted((1 << (np.arange(8) + 6)) - 1, p)
    uval = (seg << 4) | ((p >> (seg + 1)) & 0xF)
    return (np.where(seg >= 8, 0x7F, uval) ^ mask).astype(np.uint8)


def g711_linear_to_alaw(pcm: np.ndarray) -> np.ndarray:
    """int16 linear -> A-law bytes (13-bit segment search)."""
    p = np.asarray(pcm).astype(np.int32) >> 3
    mask = np.where(p >= 0, 0xD5, 0x55)
    p = np.where(p >= 0, p, -p - 1)
    seg = np.searchsorted((1 << (np.arange(8) + 5)) - 1, p)
    segc = np.minimum(seg, 7)
    aval = (segc << 4) | np.where(segc < 2, (p >> 1) & 0xF,
                                  (p >> segc) & 0xF)
    return (np.where(seg >= 8, 0x7F, aval) ^ mask).astype(np.uint8)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to ``(samples, sample_rate)``.

    ``samples`` is ``(n_frames, n_channels) float64`` normalized to
    [-1, 1] (8-bit PCM is unsigned-offset per the spec; 16/32-bit are
    signed; float formats pass through). Chunk walk skips unknown chunks
    (LIST/fact/cue), honoring the spec's word alignment.
    """
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(data)
    fmt = None
    frames = None
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", data, body)
            if fmt[0] == 0xFFFE and size >= 40:
                # WAVE_FORMAT_EXTENSIBLE: the real format tag is the
                # first two bytes of the 16-byte SubFormat GUID at
                # offset 24 (after cbSize=22, wValidBitsPerSample,
                # dwChannelMask)
                (sub_tag,) = struct.unpack_from("<H", data, body + 24)
                fmt = (sub_tag,) + fmt[1:]
        elif cid == b"data":
            frames = data[body:body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, n_ch, rate, _brate, _align, bits = fmt
    if audio_fmt == 0xFFFE:  # EXTENSIBLE with a truncated fmt chunk
        raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk too short "
                         "for its SubFormat GUID")
    if audio_fmt == 1:
        dt = _PCM_DTYPES.get(bits)
        if dt is None:
            raise NotImplementedError(f"PCM bit depth {bits} unsupported")
    elif audio_fmt == 3:
        dt = _FLOAT_DTYPES.get(bits)
        if dt is None:
            raise NotImplementedError(f"float bit depth {bits} unsupported")
    elif audio_fmt in (6, 7):  # G.711 A-law / mu-law (8-bit codes)
        if bits not in (0, 8):
            raise ValueError(f"G.711 WAV with bit depth {bits}")
        dt = np.uint8
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} is compressed/unsupported: PCM "
            "(1), IEEE float (3) and G.711 mu-law/A-law (7/6) decode "
            "without native codecs")
    if n_ch < 1 or rate < 1:
        raise ValueError(f"bad WAV header: channels={n_ch} rate={rate}")
    raw = np.frombuffer(frames, dtype=np.dtype(dt).newbyteorder("<"))
    if audio_fmt == 7:
        raw = g711_ulaw_to_linear(raw)
    elif audio_fmt == 6:
        raw = g711_alaw_to_linear(raw)
    n = (raw.size // n_ch) * n_ch
    x = raw[:n].reshape(-1, n_ch).astype(np.float64)
    if audio_fmt == 1:
        if bits == 8:
            x = (x - 128.0) / 128.0
        else:
            x = x / float(2 ** (bits - 1))
    elif audio_fmt in (6, 7):
        x = x / 32768.0
    return x, rate


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Decode any supported audio payload to ``(samples: float64
    (n, channels) in [-1, 1], sample_rate)``: RIFF/WAVE PCM and IEEE
    float here, FLAC through the pure-Python `flaccodec` (round 8).
    Unknown containers raise with the sniffed magic named."""
    data = bytes(data)
    if data[:4] == b"fLaC":
        from .flaccodec import decode_flac
        return decode_flac(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    from .oggcodec import is_ogg
    if is_ogg(data):
        raise NotImplementedError(
            "Ogg (Opus/Vorbis) sample decode needs the codec's"
            " normative tables (no system library on this image);"
            " container metadata via operators.ogg_info, tag-invariant"
            " dedup via operators.audio_content_hash")
    from .mp3codec import is_mp3
    if is_mp3(data):
        # r17: system libmpg123 is the validated MP3 decode path
        # (mp3native.py); absent (this image), the honest refusal
        # stands — with the tag-invariant dedup alternative named
        from .mp3native import mp3_decode_pcm, mpg123_available
        if mpg123_available():
            return mp3_decode_pcm(data)
        raise NotImplementedError(
            "MPEG audio (MP3) sample decode needs the system libmpg123"
            " (absent on this image; the pure-Python route would need"
            " the unverifiable ISO 11172-3 Huffman/window tables —"
            " see operators/mp3native.py); metadata via"
            " operators.mp3_info, tag-invariant dedup via"
            " operators.mp3_audio_hash")
    raise NotImplementedError(
        f"no built-in audio codec for magic {data[:4]!r}: RIFF/WAVE "
        "(PCM + IEEE float) and FLAC decode without native libraries")


def encode_wav(samples: np.ndarray, sample_rate: int,
               bits: int = 16, codec: str = "pcm") -> bytes:
    """Encode float samples in [-1, 1] (``(n,)`` or ``(n, ch)``) as
    integer PCM WAV, or as G.711 telephony WAV with ``codec="ulaw"`` /
    ``"alaw"`` (format tags 7/6, 8-bit codes; ``bits`` ignored)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    if codec in ("ulaw", "alaw"):
        q = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
        enc = (g711_linear_to_ulaw if codec == "ulaw"
               else g711_linear_to_alaw)
        body = enc(q.ravel()).tobytes()
        tag, block, bits = (7 if codec == "ulaw" else 6), n_ch, 8
        hdr = (b"WAVE" + b"fmt " + struct.pack(
            "<IHHIIHH", 16, tag, n_ch, sample_rate, sample_rate * block,
            block, bits) + b"data" + struct.pack("<I", len(body)))
        return (b"RIFF" + struct.pack("<I", len(hdr) + len(body))
                + hdr + body)
    if codec != "pcm":
        raise ValueError(f"unknown WAV codec {codec!r}")
    dt = _PCM_DTYPES.get(bits)
    if dt is None:
        raise ValueError(f"PCM bit depth {bits} unsupported")
    full = float(2 ** (bits - 1))
    q = np.clip(np.round(x * full), -full, full - 1)
    if bits == 8:
        pcm = (q + 128.0).astype(np.uint8)
    else:
        pcm = q.astype(dt)
    body = pcm.astype(np.dtype(dt).newbyteorder("<")).tobytes()
    block = n_ch * bits // 8
    hdr = (b"WAVE" + b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_ch, sample_rate, sample_rate * block,
        block, bits) + b"data" + struct.pack("<I", len(body)))
    return b"RIFF" + struct.pack("<I", len(hdr) + len(body)) + hdr + body


def resample_nearest(samples: np.ndarray, src_rate: int,
                     dst_rate: int) -> np.ndarray:
    """Nearest-sample resample (index math; no filtering — feature
    extraction, not hi-fi)."""
    x = np.asarray(samples)
    n = x.shape[0]
    if n == 0:
        return x
    m = max(int(round(n * dst_rate / src_rate)), 1)
    idx = np.minimum(((np.arange(m) + 0.5) * n / m), n - 1).astype(np.intp)
    return x[idx]


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Decoded-sample features: duration, RMS level, peak, zero-crossing
    rate (on the channel mean)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    mono = x.mean(axis=1)
    n = mono.size
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) \
        if n > 1 else 0
    return {
        "n_frames": int(n),
        "n_channels": int(x.shape[1]),
        "sample_rate": int(sample_rate),
        "duration_s": float(n / sample_rate),
        "rms": float(np.sqrt((mono ** 2).mean())) if n else 0.0,
        "peak": float(np.abs(x).max()) if n else 0.0,
        "zero_cross_rate": float(zc / max(n - 1, 1)),
    }


def audio_content_hash(data: bytes) -> str:
    """Container-metadata-invariant audio CONTENT identity (r17) —
    the cross-format dedup key: re-tagged or re-containered copies of
    the same PCM collapse to one 32-char hash with no decode.

    * FLAC: the STREAMINFO raw-samples MD5 (the spec's own content
      signature — identical for ANY lossless encode of the same PCM);
      streams whose encoder left it unset (all-zero) fall back to the
      frame bytes after the metadata blocks, so re-TAGGED copies
      still collapse (re-encodes then need the md5).
    * RIFF/WAVE integer PCM: MD5 of the ``data`` chunk bytes — the
      same interleaved little-endian samples STREAMINFO hashes, so a
      WAV and a FLAC of the SAME audio produce the SAME hash
      (cross-container identity); LIST/INFO/id3/bext metadata chunks
      never contribute.
    * MPEG audio: :func:`mp3codec.mp3_audio_hash` (frame bytes,
      tag-invariant — exact-stream identity, lossy formats have no
      raw-PCM signature to key on).
    * Ogg (Opus/Vorbis): :func:`oggcodec.ogg_audio_hash` (audio
      packet bytes, comment/tags header excluded — same contract).
    * ADTS AAC (r18): :func:`aaccodec.aac_audio_hash` (raw_data_block
      payloads; ADTS headers/CRC/ID3 excluded) — equals the MP4 hash
      below for the same encode.
    * MP4/ISO-BMFF (r18): :func:`mp4codec.mp4_audio_hash` (audio
      track sample bytes via the stbl tables; udta/meta/free never
      contribute) — an ``.aac`` and an ``.m4a`` of one encode
      collapse cross-container, the WAV↔FLAC precedent.
    """
    import hashlib
    data = bytes(data)
    if data[:4] == b"fLaC":
        pos = 4
        si_md5 = None
        while pos + 4 <= len(data):
            flags = data[pos]
            size = int.from_bytes(data[pos + 1:pos + 4], "big")
            if flags & 0x7F == 0 and size >= 34:
                si_md5 = data[pos + 22:pos + 38]
            pos += 4 + size
            if flags & 0x80:
                break
        if si_md5 and si_md5 != bytes(16):
            return si_md5.hex()
        return hashlib.md5(data[pos:]).hexdigest()
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        pos = 12
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            size = int.from_bytes(data[pos + 4:pos + 8], "little")
            if cid == b"data":
                return hashlib.md5(
                    data[pos + 8:pos + 8 + size]).hexdigest()
            pos += 8 + size + (size & 1)
        raise ValueError("WAV: no data chunk")
    # ADTS before MPEG audio: both sync on 0xFFF, but an ID3-wrapped
    # ADTS stream would satisfy is_mp3's ID3 branch and then fail the
    # MP3 frame walk — the ADTS sniff validates the actual frame chain
    from .aaccodec import aac_audio_hash, is_adts
    if is_adts(data):
        return aac_audio_hash(data)
    from .mp3codec import is_mp3, mp3_audio_hash
    if is_mp3(data):
        return mp3_audio_hash(data)
    from .oggcodec import is_ogg, ogg_audio_hash
    if is_ogg(data):
        return ogg_audio_hash(data)
    from .mp4codec import is_mp4, mp4_audio_hash
    if is_mp4(data):
        return mp4_audio_hash(data)
    from .mkvcodec import is_mkv, mkv_audio_hash
    if is_mkv(data):
        # block payloads ARE the codec packets (headers live in
        # CodecPrivate), so MKV-Opus == Ogg-Opus of the same encode
        return mkv_audio_hash(data)
    raise ValueError(
        f"no content-hash rule for magic {data[:4]!r}: FLAC, "
        "RIFF/WAVE, MPEG audio, ADTS AAC, Ogg, MP4 and "
        "Matroska/WebM are supported")
