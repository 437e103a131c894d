"""System-libmpg123 binding (ctypes) — the MP3 sample-decode path.

MPEG-1 Layer III is the one AUDIO codec this engine does not
re-implement in numpy, for the same reason as lossy VP8
(``webpnative.py``): a spec-correct decoder needs the 34 normative
Huffman tables plus the 512-tap synthesis window from ISO 11172-3 —
large arbitrary constants that cannot be re-derived, only transcribed,
and there is NO reference implementation in this container to validate
a transcription against. A decoder whose tables cannot be checked
would roundtrip against itself and still silently mis-decode real
files; the engine refuses that. Production pipelines decode crawl MP3
with mpg123/ffmpeg anyway, so this module loads the SYSTEM libmpg123
behind an import-try (no pip/apt — the shared object must ship with
the OS image) and exposes one function:

``mp3_decode_pcm(data) -> (samples float64 (n, ch) in [-1, 1], rate)``

matching ``audiocodec.decode_audio``'s contract, so decoded MP3 feeds
the existing ``audio_features`` / ``audio_fingerprint``
(Haitsma-Kalker) chain unchanged and MP3 crawl audio becomes
dedupable. Where the library is absent (this container — probed:
no libmpg123/libavcodec/ffmpeg anywhere on the image),
``mpg123_available()`` is False and ``decode_audio`` keeps the honest
refusal with guidance.

The feed-API flow below (open_feed/feed/read with format pinned to
native-rate signed-16) follows the public mpg123 API documentation;
``tests/test_mp3.py::TestNativeDecode`` cross-validates it against
engine-encoded WAV tones whenever a future image DOES carry the
library, and asserts the refusal path when it does not.

Tag-invariant CONTENT identity for MP3 (``mp3codec.mp3_audio_hash``)
does NOT need this binding — re-tagged copies dedup via the exact
frame walk alone.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

__all__ = ["mpg123_available", "mp3_decode_pcm"]

_LIB = None
_TRIED = False

_MAX_INPUT = 256 << 20          # compressed-input bomb guard
_MAX_OUTPUT = 1 << 31           # ~2 GiB of PCM; a 256 MiB MP3 fits

# public API constants (mpg123.h)
_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_MPG123_NEED_MORE = -10
_MPG123_ENC_SIGNED_16 = 0xD0    # MPG123_ENC_16 | SIGNED | 0x10
_MPG123_MONO = 1
_MPG123_STEREO = 2


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = []
    found = ctypes.util.find_library("mpg123")
    if found:
        names.append(found)
    names += ["libmpg123.so.0", "libmpg123.so", "libmpg123.0.dylib"]
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.mpg123_new.restype = ctypes.c_void_p
            lib.mpg123_new.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int)]
            lib.mpg123_open_feed.argtypes = [ctypes.c_void_p]
            lib.mpg123_feed.argtypes = [ctypes.c_void_p,
                                        ctypes.c_char_p,
                                        ctypes.c_size_t]
            lib.mpg123_read.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t)]
            lib.mpg123_getformat.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
            lib.mpg123_format.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_int,
                ctypes.c_int]
            lib.mpg123_rates.argtypes = [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_long)),
                ctypes.POINTER(ctypes.c_size_t)]
            lib.mpg123_delete.argtypes = [ctypes.c_void_p]
            try:
                lib.mpg123_init()          # no-op on modern builds
            except Exception:
                pass
            _LIB = lib
            return _LIB
        except OSError:
            continue
    return None


def mpg123_available() -> bool:
    return _load() is not None


def mp3_decode_pcm(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an MPEG audio stream via the system libmpg123 (feed
    API): ``(samples float64 (n, channels) in [-1, 1], sample_rate)``.
    Raises ``NotImplementedError`` when the library is absent and
    ``ValueError`` on decode failure — never returns garbage."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "MP3 sample decode needs the system libmpg123 (probed: "
            "absent on this image); frame metadata is available via "
            "operators.mp3_info, tag-invariant dedup via "
            "operators.mp3_audio_hash")
    data = bytes(data)
    if len(data) > _MAX_INPUT:
        raise ValueError(f"MP3 payload {len(data)} B exceeds the "
                         f"{_MAX_INPUT} B bomb guard")
    err = ctypes.c_int(0)
    mh = lib.mpg123_new(None, ctypes.byref(err))
    if not mh:
        raise ValueError(f"mpg123_new failed ({err.value})")
    try:
        # pin output to native-rate signed 16-bit for every rate the
        # build supports — no resampling, deterministic conversion
        lib.mpg123_format_none(mh)
        rates = ctypes.POINTER(ctypes.c_long)()
        n_rates = ctypes.c_size_t(0)
        lib.mpg123_rates(ctypes.byref(rates), ctypes.byref(n_rates))
        for i in range(n_rates.value):
            lib.mpg123_format(mh, rates[i],
                              _MPG123_MONO | _MPG123_STEREO,
                              _MPG123_ENC_SIGNED_16)
        if lib.mpg123_open_feed(mh) != _MPG123_OK:
            raise ValueError("mpg123_open_feed failed")
        if lib.mpg123_feed(mh, data, len(data)) != _MPG123_OK:
            raise ValueError("mpg123_feed failed")
        rate = ctypes.c_long(0)
        ch = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        chunks = []
        total = 0
        buf = (ctypes.c_char * 65536)()
        done = ctypes.c_size_t(0)
        while True:
            rc = lib.mpg123_read(mh, buf, len(buf),
                                 ctypes.byref(done))
            if done.value:
                total += done.value
                if total > _MAX_OUTPUT:
                    raise ValueError("decoded PCM exceeds the "
                                     "output bomb guard")
                chunks.append(bytes(buf[:done.value]))
            if rc == _MPG123_NEW_FORMAT:
                lib.mpg123_getformat(mh, ctypes.byref(rate),
                                     ctypes.byref(ch),
                                     ctypes.byref(enc))
                continue
            if rc in (_MPG123_DONE, _MPG123_NEED_MORE):
                break                  # NEED_MORE == end of our feed
            if rc != _MPG123_OK:
                raise ValueError(f"mpg123_read failed ({rc})")
        if not chunks or rate.value <= 0 or ch.value <= 0:
            raise ValueError("mpg123 produced no PCM")
        if enc.value != _MPG123_ENC_SIGNED_16:
            raise ValueError(f"unexpected mpg123 encoding "
                             f"{enc.value:#x}")
        pcm = np.frombuffer(b"".join(chunks), dtype="<i2")
        pcm = pcm[:len(pcm) - len(pcm) % ch.value]
        x = pcm.astype(np.float64).reshape(-1, ch.value) / 32768.0
        return x, int(rate.value)
    finally:
        lib.mpg123_delete(mh)
