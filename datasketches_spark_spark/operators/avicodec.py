"""Pure-Python AVI (RIFF) container codec for Motion-JPEG and
uncompressed (BI_RGB) video.

A real video path without native libraries: AVI is a plain RIFF chunk
tree; Motion-JPEG stores every frame as an independent baseline JPEG
(which `jpegcodec.py` decodes) and BI_RGB stores raw bottom-up DIB
rasters (which `imagecodec.py`'s BMP path decodes once the stream's
BITMAPINFOHEADER supplies dimensions). Parsing the container is
bookkeeping, so frame EXTRACTION (the Spark-side operator's job) is
exact and cheap; per-frame pixel decode reuses the image codecs.

Scope:

* parse: RIFF/AVI chunk tree; video stream chunks ``NNdc``/``NNdb`` of
  the first video stream in ``movi`` order; ``avih`` header metadata
  (frame count, dimensions, microseconds per frame);
  ``avi_video_format`` (round 11) surfaces the first video stream's
  BITMAPINFOHEADER. Audio streams and OTHER codecs are carried
  opaquely — `avi_info` reports the FourCC so callers can refuse or
  route; `decode_avi_frame` decodes MJPG and (given the format dict)
  BI_RGB, refusing anything else by name — DCT-based video codecs
  stay refusals for the same verifiability reason as lossy VP8
  (``webpcodec.py``).
* encode: minimal single-video-stream MJPG AVI (avih + strh/strf +
  movi + idx1) whose frames are this engine's `encode_jpeg` output,
  plus the lossless `encode_avi_rgb` BI_RGB sibling — self-contained
  roundtrip tests, and readable by standard players.

No counterpart in the reference (no multimodal surface); makes
`operators.multimodal.sample_frames` REAL for AVI payloads instead of
the documented byte-slice fake.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["avi_info", "avi_frame_payloads", "avi_video_format",
           "decode_avi_frame", "encode_avi_mjpeg", "encode_avi_rgb",
           "mjpeg_frame_sampler", "is_avi"]


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size, list_type) within a
    RIFF span; list_type is set for LIST/RIFF chunks."""
    pos = start
    while pos + 8 <= end:
        fcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if fcc in (b"RIFF", b"LIST"):
            yield fcc, pos + 12, size - 4, data[pos + 8:pos + 12]
        else:
            yield fcc, pos + 8, size, None
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _find_list(data: bytes, start: int, end: int, ltype: bytes):
    for fcc, ps, sz, lt in _chunks(data, start, end):
        if fcc == b"LIST" and lt == ltype:
            return ps, ps + sz
    return None


def avi_info(data: bytes) -> dict:
    """Header metadata: total_frames, width, height, usec_per_frame,
    and the first video stream's codec FourCC (e.g. 'MJPG')."""
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI (RIFF/AVI signature missing)")
    hdrl = _find_list(data, 12, len(data), b"hdrl")
    if hdrl is None:
        raise ValueError("AVI: missing hdrl")
    info = {"codec": None}
    for fcc, ps, sz, lt in _chunks(data, hdrl[0], hdrl[1]):
        if fcc == b"avih":
            us, _, _, _, frames = struct.unpack("<IIIII",
                                                data[ps:ps + 20])
            w, h = struct.unpack("<II", data[ps + 32:ps + 40])
            info.update({"usec_per_frame": us, "total_frames": frames,
                         "width": w, "height": h})
        elif fcc == b"LIST" and lt == b"strl" and info["codec"] is None:
            for f2, p2, s2, _ in _chunks(data, ps, ps + sz):
                if f2 == b"strh" and data[p2:p2 + 4] == b"vids":
                    info["codec"] = data[p2 + 4:p2 + 8].decode(
                        "ascii", "replace")
    if "total_frames" not in info:
        raise ValueError("AVI: missing avih header")
    return info


def _first_video_stream_id(data: bytes) -> bytes | None:
    """The two-digit chunk-id prefix of the first ``vids`` stream.
    AVI stream numbers are assigned by ``strl`` order in ``hdrl``, so in
    a multi-stream file (audio first is common) the video chunks may be
    ``01dc``, not ``00dc``."""
    hdrl = _find_list(data, 12, len(data), b"hdrl")
    if hdrl is None:
        return None
    idx = 0
    for fcc, ps, sz, lt in _chunks(data, hdrl[0], hdrl[1]):
        if fcc == b"LIST" and lt == b"strl":
            for f2, p2, _s2, _ in _chunks(data, ps, ps + sz):
                if f2 == b"strh":
                    if data[p2:p2 + 4] == b"vids":
                        return b"%02d" % idx
                    break
            idx += 1
    return None


def avi_frame_payloads(data: bytes) -> list[bytes]:
    """The video frame payloads (compressed ``NNdc`` / uncompressed
    ``NNdb`` chunks of the first ``vids`` stream) in movi order,
    descending into interleave ``LIST 'rec '`` groupings."""
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI (RIFF/AVI signature missing)")
    movi = _find_list(data, 12, len(data), b"movi")
    if movi is None:
        raise ValueError("AVI: missing movi list")
    sid = _first_video_stream_id(data) or b"00"
    out: list[bytes] = []

    def walk(start: int, end: int) -> None:
        for fcc, ps, sz, lt in _chunks(data, start, end):
            if fcc == b"LIST" and lt == b"rec ":
                walk(ps, ps + sz)
            elif fcc[:2] == sid and fcc[2:4] in (b"dc", b"db"):
                out.append(data[ps:ps + sz])

    walk(movi[0], movi[1])
    return out


def avi_video_format(data: bytes) -> dict | None:
    """The first ``vids`` stream's BITMAPINFOHEADER as a dict
    ``{width, height, bit_count, compression}`` (compression is the
    FourCC bytes, or b"\x00"*4 for BI_RGB), or None without one —
    what a raw ``NNdb`` DIB frame payload needs to become pixels."""
    data = bytes(data)
    hdrl = _find_list(data, 12, len(data), b"hdrl")
    if hdrl is None:
        return None
    for fcc, ps, sz, lt in _chunks(data, hdrl[0], hdrl[1]):
        if fcc == b"LIST" and lt == b"strl":
            is_vids = False
            for f2, p2, s2, _ in _chunks(data, ps, ps + sz):
                if f2 == b"strh":
                    is_vids = data[p2:p2 + 4] == b"vids"
                elif f2 == b"strf" and is_vids and s2 >= 40:
                    _hs, w, h = struct.unpack_from("<Iii", data, p2)
                    _pl, bpp = struct.unpack_from("<HH", data, p2 + 12)
                    comp = data[p2 + 16:p2 + 20]
                    return {"width": w, "height": h, "bit_count": bpp,
                            "compression": comp}
    return None


def _wrap_dib_as_bmp(payload: bytes, fmt: dict) -> bytes:
    """Prepend BITMAPFILEHEADER + BITMAPINFOHEADER to a raw BI_RGB
    frame raster, producing a standalone BMP that ``imagecodec``
    decodes (bottom-up, 4-byte row padding — the DIB rules both
    containers share)."""
    w, h, bpp = fmt["width"], fmt["height"], fmt["bit_count"]
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0,
                       len(payload), 0, 0, 0, 0)
    off = 14 + 40
    head = b"BM" + struct.pack("<IHHI", off + len(payload), 0, 0, off)
    return head + info + payload


def decode_avi_frame(payload: bytes, fmt: dict | None = None) -> np.ndarray:
    """Decode one frame payload to pixels. MJPG frames are JPEGs
    (decoded by `jpegcodec`); raw BI_RGB DIB frames decode when the
    stream's ``avi_video_format`` dict is passed (the payload alone
    carries no dimensions); other codecs refuse by name."""
    payload = bytes(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from .jpegcodec import decode_jpeg
        return decode_jpeg(payload)
    if fmt is not None and fmt.get("compression") == b"\x00\x00\x00\x00":
        from .imagecodec import decode_bmp
        return decode_bmp(_wrap_dib_as_bmp(payload, fmt))
    raise NotImplementedError(
        "AVI frame is not Motion-JPEG (and no BI_RGB format header was "
        "supplied); MJPG and uncompressed BI_RGB streams decode "
        "without native codecs")


def mjpeg_frame_sampler(raw: bytes, num_frames: int) -> list[bytes]:
    """``sample_frames``-compatible decoder: `num_frames` evenly spaced
    REAL frame blobs from the first video stream. MJPEG streams yield
    each frame's own JPEG; uncompressed BI_RGB streams (round 11) yield
    each raw DIB raster RE-WRAPPED as a standalone BMP
    (``_wrap_dib_as_bmp``) — either way every emitted frame is
    self-describing and decodes downstream via ``decode_image``."""
    frames = avi_frame_payloads(raw)
    if not frames:
        return []
    if num_frames < len(frames):
        idx = np.linspace(0, len(frames) - 1,
                          num_frames).round().astype(int)
        frames = [frames[i] for i in idx]
    fmt = avi_video_format(raw)
    if (fmt is not None and frames
            and frames[0][:3] != b"\xff\xd8\xff"
            and fmt.get("compression") == b"\x00\x00\x00\x00"):
        frames = [_wrap_dib_as_bmp(f, fmt) for f in frames]
    return frames


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 50) -> bytes:
    """Encode a list of ``(H, W[, 3]) uint8`` arrays as a Motion-JPEG
    AVI (each frame an `encode_jpeg` baseline JPEG at ``quality`` —
    r15: exposed so re-encode robustness of downstream perceptual
    hashing is testable against genuinely different frame bytes)."""
    from .jpegcodec import encode_jpeg
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    jpegs = [encode_jpeg(np.asarray(f), quality=quality)
             for f in frames]
    h, w = np.asarray(frames[0]).shape[:2]

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    usec = 1_000_000 // fps
    max_size = max(len(j) for j in jpegs)
    avih = struct.pack("<IIIIIIIIIIIIII",
                       usec, max_size * fps, 0, 0x10,  # HASINDEX
                       len(jpegs), 0, 1, max_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII",
            0, 0, 0, 0, 1, fps, 0, len(jpegs), max_size, 0, 0, 0))
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)
    # idx1: one entry per frame (offset relative to movi list start)
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body

def encode_avi_rgb(frames, fps: int = 10) -> bytes:
    """Encode ``(H, W[, 3]) uint8`` arrays as an UNCOMPRESSED (BI_RGB)
    AVI — bottom-up BGR DIB rasters with 4-byte row padding in
    ``00db`` chunks; the lossless sibling of ``encode_avi_mjpeg``
    (round 11: gives the BI_RGB decode path a self-contained
    roundtrip)."""
    if not frames:
        raise ValueError("encode_avi_rgb needs at least one frame")
    mats = []
    for f in frames:
        a = np.asarray(f, dtype=np.uint8)
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=-1)
        mats.append(a)
    h, w = mats[0].shape[:2]
    if any(m.shape[:2] != (h, w) for m in mats):
        raise ValueError("all frames must share one size")
    row_bytes = (w * 3 + 3) & ~3
    payloads = []
    for m in mats:
        raster = np.zeros((h, row_bytes), np.uint8)
        raster[:, :w * 3] = m[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        payloads.append(raster.tobytes())

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    usec = 1_000_000 // fps
    size = row_bytes * h
    avih = struct.pack("<IIIIIIIIIIIIII",
                       usec, size * fps, 0, 0x10,
                       len(payloads), 0, 1, size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"\x00" * 4 + struct.pack("<IHHIIIIIIIII",
            0, 0, 0, 0, 1, fps, 0, len(payloads), size, 0, 0, 0))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", p) for p in payloads))
    idx = bytearray()
    off = 4
    for p in payloads:
        idx += b"00db" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body
