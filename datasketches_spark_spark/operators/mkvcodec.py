"""Matroska / WebM container demux (EBML, RFC 8794 + the public
Matroska element registry) — the second dominant wild a/v container
after MP4, structural parsing without codec tables.

EBML is self-describing (vint element IDs + sizes), so — like the r17
Ogg work and the r18 MP4 work — everything a training-data pipeline
needs is pure container structure:

* ``mkv_info`` — DocType (matroska/webm), duration
  (Info/Duration x TimestampScale), one row per TrackEntry (number,
  type, CodecID, dimensions or channels/rate, block count).
* ``mkv_audio_hash`` / ``mkv_video_hash`` — metadata-invariant
  content identity over the track's BLOCK payloads (SimpleBlock +
  BlockGroup/Block, all four lacing modes reassembled). Codec header
  packets live in ``CodecPrivate`` — never in blocks — so for Opus/
  Vorbis the block payloads are EXACTLY the audio packets
  ``oggcodec.ogg_audio_hash`` hashes: one encode packaged as Ogg and
  as MKV/WebM collapses to ONE hash (the ``.aac`` ↔ ``.m4a``
  precedent, third instance). For H.264/HEVC tracks the hash covers
  VCL NALs parsed from the length-prefixed payloads — collapsing
  with :func:`mp4codec.mp4_video_hash` and raw Annex B of the same
  encode. Tags/Void/attachments never contribute.
* ``mkv_extract_video`` — H.264/HEVC tracks re-expressed as Annex B
  (parameter sets from the CodecPrivate avcC/hvcC record); VP8/VP9
  tracks as raw frame lists.
* ``mkv_frame_sampler`` — the ``sample_frames`` hook: VP8 keyframes
  decode through the SYSTEM libwebp by rewrapping each frame as a
  one-chunk WebP (VP8 bitstreams are identical in both containers);
  H.264 goes through ``h264codec`` (I_PCM), HEVC through the system
  libde265 (``hevcnative``) — every path refuses per payload, never
  aborting the job.
* ``build_mkv`` — deterministic TEST/FIXTURE writer: real EBML
  (header + Segment/Info/Tracks/Cluster/SimpleBlock), all four
  lacing modes, optional Tags + Void padding and a per-cluster
  split — the shapes the reader must be invariant to.

Scale shape: one sequential pass per payload inside the Arrow
worker; only 32-char hex keys shuffle.

Reference parity note: /root/reference (1,856 LoC of sketch-function
registration) has no media handling; this module belongs to the
engine's training-data-pipeline extension surface (SURVEY.md §2,
multimodal columns).
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["is_mkv", "mkv_info", "mkv_audio_hash", "mkv_video_hash",
           "mkv_extract_video", "mkv_subtitle_text",
           "mkv_frame_sampler", "build_mkv",
           "annexb_to_mkv_track", "webp_vp8_payload"]

MAX_INPUT_BYTES = 256 << 20
_MAX_ELEMENTS = 1 << 20

# EBML / Matroska element IDs (marker bit kept, as they appear on wire)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CODEC_PRIVATE = 0x63A2
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLING = 0xB5
_CHANNELS = 0x9F
_LANGUAGE = 0x22B59C
_CLUSTER = 0x1F43B675
_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_TAGS = 0x1254C367
_VOID = 0xEC


# ------------------------------------------------------------- vints

def _read_id(data: bytes, pos: int) -> tuple[int, int]:
    if pos >= len(data):
        raise ValueError("MKV: truncated element ID")
    b0 = data[pos]
    ln = 0
    for i in range(4):
        if b0 & (0x80 >> i):
            ln = i + 1
            break
    if ln == 0 or pos + ln > len(data):
        raise ValueError(f"MKV: bad element ID at byte {pos}")
    return int.from_bytes(data[pos:pos + ln], "big"), pos + ln


def _read_size(data: bytes, pos: int) -> tuple[int | None, int]:
    """EBML size vint (marker stripped). All-ones payload = unknown
    size (streamed Segments/Clusters) -> None."""
    if pos >= len(data):
        raise ValueError("MKV: truncated size vint")
    b0 = data[pos]
    ln = 0
    for i in range(8):
        if b0 & (0x80 >> i):
            ln = i + 1
            break
    if ln == 0 or pos + ln > len(data):
        raise ValueError(f"MKV: bad size vint at byte {pos}")
    val = (b0 & (0xFF >> ln))
    for i in range(1, ln):
        val = (val << 8) | data[pos + i]
    if val == (1 << (7 * ln)) - 1:
        return None, pos + ln          # unknown size
    return val, pos + ln


def _elements(data: bytes, start: int, end: int,
              stop_ids: tuple = ()):
    """Yield ``(elem_id, payload_start, payload_end)`` over
    ``data[start:end]``. Unknown-size elements extend to the next
    ``stop_ids`` sibling (or to ``end``) — the streamed-file shape."""
    pos = start
    n = 0
    while pos < end:
        eid, pos = _read_id(data, pos)
        size, pos = _read_size(data, pos)
        if size is None:
            # streamed shape: a Segment extends to the container end;
            # an unknown-size Cluster (or anything else) ends where
            # the next Cluster starts
            pe = end
            if eid != _SEGMENT:
                scan = pos
                while scan < end - 3:
                    if data[scan:scan + 4] == b"\x1f\x43\xb6\x75":
                        pe = scan
                        break
                    scan += 1
            yield eid, pos, pe
            pos = pe
        else:
            if pos + size > end:
                raise ValueError(
                    f"MKV: element 0x{eid:X} overruns its container")
            yield eid, pos, pos + size
            pos += size
        n += 1
        if n > _MAX_ELEMENTS:
            raise ValueError("MKV: element count guard exceeded")


def _child(data: bytes, start: int, end: int, eid: int):
    for i, ps, pe in _elements(data, start, end):
        if i == eid:
            return ps, pe
    return None


def _uint(data: bytes, ps: int, pe: int) -> int:
    return int.from_bytes(data[ps:pe], "big")


def _float(data: bytes, ps: int, pe: int) -> float:
    if pe - ps == 4:
        return struct.unpack(">f", data[ps:pe])[0]
    if pe - ps == 8:
        return struct.unpack(">d", data[ps:pe])[0]
    raise ValueError("MKV: bad float width")


def is_mkv(data: bytes) -> bool:
    """EBML magic at offset 0 (matroska and webm both)."""
    return bytes(data[:4]) == b"\x1a\x45\xdf\xa3"


# ------------------------------------------------------------- reader

def _segment(data: bytes) -> tuple[int, int]:
    for eid, ps, pe in _elements(data, 0, len(data)):
        if eid == _SEGMENT:
            return ps, pe
    raise ValueError("MKV: no Segment element")


def _parse_tracks(data: bytes, sps: int, spe: int) -> list[dict]:
    tr = _child(data, sps, spe, _TRACKS)
    if tr is None:
        raise ValueError("MKV: no Tracks element")
    out = []
    for eid, ps, pe in _elements(data, tr[0], tr[1]):
        if eid != _TRACK_ENTRY:
            continue
        t: dict = {}
        for cid, cs, ce in _elements(data, ps, pe):
            if cid == _TRACK_NUMBER:
                t["number"] = _uint(data, cs, ce)
            elif cid == _TRACK_TYPE:
                t["type"] = {1: "video", 2: "audio",
                             17: "subtitle"}.get(
                    _uint(data, cs, ce), "other")
            elif cid == _CODEC_ID:
                t["codec_id"] = data[cs:ce].decode("latin-1")
            elif cid == _CODEC_PRIVATE:
                t["codec_private"] = data[cs:ce]
            elif cid == _LANGUAGE:
                t["lang"] = data[cs:ce].decode("latin-1")
            elif cid == _VIDEO:
                for vid, vs, ve in _elements(data, cs, ce):
                    if vid == _PIXEL_W:
                        t["width"] = _uint(data, vs, ve)
                    elif vid == _PIXEL_H:
                        t["height"] = _uint(data, vs, ve)
            elif cid == _AUDIO:
                for aid, as_, ae in _elements(data, cs, ce):
                    if aid == _SAMPLING:
                        t["sample_rate"] = int(_float(data, as_, ae))
                    elif aid == _CHANNELS:
                        t["channels"] = _uint(data, as_, ae)
        if "number" in t:
            out.append(t)
    if not out:
        raise ValueError("MKV: Tracks has no TrackEntry")
    return out


def _block_frames(data: bytes, ps: int, pe: int):
    """(track_number, [frame bytes...]) for one (Simple)Block —
    all four lacing modes (§ Matroska block structure)."""
    tn, pos = _read_size(data, ps)     # track number is a plain vint
    if tn is None:
        raise ValueError("MKV: block with unknown-size track number")
    pos += 2                           # relative timestamp (s16)
    if pos >= pe:
        raise ValueError("MKV: truncated block header")
    flags = data[pos]
    pos += 1
    lacing = (flags >> 1) & 0x3
    if lacing == 0:
        return tn, [data[pos:pe]]
    nframes = data[pos] + 1
    pos += 1
    sizes: list[int] = []
    if lacing == 2:                    # fixed: equal sizes
        total = pe - pos
        if total % nframes:
            raise ValueError("MKV: fixed lacing with uneven payload")
        sizes = [total // nframes] * nframes
    elif lacing == 1:                  # Xiph: 255-run bytes
        for _ in range(nframes - 1):
            sz = 0
            while True:
                b = data[pos]
                pos += 1
                sz += b
                if b != 255:
                    break
            sizes.append(sz)
        sizes.append(pe - pos - sum(sizes))
    else:                              # EBML: first vint, then deltas
        first, pos = _read_size(data, pos)
        if first is None:
            raise ValueError("MKV: EBML lacing with unknown size")
        sizes.append(first)
        for _ in range(nframes - 2):
            raw_start = pos
            val, pos = _read_size(data, pos)
            if val is None:
                raise ValueError("MKV: EBML lacing delta unknown")
            ln = pos - raw_start
            delta = val - ((1 << (7 * ln - 1)) - 1)
            sizes.append(sizes[-1] + delta)
        sizes.append(pe - pos - sum(sizes))
    frames = []
    for sz in sizes:
        if sz < 0 or pos + sz > pe:
            raise ValueError("MKV: laced frame overruns its block")
        frames.append(data[pos:pos + sz])
        pos += sz
    return tn, frames


def _track_payloads(data: bytes, track_number: int) -> list[bytes]:
    """Every block frame of one track, in cluster order."""
    sps, spe = _segment(data)
    out: list[bytes] = []
    for eid, ps, pe in _elements(data, sps, spe):
        if eid != _CLUSTER:
            continue
        for cid, cs, ce in _elements(data, ps, pe):
            if cid == _SIMPLE_BLOCK:
                tn, frames = _block_frames(data, cs, ce)
            elif cid == _BLOCK_GROUP:
                blk = _child(data, cs, ce, _BLOCK)
                if blk is None:
                    continue
                tn, frames = _block_frames(data, blk[0], blk[1])
            else:
                continue
            if tn == track_number:
                out.extend(frames)
    return out


def mkv_info(data: bytes) -> dict:
    """Container summary: ``{doctype, duration_s, n_tracks, tracks:
    [{number, type, codec_id, n_blocks, payload_bytes,
    bitrate_kbps, width/height | channels/sample_rate | lang}],
    has_tags}``. Pure structure — the per-track payload totals give
    audio/video quality filtering with no decode (the ``ogg_info``
    packet-stats parity)."""
    data = bytes(data)
    if not is_mkv(data):
        raise ValueError("not an EBML/Matroska payload")
    if len(data) > MAX_INPUT_BYTES:
        raise ValueError("MKV exceeds the input size guard")
    hdr = _child(data, 0, len(data), _EBML)
    doctype = "matroska"
    if hdr:
        dt = _child(data, hdr[0], hdr[1], _DOCTYPE)
        if dt:
            doctype = data[dt[0]:dt[1]].decode("latin-1")
    sps, spe = _segment(data)
    ts_scale = 1_000_000
    duration = None
    info = _child(data, sps, spe, _INFO)
    if info:
        sc = _child(data, info[0], info[1], _TS_SCALE)
        if sc:
            ts_scale = _uint(data, sc[0], sc[1])
        du = _child(data, info[0], info[1], _DURATION)
        if du:
            duration = round(_float(data, du[0], du[1])
                             * ts_scale / 1e9, 3)
    tracks = _parse_tracks(data, sps, spe)
    rows = []
    for t in tracks:
        row = {k: t[k] for k in ("number", "type", "codec_id",
                                 "width", "height", "channels",
                                 "sample_rate", "lang") if k in t}
        payloads = _track_payloads(data, t["number"])
        row["n_blocks"] = len(payloads)
        row["payload_bytes"] = sum(len(p) for p in payloads)
        if duration and row["payload_bytes"]:
            # the ogg_info parity: quality filtering with no decode
            row["bitrate_kbps"] = round(
                row["payload_bytes"] * 8 / duration / 1000, 1)
        rows.append(row)
    return {"doctype": doctype, "duration_s": duration,
            "n_tracks": len(rows), "tracks": rows,
            "has_tags": _child(data, sps, spe, _TAGS) is not None}


def _first_track(data: bytes, ttype: str) -> dict:
    sps, spe = _segment(data)
    for t in _parse_tracks(data, sps, spe):
        if t.get("type") == ttype:
            return t
    raise ValueError(f"MKV: no {ttype} track")


def mkv_audio_hash(data: bytes) -> str:
    """Tag-invariant audio content identity: md5 over the first audio
    track's block payloads in cluster order. Codec headers live in
    CodecPrivate (excluded by construction), so for Opus/Vorbis this
    equals :func:`oggcodec.ogg_audio_hash` of the same packets in an
    Ogg — cross-container collapse with no decode."""
    data = bytes(data)
    t = _first_track(data, "audio")
    h = hashlib.md5()
    for frame in _track_payloads(data, t["number"]):
        h.update(frame)
    return h.hexdigest()


def mkv_video_hash(data: bytes) -> str:
    """Metadata-invariant video content identity: for H.264/HEVC
    tracks, md5 over the VCL NAL bytes parsed from the
    length-prefixed block payloads — EQUAL to
    :func:`mp4codec.mp4_video_hash` / :func:`mp4codec.
    video_content_hash` of the same encode in MP4 or raw Annex B.
    For VP8/VP9 (and anything else), md5 over the raw frame
    payloads (the VP8 bitstream has no container-varying framing)."""
    from .mp4codec import _is_vcl
    data = bytes(data)
    t = _first_track(data, "video")
    cid = t.get("codec_id", "")
    h = hashlib.md5()
    if cid in ("V_MPEG4/ISO/AVC", "V_MPEGH/ISO/HEVC"):
        codec = "h264" if cid.endswith("AVC") else "hevc"
        from .mp4codec import _config_nals
        _, lsize = _config_nals(
            "avcC" if codec == "h264" else "hvcC",
            t.get("codec_private", b""))
        for payload in _track_payloads(data, t["number"]):
            pos = 0
            while pos < len(payload):
                ln = int.from_bytes(payload[pos:pos + lsize], "big")
                pos += lsize
                nal = payload[pos:pos + ln]
                pos += ln
                if _is_vcl(nal, codec):
                    h.update(nal)
    else:
        for frame in _track_payloads(data, t["number"]):
            h.update(frame)
    return h.hexdigest()


_ASS_TAGS = None        # compiled lazily (module import stays cheap)


def mkv_subtitle_text(data: bytes) -> dict:
    """Subtitle text out of the first subtitle track — video
    containers are a real crawl TEXT source (dialog transcripts):
    ``{"text", "cues", "codec_id", "lang"}``. S_TEXT/UTF8 (the
    SRT-in-Matroska mapping) cues are the block payloads verbatim;
    S_TEXT/ASS cues are the 9th+ comma field of the Dialogue line
    (ReadOrder,Layer,Style,Name,4x margins/effect,Text — the public
    ASS-in-Matroska mapping) with ``{...}`` override tags stripped
    and ``\\N``/``\\n`` soft breaks as newlines. Other S_ codecs
    (VobSub bitmaps etc.) refuse loudly — OCR is out of scope."""
    global _ASS_TAGS
    data = bytes(data)
    t = _first_track(data, "subtitle")
    cid = t.get("codec_id", "")
    cues = []
    for frame in _track_payloads(data, t["number"]):
        if cid == "S_TEXT/UTF8":
            cues.append(frame.decode("utf-8", "replace").strip())
        elif cid == "S_TEXT/ASS":
            parts = frame.decode("utf-8", "replace").split(",", 8)
            if len(parts) < 9:
                continue
            if _ASS_TAGS is None:
                import re
                _ASS_TAGS = re.compile(r"\{[^}]*\}")
            cues.append(_ASS_TAGS.sub("", parts[8])
                        .replace("\\N", "\n").replace("\\n", "\n")
                        .strip())
        else:
            raise NotImplementedError(
                f"MKV subtitle codec '{cid}': text extraction covers "
                "S_TEXT/UTF8 and S_TEXT/ASS; bitmap subtitles "
                "(S_VOBSUB, S_HDMV/PGS) would need OCR")
    return {"text": "\n".join(c for c in cues if c),
            "cues": len(cues), "codec_id": cid,
            "lang": t.get("lang", "und")}


def mkv_extract_video(data: bytes) -> dict:
    """The first video track re-expressed for decode:
    ``{"codec": "h264"|"hevc", "annexb": bytes}`` for NAL codecs
    (CodecPrivate parameter sets first), or ``{"codec": "vp8"|...,
    "frames": [bytes...]}`` for frame-oriented codecs."""
    data = bytes(data)
    t = _first_track(data, "video")
    cid = t.get("codec_id", "")
    if cid in ("V_MPEG4/ISO/AVC", "V_MPEGH/ISO/HEVC"):
        from .mp4codec import _config_nals
        codec = "h264" if cid.endswith("AVC") else "hevc"
        nals, lsize = _config_nals(
            "avcC" if codec == "h264" else "hvcC",
            t.get("codec_private", b""))
        out = bytearray()
        for n in nals:
            out += b"\x00\x00\x00\x01" + n
        for payload in _track_payloads(data, t["number"]):
            pos = 0
            while pos < len(payload):
                ln = int.from_bytes(payload[pos:pos + lsize], "big")
                pos += lsize
                out += b"\x00\x00\x00\x01" + payload[pos:pos + ln]
                pos += ln
        return {"codec": codec, "annexb": bytes(out)}
    name = {"V_VP8": "vp8", "V_VP9": "vp9", "V_AV1": "av1"}.get(
        cid, cid or "unknown")
    return {"codec": name,
            "frames": _track_payloads(data, t["number"])}


def _vp8_as_webp(frame: bytes) -> bytes:
    """Wrap one VP8 keyframe bitstream as a single-chunk WebP — the
    VP8 payload is IDENTICAL in WebP and WebM (RFC 6386 §19 /
    WebP container spec), so the system libwebp decodes it."""
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def mkv_frame_sampler(raw: bytes, num_frames: int) -> list[bytes]:
    """``sample_frames`` hook for Matroska/WebM payloads: VP8
    keyframes decode through the system libwebp (rewrapped as WebP),
    H.264 through ``h264codec`` (I_PCM subset), HEVC through the
    system libde265. Raises for payloads it cannot decode;
    ``sample_frames`` turns that into zero rows, never a task
    abort."""
    import numpy as np
    v = mkv_extract_video(raw)
    if v["codec"] == "h264":
        from .h264codec import h264_frame_sampler
        return h264_frame_sampler(v["annexb"], num_frames)
    if v["codec"] == "hevc":
        from .hevcnative import hevc_frame_sampler
        return hevc_frame_sampler(v["annexb"], num_frames)
    if v["codec"] != "vp8":
        raise NotImplementedError(
            f"MKV video codec '{v['codec']}': decodable codecs here "
            "are VP8 (libwebp), H.264 I_PCM, HEVC (libde265); use "
            "mkv_video_hash for identity without decode")
    from .imagecodec import encode_ppm
    from .webpcodec import decode_webp
    frames = v["frames"]
    # keyframes only: a VP8 interframe's first header bit is 1
    keys = [f for f in frames if f and not (f[0] & 0x1)]
    if not keys:
        raise ValueError("MKV: VP8 track has no keyframes")
    if num_frames < len(keys):
        idx = np.linspace(0, len(keys) - 1,
                          num_frames).round().astype(int)
        keys = [keys[i] for i in idx]
    return [encode_ppm(decode_webp(_vp8_as_webp(f))) for f in keys]


# ------------------------------------------------------------- writer

def _vint_id(eid: int) -> bytes:
    ln = (eid.bit_length() + 7) // 8
    return eid.to_bytes(ln, "big")


def _vint_size(val: int) -> bytes:
    for ln in range(1, 9):
        if val < (1 << (7 * ln)) - 1:
            return ((1 << (7 * ln)) | val).to_bytes(ln, "big")
    raise ValueError("size too large for a vint")


def _el(eid: int, payload: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(payload)) + payload


def _el_uint(eid: int, val: int) -> bytes:
    ln = max((val.bit_length() + 7) // 8, 1)
    return _el(eid, val.to_bytes(ln, "big"))


def _simple_block(track: int, ts: int, frames: list[bytes],
                  lacing: str) -> bytes:
    body = bytearray(_vint_size(track))
    body += struct.pack(">h", ts)
    if lacing == "none" or len(frames) == 1:
        body += b"\x80"                      # keyframe, no lacing
        body += frames[0]
        return bytes(_el(_SIMPLE_BLOCK, bytes(body)))
    if lacing == "xiph":
        body += bytes([0x80 | 0x02, len(frames) - 1])
        for f in frames[:-1]:
            sz = len(f)
            while sz >= 255:
                body += b"\xff"
                sz -= 255
            body += bytes([sz])
    elif lacing == "fixed":
        if len({len(f) for f in frames}) != 1:
            raise ValueError("fixed lacing needs equal frame sizes")
        body += bytes([0x80 | 0x04, len(frames) - 1])
    elif lacing == "ebml":
        body += bytes([0x80 | 0x06, len(frames) - 1])
        body += _vint_size(len(frames[0]))
        for i in range(1, len(frames) - 1):
            delta = len(frames[i]) - len(frames[i - 1])
            # signed vint, 2-byte form covers +-8190
            body += ((1 << 14) | (delta + (1 << 13) - 1)).to_bytes(
                2, "big")
    else:
        raise ValueError("lacing: none|xiph|fixed|ebml")
    for f in frames:
        body += f
    return bytes(_el(_SIMPLE_BLOCK, bytes(body)))


def webp_vp8_payload(webp: bytes) -> bytes:
    """The raw VP8 frame bitstream out of a (lossy) WebP file —
    fixture plumbing for WebM VP8 tracks, the inverse of
    :func:`_vp8_as_webp`: the VP8 payload is byte-identical in the
    WebP and WebM containers, so system-libwebp encodes
    (``webpnative.webp_encode_rgb``) become real WebM video frames."""
    webp = bytes(webp)
    if webp[:4] != b"RIFF" or webp[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos:pos + 4]
        ln = struct.unpack("<I", webp[pos + 4:pos + 8])[0]
        if tag == b"VP8 ":
            return webp[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    raise ValueError("WebP has no lossy 'VP8 ' chunk")


def annexb_to_mkv_track(annexb: bytes) -> tuple[str, bytes,
                                                list[bytes]]:
    """``(codec_id, codec_private, block payloads)`` from an Annex B
    H.264/HEVC stream — fixture plumbing for NAL-codec MKV tracks
    (parameter sets go to CodecPrivate as an avcC/hvcC record, each
    VCL NAL becomes one length-prefixed block payload, the Matroska
    storage convention)."""
    from .h264codec import _split_nals
    from .mp4codec import (_avcc_record, _hvcc_record, _is_vcl,
                           _looks_annexb_hevc)
    annexb = bytes(annexb)
    hevc = _looks_annexb_hevc(annexb)
    ps, payloads = [], []
    seen: set[bytes] = set()
    for nal in _split_nals(annexb):
        if _is_vcl(nal, "hevc" if hevc else "h264"):
            payloads.append(struct.pack(">I", len(nal)) + nal)
        elif bytes(nal) not in seen:
            seen.add(bytes(nal))
            ps.append(nal)
    if not payloads:
        raise ValueError("annexb stream has no VCL NALs")
    if hevc:
        return "V_MPEGH/ISO/HEVC", _hvcc_record(ps), payloads
    sps = [n for n in ps if n[0] & 0x1F == 7]
    pps = [n for n in ps if n[0] & 0x1F == 8]
    if not sps or not pps:
        raise ValueError("H.264 annexb without SPS/PPS")
    return "V_MPEG4/ISO/AVC", _avcc_record(sps, pps), payloads


def build_mkv(video_frames: list[bytes] | None = None,
              video_codec: str = "V_VP8",
              video_private: bytes | None = None,
              video_dims: tuple[int, int] = (0, 0),
              audio_payloads: list[bytes] | None = None,
              audio_codec: str = "A_OPUS",
              audio_rate: int = 48000, audio_channels: int = 2,
              subtitle_cues: list[bytes] | None = None,
              subtitle_codec: str = "S_TEXT/UTF8",
              subtitle_lang: str = "und",
              tags: bytes = b"", lacing: str = "none",
              per_cluster: int = 4, void_pad: int = 0,
              doctype: str = "webm",
              tag_fields: dict | None = None,
              attachments: list[tuple[str, str, bytes]]
              | None = None) -> bytes:
    """TEST/FIXTURE writer: a structurally valid Matroska/WebM file.
    ``video_frames`` become one video track's blocks (real VP8
    keyframes from ``webpnative.webp_encode_rgb`` make the decode
    path real); ``audio_payloads`` one audio track's (feed the same
    list to ``oggcodec``'s packets for the cross-container pair).
    ``subtitle_cues`` become an S_TEXT track whose blocks are
    written as BlockGroup/Block + BlockDuration (the real-muxer
    shape for cues, exercising the non-SimpleBlock read path).
    Layout knobs exercise reader invariance: ``tags`` (a Tags
    element), ``lacing`` (none/xiph/fixed/ebml), ``per_cluster``
    (blocks per Cluster), ``void_pad`` (a Void element between
    clusters)."""
    if video_frames is None and audio_payloads is None \
            and subtitle_cues is None:
        raise ValueError("build_mkv needs at least one track")
    header = _el(_EBML,
                 _el_uint(0x4286, 1)           # EBMLVersion
                 + _el_uint(0x42F7, 1)         # EBMLReadVersion
                 + _el_uint(0x42F2, 4)         # EBMLMaxIDLength
                 + _el_uint(0x42F3, 8)         # EBMLMaxSizeLength
                 + _el(_DOCTYPE, doctype.encode())
                 + _el_uint(0x4287, 2)         # DocTypeVersion
                 + _el_uint(0x4285, 2))        # DocTypeReadVersion
    entries = b""
    n_blocks = 0
    if video_frames is not None:
        e = (_el_uint(_TRACK_NUMBER, 1) + _el_uint(0x73C5, 1)
             + _el_uint(_TRACK_TYPE, 1)
             + _el(_CODEC_ID, video_codec.encode())
             + _el(_VIDEO, _el_uint(_PIXEL_W, video_dims[0])
                   + _el_uint(_PIXEL_H, video_dims[1])))
        if video_private:
            e += _el(_CODEC_PRIVATE, video_private)
        entries += _el(_TRACK_ENTRY, e)
        n_blocks = max(n_blocks, len(video_frames))
    if audio_payloads is not None:
        e = (_el_uint(_TRACK_NUMBER, 2) + _el_uint(0x73C5, 2)
             + _el_uint(_TRACK_TYPE, 2)
             + _el(_CODEC_ID, audio_codec.encode())
             + _el(_AUDIO,
                   _el(_SAMPLING, struct.pack(">f", audio_rate))
                   + _el_uint(_CHANNELS, audio_channels)))
        entries += _el(_TRACK_ENTRY, e)
        n_blocks = max(n_blocks, len(audio_payloads))
    if subtitle_cues is not None:
        e = (_el_uint(_TRACK_NUMBER, 3) + _el_uint(0x73C5, 3)
             + _el_uint(_TRACK_TYPE, 17)
             + _el(_CODEC_ID, subtitle_codec.encode())
             + _el(_LANGUAGE, subtitle_lang.encode()))
        entries += _el(_TRACK_ENTRY, e)
        n_blocks = max(n_blocks, len(subtitle_cues))
    info = _el(_INFO, _el_uint(_TS_SCALE, 1_000_000)
               + _el(_DURATION,
                     struct.pack(">d", float(n_blocks * 40)))
               + _el(0x4D80, b"dss-engine")    # MuxingApp
               + _el(0x5741, b"dss-engine"))   # WritingApp
    body = info + _el(_TRACKS, entries)

    clusters = b""
    vids = list(video_frames or [])
    auds = list(audio_payloads or [])
    subs = list(subtitle_cues or [])
    ci = 0
    while vids or auds or subs:
        cb = _el_uint(_TIMESTAMP, ci * per_cluster * 40)
        vc = vids[:per_cluster]
        del vids[:per_cluster]
        for j, f in enumerate(vc):
            cb += _simple_block(1, j * 40, [bytes(f)], "none")
        ac = auds[:per_cluster]
        del auds[:per_cluster]
        if ac:
            if lacing == "none":
                for j, f in enumerate(ac):
                    cb += _simple_block(2, j * 40, [bytes(f)], "none")
            else:
                cb += _simple_block(2, 0, [bytes(f) for f in ac],
                                    lacing)
        sc = subs[:per_cluster]
        del subs[:per_cluster]
        for j, f in enumerate(sc):
            # real muxers write subtitle cues as BlockGroup/Block (a
            # cue has a duration); exercise the BlockGroup read path
            cb += _el(_BLOCK_GROUP,
                      _el(_BLOCK, bytes(_vint_size(3))
                          + struct.pack(">h", j * 40) + b"\x00"
                          + bytes(f))
                      + _el_uint(0x9B, 40))          # BlockDuration
        clusters += _el(_CLUSTER, cb)
        if void_pad:
            clusters += _el(_VOID, b"\x00" * void_pad)
        ci += 1
    if tags or tag_fields:
        # uniform-key names -> the official tagging-registry names
        inv = {"title": b"TITLE", "artist": b"ARTIST",
               "album": b"ALBUM", "date": b"DATE_RELEASED",
               "genre": b"GENRE", "comment": b"COMMENT",
               "software": b"ENCODER", "copyright": b"COPYRIGHT"}
        sts = b""
        if tags:
            sts += _el(0x67C8, _el(0x45A3, b"TITLE")
                       + _el(0x4487, tags))
        for k, v in sorted((tag_fields or {}).items()):
            sts += _el(0x67C8, _el(0x45A3, inv[k])
                       + _el(0x4487, str(v).encode()))
        body += _el(_TAGS, _el(0x7373, sts))
    if attachments:
        # Attachments/AttachedFile: FileName + FileMediaType +
        # FileData + the mandatory FileUID (matroska.org §4.1.10)
        afs = b""
        for uid, (name, mime, payload) in enumerate(attachments, 1):
            afs += _el(0x61A7,
                       _el(0x466E, name.encode())
                       + _el(0x4660, mime.encode())
                       + _el(0x465C, bytes(payload))
                       + _el_uint(0x46AE, uid))
        body += _el(0x1941A469, afs)
    return header + _el(_SEGMENT, body + clusters)
