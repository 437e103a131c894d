"""Embedded media metadata extraction — EXIF, ID3, Vorbis comments,
PNG text chunks, RIFF INFO — as ONE uniform record.

Curation and provenance for a multimodal crawl need the metadata the
files themselves carry: who/what produced an image (EXIF Make/Model/
Software), when (DateTimeOriginal), whether it embeds a GPS fix (a
PII signal the redaction chain must see), and the title/artist/album
tags on audio. Every family stores this differently; this module
parses each from the raw container bytes and maps them onto one
nullable record so pipelines filter and redact with ordinary Column
predicates.

Formats (all public specs): EXIF/TIFF IFDs (CIPA DC-008 / TIFF 6.0 —
JPEG APP1 ``Exif\\0\\0`` payloads and bare TIFF files share the
structure), JPEG ``COM`` segments, ID3v2.2/2.3/2.4 (id3.org informal
standard: syncsafe sizes, text-frame encodings 0-3, COMM language
frames) and the ID3v1 trailer, the Vorbis comment spec (FLAC
``VORBIS_COMMENT`` blocks, Ogg ``OpusTags`` / ``\\x03vorbis``
packets — one parser, three carriers), PNG ``tEXt``/``zTXt``/
``iTXt`` chunks (ISO 15948 §11.3.4), and RIFF ``LIST``/``INFO``
subchunks. The reference engine has no metadata extraction (its
``src/main`` is sketch SQL bindings); this belongs to the engine's
multimodal curation surface, same family as ``mime.py``.

Scale shape: one bounded pass per payload inside the Arrow batch
(``multimodal.py::extract_media_metadata``); no decode, no shuffle.
Unrecognized payloads refuse loudly (ValueError) and become all-null
rows under the operator's loud-null contract. IFD/frame walks are
bounds-checked and entry-capped — a malformed file can't loop or
over-read.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "media_metadata", "exif_info", "id3_info", "vorbis_comment_info",
    "png_text_info", "riff_info", "pdf_meta_info", "mkv_tags_info",
    "mp4_tags_info", "media_lyrics", "cover_art", "flac_add_picture",
    "ogg_cover_comment", "build_exif_app1", "jpeg_add_exif",
    "jpeg_add_xmp", "build_id3v2", "png_add_text", "png_add_exif",
    "wav_add_info", "webp_add_metadata", "pdf_with_info",
    "META_KEYS",
]

# The uniform record: every parser returns exactly these keys
# (None where the format has no value).
META_KEYS = ("kind", "title", "artist", "album", "date", "software",
             "genre", "comment", "copyright", "make", "model",
             "orientation", "has_gps", "n_fields")

_MAX_IFD_ENTRIES = 512           # bomb guard for IFD/frame walks


def _blank(kind: str) -> dict:
    d = {k: None for k in META_KEYS}
    d["kind"] = kind
    d["n_fields"] = 0
    return d


# ------------------------------------------------------------- EXIF

# IFD0 / Exif-IFD tags -> uniform keys (TIFF 6.0 / CIPA DC-008)
_EXIF_TAGS = {
    0x010E: "title",            # ImageDescription
    0x010F: "make",
    0x0110: "model",
    0x0131: "software",
    0x0132: "date",             # DateTime (overridden by 0x9003)
    0x013B: "artist",
    0x8298: "copyright",
}


def _parse_ifd(data: bytes, bo: str, off: int, out: dict,
               depth: int = 0) -> None:
    if depth > 2 or off + 2 > len(data):
        return
    (n,) = struct.unpack_from(bo + "H", data, off)
    n = min(n, _MAX_IFD_ENTRIES)
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            return
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        val = data[e + 8:e + 12]
        if typ == 2:                       # ASCII
            if cnt <= 4:
                raw = val[:cnt]
            else:
                (p,) = struct.unpack_from(bo + "I", val, 0)
                if p + cnt > len(data):
                    continue
                raw = data[p:p + cnt]
            text = raw.split(b"\x00", 1)[0].decode(
                "utf-8", "replace").strip()
            if tag == 0x9003:              # DateTimeOriginal
                out["_dto"] = text
            else:
                key = _EXIF_TAGS.get(tag)
                if key and text:
                    out[key] = text
                    out["n_fields"] += 1
        elif typ == 3 and tag == 0x0112:   # Orientation, SHORT
            out["orientation"] = struct.unpack_from(bo + "H", val)[0]
            out["n_fields"] += 1
        elif typ == 4 and tag in (0x8769, 0x8825):
            (p,) = struct.unpack_from(bo + "I", val, 0)
            if tag == 0x8769:              # Exif IFD
                sub: dict = {"n_fields": 0}
                _parse_ifd(data, bo, p, sub, depth + 1)
                # DateTimeOriginal read via the shared table? no —
                # it has its own tag; handle below
                if sub.get("_dto"):
                    out["date"] = sub["_dto"]
                    out["n_fields"] += 1
            else:                          # GPS IFD: presence only
                if p + 2 <= len(data):
                    (gn,) = struct.unpack_from(bo + "H", data, p)
                    tags = set()
                    for j in range(min(gn, _MAX_IFD_ENTRIES)):
                        ge = p + 2 + 12 * j
                        if ge + 2 > len(data):
                            break
                        tags.add(struct.unpack_from(
                            bo + "H", data, ge)[0])
                    # GPSLatitude (2) + GPSLongitude (4)
                    out["has_gps"] = bool({2, 4} <= tags)
                    if out["has_gps"]:
                        out["n_fields"] += 1


def _parse_tiff_meta(tiff: bytes) -> dict:
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("EXIF: not a TIFF structure")
    if struct.unpack_from(bo + "H", tiff, 2)[0] != 42:
        raise ValueError("EXIF: bad TIFF magic number")
    out = _blank("exif")
    if out.get("has_gps") is None:
        out["has_gps"] = False
    (ifd0,) = struct.unpack_from(bo + "I", tiff, 4)
    _parse_ifd(tiff, bo, ifd0, out)
    out.pop("_dto", None)
    return out


def exif_info(data: bytes) -> dict:
    """EXIF out of a JPEG (the APP1 ``Exif\\0\\0`` segment; ``COM``
    segments land in ``comment``) or a bare TIFF file. ``has_gps``
    reports whether the GPS IFD carries an actual latitude+longitude
    fix — the PII routing signal. ``date`` prefers
    DateTimeOriginal over the file-modification DateTime."""
    data = bytes(data)
    if data[:2] == b"\xff\xd8":            # JPEG segment walk
        out = None
        comment = None
        xmp = None
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xDA:             # SOS: entropy data follows
                break
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            seg = data[pos + 4:pos + 2 + seglen]
            if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
                try:
                    out = _parse_tiff_meta(seg[6:])
                except ValueError:
                    pass
            elif marker == 0xE1 and seg.startswith(_XMP_HEADER):
                xmp = seg[len(_XMP_HEADER):]
            elif marker == 0xFE and seg:   # COM
                comment = seg.decode("utf-8", "replace").strip()
            pos += 2 + seglen
        if out is None:
            out = _blank("exif")
            out["has_gps"] = False
        if comment:
            out["comment"] = comment
            out["n_fields"] += 1
        if xmp:
            _merge_xmp(xmp, out)
        return out
    if data[:2] in (b"II", b"MM"):
        return _parse_tiff_meta(data)
    raise ValueError("exif_info: not a JPEG or TIFF payload")


# -------------------------------------------------------------- ID3

_ID3_FRAMES = {                  # v2.3/v2.4 ids and v2.2 ids
    "TIT2": "title", "TT2": "title",
    "TPE1": "artist", "TP1": "artist",
    "TALB": "album", "TAL": "album",
    "TDRC": "date", "TYER": "date", "TYE": "date",
    "TCON": "genre", "TCO": "genre",
    "TSSE": "software", "TSS": "software",
    "TCOP": "copyright", "TCR": "copyright",
}
_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be",
                  3: "utf-8"}


def _id3_text(payload: bytes) -> str:
    if not payload:
        return ""
    enc = _ID3_ENCODINGS.get(payload[0], "latin-1")
    return payload[1:].decode(enc, "replace").split("\x00", 1)[0] \
        .strip()


def _syncsafe(b: bytes) -> int:
    return ((b[0] & 0x7F) << 21) | ((b[1] & 0x7F) << 14) \
        | ((b[2] & 0x7F) << 7) | (b[3] & 0x7F)


def _id3_frames(data: bytes):
    """Yield ``(version, frame_id, payload)`` over an ID3v2 tag —
    the shared walk behind :func:`id3_info` and :func:`cover_art`:
    tag-level unsynchronisation undone, extended header skipped,
    compressed/encrypted frames dropped, v2.4 per-frame unsync and
    data-length indicator reversed."""
    if data[:3] != b"ID3" or len(data) < 10:
        return
    ver = data[3]
    flags = data[5]
    size = _syncsafe(data[6:10])
    body = data[10:10 + size]
    if flags & 0x80:                       # unsynchronisation
        body = body.replace(b"\xff\x00", b"\xff")
    pos = 0
    if flags & 0x40:                       # extended header
        if ver >= 4:
            pos += _syncsafe(body[0:4])
        else:
            pos += 4 + struct.unpack_from(">I", body, 0)[0]
    idlen = 3 if ver <= 2 else 4
    for _ in range(_MAX_IFD_ENTRIES):
        if pos + idlen * 2 > len(body) or body[pos] == 0:
            break
        fid = body[pos:pos + idlen].decode("latin-1")
        fflags = 0
        if ver <= 2:
            fsz = int.from_bytes(body[pos + 3:pos + 6], "big")
            hdr = 6
        else:
            raw = body[pos + 4:pos + 8]
            fsz = _syncsafe(raw) if ver >= 4 \
                else struct.unpack(">I", raw)[0]
            fflags = body[pos + 9] if pos + 10 <= len(body) else 0
            hdr = 10
        payload = body[pos + hdr:pos + hdr + fsz]
        pos += hdr + fsz
        # format flags: compressed (v3 0x80 / v4 0x08) or encrypted
        # (v3 0x40 / v4 0x04) frames would decode to garbage — skip
        # them rather than yield noise; v4 per-frame unsync (0x02)
        # and the data-length indicator (0x01) are reversible
        if ver == 3 and fflags & 0xC0:
            continue
        if ver >= 4:
            if fflags & 0x0C:
                continue
            if fflags & 0x02:
                payload = payload.replace(b"\xff\x00", b"\xff")
            if fflags & 0x01 and len(payload) >= 4:
                payload = payload[4:]
        yield ver, fid, payload


def id3_info(data: bytes) -> dict:
    """ID3v2.2/2.3/2.4 text frames (+ COMM comments) from the head of
    an MPEG audio stream, falling back to the 128-byte ID3v1 trailer
    when no v2 tag exists. Unsynchronised tags are de-unsynchronised
    first (v2 §5)."""
    data = bytes(data)
    out = _blank("id3")
    if data[:3] == b"ID3" and len(data) >= 10:
        for _ver, fid, payload in _id3_frames(data):
            key = _ID3_FRAMES.get(fid)
            if key:
                text = _id3_text(payload)
                if text:
                    out[key] = text
                    out["n_fields"] += 1
            elif fid in ("COMM", "COM") and len(payload) > 4:
                enc = _ID3_ENCODINGS.get(payload[0], "latin-1")
                rest = payload[4:].decode(enc, "replace")
                # short-description \0 full-text
                parts = rest.split("\x00", 1)
                text = (parts[1] if len(parts) > 1 else parts[0]) \
                    .strip("\x00").strip()
                if text:
                    out["comment"] = text
                    out["n_fields"] += 1
        return out
    if len(data) >= 128 and data[-128:-125] == b"TAG":
        t = data[-128:]
        for key, sl in (("title", slice(3, 33)),
                        ("artist", slice(33, 63)),
                        ("album", slice(63, 93)),
                        ("date", slice(93, 97))):
            v = t[sl].split(b"\x00", 1)[0].decode(
                "latin-1").strip()
            if v:
                out[key] = v
                out["n_fields"] += 1
        return out
    raise ValueError("id3_info: no ID3v2 header or ID3v1 trailer")


# -------------------------------------------- Vorbis comments (×3)

_VC_KEYS = {"title": "title", "artist": "artist", "album": "album",
            "date": "date", "genre": "genre", "comment": "comment",
            "description": "comment", "encoder": "software",
            "copyright": "copyright"}


def _parse_vc_body(body: bytes, out: dict) -> None:
    if len(body) < 4:
        return
    (vl,) = struct.unpack_from("<I", body, 0)
    pos = 4 + vl
    if pos + 4 > len(body):
        return
    (n,) = struct.unpack_from("<I", body, pos)
    pos += 4
    for _ in range(min(n, _MAX_IFD_ENTRIES)):
        if pos + 4 > len(body):
            break
        (ln,) = struct.unpack_from("<I", body, pos)
        pos += 4
        item = body[pos:pos + ln].decode("utf-8", "replace")
        pos += ln
        if "=" in item:
            k, v = item.split("=", 1)
            key = _VC_KEYS.get(k.lower())
            if key and v.strip():
                out[key] = v.strip()
                out["n_fields"] += 1


def vorbis_comment_info(data: bytes) -> dict:
    """The Vorbis comment block from any of its three carriers: a
    FLAC file (metadata block type 4), an Ogg Opus stream (the
    ``OpusTags`` packet), or an Ogg Vorbis stream (the
    ``\\x03vorbis`` packet)."""
    data = bytes(data)
    out = _blank("vorbis")
    if data[:4] == b"fLaC":
        pos = 4
        while pos + 4 <= len(data):
            hdr = data[pos]
            size = int.from_bytes(data[pos + 1:pos + 4], "big")
            if hdr & 0x7F == 4:
                _parse_vc_body(data[pos + 4:pos + 4 + size], out)
                return out
            pos += 4 + size
            if hdr & 0x80:
                break
        return out
    if data[:4] == b"OggS":
        from .oggcodec import _packets, _pages
        pages = list(_pages(data))
        if not pages:
            raise ValueError("vorbis_comment_info: no Ogg pages")
        serial = pages[0]["serial"]
        pkts = []
        for p in _packets(iter(pages), serial):
            pkts.append(p)
            if len(pkts) >= 2:
                break
        if len(pkts) >= 2:
            second = pkts[1]
            if second[:8] == b"OpusTags":
                _parse_vc_body(second[8:], out)
            elif second[:7] == b"\x03vorbis":
                _parse_vc_body(second[7:], out)
        return out
    raise ValueError("vorbis_comment_info: not a FLAC or Ogg payload")


# -------------------------------------- MKV Tags / MP4 ilst atoms

# Matroska official tag names (matroska.org tagging registry)
_MKV_TAG_KEYS = {"title": "title", "artist": "artist",
                 "album": "album", "date_released": "date",
                 "date": "date", "genre": "genre",
                 "comment": "comment", "encoder": "software",
                 "copyright": "copyright"}
_MKV_TAG, _MKV_SIMPLETAG = 0x7373, 0x67C8
_MKV_TAGNAME, _MKV_TAGSTRING = 0x45A3, 0x4487


def mkv_tags_info(data: bytes) -> dict:
    """Matroska/WebM ``Tags`` element: SimpleTag TagName/TagString
    pairs mapped via the official tagging registry names."""
    from .mkvcodec import _SEGMENT, _TAGS, _child, _elements
    data = bytes(data)
    if data[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("mkv_tags_info: not an EBML/Matroska "
                         "payload")
    out = _blank("mkv")
    seg = _child(data, 0, len(data), _SEGMENT)
    if seg is None:
        return out
    tags = _child(data, seg[0], seg[1], _TAGS)
    if tags is None:
        return out
    for tid, ts, te in _elements(data, tags[0], tags[1]):
        if tid != _MKV_TAG:
            continue
        for sid, ss, se in _elements(data, ts, te):
            if sid != _MKV_SIMPLETAG:
                continue
            name = val = None
            for eid, es, ee in _elements(data, ss, se):
                if eid == _MKV_TAGNAME:
                    name = data[es:ee].decode("utf-8", "replace")
                elif eid == _MKV_TAGSTRING:
                    val = data[es:ee].decode("utf-8", "replace")
            key = name and _MKV_TAG_KEYS.get(name.lower())
            if key and val and val.strip():
                out[key] = val.strip()
                out["n_fields"] += 1
    return out


# iTunes-style ilst atoms (the de-facto MP4 tagging scheme)
_ILST_KEYS = {b"\xa9nam": "title", b"\xa9ART": "artist",
              b"\xa9alb": "album", b"\xa9day": "date",
              b"\xa9gen": "genre", b"\xa9cmt": "comment",
              b"\xa9too": "software", b"cprt": "copyright"}


def mp4_tags_info(data: bytes) -> dict:
    """The MP4 ``moov/udta/meta/ilst`` atom list (the iTunes-style
    tagging scheme): each item's ``data`` box value, UTF-8. The
    ``meta`` box is parsed both as the spec's FullBox (4
    version/flags bytes) and as the bare-box shape some muxers
    emit."""
    from .mp4codec import _boxes, _child, is_mp4
    data = bytes(data)
    if not is_mp4(data):
        raise ValueError("mp4_tags_info: not an ISO-BMFF payload")
    out = _blank("mp4")
    moov = _child(data, 0, len(data), b"moov")
    udta = moov and _child(data, moov[0], moov[1], b"udta")
    meta = udta and _child(data, udta[0], udta[1], b"meta")
    if not meta:
        return out
    ms, me = meta
    if data[ms + 4:ms + 8] not in (b"hdlr", b"ilst"):
        ms += 4                            # FullBox version/flags
    ilst = _child(data, ms, me, b"ilst")
    if not ilst:
        return out
    for bt, bs, be in _boxes(data, ilst[0], ilst[1]):
        key = _ILST_KEYS.get(bt)
        if not key:
            continue
        for ct, cs, ce in _boxes(data, bs, be):
            if ct == b"data" and ce - cs > 8:
                val = data[cs + 8:ce].decode(
                    "utf-8", "replace").strip()
                if val:
                    out[key] = val
                    out["n_fields"] += 1
                break
    return out


# ---------------------------------------------------- XMP (in JPEG)

_XMP_HEADER = b"http://ns.adobe.com/xap/1.0/\x00"
# element and attribute forms both occur in the wild
_XMP_PATTERNS = {
    "title": (rb"<dc:title>.*?<rdf:li[^>]*>(.*?)</rdf:li>",),
    "artist": (rb"<dc:creator>.*?<rdf:li[^>]*>(.*?)</rdf:li>",),
    "date": (rb"<xmp:CreateDate>(.*?)</xmp:CreateDate>",
             rb'xmp:CreateDate="([^"]*)"'),
    "software": (rb"<xmp:CreatorTool>(.*?)</xmp:CreatorTool>",
                 rb'xmp:CreatorTool="([^"]*)"'),
}


def _merge_xmp(xmp: bytes, out: dict) -> None:
    """Fill keys still empty from an XMP packet (EXIF wins — the
    usual precedence; regex extraction over the size-capped packet,
    no XML parser on untrusted bytes)."""
    import re as _re
    for key, pats in _XMP_PATTERNS.items():
        if out.get(key):
            continue
        for pat in pats:
            m = _re.search(pat, xmp, _re.DOTALL)
            if m:
                text = m.group(1).decode("utf-8", "replace").strip()
                if text:
                    out[key] = text
                    out["n_fields"] += 1
                break


# ------------------------------------------------------- PNG / RIFF

_PNG_KEYS = {"title": "title", "author": "artist",
             "description": "comment", "software": "software",
             "copyright": "copyright", "creation time": "date",
             "comment": "comment"}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_text_info(data: bytes) -> dict:
    """PNG ``tEXt`` / ``zTXt`` (zlib) / ``iTXt`` chunks mapped via
    their registered keywords (ISO 15948 §11.3.4.2)."""
    data = bytes(data)
    if data[:8] != _PNG_SIG:
        raise ValueError("png_text_info: not a PNG payload")
    out = _blank("png")
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        kw_text = None
        if ctype == b"eXIf":               # PNG 3rd ed.: raw TIFF
            try:
                ex = _parse_tiff_meta(body)
            except ValueError:
                ex = None
            if ex:
                for k in META_KEYS:
                    if k in ("kind", "n_fields"):
                        continue
                    if out.get(k) is None and ex.get(k) is not None:
                        out[k] = ex[k]
                out["n_fields"] += ex["n_fields"]
            continue
        if ctype == b"tEXt":
            kw, _, txt = body.partition(b"\x00")
            kw_text = (kw, txt.decode("latin-1", "replace"))
        elif ctype == b"zTXt":
            kw, _, rest = body.partition(b"\x00")
            if rest[:1] == b"\x00":
                try:
                    kw_text = (kw, zlib.decompress(
                        rest[1:]).decode("latin-1", "replace"))
                except zlib.error:
                    pass
        elif ctype == b"iTXt":
            kw, _, rest = body.partition(b"\x00")
            if len(rest) >= 2:
                comp, meth = rest[0], rest[1]
                rest = rest[2:]
                _lang, _, rest = rest.partition(b"\x00")
                _tkw, _, txt = rest.partition(b"\x00")
                if comp == 1 and meth == 0:
                    try:
                        txt = zlib.decompress(txt)
                    except zlib.error:
                        txt = b""
                kw_text = (kw, txt.decode("utf-8", "replace"))
        elif ctype == b"IEND":
            break
        if kw_text:
            key = _PNG_KEYS.get(
                kw_text[0].decode("latin-1", "replace").lower())
            if key and kw_text[1].strip():
                out[key] = kw_text[1].strip()
                out["n_fields"] += 1
    return out


_RIFF_KEYS = {b"INAM": "title", b"IART": "artist", b"IPRD": "album",
              b"ICRD": "date", b"IGNR": "genre", b"ICMT": "comment",
              b"ISFT": "software", b"ICOP": "copyright"}


def _webp_meta(data: bytes) -> dict:
    """WebP ``EXIF`` / ``XMP `` chunks (the extended-format
    metadata): the EXIF chunk holds a TIFF structure (an optional
    ``Exif\\0\\0`` prefix some writers include is stripped), XMP
    merges into keys EXIF left empty — same precedence as JPEG."""
    out = None
    xmp = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + sz]
        if cid == b"EXIF":
            t = body[6:] if body[:6] == b"Exif\x00\x00" else body
            try:
                out = _parse_tiff_meta(t)
            except ValueError:
                pass
        elif cid == b"XMP ":
            xmp = body
        pos += 8 + sz + (sz & 1)
    if out is None:
        out = _blank("exif")
        out["has_gps"] = False
    if xmp:
        _merge_xmp(xmp, out)
    return out


def riff_info(data: bytes) -> dict:
    """``LIST``/``INFO`` subchunks of a RIFF container (WAV/AVI) —
    the classic INAM/IART/ICRD tagging scheme. A ``WEBP`` form
    routes to its own ``EXIF``/``XMP `` chunk scheme instead (the
    record comes back with kind ``exif``, like JPEG)."""
    data = bytes(data)
    if data[:4] != b"RIFF":
        raise ValueError("riff_info: not a RIFF payload")
    if data[8:12] == b"WEBP":
        return _webp_meta(data)
    out = _blank("riff")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"LIST" and data[pos + 8:pos + 12] == b"INFO":
            sub = data[pos + 12:pos + 8 + sz]
            sp = 0
            while sp + 8 <= len(sub):
                sk = sub[sp:sp + 4]
                (ssz,) = struct.unpack_from("<I", sub, sp + 4)
                val = sub[sp + 8:sp + 8 + ssz].split(b"\x00", 1)[0] \
                    .decode("latin-1", "replace").strip()
                key = _RIFF_KEYS.get(sk)
                if key and val:
                    out[key] = val
                    out["n_fields"] += 1
                sp += 8 + ssz + (ssz & 1)
        pos += 8 + sz + (sz & 1)
    return out


# -------------------------------------------------------------- PDF

_PDF_INFO_KEYS = {b"Title": "title", b"Author": "artist",
                  b"Creator": "software", b"Subject": "comment",
                  b"CreationDate": "date"}


def _pdf_string_at(data: bytes, pos: int) -> str | None:
    """Decode the PDF string object starting at ``pos`` — a literal
    ``(...)`` (balanced nested parens, backslash escapes §7.3.4.2) or
    hex ``<...>``; UTF-16BE when the decoded bytes lead with a BOM,
    else PDFDocEncoding ~ Latin-1."""
    while pos < len(data) and data[pos:pos + 1] in b" \t\r\n":
        pos += 1
    if data[pos:pos + 1] == b"(":
        depth, i, out = 1, pos + 1, bytearray()
        while i < len(data) and depth:
            c = data[i]
            if c == 0x5C and i + 1 < len(data):        # backslash
                nxt = data[i + 1]
                esc = {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                       0x62: b"\b", 0x66: b"\f", 0x28: b"(",
                       0x29: b")", 0x5C: b"\\"}.get(nxt)
                if esc is not None:
                    out += esc
                    i += 2
                    continue
                if 0x30 <= nxt <= 0x37:                # \ooo octal
                    j = i + 1
                    oct_s = b""
                    while j < len(data) and len(oct_s) < 3 \
                            and 0x30 <= data[j] <= 0x37:
                        oct_s += data[j:j + 1]
                        j += 1
                    out.append(int(oct_s, 8) & 0xFF)
                    i = j
                    continue
                i += 2                                 # \<other>
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if not depth:
                    break
            out.append(c)
            i += 1
        raw = bytes(out)
    elif data[pos:pos + 1] == b"<":
        end = data.find(b">", pos)
        if end < 0:
            return None
        hx = bytes(c for c in data[pos + 1:end]
                   if c not in b" \t\r\n")
        if len(hx) & 1:
            hx += b"0"
        try:
            raw = bytes.fromhex(hx.decode("ascii"))
        except ValueError:
            return None
    else:
        return None
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace").strip()
    return raw.decode("latin-1").strip()


def pdf_meta_info(data: bytes) -> dict:
    """The PDF document-information dictionary (ISO 32000 §14.3.3):
    the trailer's ``/Info`` object's Title/Author/Creator/Subject/
    CreationDate, document-order last-wins for both the reference and
    the object (incremental updates). Encrypted documents return the
    blank record — /Info strings are ciphertext without the key, and
    guessing is worse than reporting nothing."""
    import re as _re
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        raise ValueError("pdf_meta_info: not a PDF payload")
    out = _blank("pdf")
    tail = data[-4096:]
    if _re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", tail):
        return out
    refs = list(_re.finditer(rb"/Info\s+(\d+)\s+(\d+)\s+R", data))
    if not refs:
        return out
    num = int(refs[-1].group(1))
    objs = list(_re.finditer(
        rb"(?:^|[\r\n])%d\s+\d+\s+obj\b" % num, data))
    if not objs:
        return out
    start = objs[-1].end()
    end = data.find(b"endobj", start)
    body = data[start:end if end > 0 else len(data)]
    for raw_key, key in _PDF_INFO_KEYS.items():
        m = _re.search(rb"/" + raw_key + rb"\s*(?=[(<])", body)
        if not m:
            continue
        val = _pdf_string_at(body, m.end())
        if val:
            if key == "date" and val.startswith("D:"):
                val = val[2:]
            out[key] = val
            out["n_fields"] += 1
    return out


# ------------------------------------------------------ lyrics (×3)

def media_lyrics(data: bytes) -> dict:
    """Embedded lyrics — audio files double as a crawl TEXT source:
    ``{"text", "lang"}`` from ID3v2 ``USLT`` (unsynchronised-lyrics
    frames: encoding byte, ISO-639-2 language, descriptor, text),
    the Vorbis ``LYRICS``/``UNSYNCEDLYRICS`` comment (FLAC blocks
    and both Ogg packet carriers), or the MP4 ``©lyr`` ilst atom
    (``lang`` is null — ilst atoms carry none). Raises ValueError
    when the payload kind is unrecognized or carries no lyrics."""
    data = bytes(data)
    if data[:3] == b"ID3":
        for _ver, fid, payload in _id3_frames(data):
            if fid in ("USLT", "ULT") and len(payload) > 4:
                enc = _ID3_ENCODINGS.get(payload[0], "latin-1")
                lang = payload[1:4].decode("latin-1").strip("\x00") \
                    or None
                rest = payload[4:].decode(enc, "replace")
                parts = rest.split("\x00", 1)
                text = (parts[1] if len(parts) > 1 else parts[0]) \
                    .strip("\x00").strip()
                if text:
                    return {"text": text, "lang": lang}
        raise ValueError("media_lyrics: no USLT frame in the ID3v2 "
                         "tag")
    if data[:4] == b"fLaC" or data[:4] == b"OggS":
        # LYRICS is not in the uniform record — walk for it directly
        text = _vorbis_field(data, (b"lyrics", b"unsyncedlyrics"))
        if text:
            return {"text": text, "lang": None}
        raise ValueError("media_lyrics: no LYRICS comment")
    if len(data) >= 12 and data[4:8] == b"ftyp":
        from .mp4codec import _boxes, _child
        moov = _child(data, 0, len(data), b"moov")
        udta = moov and _child(data, moov[0], moov[1], b"udta")
        meta = udta and _child(data, udta[0], udta[1], b"meta")
        if meta:
            ms, me = meta
            if data[ms + 4:ms + 8] not in (b"hdlr", b"ilst"):
                ms += 4
            ilst = _child(data, ms, me, b"ilst")
            lyr = ilst and _child(data, ilst[0], ilst[1],
                                  b"\xa9lyr")
            d = lyr and _child(data, lyr[0], lyr[1], b"data")
            if d and d[1] - d[0] > 8:
                text = data[d[0] + 8:d[1]].decode(
                    "utf-8", "replace").strip()
                if text:
                    return {"text": text, "lang": None}
        raise ValueError("media_lyrics: no ©lyr atom in the MP4")
    raise ValueError("media_lyrics: unrecognized payload "
                     "(ID3/FLAC/Ogg/MP4 supported)")


def _vorbis_field(data: bytes, keys: tuple) -> str | None:
    """A raw Vorbis-comment value by key, from any of the three
    carriers — for fields outside the uniform record."""
    bodies = []
    if data[:4] == b"fLaC":
        pos = 4
        while pos + 4 <= len(data):
            hdr = data[pos]
            size = int.from_bytes(data[pos + 1:pos + 4], "big")
            if hdr & 0x7F == 4:
                bodies.append(data[pos + 4:pos + 4 + size])
                break
            pos += 4 + size
            if hdr & 0x80:
                break
    elif data[:4] == b"OggS":
        from .oggcodec import _packets, _pages
        pages = list(_pages(data))
        if pages:
            pkts = []
            for p in _packets(iter(pages), pages[0]["serial"]):
                pkts.append(p)
                if len(pkts) >= 2:
                    break
            if len(pkts) >= 2:
                if pkts[1][:8] == b"OpusTags":
                    bodies.append(pkts[1][8:])
                elif pkts[1][:7] == b"\x03vorbis":
                    bodies.append(pkts[1][7:])
    for body in bodies:
        if len(body) < 4:
            continue
        (vl,) = struct.unpack_from("<I", body, 0)
        pos = 4 + vl
        if pos + 4 > len(body):
            continue
        (n,) = struct.unpack_from("<I", body, pos)
        pos += 4
        for _ in range(min(n, _MAX_IFD_ENTRIES)):
            if pos + 4 > len(body):
                break
            (ln,) = struct.unpack_from("<I", body, pos)
            pos += 4
            item = body[pos:pos + ln]
            pos += ln
            k, _, v = item.partition(b"=")
            if k.lower() in keys and v.strip():
                return v.decode("utf-8", "replace").strip()
    return None


# --------------------------------------------------- cover art (×5)

def _flac_picture_block(body: bytes) -> dict | None:
    """Decode a METADATA_BLOCK_PICTURE body (the FLAC spec §
    picture structure — also what Ogg's base64 comment carries)."""
    if len(body) < 32:
        return None
    pos = 4                                    # picture type
    (ml,) = struct.unpack_from(">I", body, pos)
    pos += 4
    mime = body[pos:pos + ml].decode("latin-1")
    pos += ml
    (dl,) = struct.unpack_from(">I", body, pos)
    pos += 4 + dl + 16                         # desc + w/h/depth/idx
    if pos + 4 > len(body):
        return None
    (il,) = struct.unpack_from(">I", body, pos)
    pos += 4
    img = body[pos:pos + il]
    return {"mime": mime, "image": img} if img else None


def cover_art(data: bytes) -> dict:
    """Embedded cover art / attached picture out of any audio or A/V
    container: ``{"mime", "image"}`` — ID3v2 ``APIC`` (v2.2
    ``PIC``), the FLAC ``PICTURE`` metadata block, the Ogg
    ``METADATA_BLOCK_PICTURE`` base64 comment (the Opus/Vorbis
    convention — same structure as FLAC's), the MP4 ``covr`` ilst
    atom, and Matroska ``Attachments`` (the first ``image/*``
    AttachedFile). The extracted image feeds the existing
    ``decode_image`` chain for album-art dedup. Raises ValueError
    when the payload kind is unrecognized or carries no picture."""
    data = bytes(data)
    if data[:3] == b"ID3":
        for ver, fid, payload in _id3_frames(data):
            if fid == "APIC" and len(payload) > 4:
                enc = payload[0]
                i = payload.index(b"\x00", 1)
                mime = payload[1:i].decode("latin-1")
                i += 2                          # \0 + picture type
                if enc in (1, 2):               # utf-16 description
                    while i + 1 < len(payload) \
                            and payload[i:i + 2] != b"\x00\x00":
                        i += 2
                    i += 2
                else:
                    i = payload.index(b"\x00", i) + 1
                if payload[i:]:
                    return {"mime": mime, "image": payload[i:]}
            elif fid == "PIC" and len(payload) > 6:
                fmt = payload[1:4].decode("latin-1").lower()
                i = payload.index(b"\x00", 5) + 1
                if payload[i:]:
                    return {"mime": "image/png" if fmt == "png"
                            else "image/jpeg", "image": payload[i:]}
        raise ValueError("cover_art: no APIC/PIC frame in the "
                         "ID3v2 tag")
    if data[:4] == b"fLaC":
        pos = 4
        while pos + 4 <= len(data):
            hdr = data[pos]
            size = int.from_bytes(data[pos + 1:pos + 4], "big")
            if hdr & 0x7F == 6:                # PICTURE
                pic = _flac_picture_block(
                    data[pos + 4:pos + 4 + size])
                if pic:
                    return pic
            pos += 4 + size
            if hdr & 0x80:
                break
        raise ValueError("cover_art: no PICTURE block in the FLAC "
                         "stream")
    if data[:4] == b"OggS":
        import base64
        from .oggcodec import _packets, _pages
        pages = list(_pages(data))
        if pages:
            pkts = []
            for p in _packets(iter(pages), pages[0]["serial"]):
                pkts.append(p)
                if len(pkts) >= 2:
                    break
            if len(pkts) >= 2:
                body = None
                if pkts[1][:8] == b"OpusTags":
                    body = pkts[1][8:]
                elif pkts[1][:7] == b"\x03vorbis":
                    body = pkts[1][7:]
                if body is not None and len(body) >= 4:
                    # raw item walk (the value is binary-ish base64,
                    # not a text field the uniform record carries)
                    (vl,) = struct.unpack_from("<I", body, 0)
                    pos = 4 + vl
                    if pos + 4 <= len(body):
                        (n,) = struct.unpack_from("<I", body, pos)
                        pos += 4
                        for _ in range(min(n, _MAX_IFD_ENTRIES)):
                            if pos + 4 > len(body):
                                break
                            (ln,) = struct.unpack_from(
                                "<I", body, pos)
                            pos += 4
                            item = body[pos:pos + ln]
                            pos += ln
                            k, _, v = item.partition(b"=")
                            if k.lower() == b"metadata_block_picture":
                                try:
                                    pic = _flac_picture_block(
                                        base64.b64decode(v))
                                except Exception:
                                    pic = None
                                if pic:
                                    return pic
        raise ValueError("cover_art: no METADATA_BLOCK_PICTURE "
                         "comment in the Ogg stream")
    if len(data) >= 12 and data[4:8] == b"ftyp":
        from .mp4codec import _boxes, _child
        moov = _child(data, 0, len(data), b"moov")
        udta = moov and _child(data, moov[0], moov[1], b"udta")
        meta = udta and _child(data, udta[0], udta[1], b"meta")
        if meta:
            ms, me = meta
            if data[ms + 4:ms + 8] not in (b"hdlr", b"ilst"):
                ms += 4
            ilst = _child(data, ms, me, b"ilst")
            covr = ilst and _child(data, ilst[0], ilst[1], b"covr")
            d = covr and _child(data, covr[0], covr[1], b"data")
            if d and d[1] - d[0] > 8:
                (dtype,) = struct.unpack_from(">I", data, d[0])
                return {"mime": "image/png" if dtype == 14
                        else "image/jpeg",
                        "image": data[d[0] + 8:d[1]]}
        raise ValueError("cover_art: no covr atom in the MP4")
    if data[:4] == b"\x1aE\xdf\xa3":
        from .mkvcodec import _SEGMENT, _child, _elements
        seg = _child(data, 0, len(data), _SEGMENT)
        if seg:
            att = _child(data, seg[0], seg[1], 0x1941A469)
            if att:
                for fid_, fs, fe in _elements(data, att[0], att[1]):
                    if fid_ != 0x61A7:         # AttachedFile
                        continue
                    mime = img = None
                    for eid, es, ee in _elements(data, fs, fe):
                        if eid == 0x4660:
                            mime = data[es:ee].decode("latin-1")
                        elif eid == 0x465C:
                            img = data[es:ee]
                    if mime and mime.startswith("image/") and img:
                        return {"mime": mime, "image": img}
        raise ValueError("cover_art: no image attachment in the "
                         "Matroska file")
    raise ValueError(
        "cover_art: unrecognized payload (ID3/FLAC/Ogg/MP4/Matroska "
        "supported)")


def flac_add_picture(flac: bytes, mime: str, image: bytes) -> bytes:
    """Insert a ``PICTURE`` metadata block (type 6) into an existing
    FLAC stream, fixing the last-metadata-block flag."""
    flac = bytes(flac)
    if flac[:4] != b"fLaC":
        raise ValueError("flac_add_picture: not a FLAC stream")
    mb = mime.encode("latin-1")
    body = (struct.pack(">I", 3)               # front cover
            + struct.pack(">I", len(mb)) + mb
            + struct.pack(">I", 0)             # description
            + struct.pack(">IIII", 0, 0, 0, 0)
            + struct.pack(">I", len(image)) + bytes(image))
    out = bytearray(flac[:4])
    pos = 4
    while pos + 4 <= len(flac):
        hdr = flac[pos]
        size = int.from_bytes(flac[pos + 1:pos + 4], "big")
        last = bool(hdr & 0x80)
        out += bytes([hdr & 0x7F]) + flac[pos + 1:pos + 4 + size]
        pos += 4 + size
        if last:
            break
    out += bytes([0x80 | 6]) + len(body).to_bytes(3, "big") + body
    out += flac[pos:]
    return bytes(out)


def ogg_cover_comment(mime: str, image: bytes) -> str:
    """The ``METADATA_BLOCK_PICTURE`` base64 value for
    ``build_ogg_stream(comments=...)`` — the Opus/Vorbis cover-art
    convention (the FLAC picture structure, base64-encoded)."""
    import base64
    mb = mime.encode("latin-1")
    body = (struct.pack(">I", 3)
            + struct.pack(">I", len(mb)) + mb
            + struct.pack(">I", 0)
            + struct.pack(">IIII", 0, 0, 0, 0)
            + struct.pack(">I", len(image)) + bytes(image))
    return base64.b64encode(body).decode("ascii")


# ------------------------------------------------------ dispatcher

def media_metadata(data: bytes) -> dict:
    """One call for any media payload: sniffs the container and runs
    the matching parser — JPEG/TIFF -> :func:`exif_info`, MPEG audio
    (ID3 or bare sync) -> :func:`id3_info`, FLAC / Ogg ->
    :func:`vorbis_comment_info`, PNG -> :func:`png_text_info`,
    RIFF (WAV/AVI) -> :func:`riff_info`. Raises ValueError for
    anything else."""
    data = bytes(data)
    if data[:2] == b"\xff\xd8" or data[:2] in (b"II", b"MM"):
        return exif_info(data)
    if data[:8] == _PNG_SIG:
        return png_text_info(data)
    if data[:4] == b"fLaC" or data[:4] == b"OggS":
        return vorbis_comment_info(data)
    if data[:4] == b"RIFF":
        return riff_info(data)
    if data[:4] == b"\x1aE\xdf\xa3":
        return mkv_tags_info(data)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return mp4_tags_info(data)
    if data[:3] == b"ID3" or (
            len(data) >= 2 and data[0] == 0xFF
            and (data[1] & 0xE0) == 0xE0):
        return id3_info(data)
    if data[:5] == b"%PDF-":
        return pdf_meta_info(data)
    raise ValueError(
        "media_metadata: unrecognized payload (JPEG/TIFF/PNG/FLAC/"
        "Ogg/RIFF/MPEG-audio/PDF supported)")


# --------------------------------------------------------- writers
# Deterministic fixture writers (the build_mkv convention).

def build_exif_app1(fields: dict | None = None,
                    orientation: int | None = None,
                    gps: bool = False,
                    date_original: str | None = None) -> bytes:
    """An APP1 ``Exif\\0\\0`` segment body (marker not included):
    little-endian TIFF with an IFD0 carrying ``fields`` (uniform-key
    names: title/make/model/software/date/artist/copyright), an
    optional Exif IFD (DateTimeOriginal) and an optional GPS IFD
    with an actual lat/lon fix."""
    inv = {v: k for k, v in _EXIF_TAGS.items()}
    entries: list[tuple[int, int, int, bytes]] = []   # tag,type,cnt,val
    extra: list[tuple[int, bytes]] = []               # (entry idx, data)
    for key, val in sorted((fields or {}).items(),
                           key=lambda kv: inv[kv[0]]):
        raw = str(val).encode() + b"\x00"
        entries.append((inv[key], 2, len(raw), raw))
    if orientation is not None:
        entries.append((0x0112, 3, 1,
                        struct.pack("<H", orientation) + b"\x00\x00"))
    sub_ptr_slots = []
    if date_original:
        sub_ptr_slots.append(0x8769)
    if gps:
        sub_ptr_slots.append(0x8825)
    total_entries = len(entries) + len(sub_ptr_slots)
    # layout: TIFF header(8) + IFD0 dir + next-IFD ptr + value area
    # + sub-IFDs; sub-IFD pointers are patched once sizes are known
    value_at = 8 + 2 + 12 * total_entries + 4
    values = bytearray()

    def _entry(tag, typ, cnt, raw):
        nonlocal values
        if len(raw) <= 4:
            val4 = raw + b"\x00" * (4 - len(raw))
        else:
            val4 = struct.pack("<I", value_at + len(values))
            values += raw + (b"\x00" if len(raw) & 1 else b"")
        return struct.pack("<HHI", tag, typ, cnt) + val4

    all_tags = sorted(entries + [(t, 4, 1, b"") for t in sub_ptr_slots])
    dirent = bytearray(struct.pack("<H", total_entries))
    patch: list[tuple[int, int]] = []     # (dirent offset, which sub)
    for tag, typ, cnt, raw in all_tags:
        if typ == 4 and tag in (0x8769, 0x8825):
            patch.append((len(dirent) + 8, tag))
            dirent += struct.pack("<HHII", tag, typ, cnt, 0)
        else:
            dirent += _entry(tag, typ, cnt, raw)
    dirent += struct.pack("<I", 0)        # next-IFD = none
    subs = bytearray()
    sub_offsets = {}
    if date_original:
        raw = date_original.encode() + b"\x00"
        sub_offsets[0x8769] = value_at + len(values) + len(subs)
        s = bytearray(struct.pack("<H", 1))
        if len(raw) <= 4:
            s += struct.pack("<HHI", 0x9003, 2, len(raw)) \
                + raw + b"\x00" * (4 - len(raw))
        else:
            s += struct.pack("<HHII", 0x9003, 2, len(raw),
                             sub_offsets[0x8769] + 2 + 12 + 4)
        s += struct.pack("<I", 0)
        if len(raw) > 4:
            s += raw
        subs += s
    if gps:
        sub_offsets[0x8825] = value_at + len(values) + len(subs)
        at = sub_offsets[0x8825]
        # two RATIONAL triplets (lat/lon) in a data area after the IFD
        s = bytearray(struct.pack("<H", 2))
        data_at = at + 2 + 24 + 4
        s += struct.pack("<HHII", 0x0002, 5, 3, data_at)
        s += struct.pack("<HHII", 0x0004, 5, 3, data_at + 24)
        s += struct.pack("<I", 0)
        for num in (52, 30, 15, 13, 24, 36):           # deg/min/sec
            s += struct.pack("<II", num, 1)
        subs += s
    for doff, tag in patch:
        dirent[doff:doff + 4] = struct.pack("<I", sub_offsets[tag])
    tiff = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + bytes(dirent) + bytes(values) + bytes(subs))
    return b"Exif\x00\x00" + tiff


def jpeg_add_exif(jpeg: bytes, *args, comment: str | None = None,
                  **kw) -> bytes:
    """Inject an APP1 EXIF segment (args forwarded to
    :func:`build_exif_app1`) and an optional COM segment right after
    SOI of an existing JPEG."""
    jpeg = bytes(jpeg)
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("jpeg_add_exif: not a JPEG")
    seg = b""
    app1 = build_exif_app1(*args, **kw)
    seg += b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    if comment is not None:
        raw = comment.encode()
        seg += b"\xff\xfe" + struct.pack(">H", len(raw) + 2) + raw
    return jpeg[:2] + seg + jpeg[2:]


def _xmp_packet(fields: dict) -> bytes:
    """A standard XMP packet (xpacket + rdf:Description with
    dc:title/dc:creator element forms and CreateDate/CreatorTool
    attribute forms) from uniform-key fields."""
    attrs = ""
    elems = ""
    if "date" in fields:
        attrs += ' xmp:CreateDate="%s"' % fields["date"]
    if "software" in fields:
        attrs += ' xmp:CreatorTool="%s"' % fields["software"]
    if "title" in fields:
        elems += ("<dc:title><rdf:Alt><rdf:li xml:lang=\"x-default\""
                  ">%s</rdf:li></rdf:Alt></dc:title>"
                  % fields["title"])
    if "artist" in fields:
        elems += ("<dc:creator><rdf:Seq><rdf:li>%s</rdf:li>"
                  "</rdf:Seq></dc:creator>" % fields["artist"])
    return ('<?xpacket begin="﻿" '
            'id="W5M0MpCehiHzreSzNTczkc9d"?>'
            '<x:xmpmeta xmlns:x="adobe:ns:meta/">'
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
            '22-rdf-syntax-ns#"><rdf:Description '
            'xmlns:dc="http://purl.org/dc/elements/1.1/" '
            'xmlns:xmp="http://ns.adobe.com/xap/1.0/"%s>%s'
            '</rdf:Description></rdf:RDF></x:xmpmeta>'
            '<?xpacket end="w"?>' % (attrs, elems)).encode("utf-8")


def jpeg_add_xmp(jpeg: bytes, fields: dict) -> bytes:
    """Inject a standard XMP APP1 segment (:func:`_xmp_packet`)
    after SOI of an existing JPEG."""
    jpeg = bytes(jpeg)
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("jpeg_add_xmp: not a JPEG")
    seg = _XMP_HEADER + _xmp_packet(fields)
    return jpeg[:2] + b"\xff\xe1" \
        + struct.pack(">H", len(seg) + 2) + seg + jpeg[2:]


def pdf_with_info(pages: list[str], fields: dict,
                  utf16: bool = False) -> bytes:
    """A deterministic PDF (the ``encode_pdf_text`` document) whose
    trailer carries an ``/Info`` dictionary built from uniform-key
    ``fields``; ``utf16`` writes the values as BOM-led UTF-16BE hex
    strings (the other spec-legal string shape)."""
    from .pdfcodec import (_assemble_classic, _esc_literal,
                           _simple_doc_objs)
    inv = {v: k for k, v in _PDF_INFO_KEYS.items()}
    objs = _simple_doc_objs(pages, compress=True)
    body = bytearray(b"<<")
    for key, val in sorted(fields.items()):
        sval = str(val)
        if key == "date":
            sval = "D:" + sval
        if utf16:
            raw = b"\xfe\xff" + sval.encode("utf-16-be")
            enc = b"<" + raw.hex().upper().encode("ascii") + b">"
        else:
            enc = b"(" + _esc_literal(sval) + b")"
        body += b" /" + inv[key] + b" " + enc
    body += b" >>"
    objs.append(bytes(body))
    return _assemble_classic(
        objs, trailer_extra=b" /Info %d 0 R" % len(objs))


def build_id3v2(fields: dict, version: int = 3,
                comment: str | None = None,
                utf16: bool = False,
                cover: tuple[str, bytes] | None = None,
                lyrics: tuple[str, str] | None = None) -> bytes:
    """An ID3v2.3 or v2.4 tag block carrying ``fields`` (uniform-key
    names). ``utf16`` switches the text encoding byte to 1 (UTF-16
    with BOM) — the common Windows-tagger shape."""
    inv = {}
    for fid, key in _ID3_FRAMES.items():
        if len(fid) == 4 and key not in inv:
            inv[key] = fid
    if version == 3:
        inv["date"] = "TYER"
    frames = bytearray()

    def _enc(text: str) -> bytes:
        if utf16:
            return b"\x01" + text.encode("utf-16")    # BOM included
        return b"\x00" + text.encode("latin-1", "replace")

    def _fsize(n: int) -> bytes:
        if version >= 4:
            return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                          (n >> 7) & 0x7F, n & 0x7F])
        return struct.pack(">I", n)

    for key, val in sorted(fields.items()):
        payload = _enc(str(val))
        frames += inv[key].encode() + _fsize(len(payload)) \
            + b"\x00\x00" + payload
    if comment is not None:
        payload = b"\x00eng" + b"\x00" \
            + comment.encode("latin-1", "replace")
        frames += b"COMM" + _fsize(len(payload)) + b"\x00\x00" \
            + payload
    if cover is not None:
        mime, img = cover
        payload = (b"\x00" + mime.encode("latin-1") + b"\x00"
                   + bytes([3])                 # front cover
                   + b"\x00" + bytes(img))      # empty description
        frames += b"APIC" + _fsize(len(payload)) + b"\x00\x00" \
            + payload
    if lyrics is not None:
        lang, text = lyrics
        payload = (b"\x00" + lang.encode("latin-1") + b"\x00"
                   + text.encode("latin-1", "replace"))
        frames += b"USLT" + _fsize(len(payload)) + b"\x00\x00" \
            + payload
    n = len(frames)
    hdr = (b"ID3" + bytes([version, 0, 0])
           + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F, n & 0x7F]))
    return hdr + bytes(frames)


def png_add_text(png: bytes, pairs: dict,
                 compressed: bool = False) -> bytes:
    """Insert ``tEXt`` (or ``zTXt`` when ``compressed``) chunks after
    IHDR of an existing PNG, CRCs included."""
    png = bytes(png)
    if png[:8] != _PNG_SIG:
        raise ValueError("png_add_text: not a PNG")
    (ihdr_len,) = struct.unpack_from(">I", png, 8)
    cut = 8 + 12 + ihdr_len
    chunks = bytearray()
    for k, v in sorted(pairs.items()):
        if compressed:
            body = k.encode("latin-1") + b"\x00\x00" \
                + zlib.compress(str(v).encode("latin-1", "replace"))
            ctype = b"zTXt"
        else:
            body = k.encode("latin-1") + b"\x00" \
                + str(v).encode("latin-1", "replace")
            ctype = b"tEXt"
        chunks += struct.pack(">I", len(body)) + ctype + body \
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    return png[:cut] + bytes(chunks) + png[cut:]


def png_add_exif(png: bytes, *args, **kw) -> bytes:
    """Insert a PNG 3rd-edition ``eXIf`` chunk (raw TIFF from
    :func:`build_exif_app1`, header stripped) after IHDR."""
    png = bytes(png)
    if png[:8] != _PNG_SIG:
        raise ValueError("png_add_exif: not a PNG")
    tiff = build_exif_app1(*args, **kw)[6:]
    (ihdr_len,) = struct.unpack_from(">I", png, 8)
    cut = 8 + 12 + ihdr_len
    chunk = struct.pack(">I", len(tiff)) + b"eXIf" + tiff \
        + struct.pack(">I", zlib.crc32(b"eXIf" + tiff) & 0xFFFFFFFF)
    return png[:cut] + chunk + png[cut:]


def webp_add_metadata(webp: bytes, fields: dict | None = None,
                      xmp_fields: dict | None = None,
                      **exif_kw) -> bytes:
    """Append WebP extended-format ``EXIF`` (Exif\\0\\0 + TIFF) and
    ``XMP `` chunks to an existing WebP, fixing the RIFF size. The
    VP8X feature-flag bookkeeping real muxers maintain is omitted —
    the reader walks chunks, it does not gate on flags."""
    webp = bytes(webp)
    if webp[:4] != b"RIFF" or webp[8:12] != b"WEBP":
        raise ValueError("webp_add_metadata: not a WebP")
    out = bytearray(webp)
    if fields is not None or exif_kw:
        body = build_exif_app1(fields, **exif_kw)
        if len(body) & 1:
            body += b"\x00"
        out += b"EXIF" + struct.pack("<I", len(body)) + body
    if xmp_fields is not None:
        xml = _xmp_packet(xmp_fields)
        pad = b"\x00" if len(xml) & 1 else b""
        out += b"XMP " + struct.pack("<I", len(xml)) + xml + pad
    out[4:8] = struct.pack("<I", len(out) - 8)
    return bytes(out)


def wav_add_info(wav: bytes, fields: dict) -> bytes:
    """Append a ``LIST``/``INFO`` chunk (uniform-key names) to an
    existing RIFF/WAVE file, fixing the RIFF size."""
    wav = bytes(wav)
    if wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise ValueError("wav_add_info: not a RIFF/WAVE")
    inv = {v: k for k, v in _RIFF_KEYS.items()}
    sub = bytearray(b"INFO")
    for key, val in sorted(fields.items()):
        raw = str(val).encode("latin-1", "replace") + b"\x00"
        if len(raw) & 1:
            raw += b"\x00"
        sub += inv[key] + struct.pack("<I", len(raw)) + raw
    chunk = b"LIST" + struct.pack("<I", len(sub)) + bytes(sub)
    out = bytearray(wav) + chunk
    out[4:8] = struct.pack("<I", len(out) - 8)
    return bytes(out)
