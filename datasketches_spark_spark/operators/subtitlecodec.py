"""Standalone subtitle-file text extraction — SRT, WebVTT, ASS/SSA.

Crawl pipelines meet subtitle text in two shapes: muxed into a video
container (``operators/mkvcodec.py::mkv_subtitle_text``) and as bare
sidecar files — ``.srt`` (SubRip, the dominant wild format), ``.vtt``
(W3C WebVTT, the only subtitle format the web platform itself ships —
every ``<track>`` element on the web points at one), and
``.ass``/``.ssa`` (Advanced SubStation Alpha). This module parses the
bare files with deterministic fixture writers for the gates, and
``subtitle_text()`` sniff-dispatches across all four shapes
(including Matroska) so ONE call covers the crawl surface.

Spec basis (public): the SubRip de-facto format (index line,
``HH:MM:SS,mmm --> HH:MM:SS,mmm`` time line, text lines, blank-line
separator); W3C WebVTT (the ``WEBVTT`` signature, NOTE/STYLE/REGION
blocks, optional cue identifiers, dot-millisecond timings with
optional hours, cue-text tags ``<v>``/``<c>``/``<i>``... and the five
character escapes); the SSA/ASS format description shipped with every
libass distribution (``[Events]`` section, ``Format:``-declared field
order, ``Dialogue:`` lines, ``{...}`` override blocks, ``\\N``/
``\\n``/``\\h`` escapes). The reference engine has no document
extraction (its ``src/main`` is sketch SQL bindings only); this
module belongs to the engine's LLM-training-data text surface, same
family as pdfcodec/docxcodec.

Scale shape: each file parses independently in one pass inside the
Arrow batch (``operators/multimodal.py::extract_subtitle_text``) —
no shuffle, no driver state; malformed payloads refuse loudly and
become all-null rows under the operator's loud-null contract.
"""

from __future__ import annotations

import re

__all__ = [
    "srt_text", "vtt_text", "ass_text", "subtitle_text",
    "build_srt", "build_vtt", "build_ass",
]

# SRT times are HH:MM:SS,mmm; wild files also use '.' millis and
# 1-digit hours — accept both, emit the canonical comma form.
_SRT_TIME = r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{1,3})"
_SRT_ARROW = re.compile(
    rf"^\s*{_SRT_TIME}\s*-->\s*{_SRT_TIME}\s*$")
# WebVTT: dot millis, hours OPTIONAL, cue settings may follow.
_VTT_ARROW = re.compile(
    r"^\s*(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})"
    r"\s*-->\s*(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})(?:[ \t].*)?$")
_TAGS = re.compile(r"<[^>\n]*>")           # <i>, </c>, <v Name>, ...
_ASS_OVERRIDE = re.compile(r"\{[^}]*\}")
# WebVTT cue-text character escapes (the normative five + the two
# directional marks, which strip to nothing in plain text).
_VTT_ESCAPES = (("&lt;", "<"), ("&gt;", ">"), ("&nbsp;", "\u00a0"),
                ("&lrm;", ""), ("&rlm;", ""), ("&amp;", "&"))


def _utext(data: bytes) -> str:
    """Decode with BOM strip and newline normalization — subtitle
    files are the wildest of wild text (Windows tooling, mixed
    editors), so CRLF and bare CR both become LF."""
    s = bytes(data).decode("utf-8-sig", "replace")
    return s.replace("\r\n", "\n").replace("\r", "\n")


def _blocks(text: str) -> list[list[str]]:
    out = []
    for blk in re.split(r"\n[ \t]*\n+", text.strip("\n")):
        lines = [ln for ln in blk.split("\n")]
        if any(ln.strip() for ln in lines):
            out.append(lines)
    return out


def srt_text(data: bytes) -> dict:
    """SubRip text: ``{"text", "cues", "format": "srt", "lang":
    "und"}`` (bare subtitle files declare no language — curation gets
    it from ``lang_id`` downstream). Cue blocks are blank-line
    separated: an optional all-digits index line, a ``-->`` time
    line, then the cue text; ``<i>``-style markup strips. Refuses
    (ValueError) when no cue parses — the sniffing contract."""
    cues = []
    for lines in _blocks(_utext(data)):
        i = 0
        if i < len(lines) and lines[i].strip().isdigit():
            i += 1
        if i >= len(lines) or not _SRT_ARROW.match(lines[i]):
            continue
        i += 1
        body = "\n".join(ln.rstrip() for ln in lines[i:])
        # strip AFTER tag removal: "<i>x </i>" renders as "x", and
        # whitespace that only existed inside markup must not leak
        cues.append(_TAGS.sub("", body).strip())
    if not cues:
        raise ValueError("not an SRT file: no index/time/text cue "
                         "blocks found")
    return {"text": "\n".join(c for c in cues if c),
            "cues": len(cues), "format": "srt", "lang": "und"}


def vtt_text(data: bytes) -> dict:
    """WebVTT text: requires the ``WEBVTT`` signature (optionally
    BOM-preceded; anything after it on the line is a comment);
    NOTE / STYLE / REGION blocks and the header block skip; cue
    blocks may lead with an identifier line (any line without
    ``-->``); cue settings after the time range are ignored; cue-text
    tags (``<v Speaker>``, ``<c.cls>``, inline timestamps) strip and
    the five character escapes decode."""
    text = _utext(data)
    if not re.match(r"^WEBVTT(?:[ \t\n]|$)", text):
        raise ValueError("not a WebVTT file: missing WEBVTT "
                         "signature")
    cues = []
    blocks = _blocks(text)
    for bi, lines in enumerate(blocks):
        if bi == 0 and lines[0].startswith("WEBVTT"):
            continue
        first = lines[0].strip()
        if first.startswith(("NOTE", "STYLE", "REGION")):
            continue
        i = 0
        if "-->" not in lines[i]:
            i += 1                        # cue identifier line
        if i >= len(lines) or not _VTT_ARROW.match(lines[i]):
            continue
        i += 1
        body = "\n".join(ln.rstrip() for ln in lines[i:])
        body = _TAGS.sub("", body)
        for esc, ch in _VTT_ESCAPES:
            body = body.replace(esc, ch)
        cues.append(body.strip())
    return {"text": "\n".join(c for c in cues if c),
            "cues": len(cues), "format": "vtt", "lang": "und"}


def ass_text(data: bytes) -> dict:
    """ASS/SSA text out of the ``[Events]`` section. The ``Format:``
    line declares the field order (ASS: Layer,Start,End,Style,Name,
    3 margins,Effect,Text; SSA leads with Marked) — the Text field's
    declared position drives the comma split, so reordered or
    extended Format lines parse correctly. ``{...}`` override blocks
    strip; ``\\N``/``\\n`` become newlines, ``\\h`` a space.
    Refuses when there is no ``[Events]`` section."""
    text = _utext(data)
    lines = text.split("\n")
    in_events = False
    fields = None
    cues = []
    for ln in lines:
        s = ln.strip()
        if s.startswith("[") and s.endswith("]"):
            in_events = s.lower() == "[events]"
            continue
        if not in_events or not s:
            continue
        low = s.lower()
        if low.startswith("format:"):
            fields = [f.strip().lower()
                      for f in s.split(":", 1)[1].split(",")]
            continue
        if not low.startswith("dialogue:"):
            continue
        val = s.split(":", 1)[1].lstrip()
        flds = fields or ["layer", "start", "end", "style", "name",
                          "marginl", "marginr", "marginv", "effect",
                          "text"]
        try:
            ti = flds.index("text")
        except ValueError:
            ti = len(flds) - 1
        parts = val.split(",", ti)
        if len(parts) <= ti:
            continue
        body = (_ASS_OVERRIDE.sub("", parts[ti])
                .replace("\\N", "\n").replace("\\n", "\n")
                .replace("\\h", " ").strip())
        cues.append(body)
    if fields is None and not cues:
        raise ValueError("not an ASS/SSA file: no [Events] section "
                         "with Format/Dialogue lines")
    return {"text": "\n".join(c for c in cues if c),
            "cues": len(cues), "format": "ass", "lang": "und"}


def subtitle_text(data: bytes) -> dict:
    """One call for every subtitle shape the crawl meets — sniffs and
    dispatches: EBML magic -> the Matroska/WebM subtitle track
    (``mkvcodec.mkv_subtitle_text``; ``format`` is the track's
    CodecID and ``lang`` its declared Language element), ``ftyp`` at
    offset 4 -> the MP4 tx3g timed-text track
    (``mp4codec.mp4_subtitle_text``; ``lang`` from the mdhd packed
    code), ``WEBVTT`` signature -> WebVTT, ``[Script Info]`` head ->
    ASS/SSA, else the SRT cue-block grammar. Raises ValueError for
    payloads that are none of the five."""
    data = bytes(data)
    if data[:4] == b"\x1aE\xdf\xa3":
        from .mkvcodec import mkv_subtitle_text
        info = mkv_subtitle_text(data)
        return {"text": info["text"], "cues": info["cues"],
                "format": info["codec_id"], "lang": info["lang"]}
    if len(data) >= 12 and data[4:8] == b"ftyp":
        from .mp4codec import mp4_subtitle_text
        info = mp4_subtitle_text(data)
        return {"text": info["text"], "cues": info["cues"],
                "format": info["codec_id"], "lang": info["lang"]}
    head = data[3:] if data[:3] == b"\xef\xbb\xbf" else data
    if head[:6] == b"WEBVTT":
        return vtt_text(data)
    if head.lstrip()[:13].lower() == b"[script info]":
        return ass_text(data)
    try:
        return srt_text(data)
    except ValueError:
        raise ValueError(
            "payload is not a recognized subtitle format "
            "(SRT / WebVTT / ASS / Matroska subtitle track)")


# ---------------------------------------------------------------
# Deterministic fixture writers (the build_mkv convention: tests and
# demo gates synthesize inputs; no subtitle tooling exists on this
# image to cross-check against, so the gates are write/read-symmetry
# plus the DuckDB relational rebuild).

def _ts(ms: int, sep: str) -> str:
    h, rem = divmod(int(ms), 3600000)
    m, rem = divmod(rem, 60000)
    s, ms = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{ms:03d}"


def build_srt(cues: list[tuple[int, int, str]],
              crlf: bool = False, bom: bool = False) -> bytes:
    """Canonical SubRip bytes from ``(start_ms, end_ms, text)``
    cues. ``crlf``/``bom`` exercise the Windows-tooling shapes the
    parser must normalize away."""
    out = []
    for i, (a, b, t) in enumerate(cues, 1):
        out.append(f"{i}\n{_ts(a, ',')} --> {_ts(b, ',')}\n{t}\n")
    text = "\n".join(out)
    if crlf:
        text = text.replace("\n", "\r\n")
    raw = text.encode("utf-8")
    return (b"\xef\xbb\xbf" + raw) if bom else raw


def build_vtt(cues: list[tuple[int, int, str]],
              note: str | None = None,
              ids: bool = False, settings: str = "") -> bytes:
    """WebVTT bytes: signature line, optional NOTE block, cues with
    optional identifier lines and cue settings."""
    parts = ["WEBVTT\n"]
    if note is not None:
        parts.append(f"NOTE {note}\n")
    for i, (a, b, t) in enumerate(cues, 1):
        idline = f"cue-{i}\n" if ids else ""
        tail = f" {settings}" if settings else ""
        parts.append(
            f"{idline}{_ts(a, '.')} --> {_ts(b, '.')}{tail}\n{t}\n")
    return "\n".join(parts).encode("utf-8")


def build_ass(cues: list[tuple[int, int, str]],
              ssa: bool = False, style: str = "Default") -> bytes:
    """ASS (or SSA when ``ssa=True``) bytes with the real section
    layout: [Script Info], a minimal [V4+ Styles], and [Events] whose
    Format line matches the species (SSA leads with Marked)."""
    def ats(ms: int) -> str:
        h, rem = divmod(int(ms), 3600000)
        m, rem = divmod(rem, 60000)
        s, cs = divmod(rem, 1000)
        return f"{h:d}:{m:02d}:{s:02d}.{cs // 10:02d}"
    hdr = ("[Script Info]\nTitle: fixture\nScriptType: "
           + ("v4.00" if ssa else "v4.00+")
           + "\n\n[V4+ Styles]\nFormat: Name, Fontname, Fontsize\n"
           f"Style: {style},Arial,20\n\n[Events]\n")
    if ssa:
        fmt = ("Format: Marked, Start, End, Style, Name, MarginL, "
               "MarginR, MarginV, Effect, Text\n")
        lead = "Marked=0"
    else:
        fmt = ("Format: Layer, Start, End, Style, Name, MarginL, "
               "MarginR, MarginV, Effect, Text\n")
        lead = "0"
    rows = [f"Dialogue: {lead},{ats(a)},{ats(b)},{style},,0,0,0,,{t}"
            for a, b, t in cues]
    return (hdr + fmt + "\n".join(rows) + "\n").encode("utf-8")
