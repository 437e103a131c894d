"""Minimal PDF text codec — pure Python, public ISO 32000-1 subset.

PDF is a double-digit share of crawled document bytes, and training
pipelines extract its text the way they extract HTML's. No PDF
library or tool exists in this environment (no poppler/mupdf/qpdf —
probed), so this module follows the engine's WARC convention
(write/read symmetry; ``operators/warc.py``): a DETERMINISTIC writer
(``encode_pdf_text``) that emits spec-correct simple documents, and
an extractor (``pdf_text``) that handles the writer's subset plus the
common wild shapes — uncompressed or FlateDecode content streams and
the standard text-showing operators. Everything cites ISO 32000-1
(public): objects/streams §7.3, FlateDecode §7.4.4, xref/trailer
§7.5, text objects and showing operators §9.4.

Honest limits (loud, documented — the codec-refusal posture):

* encrypted documents (``/Encrypt`` in a trailer) raise;
* composite-font / CMap text (``/Type0`` fonts) extracts as the raw
  code bytes best-effort — correct for the writer's subset and for
  simple-font documents, NOT for CID-keyed CJK (flagged in
  ``pdf_info`` as ``has_type0``);
* object streams (``/ObjStm``, xref streams — PDF 1.5 packed
  objects) are not unpacked; classic xref documents only (the writer
  emits classic).

Extraction strategy: objects are located by scanning ``N G obj ...
endobj`` spans (robust against broken/absent xref tables, which real
crawl PDFs have constantly — the xref is only needed for random
access, not for a full scan); every stream whose data inflates (or is
raw) and contains a ``BT``/``ET`` text object contributes, in
document order. Inside text objects: ``Tj``/``'``/``\"`` show a
string, ``TJ`` shows an array of strings with kerning numbers
(ignored), ``Td``/``TD``/``T*``/``'``/``\"`` start new lines.
String syntax per §7.3.4: literal ``( )`` with backslash escapes
(incl. octal and line continuations) and hex ``< >``.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["encode_pdf_text", "pdf_text", "pdf_info",
           "pdf_extract"]

MAX_INPUT_BYTES = 256 << 20
_MAX_STREAM_OUT = 64 << 20      # per-stream inflate bomb guard


# --------------------------------------------------------------- writer

def _esc_literal(s: str) -> bytes:
    out = []
    for ch in s:
        o = ord(ch)
        if ch in "()\\":
            out.append("\\" + ch)
        elif 32 <= o < 127:
            out.append(ch)
        elif o <= 255:
            out.append("\\%03o" % o)
        else:
            raise ValueError(
                f"encode_pdf_text writes Latin-1-range text only "
                f"(got U+{o:04X}); pre-transliterate or filter")
    return "".join(out).encode("latin-1")


def encode_pdf_text(pages: list[str], compress: bool = True) -> bytes:
    """Deterministic single-font PDF: one content stream per page,
    11 pt Helvetica, one text line per input line (``\\n`` splits),
    Letter media box, classic xref. Byte-identical across runs (no
    dates, no /ID) — the oracle-comparability property the WARC sink
    established."""
    if not pages:
        raise ValueError("encode_pdf_text needs at least one page")
    objs: list[bytes] = []           # 1-indexed object bodies

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    page_ids = []
    content_ids = []
    font_id_placeholder = None
    # reserve: 1 catalog, 2 pages-tree, 3 font; then page/content pairs
    add(b"")   # 1 catalog (filled later)
    add(b"")   # 2 pages tree (filled later)
    font_id_placeholder = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for text in pages:
        lines = text.split("\n")
        parts = [b"BT /F1 11 Tf 72 720 Td 13 TL"]
        for i, line in enumerate(lines):
            if i > 0:
                parts.append(b"T*")
            parts.append(b"(" + _esc_literal(line) + b") Tj")
        parts.append(b"ET")
        data = b"\n".join(parts)
        filt = b""
        if compress:
            data = zlib.compress(data, 6)
            filt = b" /Filter /FlateDecode"
        cid = add(b"<< /Length " + str(len(data)).encode() + filt
                  + b" >>\nstream\n" + data + b"\nendstream")
        content_ids.append(cid)
        pid = add(b"")               # page dict (filled after loop)
        page_ids.append(pid)
    for pid, cid in zip(page_ids, content_ids):
        objs[pid - 1] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 "
            + str(font_id_placeholder).encode()
            + b" 0 R >> >> /Contents " + str(cid).encode() + b" 0 R >>")
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    objs[1] = (b"<< /Type /Pages /Kids [" + kids + b"] /Count "
               + str(len(page_ids)).encode() + b" >>")
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]                    # object 0 is the free head
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (len(objs) + 1, xref_at))
    return bytes(out)


# ------------------------------------------------------------- extractor

_STREAM_HEAD_RE = re.compile(rb"<<((?:[^<>]|<<|>>)*?)>>\s*stream(\r\n|\n)",
                             re.S)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal starting at the '(' — §7.3.4.2:
    balanced parens, backslash escapes, octal, line continuations."""
    out, depth, i, n = bytearray(), 1, i + 1, len(data)
    while i < n and depth:
        c = data[i:i + 1]
        if c == b"\\":
            nxt = data[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt and nxt in b"01234567":
                # octal digits ONLY — \8 / \9 from buggy generators
                # fall through to the drop-the-backslash rule below
                j = i + 1
                while (j < min(i + 4, n)
                       and data[j:j + 1] in b"01234567"):
                    j += 1
                out.append(int(data[i + 1:j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):
                i += 2                       # line continuation
                if nxt == b"\r" and data[i:i + 1] == b"\n":
                    i += 1
            else:
                i += 1                       # lone backslash: drop
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    j = data.find(b">", i)
    if j < 0:
        j = len(data)
    hx = re.sub(rb"\s", b"", data[i + 1:j])
    if len(hx) % 2:
        hx += b"0"                           # §7.3.4.3 odd-pad
    try:
        return bytes.fromhex(hx.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


def _extract_text_ops(content: bytes) -> str:
    """Walk BT..ET text objects; show-ops append, line-ops newline."""
    out: list[str] = []
    for bt in re.finditer(rb"\bBT\b(.*?)\bET\b", content, re.S):
        body = bt.group(1)
        i, n = 0, len(body)
        line: list[str] = []

        def flush():
            if line:
                out.append("".join(line))
                line.clear()

        while i < n:
            c = body[i:i + 1]
            if c == b"(":
                s, i = _literal_string(body, i)
                line.append(s.decode("latin-1"))
            elif c == b"<" and body[i + 1:i + 2] != b"<":
                s, i = _hex_string(body, i)
                line.append(s.decode("latin-1"))
            elif c in (b"'", b'"'):
                # §9.4.3: ' and " are T*-THEN-show — the line break
                # precedes the string these operators consumed, so
                # the just-appended string moves to the new line
                last = line.pop() if line else None
                flush()
                if last is not None:
                    line.append(last)
                i += 1
            else:
                m = re.match(rb"T\*|TD|Td", body[i:i + 2] or b"")
                if m:
                    flush()
                    i += 2
                else:
                    i += 1
        flush()
    return "\n".join(out)


def _iter_streams(data: bytes):
    """Yield (dict_bytes, decoded_stream) for every object stream.
    Stream heads are scanned over the WHOLE file (not within
    ``endobj``-bounded spans — compressed data can contain the bytes
    ``endobj``/``endstream``, and an object-bounded scan would
    truncate such streams). A DIRECT integer ``/Length`` is used when
    it checks out (an ``endstream`` token follows the claimed span —
    §7.3.8); otherwise fall back to the ``endstream`` scan with the
    trailing EOL trimmed, since crawl PDFs routinely carry broken or
    indirect Lengths."""
    pos = 0
    while True:
        sm = _STREAM_HEAD_RE.search(data, pos)
        if not sm:
            return
        d = sm.group(1)
        start = sm.end()
        raw = None
        lm = _LENGTH_RE.search(d)
        if lm:
            ln = int(lm.group(1))
            tail = data[start + ln:start + ln + 16]
            if re.match(rb"(\r\n|\r|\n)?endstream", tail):
                raw = data[start:start + ln]
        if raw is None:
            end = data.find(b"endstream", start)
            if end < 0:
                return
            raw = data[start:end]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                raw = raw[:-1]
        pos = start + len(raw)
        if b"/FlateDecode" in d:
            try:
                dec = zlib.decompressobj()
                raw = dec.decompress(raw, _MAX_STREAM_OUT)
                if dec.unconsumed_tail:
                    raise ValueError(
                        "PDF stream exceeds the per-stream inflate "
                        "bomb guard")
            except zlib.error:
                continue                     # undecodable: skip loud-ish
        elif b"/Filter" in d:
            continue                         # unsupported filter: skip
        yield d, raw


def pdf_text(data: bytes) -> str:
    """Visible text of a PDF (writer's subset + simple wild PDFs):
    text-showing operators from every BT/ET block of every content
    stream, in document order, lines joined with ``\\n``. Raises on
    non-PDF payloads, oversized inputs, and encrypted documents
    (loud null row through the Arrow wrapper — never silent
    garbage)."""
    return pdf_extract(data)["text"]


def _is_encrypted(data: bytes) -> bool:
    """/Encrypt belongs to the TRAILER dictionary (§7.6.1) — probing
    the whole byte stream would false-refuse valid documents whose
    CONTENT mentions '/Encrypt' (e.g. text about the PDF format), so
    the scan is scoped to a bounded window after each ``trailer``
    keyword."""
    return bool(re.search(rb"trailer[^>]{0,1024}?/Encrypt\b", data,
                          re.S))


def pdf_extract(data: bytes) -> dict:
    """One-pass extraction: ``text`` plus the structural metadata
    (``pages``/``streams``/``encrypted``/``has_type0``) from a single
    walk of the object streams — the Arrow operator calls THIS so a
    100 TB corpus inflates every stream once, not twice."""
    data = bytes(data)
    if len(data) > MAX_INPUT_BYTES:
        raise ValueError(f"PDF payload {len(data)} B exceeds the "
                         f"{MAX_INPUT_BYTES} B bomb guard")
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if _is_encrypted(data):
        raise NotImplementedError(
            "encrypted PDF: text extraction requires the document "
            "decryption keys (ISO 32000-1 §7.6); decrypt upstream")
    parts = []
    n_streams = 0
    for _d, raw in _iter_streams(data):
        n_streams += 1
        if b"BT" in raw and b"ET" in raw:
            t = _extract_text_ops(raw)
            if t:
                parts.append(t)
    return {
        "text": "\n".join(parts),
        "version": data[5:8].decode("latin-1", "replace"),
        "pages": len(re.findall(rb"/Type\s*/Page\b(?!s)", data)),
        "streams": n_streams,
        "encrypted": False,
        "has_type0": bool(re.search(rb"/Subtype\s*/Type0\b", data)),
    }


def pdf_info(data: bytes) -> dict:
    """Structural metadata: version, page count, stream count, the
    trailer-scoped ``encrypted`` flag, and ``has_type0``
    (composite/CMap fonts present — extraction is code-bytes
    best-effort for those)."""
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    return {
        "version": data[5:8].decode("latin-1", "replace"),
        "pages": len(re.findall(rb"/Type\s*/Page\b(?!s)", data)),
        "streams": sum(1 for _ in _iter_streams(data)),
        "encrypted": _is_encrypted(data),
        "has_type0": bool(re.search(rb"/Subtype\s*/Type0\b", data)),
    }
