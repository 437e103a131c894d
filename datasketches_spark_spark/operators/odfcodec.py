"""Minimal OpenDocument Text codec — stdlib zipfile + the ODF text
subset.

ODT (OASIS OpenDocument v1.3, public; ISO/IEC 26300) is the
word-processor format ``detect_ooxml`` already ROUTES
(``functions/mime.py`` reads the stored ``mimetype`` member) — r15
verdict "What's missing" #3: the routing column pointed at a refusal.
An .odt is a ZIP package whose ``content.xml`` carries text in
``<text:p>`` paragraphs and ``<text:h>`` headings (ODF §5.1), with
``<text:span>`` formatting wrappers, ``<text:tab/>``,
``<text:line-break/>`` and the run-length space element
``<text:s text:c="N"/>`` (§6.1.2-6.1.3). The package convention
(§3.3): the ``mimetype`` member is first and STORED so type sniffers
read it without inflating.

No Office tooling exists in this environment, so this module follows
the engine's write/read-symmetry convention (``operators/warc.py``,
``pdfcodec.py``, ``docxcodec.py``): a DETERMINISTIC writer (fixed ZIP
timestamps, stable member order, stored-first mimetype) and an
extractor handling the writer's subset plus the common wild shapes.

Extraction contract: paragraphs (``text:p`` / ``text:h``) join with
``\n``; within one, tags strip, entities decode, tab/line-break/space
elements expand; tables contribute their cell paragraphs in document
order (same altitude as ``docx_text``). Honest refusals: non-ZIP
payloads, packages without ``content.xml``, and bomb-guard hits
raise; a package whose stored mimetype is present but NOT an
opendocument type raises (it's a different ZIP species — the router
should never send it here).
"""

from __future__ import annotations

import io
import re
import zipfile

from .docxcodec import _xml_unescape

__all__ = ["encode_odt_text", "odt_text", "odt_info",
           "odt_extract", "encode_ods_cells", "ods_extract",
           "ods_text"]

MAX_INPUT_BYTES = 256 << 20
_MAX_PART_BYTES = 64 << 20

ODT_MIME = "application/vnd.oasis.opendocument.text"

_MANIFEST = (
    b'<?xml version="1.0" encoding="UTF-8"?>'
    b'<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
    b'opendocument:xmlns:manifest:1.0" manifest:version="1.3">'
    b'<manifest:file-entry manifest:full-path="/" manifest:media-type='
    b'"application/vnd.oasis.opendocument.text"/>'
    b'<manifest:file-entry manifest:full-path="content.xml" '
    b'manifest:media-type="text/xml"/></manifest:manifest>')

_CONTENT_HEAD = (
    b'<?xml version="1.0" encoding="UTF-8"?>'
    b'<office:document-content xmlns:office="urn:oasis:names:tc:'
    b'opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:'
    b'opendocument:xmlns:text:1.0" office:version="1.3">'
    b'<office:body><office:text>')
_CONTENT_TAIL = b"</office:text></office:body></office:document-content>"


def _xml_escape(s: str) -> str:
    # quotes too: the same helper feeds ATTRIBUTE values (table:name)
    # where a raw '"' breaks the document (r16 review)
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def encode_odt_text(paragraphs: list[str]) -> bytes:
    """Deterministic .odt: one ``<text:p>`` per entry (``\\n`` inside
    an entry becomes ``<text:line-break/>``, ``\\t`` a ``<text:tab/>``,
    runs of 2+ spaces the ``<text:s>`` element — the shapes real
    writers emit), stored-first ``mimetype``, fixed timestamps.
    Byte-identical across runs."""
    body = []
    for p in paragraphs:
        enc = _xml_escape(p)
        enc = enc.replace("\t", "<text:tab/>")
        enc = enc.replace("\n", "<text:line-break/>")
        enc = re.sub(
            r"  +",
            lambda m: ' <text:s text:c="%d"/>' % (len(m.group(0)) - 1),
            enc)
        body.append("<text:p>" + enc + "</text:p>")
    content = _CONTENT_HEAD + "".join(body).encode("utf-8") + _CONTENT_TAIL
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        mi = zipfile.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0))
        z.writestr(mi, ODT_MIME, compress_type=zipfile.ZIP_STORED)
        for name, data in (("META-INF/manifest.xml", _MANIFEST),
                           ("content.xml", content)):
            zi = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            z.writestr(zi, data, compress_type=zipfile.ZIP_DEFLATED)
    return buf.getvalue()


def _content_part(data: bytes, species: str | None = None) -> str:
    """``species``: 'text' / 'spreadsheet' — when the package carries
    a stored mimetype, the species must MATCH, like the OOXML
    extractors' part checks: a misrouted .odt into ``ods_extract``
    previously returned a plausible-looking empty result instead of
    the loud null the operator contract promises (r16 review)."""
    data = bytes(data)
    if len(data) > MAX_INPUT_BYTES:
        raise ValueError(f"ODF payload {len(data)} B exceeds the "
                         f"{MAX_INPUT_BYTES} B bomb guard")
    if data[:4] != b"PK\x03\x04":
        raise ValueError("not a ZIP package (missing PK magic)")
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as ex:
        raise ValueError(f"unreadable ZIP package: {ex}") from ex
    with z:
        names = set(z.namelist())
        if "mimetype" in names:
            mi = z.getinfo("mimetype")
            if mi.file_size <= 256:
                mime = z.read(mi).decode("ascii", "replace").strip()
                if mime and not mime.startswith(
                        "application/vnd.oasis.opendocument"):
                    raise ValueError(
                        f"ZIP package declares {mime!r} — not an "
                        "OpenDocument (routing should not reach the "
                        "ODF extractors)")
                if (species and mime
                        and not mime.endswith("." + species)):
                    raise ValueError(
                        f"OpenDocument species mismatch: package "
                        f"declares {mime!r}, extractor expects "
                        f".{species} (route on detect_ooxml)")
        try:
            info = z.getinfo("content.xml")
        except KeyError:
            raise ValueError(
                "no content.xml — a ZIP but not an OpenDocument "
                "package") from None
        if info.file_size > _MAX_PART_BYTES:
            raise ValueError(
                f"content.xml claims {info.file_size} B, over the "
                f"{_MAX_PART_BYTES} B part bomb guard")
        return z.read(info).decode("utf-8", "replace")


# paragraphs and headings; self-closing first (empty styled <text:p/>
# is common — the paired alternative's [^>]* would swallow the '/')
_P_RE = re.compile(
    r"<text:(?:p|h)(?:\s[^>]*?)?/>|"
    r"<text:(?:p|h)(?:\s[^>]*)?>(.*?)</text:(?:p|h)>", re.S)
_INLINE_RE = re.compile(
    r"<text:tab\s*/>|<text:line-break\s*/>|"
    r'<text:s(?:\s[^>]*?text:c="(\d+)")?[^>]*/>|<[^>]+>', re.S)


def _para_text(body: str) -> str:
    """Inline content of one paragraph: expand tab/line-break/space
    elements, strip every other tag (span/a/bookmark wrappers),
    decode entities LAST (so literal ``&lt;`` never becomes a tag)."""
    def sub(m: re.Match) -> str:
        tok = m.group(0)
        if tok.startswith("<text:tab"):
            return "\t"
        if tok.startswith("<text:line-break"):
            return "\n"
        # boundary-checked: "<text:span ...>" also starts with
        # "<text:s" but is a formatting wrapper to strip, not spaces
        if re.match(r"<text:s[\s/>]", tok):
            return " " * int(m.group(1) or 1)
        return ""
    return _xml_unescape(_INLINE_RE.sub(sub, body))


def odt_text(data: bytes) -> str:
    """Visible text of an .odt (module-docstring contract)."""
    return odt_extract(data)["text"]


def odt_extract(data: bytes) -> dict:
    """One-pass extraction: ``text`` + ``paragraphs``/``tables`` from
    a single read of ``content.xml`` (the Arrow operator calls THIS —
    one unzip per document, not two)."""
    xml = _content_part(data, "text")
    out = []
    for pm in _P_RE.finditer(xml):
        out.append(_para_text(pm.group(1)) if pm.group(1) is not None
                   else "")
    return {
        "text": "\n".join(out),
        "paragraphs": len(out),
        "tables": len(re.findall(r"<table:table[ >/]", xml)),
        "chars": len(xml),
    }


def odt_info(data: bytes) -> dict:
    """Structural metadata: paragraph/table counts and the part size
    (pipelines route on these before extracting)."""
    info = odt_extract(data)
    return {k: info[k] for k in ("paragraphs", "tables", "chars")}


# ------------------------------------------- spreadsheet (.ods, r16)

ODS_MIME = "application/vnd.oasis.opendocument.spreadsheet"

_ODS_MANIFEST = _MANIFEST.replace(b"opendocument.text",
                                  b"opendocument.spreadsheet")

_TABLE_RE = re.compile(
    r'<table:table\s[^>]*?table:name="([^"]*)"[^>]*>(.*?)</table:table>',
    re.S)
_TROW_RE = re.compile(
    r"<table:table-row(?:\s[^>]*?)?/>|"
    r"<table:table-row(?:\s[^>]*)?>(.*?)</table:table-row>", re.S)
# the paired close tag must match the OPEN tag's covered-ness (a
# backreference on an always-participating group): a plain
# </table:table-cell> close would let a covered cell's non-greedy
# body swallow the following normal cell
_TCELL_RE = re.compile(
    r"<table:(?:covered-)?table-cell(?:\s[^>]*?)?/>|"
    r"<table:((?:covered-)?)table-cell(\s[^>]*)?>(.*?)"
    r"</table:\1table-cell>",
    re.S)
_REPEAT_RE = re.compile(r'table:number-columns-repeated="(\d+)"')
_ROWREPEAT_RE = re.compile(r'table:number-rows-repeated="(\d+)"')
_MAX_REPEAT = 4096      # trailing-filler bomb guard (real sheets pad
#                         to 16384 columns; only positions advance)


def encode_ods_cells(rows: list[list], sheet: str = "Sheet1") -> bytes:
    """Deterministic one-table .ods mirroring ``encode_xlsx_cells``:
    strings as text cells, ints/floats as float cells whose DISPLAY
    text is ``repr``-stable, ``None`` skipped (position advances).
    Stored-first mimetype, fixed timestamps — byte-identical across
    runs."""
    body = []
    for row in rows:
        cells = []
        for val in row:
            if val is None:
                cells.append("<table:table-cell/>")
            elif isinstance(val, (int, float)) and not isinstance(
                    val, bool):
                cells.append(
                    '<table:table-cell office:value-type="float" '
                    'office:value="%r"><text:p>%r</text:p>'
                    "</table:table-cell>" % (val, val))
            else:
                cells.append(
                    '<table:table-cell office:value-type="string">'
                    "<text:p>%s</text:p></table:table-cell>"
                    % _xml_escape(str(val)))
        body.append("<table:table-row>%s</table:table-row>"
                    % "".join(cells))
    content = (
        b'<?xml version="1.0" encoding="UTF-8"?>'
        b'<office:document-content xmlns:office="urn:oasis:names:tc:'
        b'opendocument:xmlns:office:1.0" xmlns:table="urn:oasis:names'
        b':tc:opendocument:xmlns:table:1.0" xmlns:text="urn:oasis:'
        b'names:tc:opendocument:xmlns:text:1.0" office:version="1.3">'
        b"<office:body><office:spreadsheet>"
        + ('<table:table table:name="%s">%s</table:table>'
           % (_xml_escape(sheet), "".join(body))).encode("utf-8")
        + b"</office:spreadsheet></office:body>"
          b"</office:document-content>")
    import io as _io
    import zipfile as _zf
    buf = _io.BytesIO()
    with _zf.ZipFile(buf, "w") as z:
        mi = _zf.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0))
        z.writestr(mi, ODS_MIME, compress_type=_zf.ZIP_STORED)
        for name, data in (("META-INF/manifest.xml", _ODS_MANIFEST),
                           ("content.xml", content)):
            zi = _zf.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            z.writestr(zi, data, compress_type=_zf.ZIP_DEFLATED)
    return buf.getvalue()


def ods_extract(data: bytes) -> dict:
    """One-pass .ods extraction mirroring ``xlsx_extract``: ``cells``
    as ``(table_name, A1-style ref, display_text)`` in document order
    (refs computed from position — ODF cells carry no refs). Repeat
    semantics (r16 review): EMPTY/covered ``number-columns-repeated``
    fillers advance the position in FULL (a position is just an
    integer — the 16384-column trailing filler costs nothing, and
    capping it would corrupt following refs); NON-EMPTY repeats emit
    that many cells and are bomb-guarded LOUDLY (a ``ValueError``,
    never a silent truncation that would make ``units`` disagree with
    the document)."""
    from .ooxmlcodec import _col_letters
    xml = _content_part(data, "spreadsheet")
    cells: list[tuple[str, str, str]] = []
    blocks: list[str] = []
    for tm in _TABLE_RE.finditer(xml):
        name, body = _xml_unescape(tm.group(1)), tm.group(2)
        row_seq = 0
        row_texts: list[str] = []
        for rm in _TROW_RE.finditer(body):
            head = rm.group(0)[:rm.group(0).find(">") + 1]
            rrep = _ROWREPEAT_RE.search(head)
            nrows = int(rrep.group(1)) if rrep else 1
            rbody = rm.group(1)
            texts_vals: list[tuple[int, str]] = []
            if rbody is not None:
                col_seq = 0
                for cm in _TCELL_RE.finditer(rbody):
                    chead = cm.group(0)[:cm.group(0).find(">") + 1]
                    crep = _REPEAT_RE.search(chead)
                    ncols = int(crep.group(1)) if crep else 1
                    inner = cm.group(3)
                    covered = (cm.group(0)
                               .startswith("<table:covered-"))
                    if inner and not covered:
                        val = "\n".join(
                            _para_text(p.group(1))
                            if p.group(1) is not None else ""
                            for p in _P_RE.finditer(inner))
                        if val:
                            if ncols > _MAX_REPEAT:
                                raise ValueError(
                                    f"ODS cell repeat {ncols} exceeds "
                                    f"the {_MAX_REPEAT} emission bomb "
                                    "guard")
                            for k in range(ncols):
                                texts_vals.append((col_seq + k, val))
                    col_seq += ncols
            if texts_vals and nrows > _MAX_REPEAT:
                raise ValueError(
                    f"ODS row repeat {nrows} exceeds the "
                    f"{_MAX_REPEAT} emission bomb guard")
            if not texts_vals:
                row_seq += nrows     # empty filler rows: advance only
                continue
            for _ in range(nrows):
                row_seq += 1
                for col, val in texts_vals:
                    cells.append((name,
                                  f"{_col_letters(col)}{row_seq}",
                                  val))
            row_texts.extend(
                "\t".join(v for _c, v in texts_vals)
                for _ in range(nrows))
        blocks.append("\n".join(row_texts))
    return {
        "text": "\n\n".join(b for b in blocks if b),
        "cells": cells,
        "tables": len(blocks),
        "units": len(cells),
    }


def ods_text(data: bytes) -> str:
    """Flat text of an .ods (module-docstring contract)."""
    return ods_extract(data)["text"]
