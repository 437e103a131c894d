"""XLSX / PPTX text codecs — stdlib zipfile + the OOXML subsets.

Completes the Office-document triple started by ``docxcodec.py``
(ECMA-376, public): SpreadsheetML cell extraction (crawled
spreadsheets carry tables pipelines mine as structured text) and
PresentationML slide text. Same conventions as the DOCX codec —
write/read symmetry (deterministic writers: fixed ZIP timestamps,
stable member order; no Office tooling exists in this environment),
loud refusals (OLE ``.xls``/``.ppt``, non-OOXML ZIPs), per-part
decompression bomb guards, and the surrogate-safe XML entity decode
shared from ``docxcodec``.

XLSX extraction contract: every sheet part (``xl/worksheets/
sheet*.xml``, workbook order = part-name order) yields its cells as
``(sheet, ref, value)`` — shared strings (``t="s"`` indexing
``xl/sharedStrings.xml``), inline strings (``t="inlineStr"``),
formula-string results (``t="str"``) and plain numeric ``<v>`` all
resolve to their TEXT value; formulas themselves (``<f>``) are not
evaluated (the cached ``<v>`` is the value, per spec §18.3.1.40).

PPTX extraction contract: every slide part (``ppt/slides/
slide*.xml``, deck order = numeric part order) yields its visible
text — DrawingML ``<a:t>`` runs concatenate within a paragraph
(``<a:p>``), paragraphs join with newlines, slides with blank lines.
"""

from __future__ import annotations

import io
import re
import zipfile

from .docxcodec import (MAX_INPUT_BYTES, _MAX_PART_BYTES,
                        _xml_escape, _xml_unescape)

__all__ = ["encode_xlsx_cells", "xlsx_cells", "xlsx_text",
           "xlsx_extract", "encode_pptx_text", "pptx_text",
           "pptx_extract"]

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _open_pkg(data: bytes, marker: str, kind: str) -> zipfile.ZipFile:
    data = bytes(data)
    if len(data) > MAX_INPUT_BYTES:
        raise ValueError(f"{kind} payload {len(data)} B exceeds the "
                         f"{MAX_INPUT_BYTES} B bomb guard")
    if data[:8] == _OLE_MAGIC:
        raise NotImplementedError(
            f"legacy OLE compound document (binary {kind} / encrypted "
            "OOXML): needs the CFB parser; convert or decrypt upstream")
    if data[:4] != b"PK\x03\x04":
        raise ValueError(f"not a ZIP package (missing PK magic)")
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as ex:
        raise ValueError(f"unreadable ZIP package: {ex}") from ex
    if not any(n.startswith(marker) for n in z.namelist()):
        z.close()
        raise ValueError(
            f"no {marker}* part — a ZIP but not a {kind} package")
    return z


def _read_part(z: zipfile.ZipFile, name: str) -> str:
    info = z.getinfo(name)
    if info.file_size > _MAX_PART_BYTES:
        raise ValueError(f"{name} claims {info.file_size} B, over "
                         f"the {_MAX_PART_BYTES} B part bomb guard")
    return z.read(info).decode("utf-8", "replace")


def _zip_write(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zi.external_attr = 0o644 << 16
            z.writestr(zi, data)
    return buf.getvalue()


# ----------------------------------------------------------------- xlsx

def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        out = chr(65 + r) + out
    return out


def encode_xlsx_cells(rows: list[list], sheet: str = "Sheet1") -> bytes:
    """Deterministic one-sheet .xlsx: strings as inline strings,
    ints/floats as numeric cells (``repr``-stable), ``None`` skipped.
    Fixed ZIP timestamps and member order — byte-identical across
    runs."""
    body = []
    for r, row in enumerate(rows, 1):
        cells = []
        for c, val in enumerate(row):
            if val is None:
                continue
            ref = f"{_col_letters(c)}{r}"
            if isinstance(val, (int, float)) and not isinstance(
                    val, bool):
                cells.append('<c r="%s"><v>%r</v></c>' % (ref, val))
            else:
                cells.append(
                    '<c r="%s" t="inlineStr"><is><t xml:space='
                    '"preserve">%s</t></is></c>'
                    % (ref, _xml_escape(str(val))))
        body.append('<row r="%d">%s</row>' % (r, "".join(cells)))
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>%s</sheetData>'
        '</worksheet>' % "".join(body)).encode()
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main"><sheets><sheet name="%s" '
          'sheetId="1" r:id="rId1" xmlns:r="http://schemas.'
          'openxmlformats.org/officeDocument/2006/relationships"/>'
          '</sheets></workbook>' % _xml_escape(sheet)).encode()
    ct = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          b'<Types xmlns="http://schemas.openxmlformats.org/package/'
          b'2006/content-types">'
          b'<Default Extension="rels" ContentType="application/vnd.'
          b'openxmlformats-package.relationships+xml"/>'
          b'<Default Extension="xml" ContentType="application/xml"/>'
          b'<Override PartName="/xl/workbook.xml" ContentType='
          b'"application/vnd.openxmlformats-officedocument.'
          b'spreadsheetml.sheet.main+xml"/></Types>')
    rels = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            b'<Relationships xmlns="http://schemas.openxmlformats.org'
            b'/package/2006/relationships"><Relationship Id="rId1" '
            b'Type="http://schemas.openxmlformats.org/officeDocument/'
            b'2006/relationships/officeDocument" Target="xl/workbook.'
            b'xml"/></Relationships>')
    return _zip_write([("[Content_Types].xml", ct),
                       ("_rels/.rels", rels),
                       ("xl/workbook.xml", wb),
                       ("xl/worksheets/sheet1.xml", sheet_xml)])


# self-closing cells FIRST (styled-but-empty <c r="A1" s="1"/> is
# ubiquitous in real Excel output — the paired alternative's [^>]*
# would swallow the '/' and merge it into the next cell, the same
# swallow family docxcodec's paragraph regex documents)
_CELL_RE = re.compile(
    r'<c\b[^>]*?/>|<c\b([^>]*)>(.*?)</c>', re.S)
# self-closing rows too: some producers emit <row r="N"/> for empty
# styled rows; skipping them would desync row_seq and give following
# r=-less rows wrong implied cell refs (r15 ADVICE)
_ROW_RE = re.compile(r"<row\b([^>]*?)/>|<row\b([^>]*)>(.*?)</row>", re.S)
_V_RE = re.compile(r"<v>(.*?)</v>", re.S)
_IS_T_RE = re.compile(r"<t(?:\s[^>]*)?>(.*?)</t>", re.S)
_SI_RE = re.compile(r"<si>(.*?)</si>", re.S)


def _col_index(letters: str) -> int:
    col = 0
    for ch in letters:
        col = col * 26 + ord(ch) - 64
    return col


def xlsx_extract(data: bytes) -> dict:
    """One-pass extraction: ``cells`` as ``(sheet_part, cell_ref,
    text_value)`` in document order, the flat ``text`` view (cells
    tab-joined within a row, rows newline-joined, sheets separated by
    blank lines), and ``units`` (cell count) — ONE unzip per
    document. Sheets order NUMERICALLY (sheet10 after sheet9, not
    after sheet1); cells without an ``r=`` attribute take their
    spec-implied position (next column after the previous cell), so
    text and units always agree."""
    with _open_pkg(data, "xl/", "XLSX") as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = _read_part(z, "xl/sharedStrings.xml")
            for si in _SI_RE.finditer(sst):
                shared.append("".join(
                    _xml_unescape(m.group(1))
                    for m in _IS_T_RE.finditer(si.group(1))))
        cells: list[tuple[str, str, str]] = []
        sheet_blocks: list[str] = []
        sheets = sorted(
            (n for n in z.namelist()
             if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[1])
                              .group(0)))
        for part in sheets:
            xml = _read_part(z, part)
            sheet = part.rsplit("/", 1)[1].rsplit(".", 1)[0]
            row_texts: list[str] = []
            row_seq = 0
            for rm_ in _ROW_RE.finditer(xml):
                if rm_.group(1) is not None:
                    # self-closing empty row: no cells, but it still
                    # advances the implied row counter
                    rnum = re.search(r'r="(\d+)"', rm_.group(1))
                    row_seq = int(rnum.group(1)) if rnum else row_seq + 1
                    continue
                rattrs, rbody = rm_.group(2), rm_.group(3)
                rnum = re.search(r'r="(\d+)"', rattrs)
                row_seq = int(rnum.group(1)) if rnum else row_seq + 1
                col_seq = 0
                vals: list[str] = []
                for cm in _CELL_RE.finditer(rbody):
                    attrs, body = cm.group(1), cm.group(2)
                    if attrs is None:
                        # self-closing: no value, but it ADVANCES the
                        # implied position when it carries a ref
                        sm = re.search(r'r="([A-Z]+)\d+"',
                                       cm.group(0))
                        if sm:
                            col_seq = _col_index(sm.group(1))
                        else:
                            col_seq += 1
                        continue
                    rm2 = re.search(r'r="([A-Z]+)(\d+)"', attrs)
                    if rm2:
                        col_seq = _col_index(rm2.group(1))
                        ref = rm2.group(1) + rm2.group(2)
                    else:
                        col_seq += 1
                        ref = _col_letters(col_seq - 1) + str(row_seq)
                    tm = re.search(r't="(\w+)"', attrs)
                    ctype = tm.group(1) if tm else "n"
                    if ctype == "inlineStr":
                        val = "".join(
                            _xml_unescape(m.group(1))
                            for m in _IS_T_RE.finditer(body))
                    elif ctype == "s":
                        vm = _V_RE.search(body)
                        idx = int(vm.group(1)) if vm else -1
                        val = (shared[idx]
                               if 0 <= idx < len(shared) else "")
                    else:                    # n / str / b: cached <v>
                        vm = _V_RE.search(body)
                        val = _xml_unescape(vm.group(1)) if vm else ""
                    if val != "":
                        cells.append((sheet, ref, val))
                        vals.append(val)
                if vals:
                    row_texts.append("\t".join(vals))
            sheet_blocks.append("\n".join(row_texts))
        return {"cells": cells,
                "text": "\n\n".join(sheet_blocks),
                "units": len(cells)}


def xlsx_cells(data: bytes) -> list[tuple[str, str, str]]:
    """All cells as ``(sheet_part, cell_ref, text_value)`` in
    document order (module-docstring contract)."""
    return xlsx_extract(data)["cells"]


def xlsx_text(data: bytes) -> str:
    """Flat text view — the mineable-table form for the text-quality
    / dedup stack (see :func:`xlsx_extract`)."""
    return xlsx_extract(data)["text"]


# ----------------------------------------------------------------- pptx

def encode_pptx_text(slides: list[str]) -> bytes:
    """Deterministic .pptx: one text box per slide, one DrawingML
    paragraph per input line. Byte-identical across runs."""
    if not isinstance(slides, list):
        raise ValueError("encode_pptx_text needs a list of slides")
    members: list[tuple[str, bytes]] = []
    overrides = []
    for i, text in enumerate(slides, 1):
        paras = "".join(
            '<a:p><a:r><a:t>%s</a:t></a:r></a:p>'
            % _xml_escape(line) for line in text.split("\n"))
        slide = ('<?xml version="1.0" encoding="UTF-8" standalone='
                 '"yes"?><p:sld xmlns:p="http://schemas.'
                 'openxmlformats.org/presentationml/2006/main" '
                 'xmlns:a="http://schemas.openxmlformats.org/'
                 'drawingml/2006/main"><p:cSld><p:spTree><p:sp>'
                 '<p:txBody>%s</p:txBody></p:sp></p:spTree></p:cSld>'
                 '</p:sld>' % paras).encode()
        members.append(("ppt/slides/slide%d.xml" % i, slide))
        overrides.append(
            '<Override PartName="/ppt/slides/slide%d.xml" ContentType'
            '="application/vnd.openxmlformats-officedocument.'
            'presentationml.slide+xml"/>' % i)
    ct = (('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           '<Types xmlns="http://schemas.openxmlformats.org/package/'
           '2006/content-types">'
           '<Default Extension="rels" ContentType="application/vnd.'
           'openxmlformats-package.relationships+xml"/>'
           '<Default Extension="xml" ContentType="application/xml"/>'
           '<Override PartName="/ppt/presentation.xml" ContentType='
           '"application/vnd.openxmlformats-officedocument.'
           'presentationml.presentation.main+xml"/>%s</Types>')
          % "".join(overrides)).encode()
    pres = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            b'<p:presentation xmlns:p="http://schemas.openxmlformats.'
            b'org/presentationml/2006/main"/>')
    rels = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            b'<Relationships xmlns="http://schemas.openxmlformats.org'
            b'/package/2006/relationships"><Relationship Id="rId1" '
            b'Type="http://schemas.openxmlformats.org/officeDocument/'
            b'2006/relationships/officeDocument" Target="ppt/'
            b'presentation.xml"/></Relationships>')
    return _zip_write([("[Content_Types].xml", ct),
                       ("_rels/.rels", rels),
                       ("ppt/presentation.xml", pres)] + members)


_A_T_RE = re.compile(r"<a:t(?:\s[^>]*)?>(.*?)</a:t>", re.S)
# self-closing paragraphs FIRST (the docxcodec <w:p .../> rule)
_A_P_RE = re.compile(
    r"<a:p(?:\s[^>]*?)?/>|<a:p(?:\s[^>]*)?>.*?</a:p>", re.S)


def pptx_extract(data: bytes) -> dict:
    """One-pass extraction: slide ``text`` (numeric part order,
    paragraphs newline-joined, slides separated by blank lines) and
    ``units`` = the SLIDE COUNT from the parts list — never
    reverse-engineered from the joined text, which miscounts when a
    slide contains consecutive empty paragraphs."""
    with _open_pkg(data, "ppt/", "PPTX") as z:
        parts = sorted(
            (n for n in z.namelist()
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[1])
                              .group(0)))
        slides = []
        for part in parts:
            xml = _read_part(z, part)
            paras = []
            for pm in _A_P_RE.finditer(xml):
                txt = "".join(_xml_unescape(m.group(1))
                              for m in _A_T_RE.finditer(pm.group(0)))
                paras.append(txt)
            slides.append("\n".join(paras))
        return {"text": "\n\n".join(slides), "units": len(parts)}


def pptx_text(data: bytes) -> str:
    """Visible slide text (module-docstring contract)."""
    return pptx_extract(data)["text"]
