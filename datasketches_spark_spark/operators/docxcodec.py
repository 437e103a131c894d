"""Minimal DOCX text codec — stdlib zipfile + the OOXML text subset.

DOCX (ECMA-376 / ISO 29500 WordprocessingML, public) is the dominant
word-processor format in crawled attachments. A .docx is a ZIP
package whose main part, ``word/document.xml``, carries text in
``<w:t>`` runs inside ``<w:p>`` paragraphs — extraction needs no
layout engine, just the package and the run/paragraph/break elements.
No Office tooling exists in this environment, so this module follows
the engine's write/read-symmetry convention (``operators/warc.py``,
``pdfcodec.py``): a DETERMINISTIC writer (fixed ZIP timestamps,
stable member order, no revision IDs) and an extractor handling the
writer's subset plus the common wild shapes.

Extraction contract: paragraphs (``<w:p>``) join with ``\\n``; within
a paragraph, ``<w:t>`` run text concatenates (XML entities decoded:
the five predefined + numeric references), ``<w:tab/>`` becomes a tab
and ``<w:br/>`` / ``<w:cr/>`` become newlines; everything else
(formatting, tables' cell structure beyond their paragraphs,
headers/footers in other parts) is ignored — same altitude as
``html_to_text``. Honest refusals: legacy ``.doc`` (OLE CFB magic)
and non-ZIP payloads raise; an OOXML package without
``word/document.xml`` raises (it's a different Office species —
xlsx/pptx); per-entry size is bomb-guarded before decompression.
"""

from __future__ import annotations

import io
import re
import zipfile

__all__ = ["encode_docx_text", "docx_text", "docx_info",
           "docx_extract"]

MAX_INPUT_BYTES = 256 << 20
_MAX_PART_BYTES = 64 << 20

_CONTENT_TYPES = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    b'content-types">'
    b'<Default Extension="rels" ContentType="application/vnd.'
    b'openxmlformats-package.relationships+xml"/>'
    b'<Default Extension="xml" ContentType="application/xml"/>'
    b'<Override PartName="/word/document.xml" ContentType="application'
    b'/vnd.openxmlformats-officedocument.wordprocessingml.document.'
    b'main+xml"/></Types>')

_RELS = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Relationships xmlns="http://schemas.openxmlformats.org/package'
    b'/2006/relationships"><Relationship Id="rId1" Type="http://'
    b'schemas.openxmlformats.org/officeDocument/2006/relationships/'
    b'officeDocument" Target="word/document.xml"/></Relationships>')

_W_NS = ("http://schemas.openxmlformats.org/wordprocessingml/2006/"
         "main")


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def encode_docx_text(paragraphs: list[str]) -> bytes:
    """Deterministic minimal .docx: one ``<w:p>`` per input paragraph
    (``\\t`` becomes ``<w:tab/>``, ``\\n`` inside a paragraph becomes
    ``<w:br/>``), fixed ZIP timestamps (1980-01-01) and member order
    — byte-identical across runs."""
    if not isinstance(paragraphs, list):
        raise ValueError("encode_docx_text needs a list of paragraphs")
    body = []
    for p in paragraphs:
        runs = []
        for piece in re.split(r"([\t\n])", p):
            if piece == "\t":
                runs.append("<w:tab/>")
            elif piece == "\n":
                runs.append("<w:br/>")
            elif piece:
                runs.append('<w:t xml:space="preserve">%s</w:t>'
                            % _xml_escape(piece))
        body.append("<w:p><w:r>%s</w:r></w:p>" % "".join(runs))
    doc = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           '<w:document xmlns:w="%s"><w:body>%s</w:body>'
           '</w:document>' % (_W_NS, "".join(body))).encode("utf-8")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in (("[Content_Types].xml", _CONTENT_TYPES),
                           ("_rels/.rels", _RELS),
                           ("word/document.xml", doc)):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zi.external_attr = 0o644 << 16
            z.writestr(zi, data)
    return buf.getvalue()


_ENT = {"amp": "&", "lt": "<", "gt": ">", "quot": "\"", "apos": "'"}


def _xml_unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            cp = int(body[2:], 16)
        elif body.startswith("#"):
            cp = int(body[1:])
        else:
            return _ENT.get(body, m.group(0))
        # exclude surrogates: a lone chr(0xD800) poisons downstream
        # UTF-8 (Arrow serialization of the batch would fail)
        if 0 < cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
            return chr(cp)
        return m.group(0)
    return re.sub(r"&(#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|[a-z]+);",
                  sub, s)


def _main_part(data: bytes) -> str:
    data = bytes(data)
    if len(data) > MAX_INPUT_BYTES:
        raise ValueError(f"DOCX payload {len(data)} B exceeds the "
                         f"{MAX_INPUT_BYTES} B bomb guard")
    if data[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise NotImplementedError(
            "legacy OLE compound document (.doc / encrypted OOXML): "
            "binary WordprocessingML needs the CFB parser; convert "
            "upstream or decrypt first")
    if data[:4] != b"PK\x03\x04":
        raise ValueError("not a ZIP package (missing PK magic)")
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as ex:
        raise ValueError(f"unreadable ZIP package: {ex}") from ex
    with z:
        try:
            info = z.getinfo("word/document.xml")
        except KeyError:
            raise ValueError(
                "no word/document.xml — a ZIP but not a DOCX "
                "(xlsx/pptx/plain archives route elsewhere)") from None
        if info.file_size > _MAX_PART_BYTES:
            raise ValueError(
                f"word/document.xml claims {info.file_size} B, over "
                f"the {_MAX_PART_BYTES} B part bomb guard")
        return z.read(info).decode("utf-8", "replace")


def docx_text(data: bytes) -> str:
    """Visible text of a .docx (module-docstring contract)."""
    return docx_extract(data)["text"]


def docx_extract(data: bytes) -> dict:
    """One-pass extraction: ``text`` + ``paragraphs``/``tables`` from
    a single read of ``word/document.xml`` (the Arrow operator calls
    THIS — one unzip per document, not two)."""
    xml = _main_part(data)
    out = []
    # self-closing paragraphs FIRST — real Word output is full of
    # rsid-attributed <w:p .../>, and the paired alternative's
    # [^>]* would swallow the '/' and merge it into the next <w:p>
    for pm in re.finditer(
            r"<w:p(?:\s[^>]*?)?/>|<w:p(?:\s[^>]*)?>.*?</w:p>",
            xml, re.S):
        para = pm.group(0)
        pieces = []
        for m in re.finditer(
                r"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab/>|"
                r"<w:br(?:\s[^>]*)?/>|<w:cr/>", para, re.S):
            # dispatch on the capture group — "<w:tab/>" also starts
            # with "<w:t", so a prefix test misroutes tabs
            if m.group(1) is not None:
                pieces.append(_xml_unescape(m.group(1)))
            elif m.group(0).startswith("<w:tab"):
                pieces.append("\t")
            else:
                pieces.append("\n")
        out.append("".join(pieces))
    return {
        "text": "\n".join(out),
        "paragraphs": len(out),
        "tables": len(re.findall(r"<w:tbl[ >/]", xml)),
        "chars": len(xml),
    }


def docx_info(data: bytes) -> dict:
    """Structural metadata: paragraph/table counts and the part size
    (pipelines route on these before extracting). Paragraph count is
    the EXTRACTOR's count, so text lines and paragraphs stay
    consistent (a self-closing ``<w:p/>`` is one empty paragraph)."""
    info = docx_extract(data)
    return {k: info[k] for k in ("paragraphs", "tables", "chars")}
