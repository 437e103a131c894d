"""DOCX text codec (operators/docxcodec.py): write/read symmetry
(stdlib zipfile; no Office tooling in this environment), the
run/paragraph/break extraction contract, entity decoding, refusal
paths, and the Arrow operator wrapper."""

from __future__ import annotations

import io
import zipfile

import pytest

from datasketches_spark_spark.operators.docxcodec import (
    docx_info, docx_text, encode_docx_text)


class TestRoundtrip:
    def test_paragraphs_roundtrip(self):
        paras = ["First paragraph.", "Second one, with punctuation!",
                 "Tab\there and break\nhere."]
        payload = encode_docx_text(paras)
        assert payload[:4] == b"PK\x03\x04"
        assert docx_text(payload) == "\n".join(paras)
        info = docx_info(payload)
        assert info["paragraphs"] == 3 and info["tables"] == 0

    def test_xml_specials_escape_and_decode(self):
        paras = ["a < b & c > d \"quoted\" 'single'"]
        assert docx_text(encode_docx_text(paras)) == paras[0]

    def test_byte_determinism(self):
        assert encode_docx_text(["same"]) == encode_docx_text(["same"])

    def test_unicode_text(self):
        paras = ["café naïve — em"]
        assert docx_text(encode_docx_text(paras)) == paras[0]

    def test_empty_paragraph_kept(self):
        assert docx_text(encode_docx_text(["a", "", "b"])) == "a\n\nb"


class TestWildShapes:
    def _pkg(self, document_xml: str) -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", document_xml)
        return buf.getvalue()

    def test_numeric_entities_and_attrs(self):
        xml = ('<w:document><w:body>'
               '<w:p w14:x="1"><w:r><w:t>d&#97;sh&#x2014;ok</w:t>'
               '</w:r></w:p></w:body></w:document>')
        assert docx_text(self._pkg(xml)) == "dash—ok"

    def test_multi_run_concatenation(self):
        xml = ('<w:document><w:body><w:p>'
               '<w:r><w:t>one </w:t></w:r>'
               '<w:r><w:rPr/><w:t>two</w:t></w:r>'
               '<w:r><w:cr/><w:t>three</w:t></w:r>'
               '</w:p></w:body></w:document>')
        assert docx_text(self._pkg(xml)) == "one two\nthree"

    def test_table_paragraphs_counted(self):
        xml = ('<w:document><w:body><w:tbl><w:tr><w:tc>'
               '<w:p><w:r><w:t>cell</w:t></w:r></w:p>'
               '</w:tc></w:tr></w:tbl></w:body></w:document>')
        assert docx_text(self._pkg(xml)) == "cell"
        assert docx_info(self._pkg(xml))["tables"] == 1


class TestRefusals:
    def test_legacy_doc_raises(self):
        ole = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 64
        with pytest.raises(NotImplementedError, match="OLE"):
            docx_text(ole)

    def test_non_zip_raises(self):
        with pytest.raises(ValueError, match="ZIP"):
            docx_text(b"plain text, not a package")

    def test_zip_without_document_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", "<x/>")
        with pytest.raises(ValueError, match="word/document.xml"):
            docx_text(buf.getvalue())

    def test_part_bomb_guard(self):
        from datasketches_spark_spark.operators import docxcodec as dc
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("word/document.xml", b"\0" * (1 << 20))
        payload = buf.getvalue()
        old = dc._MAX_PART_BYTES
        dc._MAX_PART_BYTES = 1 << 16
        try:
            with pytest.raises(ValueError, match="bomb guard"):
                docx_text(payload)
        finally:
            dc._MAX_PART_BYTES = old


class TestOperator:
    def test_extract_docx_text_operator(self, spark):
        from datasketches_spark_spark.operators import extract_docx_text
        rows = [(1, bytearray(encode_docx_text(["hello docx"]))),
                (2, bytearray(encode_docx_text(["p1", "p2"])))]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {r.id: (r.text, r.paragraphs) for r in
               extract_docx_text(df, "id").collect()}
        assert out[1] == ("hello docx", 1)
        assert out[2] == ("p1\np2", 2)


class TestReviewFixes:
    """r15 second-review regressions."""

    def test_self_closing_paragraph_with_attrs(self):
        xml = ('<w:document><w:body>'
               '<w:p w:rsidR="00AB12EF"/>'
               '<w:p><w:r><w:t>hello</w:t></w:r></w:p>'
               '<w:p><w:r><w:t>world</w:t></w:r></w:p>'
               '</w:body></w:document>')
        pkg = TestWildShapes()._pkg(xml)
        assert docx_text(pkg) == "\nhello\nworld"
        assert docx_info(pkg)["paragraphs"] == 3

    def test_surrogate_entities_stay_literal(self):
        xml = ('<w:document><w:body><w:p><w:r>'
               '<w:t>a&#xD800;b</w:t></w:r></w:p>'
               '</w:body></w:document>')
        assert docx_text(TestWildShapes()._pkg(xml)) == "a&#xD800;b"

    def test_bad_payload_is_null_row_not_job_abort(self, spark):
        from datasketches_spark_spark.operators import extract_docx_text
        ole = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 64
        rows = [(1, bytearray(encode_docx_text(["good"]))),
                (2, bytearray(ole)),
                (3, bytearray(b"neither zip nor ole"))]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {r.id: r.text for r in
               extract_docx_text(df, "id").collect()}
        assert out[1] == "good"
        assert out[2] is None and out[3] is None

    def test_single_pass_extract(self):
        from datasketches_spark_spark.operators.docxcodec import \
            docx_extract
        info = docx_extract(encode_docx_text(["a", "b"]))
        assert info["text"] == "a\nb" and info["paragraphs"] == 2
