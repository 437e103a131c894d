"""XLSX/PPTX text codecs (operators/ooxmlcodec.py): write/read
symmetry, shared-string and inline-string paths, refusals, and the
Arrow operator wrappers."""

from __future__ import annotations

import io
import zipfile

import pytest

from datasketches_spark_spark.operators.ooxmlcodec import (
    encode_pptx_text, encode_xlsx_cells, pptx_text, xlsx_cells,
    xlsx_text)


class TestXlsx:
    def test_roundtrip_mixed_types(self):
        rows = [["name", "qty", "price"],
                ["widget & co", 3, 2.5],
                ["rope <thick>", 12, 0.75]]
        payload = encode_xlsx_cells(rows)
        assert payload[:4] == b"PK\x03\x04"
        cells = xlsx_cells(payload)
        assert ("sheet1", "A2", "widget & co") in cells
        assert ("sheet1", "B2", "3") in cells
        assert ("sheet1", "C3", "0.75") in cells
        assert xlsx_text(payload) == (
            "name\tqty\tprice\nwidget & co\t3\t2.5\n"
            "rope <thick>\t12\t0.75")

    def test_none_cells_skipped_and_refs_correct(self):
        cells = xlsx_cells(encode_xlsx_cells([[None, "b"], ["a"]]))
        assert cells == [("sheet1", "B1", "b"), ("sheet1", "A2", "a")]

    def test_wide_column_letters(self):
        row = [None] * 27 + ["ab"]          # column index 27 -> AB
        cells = xlsx_cells(encode_xlsx_cells([row]))
        assert cells == [("sheet1", "AB1", "ab")]

    def test_byte_determinism(self):
        assert encode_xlsx_cells([["x", 1]]) \
            == encode_xlsx_cells([["x", 1]])

    def test_shared_strings_path(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", "<workbook/>")
            z.writestr("xl/sharedStrings.xml",
                       "<sst><si><t>hello</t></si>"
                       "<si><r><t>wor</t></r><r><t>ld</t></r></si>"
                       "</sst>")
            z.writestr("xl/worksheets/sheet1.xml",
                       '<worksheet><sheetData><row r="1">'
                       '<c r="A1" t="s"><v>0</v></c>'
                       '<c r="B1" t="s"><v>1</v></c>'
                       '<c r="C1"><v>42</v></c>'
                       '<c r="D1" t="s"><v>99</v></c>'  # out of range
                       '</row></sheetData></worksheet>')
        cells = xlsx_cells(buf.getvalue())
        assert cells == [("sheet1", "A1", "hello"),
                         ("sheet1", "B1", "world"),
                         ("sheet1", "C1", "42")]

    def test_refusals(self):
        ole = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 32
        with pytest.raises(NotImplementedError, match="OLE"):
            xlsx_cells(ole)
        with pytest.raises(ValueError, match="ZIP"):
            xlsx_cells(b"not zip")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", "<w/>")
        with pytest.raises(ValueError, match="XLSX"):
            xlsx_cells(buf.getvalue())


class TestPptx:
    def test_roundtrip(self):
        slides = ["Title slide\nsubtitle line",
                  "Second slide & last <one>"]
        payload = encode_pptx_text(slides)
        assert pptx_text(payload) == "\n\n".join(slides)

    def test_slide_order_is_numeric_not_lexicographic(self):
        payload = encode_pptx_text(
            ["s%d" % i for i in range(1, 13)])   # slide10 > slide2
        assert pptx_text(payload) == "\n\n".join(
            "s%d" % i for i in range(1, 13))

    def test_byte_determinism(self):
        assert encode_pptx_text(["x"]) == encode_pptx_text(["x"])

    def test_refusal_non_pptx_zip(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", "<w/>")
        with pytest.raises(ValueError, match="PPTX"):
            pptx_text(buf.getvalue())


class TestOperators:
    def test_extract_xlsx_text(self, spark):
        from datasketches_spark_spark.operators import extract_xlsx_text
        good = encode_xlsx_cells([["a", 1], ["b", 2]])
        rows = [(1, bytearray(good)), (2, bytearray(b"junk bytes"))]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {r.id: (r.text, r.units) for r in
               extract_xlsx_text(df, "id").collect()}
        assert out[1] == ("a\t1\nb\t2", 4)
        assert out[2] == (None, None)        # loud null, not abort

    def test_extract_pptx_text(self, spark):
        from datasketches_spark_spark.operators import extract_pptx_text
        good = encode_pptx_text(["one", "two"])
        rows = [(1, bytearray(good)),
                (2, bytearray(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1xx"))]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {r.id: (r.text, r.units) for r in
               extract_pptx_text(df, "id").collect()}
        assert out[1] == ("one\n\ntwo", 2)
        assert out[2] == (None, None)


class TestReviewFixes:
    """r15 third-review regressions."""

    def test_self_closing_cell_does_not_swallow_neighbor(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", "<workbook/>")
            z.writestr("xl/sharedStrings.xml",
                       "<sst><si><t>hello</t></si></sst>")
            z.writestr("xl/worksheets/sheet1.xml",
                       '<worksheet><sheetData><row r="1">'
                       '<c r="A1" s="1"/>'
                       '<c r="B1" t="s"><v>0</v></c>'
                       '</row></sheetData></worksheet>')
        assert xlsx_cells(buf.getvalue()) == [
            ("sheet1", "B1", "hello")]

    def test_sheets_order_numerically(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", "<workbook/>")
            for i in (1, 2, 10):
                z.writestr(
                    "xl/worksheets/sheet%d.xml" % i,
                    '<worksheet><sheetData><row r="1">'
                    '<c r="A1" t="inlineStr"><is><t>s%d</t></is></c>'
                    '</row></sheetData></worksheet>' % i)
        from datasketches_spark_spark.operators.ooxmlcodec import (
            xlsx_extract)
        assert xlsx_extract(buf.getvalue())["text"] == \
            "s1\n\ns2\n\ns10"

    def test_unref_cells_take_implied_position(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", "<workbook/>")
            z.writestr("xl/worksheets/sheet1.xml",
                       '<worksheet><sheetData><row>'
                       '<c t="inlineStr"><is><t>x</t></is></c>'
                       '<c t="inlineStr"><is><t>y</t></is></c>'
                       '</row></sheetData></worksheet>')
        from datasketches_spark_spark.operators.ooxmlcodec import (
            xlsx_extract)
        info = xlsx_extract(buf.getvalue())
        assert info["cells"] == [("sheet1", "A1", "x"),
                                 ("sheet1", "B1", "y")]
        assert info["text"] == "x\ty" and info["units"] == 2

    def test_pptx_self_closing_paragraph_with_space(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("ppt/slides/slide1.xml",
                       "<p:sld><a:p /><a:p><a:r><a:t>hi</a:t></a:r>"
                       "</a:p></p:sld>")
        assert pptx_text(buf.getvalue()) == "\nhi"

    def test_pptx_units_from_parts_not_text(self):
        from datasketches_spark_spark.operators.ooxmlcodec import (
            pptx_extract)
        one_slide = encode_pptx_text(["a\n\nb"])
        assert pptx_extract(one_slide)["units"] == 1
        empty_slide = encode_pptx_text([""])
        assert pptx_extract(empty_slide)["units"] == 1

    def test_corrupt_member_is_null_row_not_job_abort(self, spark):
        from datasketches_spark_spark.operators import extract_xlsx_text
        good = encode_xlsx_cells([["a"]])
        # corrupt the SHEET member's deflate bytes but keep the
        # central directory valid: flip bytes right after the sheet
        # part's local-header filename (zlib.error at read time —
        # not a ValueError, the contract the broad catch exists for)
        bad = bytearray(encode_xlsx_cells([["b"]]))
        at = bad.find(b"xl/worksheets/sheet1.xml")
        start = at + len(b"xl/worksheets/sheet1.xml")
        bad[start:start + 8] = b"\xff" * 8
        rows = [(1, bytearray(good)), (2, bad)]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {r.id: r.text for r in
               extract_xlsx_text(df, "id").collect()}
        assert out[1] == "a"
        assert out[2] is None


class TestR16AdviceFixes:
    """r15 ADVICE regressions."""

    def test_self_closing_row_advances_row_seq(self):
        # <row r="2"/> (empty styled row, some producers emit it
        # self-closing) must advance the implied row counter so the
        # following r=-less row lands on row 3, not row 2
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", "<workbook/>")
            z.writestr("xl/worksheets/sheet1.xml",
                       '<worksheet><sheetData>'
                       '<row r="1"><c t="inlineStr">'
                       '<is><t>top</t></is></c></row>'
                       '<row r="2" ht="12" customHeight="1"/>'
                       '<row><c t="inlineStr">'
                       '<is><t>below</t></is></c></row>'
                       '</sheetData></worksheet>')
        from datasketches_spark_spark.operators.ooxmlcodec import (
            xlsx_extract)
        info = xlsx_extract(buf.getvalue())
        assert info["cells"] == [("sheet1", "A1", "top"),
                                 ("sheet1", "A3", "below")]

    def test_self_closing_row_without_ref_advances_too(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", "<workbook/>")
            z.writestr("xl/worksheets/sheet1.xml",
                       '<worksheet><sheetData>'
                       '<row/>'
                       '<row><c t="inlineStr">'
                       '<is><t>v</t></is></c></row>'
                       '</sheetData></worksheet>')
        from datasketches_spark_spark.operators.ooxmlcodec import (
            xlsx_extract)
        assert xlsx_extract(buf.getvalue())["cells"] == [
            ("sheet1", "A2", "v")]
