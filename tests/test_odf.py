"""ODT codec (operators/odfcodec.py, r16): write/read symmetry (no
Office tool in this environment — the WARC convention), the ODF inline
elements (tab / line-break / run-length spaces), entity handling,
refusal paths, detect_ooxml routing consistency, and the Arrow
operator wrapper."""

from __future__ import annotations

import io
import zipfile

import pytest

from datasketches_spark_spark.operators.odfcodec import (
    ODT_MIME, encode_odt_text, odt_extract, odt_info, odt_text)


class TestRoundtrip:
    def test_paragraphs(self):
        paras = ["First paragraph.", "Second paragraph."]
        assert odt_text(encode_odt_text(paras)) == "\n".join(paras)

    def test_inline_elements(self):
        paras = ["tab\there", "line\nbreak", "two  spaces", "wide    gap"]
        assert odt_text(encode_odt_text(paras)) == "\n".join(paras)

    def test_entities_escape_and_decode(self):
        paras = ["a < b & c > d", "&amp; stays literal once"]
        assert odt_text(encode_odt_text(paras)) == "\n".join(paras)

    def test_unicode(self):
        paras = ["日本語テキスト", "ümlauts & ß"]
        assert odt_text(encode_odt_text(paras)) == "\n".join(paras)

    def test_deterministic(self):
        assert encode_odt_text(["x", "y"]) == encode_odt_text(["x", "y"])

    def test_info_counts(self):
        info = odt_info(encode_odt_text(["a", "b", "c"]))
        assert info["paragraphs"] == 3 and info["tables"] == 0

    def test_mimetype_member_stored_first(self):
        # ODF §3.3: sniffers (incl. this engine's detect_ooxml) read
        # the type without inflating
        z = zipfile.ZipFile(io.BytesIO(encode_odt_text(["x"])))
        first = z.infolist()[0]
        assert first.filename == "mimetype"
        assert first.compress_type == zipfile.ZIP_STORED
        assert z.read(first).decode() == ODT_MIME


class TestWildShapes:
    def _pkg(self, content_xml: str, mimetype: str | None = ODT_MIME):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            if mimetype is not None:
                z.writestr("mimetype", mimetype)
            z.writestr("content.xml", content_xml)
        return buf.getvalue()

    def test_headings_and_spans(self):
        xml = ('<office:document-content><office:body><office:text>'
               '<text:h text:outline-level="1">Title</text:h>'
               '<text:p>with <text:span text:style-name="T1">styled'
               '</text:span> run</text:p>'
               '</office:text></office:body></office:document-content>')
        assert odt_text(self._pkg(xml)) == "Title\nwith styled run"

    def test_self_closing_empty_paragraph(self):
        xml = ('<office:text><text:p>a</text:p><text:p/>'
               '<text:p>b</text:p></office:text>')
        assert odt_text(self._pkg(xml)) == "a\n\nb"

    def test_table_cell_paragraphs_in_order(self):
        xml = ('<office:text><text:p>before</text:p>'
               '<table:table><table:table-row><table:table-cell>'
               '<text:p>cell one</text:p></table:table-cell>'
               '<table:table-cell><text:p>cell two</text:p>'
               '</table:table-cell></table:table-row></table:table>'
               '<text:p>after</text:p></office:text>')
        info = odt_extract(self._pkg(xml))
        assert info["text"] == "before\ncell one\ncell two\nafter"
        assert info["tables"] == 1

    def test_space_element_without_count(self):
        xml = "<office:text><text:p>a<text:s/>b</text:p></office:text>"
        assert odt_text(self._pkg(xml)) == "a b"

    def test_no_mimetype_member_still_extracts(self):
        # some producers omit it; content.xml is the contract
        assert odt_text(self._pkg(
            "<office:text><text:p>x</text:p></office:text>",
            mimetype=None)) == "x"

    def test_literal_lt_entity_never_becomes_a_tag(self):
        xml = ("<office:text><text:p>&lt;text:tab/&gt; literal"
               "</text:p></office:text>")
        assert odt_text(self._pkg(xml)) == "<text:tab/> literal"


class TestRefusals:
    def test_non_zip_raises(self):
        with pytest.raises(ValueError, match="PK magic"):
            odt_text(b"not a zip at all")

    def test_zip_without_content_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("mimetype", ODT_MIME)
        with pytest.raises(ValueError, match="content.xml"):
            odt_text(buf.getvalue())

    def test_foreign_mimetype_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("mimetype", "application/epub+zip")
            z.writestr("content.xml", "<text:p>x</text:p>")
        with pytest.raises(ValueError, match="epub"):
            odt_text(buf.getvalue())

    def test_truncated_zip_raises_value_error(self):
        with pytest.raises(ValueError, match="unreadable ZIP"):
            odt_text(b"PK\x03\x04" + b"\0" * 16)
        # (the 256 MiB input bomb guard is the identical docxcodec
        # guard; the per-part guard is pinned below)

    def test_part_bomb_guard(self):
        import datasketches_spark_spark.operators.odfcodec as oc
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("mimetype", ODT_MIME)
            z.writestr("content.xml", "<text:p>x</text:p>" * 10)
        old = oc._MAX_PART_BYTES
        oc._MAX_PART_BYTES = 8
        try:
            with pytest.raises(ValueError, match="bomb guard"):
                odt_text(buf.getvalue())
        finally:
            oc._MAX_PART_BYTES = old


class TestOperatorAndRouting:
    def test_extract_odt_text_operator(self, spark):
        from datasketches_spark_spark.operators import extract_odt_text
        rows = [(1, bytearray(encode_odt_text(["one", "two"]))),
                (2, bytearray(b"junk, not a package")),
                (3, None)]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {r.id: (r.text, r.units) for r in
               extract_odt_text(df, "id").collect()}
        assert out[1] == ("one\ntwo", 2)
        assert out[2] == (None, None)      # loud null, not job abort
        assert 3 not in out

    def test_detect_ooxml_routes_writer_output(self, spark):
        from datasketches_spark_spark.functions import detect_ooxml
        df = spark.createDataFrame(
            [(bytearray(encode_odt_text(["x"])),)], "payload binary")
        got = df.select(detect_ooxml("payload").alias("m")).collect()
        assert got[0].m == ODT_MIME


class TestOds:
    """r16: OpenDocument SPREADSHEET cells (the xlsx_extract mirror)."""

    def test_roundtrip_cells_and_text(self):
        from datasketches_spark_spark.operators.odfcodec import (
            encode_ods_cells, ods_extract)
        info = ods_extract(encode_ods_cells(
            [["region", "sales"], ["north", 1200],
             [None, "x & <y>"]]))
        assert info["cells"] == [
            ("Sheet1", "A1", "region"), ("Sheet1", "B1", "sales"),
            ("Sheet1", "A2", "north"), ("Sheet1", "B2", "1200"),
            ("Sheet1", "B3", "x & <y>")]
        assert info["text"] == "region\tsales\nnorth\t1200\nx & <y>"
        assert info["units"] == 5 and info["tables"] == 1

    def test_deterministic(self):
        from datasketches_spark_spark.operators.odfcodec import (
            encode_ods_cells)
        assert encode_ods_cells([["a", 1]]) == encode_ods_cells(
            [["a", 1]])

    def test_column_and_row_repeats(self):
        from datasketches_spark_spark.operators.odfcodec import (
            ods_extract)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("mimetype",
                       "application/vnd.oasis.opendocument.spreadsheet")
            z.writestr("content.xml", (
                '<office:spreadsheet>'
                '<table:table table:name="T">'
                '<table:table-row>'
                '<table:table-cell table:number-columns-repeated="2">'
                '<text:p>dup</text:p></table:table-cell>'
                '<table:table-cell table:number-columns-repeated='
                '"16384"/>'
                '<table:table-cell><text:p>end</text:p>'
                '</table:table-cell></table:table-row>'
                '<table:table-row table:number-rows-repeated="2">'
                '<table:table-cell><text:p>r</text:p>'
                '</table:table-cell></table:table-row>'
                '</table:table></office:spreadsheet>'))
        info = ods_extract(buf.getvalue())
        refs = [(r, v) for _t, r, v in info["cells"]]
        assert refs[0] == ("A1", "dup") and refs[1] == ("B1", "dup")
        # the 16384-wide EMPTY filler advances the position in FULL
        # (capping would corrupt following refs); 'end' lands exactly
        # past it: column index 2 + 16384
        from datasketches_spark_spark.operators.ooxmlcodec import (
            _col_letters)
        assert refs[2] == (f"{_col_letters(2 + 16384)}1", "end")
        assert refs[3] == ("A2", "r") and refs[4] == ("A3", "r")

    def test_nonempty_repeat_beyond_guard_raises(self):
        from datasketches_spark_spark.operators.odfcodec import (
            ods_extract)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("mimetype",
                       "application/vnd.oasis.opendocument.spreadsheet")
            z.writestr("content.xml", (
                '<office:spreadsheet><table:table table:name="T">'
                '<table:table-row>'
                '<table:table-cell table:number-columns-repeated='
                '"100000"><text:p>x</text:p></table:table-cell>'
                '</table:table-row></table:table></office:spreadsheet>'))
        with pytest.raises(ValueError, match="bomb guard"):
            ods_extract(buf.getvalue())

    def test_species_mismatch_is_loud(self):
        from datasketches_spark_spark.operators.odfcodec import (
            encode_ods_cells, ods_extract, odt_extract)
        with pytest.raises(ValueError, match="species mismatch"):
            ods_extract(encode_odt_text(["hello"]))
        with pytest.raises(ValueError, match="species mismatch"):
            odt_extract(encode_ods_cells([["x"]]))

    def test_quoted_sheet_name_roundtrips(self):
        from datasketches_spark_spark.operators.odfcodec import (
            encode_ods_cells, ods_extract)
        cells = ods_extract(encode_ods_cells(
            [["v"]], sheet='a"b'))["cells"]
        assert cells == [('a"b', "A1", "v")]

    def test_covered_cells_advance_but_do_not_emit(self):
        from datasketches_spark_spark.operators.odfcodec import (
            ods_extract)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("mimetype",
                       "application/vnd.oasis.opendocument.spreadsheet")
            z.writestr("content.xml", (
                '<office:spreadsheet><table:table table:name="T">'
                '<table:table-row>'
                '<table:table-cell><text:p>m</text:p>'
                '</table:table-cell>'
                '<table:covered-table-cell><text:p>hidden</text:p>'
                '</table:covered-table-cell>'
                '<table:table-cell><text:p>v</text:p>'
                '</table:table-cell>'
                '</table:table-row></table:table></office:spreadsheet>'))
        cells = ods_extract(buf.getvalue())["cells"]
        assert [(r, v) for _t, r, v in cells] == [("A1", "m"),
                                                  ("C1", "v")]

    def test_operator_loud_null(self, spark):
        from datasketches_spark_spark.operators import extract_ods_text
        from datasketches_spark_spark.operators.odfcodec import (
            encode_ods_cells)
        rows = [(1, bytearray(encode_ods_cells([["a", 7]]))),
                (2, bytearray(b"not a package"))]
        df = spark.createDataFrame(rows, "id long, payload binary")
        out = {r.id: (r.text, r.units) for r in
               extract_ods_text(df, "id").collect()}
        assert out[1] == ("a\t7", 2)
        assert out[2] == (None, None)

    def test_detect_ooxml_routes_ods(self, spark):
        from datasketches_spark_spark.functions import detect_ooxml
        from datasketches_spark_spark.operators.odfcodec import (
            ODS_MIME, encode_ods_cells)
        df = spark.createDataFrame(
            [(bytearray(encode_ods_cells([["x"]])),)], "payload binary")
        assert df.select(detect_ooxml("payload").alias("m")) \
                 .collect()[0].m == ODS_MIME
