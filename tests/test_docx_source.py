"""Unit tests for the stdlib OOXML parser (sources/docx.py) — edge cases
the round-trip oracle query can't isolate (pre-heading text, consecutive
headings, empty paragraphs, multi-run text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators.sectionizer import sectionize
from etl_ai_assistent_spark.sources import docx as DX


def _blocks(xml_fragments):
    return DX.parse_docx_blocks(DX.build_docx(xml_fragments))


def test_paragraphs_tables_interleaved_in_order():
    blocks = _blocks(
        [
            DX._p_xml("intro", style=None),
            DX._tbl_xml([["a", "b"]]),
            DX._p_xml("after", style="Heading 2"),
        ]
    )
    assert [(b[0], b[1]) for b in blocks] == [
        (0, "paragraph"),
        (1, "table"),
        (2, "paragraph"),
    ]
    assert blocks[1][4] == [["a", "b"]]
    assert blocks[2][2] == "Heading 2"


def test_multi_run_text_concatenates():
    xml = (
        "<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>"
    )
    blocks = DX.parse_docx_blocks(DX.build_docx([xml]))
    assert blocks[0][3] == "Hello world"


def test_image_flag_and_default_style():
    blocks = _blocks([DX._p_xml("pic here", image=True)])
    assert blocks[0][2] == "Normal"
    assert blocks[0][5] is True


def test_xml_escaping_round_trips():
    text = 'a < b & "c" > d'
    blocks = _blocks([DX._p_xml(text)])
    assert blocks[0][3] == text


def test_sectionizer_reference_semantics(spark):
    """Pre-heading text dropped; consecutive headings: first yields no
    section (no body); whitespace-only paragraphs dropped (reference
    iter_sections, docx_parser.py:54-86)."""
    data = DX.build_docx(
        [
            DX._p_xml("orphan text before any heading"),
            DX._p_xml("H1", style="Heading 1"),
            DX._p_xml("H2", style="Heading 1"),
            DX._p_xml("body a"),
            DX._p_xml("   "),
            DX._p_xml("body b"),
        ]
    )
    rows = [
        (1, b[0], b[1], b[2] or "", b[3] or "")
        for b in DX.parse_docx_blocks(data)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, block_idx int, kind string, style string, text string"
    )
    secs = sectionize(
        df.filter(F.col("kind") == "paragraph"),
        doc_col="doc_id",
        order_col="block_idx",
        text_col="text",
        is_heading=F.col("style").startswith("Heading"),
    ).collect()
    assert len(secs) == 1
    assert secs[0]["title"] == "H2"
    assert secs[0]["body"] == "body a body b"
    assert secs[0]["n_paras"] == 2


def test_extension_guard_rejects_non_docx(spark, tmp_path):
    """P15 (reference app.py:23-24): a directory mixed with non-.docx
    files must contribute only the .docx ones, even when the caller's
    glob matches everything."""
    DX.write_corpus([(1, "alpha beta"), (2, "gamma delta")], str(tmp_path))
    (tmp_path / "notes.txt").write_text("not a document")
    (tmp_path / "junk.pdf").write_bytes(b"%PDF-1.4 junk")
    (tmp_path / "doc_9.docx.tmp").write_bytes(b"partial upload")
    blocks = DX.scan_docx(spark, str(tmp_path / "*"))
    names = {r["document_name"] for r in blocks.select("document_name").distinct().collect()}
    assert names == {"doc_1.docx", "doc_2.docx"}
