"""docx container codec: roundtrip, container validity, adversarial arms.

The gate query (docx_recovery) proves hash parity of the write→parse
roundtrip against the synth SQL; these tests pin what parity alone
cannot — that the CONTAINER is really doing the work: the XML is
escaped on disk (a symmetric escape bug in writer+parser would cancel
in the roundtrip), the zip layout is spec-shaped, the bytes are
deterministic, and kind mapping follows convert_info_docx's arms
(ppstructure/recovery/recovery_to_doc.py:38-75).
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET

from paddleocr_spark.docxcodec import W_NS, build_docx, parse_docx

ADVERSARIAL = [
    ("title", "Intro & <summary> \"quoted\" 'single'"),
    ("text", "  leading and trailing  "),
    ("text", ""),
    ("media", "img://h/7FA3B1"),
    ("table", "<table><tr><td>1 &amp; 2</td></tr></table>"),
    ("text", "]]> <w:p> fake close </w:body>"),
    ("text", "unicode: 한글 ﬃ    "),
]


def test_roundtrip_exact():
    assert parse_docx(build_docx(ADVERSARIAL)) == ADVERSARIAL


def test_empty_document():
    assert parse_docx(build_docx([])) == []


def test_container_layout_and_validity():
    b = build_docx(ADVERSARIAL)
    zf = zipfile.ZipFile(io.BytesIO(b))
    assert set(zf.namelist()) == {"[Content_Types].xml", "_rels/.rels",
                                  "word/document.xml"}
    # every part is well-formed XML
    for name in zf.namelist():
        ET.fromstring(zf.read(name))
    # the document part declares the wordprocessingml namespace and the
    # body holds one child per span, in order
    root = ET.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{{{W_NS}}}body")
    assert len(list(body)) == len(ADVERSARIAL)


def test_escaping_is_real_on_disk():
    """A symmetric escape bug (writer emits raw '<', parser regex-fixes
    it back) would survive the roundtrip — so assert the raw bytes."""
    b = build_docx([("text", "<b>x & y</b>")])
    raw = zipfile.ZipFile(io.BytesIO(b)).read("word/document.xml").decode()
    assert "&lt;b&gt;x &amp; y&lt;/b&gt;" in raw
    assert "<b>x" not in raw


def test_kind_mapping_matches_convert_info_docx():
    b = build_docx([("title", "h"), ("media", "ref"), ("table", "t"),
                    ("text", "p")])
    root = ET.fromstring(
        zipfile.ZipFile(io.BytesIO(b)).read("word/document.xml"))
    body = root.find(f"{{{W_NS}}}body")
    tags = [c.tag.rsplit("}", 1)[1] for c in body]
    assert tags == ["p", "p", "tbl", "p"]
    styles = [
        (c.find(f"{{{W_NS}}}pPr/{{{W_NS}}}pStyle").get(f"{{{W_NS}}}val")
         if c.find(f"{{{W_NS}}}pPr/{{{W_NS}}}pStyle") is not None else None)
        for c in body if c.tag.endswith("}p")]
    assert styles == ["Heading1", "Figure", None]


def test_deterministic_bytes():
    assert build_docx(ADVERSARIAL) == build_docx(ADVERSARIAL)


def test_spark_roundtrip_equals_exploded_spans(spark):
    """Full sf0.001 corpus: the container roundtrip stream equals the
    directly-exploded spans (order, kind, payload) — the Spark-side
    twin of the gate check."""
    import paddleocr_spark.entry_queries as EQ

    got = EQ.queries()["docx_recovery"](spark, "/root/testdata/sf0.001")
    exp = EQ.q_explode_spans(spark, "/root/testdata/sf0.001").selectExpr(
        "doc_id", "span_idx AS ord", "kind",
        "CASE WHEN kind = 'media' THEN media_ref "
        "ELSE coalesce(text, '') END AS payload")
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
