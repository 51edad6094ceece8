"""Minimal OOXML .docx container codec — the S11 recovery sink made literal.

The reference's recovery flow (`ppstructure/recovery/recovery_to_doc.py:31-80`,
`convert_info_docx`) walks the sorted layout regions IN ORDER and emits one
docx element per region: `title` → a heading paragraph, `figure` → a picture,
`table` → a real table (via `table_process.py`'s HtmlToDocx), anything else →
a text paragraph. Our span model already carries exactly that ordered
(kind, payload) stream — SURVEY §2 S11/O5 map the SEMANTICS to the spans
array — and this module supplies the literal container: a spec-valid
.docx (a zip of OOXML parts, stdlib `zipfile` + escaped XML, no python-docx
dependency) plus a pure `xml.etree` parser that recovers the ordered
(kind, payload) stream from the bytes.

Mapping (writer), mirroring convert_info_docx's four arms:

* ``title``  → ``<w:p>`` with ``<w:pStyle w:val="Heading1"/>``
  (`recovery_to_doc.py:52-56` uses a level-2 heading paragraph)
* ``media``  → ``<w:p>`` with ``<w:pStyle w:val="Figure"/>`` whose run text
  is the content-addressed ``media_ref`` (`recovery_to_doc.py:40-51` embeds
  the decoded pixels; blobs are opaque refs throughout this repo, so the
  ref IS the picture payload — the decode seam is `multimodal.py`)
* ``table``  → a one-cell ``<w:tbl>`` carrying the table HTML
  (`recovery_to_doc.py:57-61` → HtmlToDocx builds the cell grid; the HTML
  string is this repo's table payload, see J2)
* ``text``   → a plain ``<w:p>`` paragraph (`recovery_to_doc.py:62-75`)

The parser walks ``w:body`` children in document order, so a successful
roundtrip pins span-sequence order — the north rule's per-document
invariant — through the container. Text runs carry
``xml:space="preserve"`` (chunk payloads may begin/end with spaces).

Zip entries use fixed 1980-01-01 timestamps and STORED compression, so the
container bytes are deterministic for a given span stream.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '</Types>')

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    '</Relationships>')


def _run(payload: str) -> str:
    return (f'<w:r><w:t xml:space="preserve">{escape(payload)}</w:t></w:r>')


def _para(payload: str, style: str | None = None) -> str:
    ppr = (f'<w:pPr><w:pStyle w:val={quoteattr(style)}/></w:pPr>'
           if style else '')
    return f'<w:p>{ppr}{_run(payload)}</w:p>'


def _table(payload: str) -> str:
    return (f'<w:tbl><w:tr><w:tc>{_para(payload)}</w:tc></w:tr></w:tbl>')


def build_docx(spans: list[tuple[str, str]]) -> bytes:
    """Ordered (kind, payload) stream → .docx bytes (convert_info_docx's
    walk, `recovery_to_doc.py:38-75`; payload = media_ref for media
    spans, the span text otherwise)."""
    body = []
    for kind, payload in spans:
        payload = payload or ""
        if kind == "title":
            body.append(_para(payload, "Heading1"))
        elif kind == "media":
            body.append(_para(payload, "Figure"))
        elif kind == "table":
            body.append(_table(payload))
        else:
            body.append(_para(payload))
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>'
        + "".join(body) + '</w:body></w:document>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in (("[Content_Types].xml", _CONTENT_TYPES),
                           ("_rels/.rels", _RELS),
                           ("word/document.xml", document)):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, data.encode("utf-8"))
    return buf.getvalue()


def parse_docx(data: bytes) -> list[tuple[str, str]]:
    """.docx bytes → ordered (kind, payload) stream — the read side of
    the roundtrip; walks w:body children in document order."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        doc = zf.read("word/document.xml")
    root = ET.fromstring(doc)
    body = root.find(f"{{{W_NS}}}body")
    out: list[tuple[str, str]] = []
    for child in body:
        tag = child.tag.rsplit("}", 1)[1]
        texts = [t.text or "" for t in child.iter(f"{{{W_NS}}}t")]
        payload = "".join(texts)
        if tag == "tbl":
            out.append(("table", payload))
            continue
        style = child.find(f"{{{W_NS}}}pPr/{{{W_NS}}}pStyle")
        val = style.get(f"{{{W_NS}}}val") if style is not None else None
        kind = {"Heading1": "title", "Figure": "media"}.get(val, "text")
        out.append((kind, payload))
    return out
