"""Minimal PDF container codec: deterministic writer + pure-Python parser.

The reference's PDF branch (`ppocr/utils/utility.py:108-127`,
`check_and_read`) rasterizes each page with fitz and feeds the pixmaps
to detection; the north star maps PDFs to TEXT spans instead ("PDF
layout parsing for text-kind spans"), so this module implements the
text-side container work the same way `imagecodecs.py` did PNG/GIF and
`sources/lmdbfile.py` did LMDB: a real, byte-level encode → decode
roundtrip whose every output the DuckDB oracle can predict in closed
form, making the container parsing itself the thing the gate hashes.

Writer (`render_ref_pdf`): a spec-correct PDF 1.4 — catalog → pages
tree → per-page FlateDecode content streams of `BT/Tf/Td/Tj|TJ/ET` text
objects with a cross-reference table and trailer. Text object order
inside each stream is deliberately SCRAMBLED (a coprime stride walk) so
the parser's reading-order sort is load-bearing.

Parser (`decode_pdf`): startxref → xref offsets → object fetch; pages
tree walk via /Kids; /Contents stream slice by /Length with zlib
inflate when /Filter /FlateDecode; a content-stream tokenizer tracking
the text position set by `Td` (absolute per text object here; `BT`
resets the matrix) and emitting `(x, y, text)` for `Tj` and
concatenated `TJ` arrays (kerning numbers ignored — the standard
text-extraction convention). Escapes ``\\( \\) \\\\`` are honored.
Spans return in reading order: top-down (y desc), then left-right.
"""

from __future__ import annotations

import re
import zlib

#: Alphabet used by the deterministic span texts — no PDF string
#: metacharacters, so the closed-form oracle needs no escape logic
#: (the PARSER still handles escapes; one writer case exercises them).
_PAGE_W, _PAGE_H = 612, 792


# ---------------------------------------------------------------------------
# deterministic writer
# ---------------------------------------------------------------------------

def _ref_plan(ref: str):
    """Closed-form layout for a ref: pages of (x, y, text, use_tj) spans.

    Every number below is reproduced verbatim by the DuckDB twin in
    entry_queries.oracle_sql — change BOTH or neither.
    """
    import hashlib

    h = hashlib.md5(ref.encode()).digest()
    n_pages = 1 + h[3] % 3
    pages = []
    for k in range(n_pages):
        m = 2 + h[(4 + k) % 16] % 4
        spans = []
        for j in range(m):
            x = 50 + ((h[(5 + k) % 16] + 17 * j) % 10) * 45
            y = 700 - 40 * j
            text = f"s{k}_{j}_{(h[0] + 31 * j + 7 * k) % 997}"
            spans.append((x, y, text, (h[2] + j) % 3 == 0))
        pages.append(spans)
    return pages


def _scramble(n: int) -> list[int]:
    """Deterministic permutation of range(n): coprime stride walk."""
    step = 3 if n % 3 else (5 if n % 5 else 1)
    return [(j * step) % n for j in range(n)]


def _content_stream(spans) -> bytes:
    parts = []
    for j in _scramble(len(spans)):
        x, y, text, use_tj = spans[j]
        if use_tj and len(text) > 2:
            a, b = text[:2], text[2:]
            op = f"[({a}) -250 ({b})] TJ"
        else:
            op = f"({text}) Tj"
        parts.append(f"BT /F1 12 Tf {x} {y} Td {op} ET")
    return zlib.compress("\n".join(parts).encode("latin-1"))


def render_ref_pdf(ref: str) -> bytes:
    """Deterministically render REAL PDF bytes for a media ref."""
    pages = _ref_plan(ref)
    n = len(pages)
    # object numbering: 1 catalog, 2 pages, 3..2+n page dicts,
    # 3+n..2+2n content streams, 3+2n font
    font_num = 3 + 2 * n
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: ("<< /Type /Pages /Kids ["
            + " ".join(f"{3 + k} 0 R" for k in range(n))
            + f"] /Count {n} >>").encode(),
        font_num: (b"<< /Type /Font /Subtype /Type1 "
                   b"/BaseFont /Helvetica >>"),
    }
    streams: dict[int, bytes] = {}
    for k, spans in enumerate(pages):
        data = _content_stream(spans)
        objs[3 + k] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} "
            f"{_PAGE_H}] /Contents {3 + n + k} 0 R /Resources "
            f"<< /Font << /F1 {font_num} 0 R >> >> >>").encode()
        streams[3 + n + k] = data
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(set(objs) | set(streams)):
        offsets[num] = len(out)
        if num in streams:
            d = streams[num]
            out += (f"{num} 0 obj\n<< /Length {len(d)} /Filter "
                    f"/FlateDecode >>\nstream\n").encode()
            out += d
            out += b"\nendstream\nendobj\n"
        else:
            out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    nobj = max(offsets) + 1
    out += f"xref\n0 {nobj}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, nobj):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {nobj} /Root 1 0 R >>\nstartxref\n"
            f"{xref_at}\n%%EOF\n").encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

class PdfError(ValueError):
    pass


def _xref_offsets(buf: bytes) -> dict[int, int]:
    tail = buf[-128:]
    m = re.search(rb"startxref\s+(\d+)", tail)
    if not m:
        raise PdfError("no startxref")
    at = int(m.group(1))
    if not buf.startswith(b"xref", at):
        raise PdfError("startxref does not point at an xref table")
    pos = at + 4
    offsets: dict[int, int] = {}
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", buf[pos:pos + 32])
        if not m:
            break
        first, count = int(m.group(1)), int(m.group(2))
        pos += m.end()
        for i in range(count):
            ent = buf[pos:pos + 20]
            off, _gen, kind = ent[:10], ent[11:16], ent[17:18]
            if kind == b"n":
                offsets[first + i] = int(off)
            pos += 20
    return offsets


def _object_at(buf: bytes, off: int) -> bytes:
    """Object body at an xref offset.

    For stream objects the body is cut by /Length, NOT by searching for
    ``endobj`` — compressed stream bytes can legally contain that
    6-byte sequence, and a search would truncate the stream there.
    """
    m = re.match(rb"(\d+)\s+\d+\s+obj", buf[off:off + 32])
    if not m:
        raise PdfError(f"no object at offset {off}")
    start = off + m.end()
    sm = re.compile(rb"stream\r?\n").search(buf, start)
    em = buf.find(b"endobj", start)
    if em == -1:
        raise PdfError(f"unterminated object at offset {off}")
    if sm is None or sm.start() > em:      # plain (non-stream) object
        return buf[start:em]
    head = buf[start:sm.start()]
    length = _dict_int(head, b"/Length")
    if length is None:
        raise PdfError("stream object without /Length")
    return buf[start:sm.end() + length]


def _dict_int(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)", body)
    return int(m.group(1)) if m else None


def _stream_data(body: bytes) -> bytes:
    length = _dict_int(body, b"/Length")
    m = re.search(rb"stream\r?\n", body)
    if m is None or length is None:
        raise PdfError("content object has no stream")
    data = body[m.end():m.end() + length]
    if b"/FlateDecode" in body[:m.start()]:
        data = zlib.decompress(data)
    return data


_STR = rb"\(((?:[^()\\]|\\.)*)\)"
_TOKEN = re.compile(
    rb"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+Td"
    rb"|" + _STR + rb"\s+Tj"
    rb"|\[((?:[^\]\\]|\\.)*)\]\s+TJ")


def _unescape(s: bytes) -> str:
    return re.sub(rb"\\([()\\])", rb"\1", s).decode("latin-1")


def _parse_content(data: bytes):
    """Yield (x, y, text) per shown string, tracking Td positions."""
    x = y = 0.0
    for m in _TOKEN.finditer(data):
        if m.group(1) is not None:
            x, y = float(m.group(1)), float(m.group(2))
        elif m.group(3) is not None:
            yield (x, y, _unescape(m.group(3)))
        else:
            parts = [_unescape(s) for s in
                     re.findall(_STR, m.group(4))]
            yield (x, y, "".join(parts))


def decode_pdf(buf: bytes) -> list[list[tuple[float, float, str]]]:
    """PDF bytes → per-page positioned text spans in reading order."""
    if not buf.startswith(b"%PDF-"):
        raise PdfError("not a PDF header")
    offsets = _xref_offsets(buf)
    root_off = offsets.get(1)
    if root_off is None:
        raise PdfError("no catalog object")
    catalog = _object_at(buf, root_off)
    pages_ref = _dict_int(catalog, b"/Pages")
    pages_obj = _object_at(buf, offsets[pages_ref])
    kids = re.search(rb"/Kids\s*\[([^\]]*)\]", pages_obj)
    if not kids:
        raise PdfError("pages tree has no /Kids")
    out = []
    for kid in re.findall(rb"(\d+)\s+0\s+R", kids.group(1)):
        page = _object_at(buf, offsets[int(kid)])
        cref = _dict_int(page, b"/Contents")
        data = _stream_data(_object_at(buf, offsets[cref]))
        spans = list(_parse_content(data))
        spans.sort(key=lambda s: (-s[1], s[0], s[2]))
        out.append(spans)
    return out
