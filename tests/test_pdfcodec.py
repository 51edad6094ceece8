"""PDF container codec: writer↔parser roundtrip against the closed-form
plan, spec-shape checks (xref offsets really resolve), escape handling,
the load-bearing reading-order sort, and malformed-input guards."""

from __future__ import annotations

import re
import zlib

import pytest

from paddleocr_spark.pdfcodec import (PdfError, _ref_plan, _scramble,
                                      decode_pdf, render_ref_pdf)


def _expected(ref):
    return [sorted([(float(x), float(y), t) for x, y, t, _ in spans],
                   key=lambda s: (-s[1], s[0], s[2]))
            for spans in _ref_plan(ref)]


def test_roundtrip_matches_plan_over_many_refs():
    for i in range(300):
        ref = f"media_{i:05d}"
        assert decode_pdf(render_ref_pdf(ref)) == _expected(ref), ref


def test_xref_offsets_point_at_their_objects():
    buf = render_ref_pdf("media_00007")
    m = re.search(rb"startxref\s+(\d+)", buf[-64:])
    at = int(m.group(1))
    assert buf.startswith(b"xref", at)
    # every in-use entry must land on "<num> 0 obj"
    body = buf[at:]
    first_line = re.search(rb"xref\s+0 (\d+)\s*\n", body)
    nobj = int(first_line.group(1))
    pos = first_line.end()
    seen = 0
    for num in range(nobj):
        ent = body[pos:pos + 20]
        pos += 20
        if ent[17:18] == b"n":
            off = int(ent[:10])
            assert re.match(rb"\d+\s+0\s+obj", buf[off:off + 16]), num
            seen += 1
    assert seen == nobj - 1          # all but the free head entry


def test_content_stream_is_scrambled_but_output_is_reading_order():
    # find a ref whose first page has >= 3 spans (so the stride walk
    # actually reorders) and check the RAW stream order differs from the
    # parsed (sorted) order
    for i in range(100):
        ref = f"media_{i:05d}"
        plan = _ref_plan(ref)
        if len(plan[0]) >= 3 and _scramble(len(plan[0])) != list(
                range(len(plan[0]))):
            break
    else:
        pytest.skip("no scrambled ref found")
    buf = render_ref_pdf(ref)
    m = re.search(rb"stream\r?\n", buf)
    length = int(re.search(rb"/Length (\d+)", buf[:m.start()]).group(1))
    raw = zlib.decompress(buf[m.end():m.end() + length]).decode()
    raw_ys = [float(y) for _, y in
              re.findall(r"(-?\d+) (-?\d+) Td", raw)]
    parsed_ys = [y for _, y, _ in decode_pdf(buf)[0]]
    assert raw_ys != sorted(raw_ys, reverse=True), \
        "stream should not already be in reading order"
    assert parsed_ys == sorted(parsed_ys, reverse=True)
    assert sorted(raw_ys, reverse=True) == parsed_ys


def test_tj_arrays_concatenate_and_escapes_unescape():
    # hand-built single-page PDF exercising \( \) \\ and TJ kerning
    content = (rb"BT /F1 12 Tf 50 700 Td [(a\(b) -120 (c\\d)] TJ ET"
               rb" BT /F1 12 Tf 50 660 Td (e\)f) Tj ET")
    data = zlib.compress(content)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in (1, 2, 3):
        offs[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
    offs[4] = len(out)
    out += (f"4 0 obj\n<< /Length {len(data)} /Filter /FlateDecode >>"
            f"\nstream\n").encode() + data + b"\nendstream\nendobj\n"
    xat = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for n in (1, 2, 3, 4):
        out += f"{offs[n]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n{xat}\n"
            f"%%EOF\n").encode()
    pages = decode_pdf(bytes(out))
    assert pages == [[(50.0, 700.0, "a(bc\\d"), (50.0, 660.0, "e)f")]]


def test_stream_containing_endobj_bytes_is_not_truncated():
    """Stream data can legally contain the 6-byte sequence ``endobj``
    (compressed bytes are arbitrary); the object cut must come from
    /Length, not a text search. Uncompressed stream with the literal."""
    data = b"BT /F1 12 Tf 50 700 Td (endobj) Tj ET"
    objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"}
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in (1, 2, 3):
        offs[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    offs[4] = len(out)
    out += (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(data)
            + data + b"\nendstream\nendobj\n")
    xat = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for n in (1, 2, 3, 4):
        out += b"%010d 00000 n \n" % offs[n]
    out += (b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xat)
    assert decode_pdf(bytes(out)) == [[(50.0, 700.0, "endobj")]]


def test_malformed_inputs_raise_pdferror():
    with pytest.raises(PdfError):
        decode_pdf(b"not a pdf at all")
    good = render_ref_pdf("media_00001")
    with pytest.raises(PdfError):
        decode_pdf(good[:-40])            # trailer/startxref cut off
    # startxref pointing into the void
    broken = re.sub(rb"startxref\s+\d+", b"startxref\n2", good)
    with pytest.raises(PdfError):
        decode_pdf(broken)
