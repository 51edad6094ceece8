"""S12 xlsx sink tests: grid placement, OOXML roundtrip via stdlib
zipfile + ElementTree, byte determinism, and the distributed file sink."""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile

from paddleocr_spark.xlsx import parse_table_grid, xlsx_bytes

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _read_back(blob: bytes):
    z = zipfile.ZipFile(io.BytesIO(blob))
    root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    cells = {c.get("r"): (c.findtext(f"{NS}is/{NS}t") or "")
             for c in root.iter(f"{NS}c")}
    merges = [m.get("ref") for m in root.iter(f"{NS}mergeCell")]
    return cells, merges


def test_grid_placement_spans_and_quirks():
    html = ('<table><tr><td>a</td><td>b</td></tr>'
            '<tr><td colspan="2">wide</td><td>c</td></tr>'
            '<tr><td rowspan="2">tall</td><td>x</td><td>y</td></tr>'
            '<tr><td>p</td><td>q</td></tr></table>')
    grid, merges = parse_table_grid(html)
    assert grid == [["a", "b"], ["wide", None, "c"],
                    ["tall", "x", "y"], [None, "p", "q"]]
    assert merges == [(1, 0, 1, 1), (2, 0, 3, 0)]
    # master-dialect dropped-<td> quirk: text survives, tags stripped
    g, m = parse_table_grid('<tr>no open</td><td><b>bold</b></td></tr>')
    assert g == [["no open", "bold"]] and m == []
    # rowspan overrunning the table clips to the last row
    g, m = parse_table_grid('<tr><td rowspan="9">v</td><td>w</td></tr>')
    assert m == [(0, 0, 0, 0)]
    assert parse_table_grid("") == ([], [])


def test_xlsx_roundtrip_and_determinism():
    html = ('<table><tr><td>h &amp; 1</td><td></td></tr>'
            '<tr><td colspan="2">wide</td></tr></table>')
    grid, merges = parse_table_grid(html)
    blob = xlsx_bytes(grid, merges)
    assert blob == xlsx_bytes(grid, merges)        # byte-deterministic
    cells, mrefs = _read_back(blob)
    assert cells == {"A1": "h & 1", "B1": "", "A2": "wide"}
    assert mrefs == ["A2:B2"]
    # 27+ columns exercise two-letter refs
    wide = [[f"c{i}" for i in range(30)]]
    cells, _ = _read_back(xlsx_bytes(wide))
    assert cells["AA1"] == "c26" and cells["AD1"] == "c29"


def test_write_xlsx_files_sink(spark, tmp_path):
    from paddleocr_spark.xlsx import write_xlsx_files

    df = spark.createDataFrame(
        [(1, "<tr><td>one</td></tr>"), (2, "<tr><td>two</td><td>2b</td></tr>")],
        "t_id long, html string")
    out = str(tmp_path / "xlsx")
    write_xlsx_files(df, out)
    cells1, _ = _read_back(open(f"{out}/1.xlsx", "rb").read())
    cells2, _ = _read_back(open(f"{out}/2.xlsx", "rb").read())
    assert cells1 == {"A1": "one"}
    assert cells2 == {"A1": "two", "B1": "2b"}
