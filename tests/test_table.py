"""D7/J2/A7 table family: kernel hand cases + distributed differential."""

from __future__ import annotations

import pytest

from paddleocr_spark.kernels import get_pred_html, table_label_decode
from paddleocr_spark.operators.table import (EOS, SOS, TABLE_DICT,
                                             TD_WALK_TOKENS, table_html,
                                             table_structure,
                                             table_token_acc)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# table_label_decode hand cases (table_postprocess.py:63-98 quirks)
# ---------------------------------------------------------------------------

def test_decode_breaks_at_first_eos_after_start():
    ids = [1, 5, 12, EOS, 5, 12]  # garbage after eos must vanish
    assert table_label_decode(ids, TABLE_DICT) == ["<thead>", "<tr>",
                                                   "<td></td>"]


def test_decode_eos_at_index_zero_is_skipped_not_break():
    # idx>0 guard: an eos FIRST falls through to ignored_tokens -> continue
    ids = [EOS, 1, 5, EOS]
    assert table_label_decode(ids, TABLE_DICT) == ["<thead>", "<tr>"]


def test_decode_drops_sos_anywhere():
    ids = [SOS, 5, SOS, 12, EOS]
    assert table_label_decode(ids, TABLE_DICT) == ["<tr>", "<td></td>"]


# ---------------------------------------------------------------------------
# get_pred_html hand cases (matcher.py:99-138 quirks)
# ---------------------------------------------------------------------------

def test_html_single_content_is_spliced_raw():
    # n==1: no strip, no empty-skip, no <b> handling
    html = get_pred_html(["<td></td>"], {0: [0]}, [" <b>x "])
    assert html == "<td> <b>x </td>"


def test_html_b_slice_cuts_first_three_chars_wherever_b_occurs():
    # '<b>' detected ANYWHERE but the cut is an unconditional [3:]
    html = get_pred_html(["<td></td>"], {0: [0, 1]}, ["ab<b>cd", "tail"])
    # the munge slices [3:] unconditionally: 'ab<b>cd'[3:] == 'b>cd'
    # (drops 'ab<', NOT the tag) — and NO b_with wrap: the reference's
    # `'<b>' in ocr_contents[i]` is tuple membership over (text, score),
    # i.e. the wrap needs the first TEXT to be exactly '<b>'
    assert html == "<td>b>cd tail</td>"


def test_html_b_with_needs_exact_b_first_text():
    # first text exactly '<b>' and n>1 -> wrap; the '<b>' piece itself
    # munges to '' ([3:]) and is skipped
    html = get_pred_html(["<td></td>"], {0: [0, 1, 2]},
                         ["<b>", "x", "y</b>"])
    assert html == "<td><b>x y</b></td>"


def test_html_skipped_last_leaves_trailing_space():
    # separator keys on ORIGINAL index: middle element keeps its ' ' even
    # though the last element munges to empty and is skipped
    html = get_pred_html(["<td></td>"], {0: [0, 1, 2]}, ["a", "b", ""])
    assert html == "<td>a b </td>"


def test_html_spanning_cell_uses_closing_tag_and_consumes_index():
    toks = ["<td", ' colspan="2"', ">", "</td>", "<td></td>"]
    html = get_pred_html(toks, {0: [0], 1: [1]}, ["A", "B"])
    assert html == '<td colspan="2">A</td><td>B</td>'


def test_html_unmatched_td_splices_nothing():
    assert get_pred_html(["<td></td>"], {}, []) == "<td></td>"


# ---------------------------------------------------------------------------
# Distributed == kernel differential over the full 50-table universe
# ---------------------------------------------------------------------------

def _expected_htmls(spark):
    """Compose expected html per table from the kernels + the cell_match
    assignment collected once (single-node reference composition)."""
    from paddleocr_spark.entry_queries import q_cell_match
    from paddleocr_spark.operators.table import table_ids_sql
    import pyspark.sql.functions as F

    # decoded tokens per table, via the kernel over the synthesized ids
    tabs = (spark.read.parquet(f"{SF}/lineitem.parquet")
            .select((F.col("l_orderkey") % 50).alias("t_id")).distinct()
            .select("t_id", F.expr(table_ids_sql("t_id % 11 = 3", "spark"))
                    .alias("ids")).collect())
    toks = {r["t_id"]: table_label_decode(r["ids"], TABLE_DICT)
            for r in tabs}

    def content(box_id: int) -> str:
        if box_id % 21 == 0:
            return "<b>"
        x = str(box_id % 100)
        return {0: "<b>w" + x, 1: "w" + x + "</b>", 2: " w" + x,
                3: ""}.get(box_id % 7, "w" + x)

    assigned = q_cell_match(spark, SF).collect()
    per_table: dict[int, dict[int, list[int]]] = {}
    contents: dict[int, list[str]] = {}
    for r in sorted(assigned, key=lambda r: (r["t_id"], r["box_id"])):
        m = per_table.setdefault(r["t_id"], {})
        c = contents.setdefault(r["t_id"], [])
        m.setdefault(r["cell_id"], []).append(len(c))
        c.append(content(r["box_id"]))
    out = {}
    for t, tk in toks.items():
        body = get_pred_html(tk, per_table.get(t, {}), contents.get(t, []))
        out[t] = "<html><body><table>" + body + "</table></body></html>"
    return out


def test_table_html_matches_kernel_composition(spark):
    got = {r["t_id"]: r["html"] for r in table_html(spark, SF).collect()}
    want = _expected_htmls(spark)
    assert set(got) == set(want)
    bad = [t for t in want if got[t] != want[t]]
    assert not bad, (bad[:3], got[bad[0]] if bad else None,
                     want[bad[0]] if bad else None)


def test_table_structure_tokens_match_kernel(spark):
    import pyspark.sql.functions as F
    from paddleocr_spark.operators.table import table_ids_sql
    rows = table_structure(spark, SF).collect()
    got: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["t_id"], r["pos"])):
        got.setdefault(r["t_id"], []).append(r["token"])
    tabs = (spark.read.parquet(f"{SF}/lineitem.parquet")
            .select((F.col("l_orderkey") % 50).alias("t_id")).distinct()
            .select("t_id", F.expr(table_ids_sql("t_id % 11 = 3", "spark"))
                    .alias("ids")).collect())
    for r in tabs:
        assert got[r["t_id"]] == table_label_decode(r["ids"], TABLE_DICT)
    # every table decodes to a well-formed run: td tokens present
    assert all(any(t in TD_WALK_TOKENS for t in v) for v in got.values())


def test_table_token_acc_sees_the_mutation(spark):
    row = table_token_acc(spark, SF).collect()[0]
    assert row["n_tables"] == 50
    # tables with t_id % 11 == 3 mutate (dropped trailing cell) -> mismatch
    expected_bad = len([t for t in range(50) if t % 11 == 3])
    assert row["n_correct"] == 50 - expected_bad
    assert row["token_acc"] == pytest.approx(
        (50 - expected_bad) / (50 + 1e-6), abs=1e-4)


# ---------------------------------------------------------------------------
# Hypothesis fuzz: the walk kernel is total and quirk-stable on random input
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_content_st = st.sampled_from(
    ["", " ", "a", " b", "<b>x", "y</b>", "<b>", "</b>", "a<b>b", "c</b>d",
     "tail ", "<b>m</b>", "  two", "w9"])
_tag_st = st.sampled_from(
    ["<td></td>", "</td>", "<td", ">", "<tr>", "</tr>", ' colspan="2"',
     "<thead>", "</thead>"])


@settings(max_examples=200, deadline=None)
@given(st.lists(_tag_st, min_size=0, max_size=12),
       st.lists(_content_st, min_size=0, max_size=8),
       st.data())
def test_get_pred_html_fuzz_invariants(tags, contents, data):
    n_td = sum(1 for t in tags if "</td>" in t)
    matched = {}
    if contents and n_td:
        for td in range(n_td):
            if data.draw(st.booleans()):
                k = data.draw(st.integers(1, min(4, len(contents))))
                matched[td] = sorted(data.draw(st.lists(
                    st.integers(0, len(contents) - 1), min_size=1,
                    max_size=k)))
    html = get_pred_html(tags, matched, contents)
    # every non-td tag appears verbatim and in order; td count preserved
    assert html.count("</td>") >= n_td
    stripped = html
    for td, idxs in matched.items():
        if len(idxs) == 1:
            # single content is spliced raw
            assert contents[idxs[0]] in html or contents[idxs[0]] == ""
    # the walk never raises and always returns a string
    assert isinstance(html, str)
    # unmatched walk output is reconstructible: no matched -> pure tag join
    if not matched:
        expect = "".join(
            "<td></td>" if t == "<td></td>" else t for t in tags)
        assert html == expect


# ---------------------------------------------------------------------------
# J2b: TableMaster dialect (matcher.py:140-180, table_master_match.py)
# ---------------------------------------------------------------------------

def test_merge_span_token_quirks():
    from paddleocr_spark.kernels import merge_span_token
    # colspan run fuses to one token; trailing </tbody> appended when absent
    assert merge_span_token(["<td", ' colspan="2"', ">", "</td>"]) == [
        '<td colspan="2"></td>', "</tbody>"]
    # QUIRK: a rowspan+colspan run hits BRANCH 1 (pointer+1 is an attr),
    # merging only 4 tokens — '</td>' stays a separate token and is what
    # consumes the td index in the master walk; the reference's 5-token
    # elif (table_master_match.py:497-507) is dead for well-formed runs
    assert merge_span_token(
        ["<td", ' rowspan="2"', ' colspan="3"', ">", "</td>"]) == [
        '<td rowspan="2" colspan="3">', "</td>", "</tbody>"]
    # the elif is reachable only with a non-attr token at pointer+1
    assert merge_span_token(
        ["<td", "X", ' colspan="3"', ">", "</td>"]) == [
        '<tdX colspan="3"></td>', "</tbody>"]
    # scan STOPS at the first </tbody>: trailing garbage dropped
    assert merge_span_token(["<td></td>", "</tbody>", "<tr>", "<td></td>"
                             ]) == ["<td></td>", "</tbody>"]


def test_deal_eb_token_expansions():
    from paddleocr_spark.kernels import deal_eb_token
    assert deal_eb_token("<eb></eb>") == "<td></td>"
    assert deal_eb_token("<eb5></eb5>") == "<td><b></b></td>"
    assert deal_eb_token("<eb3></eb3>") == "<td>  </td>"
    assert (deal_eb_token("<eb10></eb10>")
            == "<td><b>     </b></td>")


def test_master_whole_token_replacement_quirk():
    """For a merged span token the master splice REPLACES the whole token
    with txt+'</td>' — the '<td rowspan..>' opening is dropped (reference
    behavior, matcher.py:174-176); the plain dialect instead keeps the
    full tag after the contents."""
    from paddleocr_spark.kernels import get_pred_html, get_pred_html_master
    toks = ["<tbody>", "<tr>", '<td colspan="2"></td>', "</tr>",
            "</tbody>"]
    m = get_pred_html_master(toks, {0: [0]}, ["X"])
    assert m == "<tbody><tr>X</td></tr></tbody>"
    # plain dialect on the equivalent unmerged form keeps the closing tag
    p = get_pred_html(["<tbody>", "<tr>", "</td>", "</tr>", "</tbody>"],
                      {0: [0]}, ["X"])
    assert p == "<tbody><tr>X</td></tr></tbody>"


def test_master_deal_bb_thead_branches():
    from paddleocr_spark.kernels import get_pred_html_master
    # no-span thead: <td> -> <td><b>, </td> -> </b></td>; empty cell
    # normalized back to <td></td>
    toks = ["<thead>", "<tr>", "<td></td>", "<td></td>", "</tr>",
            "</thead>", "<tbody>", "<tr>", "<td></td>", "</tr>",
            "</tbody>"]
    html = get_pred_html_master(toks, {0: [0], 2: [1]}, ["H", "B"])
    assert "<td><b>H</b></td>" in html          # thead cell bolded
    assert "<td></td>" in html                  # empty thead cell reverted
    assert "<td>B</td>" in html                 # tbody cell untouched
    # a MERGED '<td colspan..></td>' in thead loses its opening to the
    # whole-token replacement, so deal_bb sees no span and takes branch 1
    toks = ["<thead>", "<tr>", '<td colspan="2"></td>', "</tr>",
            "</thead>", "<tbody>", "</tbody>"]
    html = get_pred_html_master(toks, {}, [])
    assert html == "<thead><tr></b></td></tr></thead><tbody></tbody>"
    # the span-in-thead branch IS reachable via the 2-attr merge quirk:
    # '<td rowspan.. colspan..>' survives as a pass-through token and the
    # dangling '</td>' carries the splice, so deal_bb finds the span open
    # and rewrites '>' -> '><b>'
    toks = ["<thead>", "<tr>", '<td rowspan="2" colspan="3">', "</td>",
            "</tr>", "</thead>", "<tbody>", "</tbody>"]
    html = get_pred_html_master(toks, {0: [0]}, ["H"])
    assert html == ('<thead><tr><td rowspan="2" colspan="3"><b>H</b></td>'
                    "</tr></thead><tbody></tbody>")


def test_master_b_wrap_and_munging_match_plain_dialect():
    """The content loop is shared with the plain dialect: [3:]/[:-4] cuts,
    original-index separators, b_with wrap."""
    from paddleocr_spark.kernels import get_pred_html_master
    toks = ["<tbody>", "<tr>", "<td></td>", "</tr>", "</tbody>"]
    html = get_pred_html_master(
        toks, {0: [0, 1, 2]}, ["<b>", " beta", "gamma</b>"])
    # first content EXACTLY '<b>' and >1 matches -> wrap (tuple-membership
    # quirk); the '<b>' piece munges to '' and is skipped, cuts applied
    assert html == "<tbody><tr><td><b>beta gamma</b></td></tr></tbody>"


def test_table_html_master_distributed_matches_kernel(spark):
    """Distributed grouped-Arrow walk == single-node shared kernel."""
    import pyspark.sql.functions as F
    from paddleocr_spark.operators.table import (html_master_one,
                                                 raw_content_col,
                                                 table_html_master,
                                                 table_structure)
    from paddleocr_spark.entry_queries import q_cell_match
    got = {r["t_id"]: r["html"]
           for r in table_html_master(spark, SF).collect()}
    toks = table_structure(spark, SF).orderBy("t_id", "pos").collect()
    cells = (q_cell_match(spark, SF)
             .withColumn("content", raw_content_col())
             .orderBy("t_id", "box_id").collect())
    token_map: dict = {}
    for r in toks:
        token_map.setdefault(r["t_id"], []).append(r["token"])
    cell_map: dict = {}
    for r in cells:
        cell_map.setdefault(r["t_id"], []).append(
            (r["box_id"], r["cell_id"], r["content"]))
    assert set(got) == set(token_map)
    for t_id, tokens in token_map.items():
        want = html_master_one(t_id, tokens, cell_map.get(t_id, []))
        assert got[t_id] == want, t_id


# ---------------------------------------------------------------------------
# Round 4: assemble_cell_txt factoring + tile-bucketed cell_match
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.lists(_tag_st, min_size=0, max_size=12),
       st.lists(_content_st, min_size=0, max_size=8),
       st.data())
def test_master_txt_composition_equals_unfactored(tags, contents, data):
    """get_pred_html_master == (assemble_cell_txt -> get_pred_html_master_txt):
    the round-4 factoring that lets the distributed path pre-aggregate the
    per-cell content loop relationally must be bit-equal to the exec-ref-
    differentialed original on arbitrary inputs."""
    from paddleocr_spark.kernels import (assemble_cell_txt,
                                         get_pred_html_master,
                                         get_pred_html_master_txt)
    n_td = sum(1 for t in tags if "</td>" in t)
    matched = {}
    if contents and n_td:
        for td in range(n_td):
            if data.draw(st.booleans()):
                k = data.draw(st.integers(1, min(4, len(contents))))
                matched[td] = sorted(data.draw(st.lists(
                    st.integers(0, len(contents) - 1), min_size=1,
                    max_size=k)))
    want = get_pred_html_master(tags, matched, contents)
    txts = {td: assemble_cell_txt([contents[i] for i in idxs])
            for td, idxs in matched.items()}
    got = get_pred_html_master_txt(tags, txts)
    assert got == want


def _cm_frames(spark, boxes_rows, cells_rows):
    b = spark.createDataFrame(
        boxes_rows, "t_id long, box_id long, bx1 double, by1 double, "
        "bx2 double, by2 double")
    c = spark.createDataFrame(
        cells_rows, "t_id long, cell_id long, cx1 double, cy1 double, "
        "cx2 double, cy2 double")
    return b, c


def _cm_both(spark, boxes_rows, cells_rows):
    from paddleocr_spark.entry_queries import _cm_argmin, cell_match_bucketed
    b, c = _cm_frames(spark, boxes_rows, cells_rows)
    simple = sorted(
        tuple(r) for r in
        _cm_argmin(b.join(c, "t_id"))
        .select("t_id", "box_id", "cell_id").collect())
    bucketed = sorted(
        tuple(r) for r in cell_match_bucketed(b, c).collect())
    return simple, bucketed


def test_cell_match_bucketed_matches_simple_on_grid(spark):
    """Boxes inside a covering cell grid: pure tile-local path."""
    cells = [(0, k, float((k % 3) * 100), float((k // 3) * 120),
              float((k % 3) * 100 + 99), float((k // 3) * 120 + 119))
             for k in range(9)]
    boxes = [(0, i, float((i * 37) % 270), float((i * 53) % 320),
              float((i * 37) % 270 + 20), float((i * 53) % 320 + 15))
             for i in range(40)]
    simple, bucketed = _cm_both(spark, boxes, cells)
    assert bucketed == simple


def test_cell_match_bucketed_fallback_no_overlap(spark):
    """A box overlapping NO cell: the reference semantics degrade to pure
    distance over all cells — must route through the full-join fallback
    and still match the simple plan exactly."""
    cells = [(0, 0, 0.0, 0.0, 99.0, 99.0), (0, 1, 100.0, 0.0, 199.0, 99.0),
             (1, 0, 0.0, 0.0, 50.0, 50.0)]
    boxes = [(0, 0, 10.0, 10.0, 30.0, 30.0),     # overlaps cell 0
             (0, 1, 5000.0, 5000.0, 5020.0, 5015.0),  # overlaps nothing
             (1, 0, 600.0, 2.0, 620.0, 20.0)]    # overlaps nothing (t=1)
    simple, bucketed = _cm_both(spark, boxes, cells)
    assert bucketed == simple


def test_cell_match_bucketed_fallback_wide_box(spark):
    """A box wider than one tile breaks the halo proof's precondition —
    its whole table must fall back, and results still match."""
    from paddleocr_spark.entry_queries import CELL_MATCH_TILE
    w = CELL_MATCH_TILE * 3
    cells = [(0, k, float(k * 200), 0.0, float(k * 200 + 199), 250.0)
             for k in range(4)]
    boxes = [(0, 0, 10.0, 10.0, 10.0 + w, 40.0),  # spans ~3 tiles wide
             (0, 1, 420.0, 5.0, 440.0, 25.0)]
    simple, bucketed = _cm_both(spark, boxes, cells)
    assert bucketed == simple


def test_cell_match_bucketed_tie_order_preserved(spark):
    """Equal-IoU, equal-distance ties resolve to the lowest cell_id in
    both plans (the reference's first-cell tie rule)."""
    # two identical overlapping cells -> tie on (1-IoU, dis) -> cell 0
    cells = [(0, 0, 0.0, 0.0, 99.0, 99.0), (0, 1, 0.0, 0.0, 99.0, 99.0)]
    boxes = [(0, 0, 10.0, 10.0, 40.0, 35.0)]
    simple, bucketed = _cm_both(spark, boxes, cells)
    assert bucketed == simple == [(0, 0, 0)]
