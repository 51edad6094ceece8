"""Executable-reference differentials: run the REFERENCE source directly
(exec'd standalone — its paddle/cv2 imports never load) against our
kernels on randomized inputs. This is the strongest fidelity oracle in the
suite: it caught the round-2 b_with bug (the reference's ``'<b>' in
ocr_contents[i]`` is tuple membership over (text, score) — element
equality — not a substring test). Skipped when the reference checkout is
absent.
"""

from __future__ import annotations

import os
import random
import textwrap

import pytest

REF = "/root/reference/ppstructure/table"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")


def _exec_method(src_file: str, start: str, end: str, self_name: str,
                 ns: dict):
    src = open(os.path.join(REF, src_file)).read()
    body = src[src.index(start):src.index(end)]
    body = textwrap.dedent(body).replace(f"def {self_name}(self, ",
                                         f"def {self_name}(")
    exec("import re, copy\nimport numpy as np\n" + body, ns)
    return ns[self_name]


def test_pred_html_walks_match_executed_reference():
    import paddleocr_spark.kernels as K
    plain = _exec_method("matcher.py", "    def get_pred_html",
                         "    def get_pred_html_master",
                         "get_pred_html", {})
    master = _exec_method("matcher.py", "    def get_pred_html_master",
                          "    def _filter_ocr_result",
                          "get_pred_html_master",
                          {"deal_eb_token": K.deal_eb_token,
                           "deal_bb": K.deal_bb})
    rng = random.Random(11)
    pool = ["", " ", "a", "<b>", "</b>", "<b>x", "y</b>", " lead",
            "tail ", "w1"]
    tags = ["<td></td>", "</td>", "<td", ">", "<tr>", "</tr>", "<thead>",
            "</thead>", "<tbody>", "</tbody>", "<eb></eb>"]
    for _ in range(300):
        pred = [rng.choice(tags) for _ in range(rng.randint(0, 10))]
        contents = [rng.choice(pool) for _ in range(rng.randint(0, 6))]
        n_td = sum(1 for t in pred if "</td>" in t)
        matched = {}
        for td in range(n_td):
            if contents and rng.random() < 0.7:
                matched[td] = sorted(rng.choices(
                    range(len(contents)), k=rng.randint(1, 3)))
        tup = [(c, 0.9) for c in contents]   # the reference's rec_res shape
        assert (K.get_pred_html(pred, matched, contents)
                == plain(pred, matched, tup)[0]), (pred, matched, contents)
        assert (K.get_pred_html_master(pred, matched, contents)
                == master(pred, matched, tup)[0]), (pred, matched, contents)


def test_master_match_helpers_match_executed_reference():
    import paddleocr_spark.kernels as K
    src = open(os.path.join(REF, "table_master_match.py")).read()

    def grab(start, end, ns=None):
        ns = dict(ns or {})
        exec("import re, copy\n" + src[src.index(start):src.index(end)], ns)
        return ns

    merge = grab("def merge_span_token", "def deal_eb_token")[
        "merge_span_token"]
    eb = grab("def deal_eb_token", "def insert_text_to_token")[
        "deal_eb_token"]
    iso = grab("def deal_isolate_span", "def deal_duplicate_bb")[
        "deal_isolate_span"]
    dup = grab("def deal_duplicate_bb", "def deal_bb")["deal_duplicate_bb"]
    bb = grab("def deal_bb", "class Matcher",
              {"deal_duplicate_bb": dup, "deal_isolate_span": iso})[
        "deal_bb"]

    for toks in ([ "<td></td>", "</tbody>"],
                 ["<td", ' colspan="2"', ">", "</td>", "<td></td>"],
                 ["<td", ' rowspan="2"', ' colspan="3"', ">", "</td>"],
                 ["<tr>", "<td></td>", "</tr>"]):
        assert K.merge_span_token(toks) == merge(list(toks)), toks
    for n in ["", "1", "2", "3", "4", "5", "6", "7", "8", "9", "10"]:
        tok = f"<eb{n}></eb{n}>"
        assert K.deal_eb_token(tok) == eb(tok), tok
    htmls = [
        '<thead><tr><td>h</td><td></td></tr></thead><tbody></tbody>',
        '<thead><tr><td rowspan="2">h</td><td>k</td></tr></thead>',
        '<thead><tr><td><b>a</b><b>b</b></td></tr></thead>',
        '<thead><td></td> rowspan="2" colspan="3"></b></td></thead>',
        '<tbody><tr><td>nohead</td></tr></tbody>',
    ]
    for h in htmls:
        assert K.deal_bb(h) == bb(h), h
        assert K.deal_duplicate_bb(h) == dup(h), h
        assert K.deal_isolate_span(h) == iso(h), h
