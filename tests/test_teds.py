"""TEDS tests: hand-computed scores + distributed consistency."""

from __future__ import annotations

import pytest

from paddleocr_spark.functions.teds import teds, teds_score

def _wrap(t: str) -> str:
    return "<html><body>" + t + "</body></html>"


A = _wrap("<table><tr><td>a</td><td>b</td></tr></table>")
B = _wrap("<table><tr><td>a</td></tr></table>")


def test_teds_hand_cases():
    # identical → 1
    assert teds_score(A, A) == 1.0
    # delete one td (cost 1), n_nodes = max(3, 2) = 3 → 1 - 1/3
    assert teds_score(A, B) == pytest.approx(2 / 3)
    # one-char cell diff: rename cost lev(['a','b'],['a','c'])/2 = 0.5,
    # n_nodes = 2 → 0.75
    assert teds_score(_wrap("<table><tr><td>ab</td></tr></table>"),
                      _wrap("<table><tr><td>ac</td></tr></table>")) == 0.75
    # colspan mismatch: rename cost 1, n = 2 → 0.5
    assert teds_score(_wrap('<table><tr><td colspan="2">a</td></tr></table>'),
                      B) == 0.5
    # inline tag inside td: content tokens ['<b>','a','</b>'] vs ['a'] →
    # rename 2/3; the <b> also counts as a table descendant (lxml .//*
    # semantics) so n_nodes = 3 → 1 - (2/3)/3
    assert teds_score(_wrap("<table><tr><td><b>a</b></td></tr></table>"),
                      B) == pytest.approx(1 - (2 / 3) / 3)
    # empty / table-less inputs → 0 (table_metric.py:146-148, 166-167)
    assert teds_score("", A) == 0.0
    assert teds_score(A, None) == 0.0
    assert teds_score("<div>x</div>", A) == 0.0
    # body/table xpath parity (table_metric.py:152): bare fragments and
    # body-less wrappings score 0.0 even though they contain a table
    assert teds_score("<table><tr><td>a</td></tr></table>", A) == 0.0
    assert teds_score(A, "<body><table><tr><td>a</td></tr></table></body>"
                      ) == 0.0
    # thead/tbody structure, one header char changed:
    # dist = 0.5, descendants = 8 → 0.9375
    f1 = _wrap("<table><thead><tr><td>h1</td><td>h2</td></tr></thead>"
               "<tbody><tr><td>1</td><td>2</td></tr></tbody></table>")
    f2 = f1.replace("h2", "hX")
    assert teds_score(f1, f2) == 0.9375


def test_teds_symmetric_and_bounded():
    cases = [(A, B), (_wrap("<table><tr><td>abc</td></tr></table>"),
                      _wrap("<table><tr><td>xyz</td></tr></table>"))]
    for p, t in cases:
        s1, s2 = teds_score(p, t), teds_score(t, p)
        assert s1 == pytest.approx(s2)
        assert 0.0 <= s1 <= 1.0


def test_teds_distributed_matches_local(spark):
    from paddleocr_spark.entry_queries import q_teds
    rows = q_teds(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 400
    # every third pair is mutated (score < 1), the rest identical (== 1)
    for r in rows[:100]:
        if r["pair_id"] % 3 == 0:
            assert r["teds"] < 1.0
        else:
            assert r["teds"] == 1.0
