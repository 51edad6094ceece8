"""interleaved_pack: packing invariants + cost differential vs the
pandas synth twin."""

from __future__ import annotations

import pytest

from paddleocr_spark.functions.curation import (
    MEDIA_TOKENS,
    SEQ_BUDGET_TOKENS,
    interleaved_pack,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def packed(spark):
    rows = interleaved_pack(spark, SF_SMALL).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: r["doc_id"])
    return by_src


def test_cost_differential(packed, documents_pdf):
    """Every document's cost equals the pandas synth twin's span walk:
    text-kind spans charge whitespace tokens, media spans MEDIA_TOKENS."""
    from paddleocr_spark.synth import synth_spans_pandas

    synth = synth_spans_pandas(documents_pdf)
    spans_by_doc = dict(zip(synth["doc_id"], synth["spans"]))
    n = 0
    for rs in packed.values():
        for r in rs:
            spans = spans_by_doc[r["doc_id"]]
            media = sum(1 for s in spans if s["kind"] == "media")
            toks = sum(
                len([w for w in (s["text"] or "").split(" ") if w])
                for s in spans if s["kind"] != "media")
            assert r["n_spans"] == len(spans), r
            assert r["n_media"] == media, r
            assert r["n_text_tokens"] == toks, r
            assert r["cost"] == toks + MEDIA_TOKENS * media, r
            n += 1
    assert n == 500


def test_packing_invariants(packed):
    """Sequential-packing contract per source: offsets are the running
    sum, seq ids start at 0 and never decrease, every offset is inside
    the budget, and a sequence overhangs only via its last document."""
    skew_seen = multi_seq = False
    for rs in packed.values():
        cum = 0
        prev_seq = 0
        for r in rs:
            assert r["seq_id"] == cum // SEQ_BUDGET_TOKENS, r
            assert r["seq_offset"] == cum % SEQ_BUDGET_TOKENS, r
            assert 0 <= r["seq_offset"] < SEQ_BUDGET_TOKENS
            assert r["seq_id"] >= prev_seq
            prev_seq = r["seq_id"]
            cum += r["cost"]
        assert rs[0]["seq_id"] == 0
        if any(r["cost"] > SEQ_BUDGET_TOKENS for r in rs):
            skew_seen = True
        if rs[-1]["seq_id"] > 0:
            multi_seq = True
    # media-heavy skew docs must exist (single-doc overhanging
    # sequences) and packing must actually span multiple sequences
    assert skew_seen and multi_seq
