"""arc90 Readability block scoring: Spark expressions vs a literal
Python rescore.

``functions/content.py::readability_extract`` flattens the published
readability.js candidate scoring (arc90 / Mozilla Readability:
initializeNode tag seeds, getClassWeight ±25, the per-paragraph
``1 + commas + min(floor(len/100), 3)`` contribution, the final
``* (1 - linkDensity)`` scaling) to block granularity. This file
recomputes every block's score IN PYTHON from the parsed text + tag +
class alone (never from the generator formulas) and differentials it
against the Spark columns, plus arm-coverage assertions so a degenerate
corpus can't green the test vacuously.
"""

from __future__ import annotations

import math

import pytest

from paddleocr_spark.functions.content import (
    READ_MIN_SCORE,
    READ_NEG_CLASSES,
    readability_extract,
)

SF_SMALL = "/root/testdata/sf0.001"


def rescore(tag: str, klass: str, text: str, link_chars: int):
    """The flattened arc90 formulas, recomputed from first principles."""
    tag_w = {"div": 5, "footer": -3, "h1": -5, "h2": -5}.get(tag, 0)
    class_w = -25 if (klass in READ_NEG_CLASSES or tag == "footer") else 0
    commas = text.count(",")
    chunks = min(len(text) // 100, 3)
    raw = tag_w + class_w + 1 + commas + chunks
    score = round(raw * (1.0 - link_chars / len(text)), 4)
    return raw, commas, score, score >= READ_MIN_SCORE


@pytest.fixture(scope="module")
def rblocks(spark):
    rows = (readability_extract(spark, SF_SMALL)
            .orderBy("doc_id", "block_idx")
            .collect())
    docs: dict[str, list] = {}
    for r in rows:
        docs.setdefault(r["doc_id"], []).append(r)
    return docs


def test_rescore_differential(rblocks):
    """Every block's raw_score/commas/score/kept match the Python rescore
    computed from (tag, klass, text, link_density) alone."""
    for doc_id, rs in rblocks.items():
        for r in rs:
            raw, commas, score, kept = rescore(
                r["tag"], r["klass"], r["text"], r["link_chars"])
            assert r["raw_score"] == raw, (doc_id, r)
            assert r["commas"] == commas, (doc_id, r)
            assert math.isclose(r["score"], score, abs_tol=5e-4), (doc_id, r)
            assert r["kept"] == kept, (doc_id, r)


def test_arm_coverage(rblocks):
    """All weight arms, both kept outcomes among p-blocks, every chunk
    tier, and a nonzero comma population must occur."""
    tags, klasses, chunk_tiers = set(), set(), set()
    p_kept = {True: 0, False: 0}
    commas_total = 0
    for rs in rblocks.values():
        for r in rs:
            tags.add(r["tag"])
            klasses.add(r["klass"])
            chunk_tiers.add(min(r["len_text"] // 100, 3))
            commas_total += r["commas"]
            if r["tag"] == "p":
                p_kept[bool(r["kept"])] += 1
            else:
                # every non-p block carries a negative weight -> dropped
                assert not r["kept"], r
    assert tags == {"div", "footer", "h1", "h2", "p"}
    assert {"nav", "aside", ""} <= klasses
    assert chunk_tiers == {0, 1, 2, 3}
    assert commas_total > 0
    assert p_kept[True] > 0 and p_kept[False] > 0


def test_page_structure(rblocks):
    """Same synthesized page skeleton as main_content: nb = 6 + did % 7
    blocks per doc, nav div first, footer last, commas only in p-blocks
    and always outside anchors."""
    assert len(rblocks) == 500
    for doc_id, rs in rblocks.items():
        nb = 6 + int(doc_id) % 7
        assert [r["block_idx"] for r in rs] == list(range(nb))
        assert rs[0]["tag"] == "div" and rs[0]["klass"] == "nav"
        assert rs[-1]["tag"] == "footer"
        for r in rs:
            if r["tag"] != "p":
                assert r["commas"] == 0, r
            assert "<" not in r["text"] and ">" not in r["text"]
