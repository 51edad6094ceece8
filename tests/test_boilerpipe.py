"""Boilerpipe NumWordsRulesClassifier: Spark lag/lead form vs a literal
transcription.

``functions/content.py::boilerpipe_extract`` expresses the published
boilerpipe DefaultExtractor decision tree (Kohlschuetter et al., WSDM
2010) as window lag/lead expressions. This file transcribes the
published Java classifier literally, rebuilds each (prev, curr, next)
triple in Python from the per-document block sequence (never trusting
the query's own lag/lead columns), and differentials every block — plus
leaf-coverage assertions so a degenerate corpus can't green the test
vacuously.
"""

from __future__ import annotations

from collections import Counter

import pytest

from paddleocr_spark.functions.content import (
    BP_CURR_LD,
    BP_PREV_LD,
    boilerpipe_extract,
)

SF_SMALL = "/root/testdata/sf0.001"


def classify(prev, curr, nxt):
    """Literal transcription of NumWordsRulesClassifier.classify
    (boilerpipe DefaultExtractor; (num_words, link_density) tuples,
    missing neighbours = (0, 0.0)). Returns (is_content, leaf_id)."""
    p_nw, p_ld = prev
    c_nw, c_ld = curr
    n_nw, _ = nxt
    if c_ld <= BP_CURR_LD:
        if p_ld <= BP_PREV_LD:
            if c_nw <= 16:
                if n_nw <= 15:
                    if p_nw <= 4:
                        return False, "sparse/short/short/short"
                    return True, "sparse/short/short/longprev"
                return True, "sparse/short/longnext"
            return True, "sparse/long"
        if c_nw <= 40:
            if n_nw <= 17:
                return False, "dense/short/shortnext"
            return True, "dense/short/longnext"
        return True, "dense/long"
    return False, "linky"


@pytest.fixture(scope="module")
def bblocks(spark):
    rows = (boilerpipe_extract(spark, SF_SMALL)
            .orderBy("doc_id", "block_idx")
            .collect())
    docs: dict[str, list] = {}
    for r in rows:
        docs.setdefault(r["doc_id"], []).append(r)
    return docs


def test_classifier_differential(bblocks):
    """Every block's content flag matches the literal Java tree applied
    to triples rebuilt from scratch; leaf coverage is total."""
    leaves = Counter()
    for doc_id, rs in bblocks.items():
        feats = [(r["n_words"], r["linked_words"] / r["n_words"])
                 for r in rs]
        for i, r in enumerate(rs):
            prev = feats[i - 1] if i > 0 else (0, 0.0)
            nxt = feats[i + 1] if i + 1 < len(feats) else (0, 0.0)
            expect, leaf = classify(prev, feats[i], nxt)
            assert r["content"] == expect, (doc_id, i, leaf, r)
            # the exposed neighbour features must agree with the rebuild
            assert r["prev_nw"] == prev[0] and r["next_nw"] == nxt[0]
            assert abs(r["prev_link_density"] - round(prev[1], 4)) < 5e-4
            leaves[leaf] += 1
    # every leaf of the published tree must be exercised
    assert set(leaves) == {
        "sparse/short/short/short", "sparse/short/short/longprev",
        "sparse/short/longnext", "sparse/long",
        "dense/short/shortnext", "dense/short/longnext",
        "dense/long", "linky"}, leaves


def test_feature_sanity(bblocks):
    """Word counts split-check against the text; asides are dense enough
    to trip the prev-dense subtree; both outcomes occur among p-blocks."""
    assert len(bblocks) == 500
    p_content = {True: 0, False: 0}
    aside_seen = False
    for rs in bblocks.values():
        for r in rs:
            assert r["n_words"] == len(
                [wd for wd in r["text"].split(" ") if wd]), r
            assert 0 <= r["linked_words"] <= r["n_words"]
            if r["klass"] == "aside":
                aside_seen = True
                assert r["linked_words"] / r["n_words"] > BP_PREV_LD
                assert not r["content"]
            if r["tag"] == "p":
                p_content[bool(r["content"])] += 1
    assert aside_seen
    assert p_content[True] > 0 and p_content[False] > 0
