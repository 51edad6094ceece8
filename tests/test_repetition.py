"""Gopher repetition block: Spark relational form vs a literal Python
reimplementation.

``functions/repetition.py`` computes the full Rae et al. (2021) Table A1
repetition signals relationally (explodes + doc-local aggregations).
This file recomputes every signal IN PYTHON from each decorated word
list — including the overlap-aware duplicate-n-gram position union and
the first-occurrence exemption — and differentials all 13 fractions and
the pass flag, plus arm-coverage assertions (every signal must fail on
some doc and pass on another, and both decoration families must be the
ones firing).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from paddleocr_spark.functions.repetition import (
    PARA_LINES,
    REP_MAX_DUP_CHAR_FRAC,
    REP_MAX_DUP_LINE_CHAR_FRAC,
    REP_MAX_DUP_LINE_FRAC,
    REP_MAX_DUP_PARA_CHAR_FRAC,
    REP_MAX_DUP_PARA_FRAC,
    REP_MAX_TOP_CHAR_FRAC,
    gopher_repetition,
    repetition_corpus,
)
from paddleocr_spark.functions.curation import LINE_WIDTH_WORDS

SF_SMALL = "/root/testdata/sf0.001"


def decorate(did: int, w0: list[str]) -> list[str]:
    pw = PARA_LINES * LINE_WIDTH_WORDS
    if did % 7 == 3:
        return w0[:pw] * 3
    if did % 11 == 5:
        return w0 + w0[:2] * 20
    return w0


def signals(w: list[str]) -> dict[str, float]:
    n_chars = sum(len(x) for x in w)
    out = {"n_words": len(w), "n_chars": n_chars}

    def chunk_stats(width: int, prefix: str):
        chunks = [" ".join(w[i * width:(i + 1) * width])
                  for i in range(len(w) // width)]
        cnt = Counter(chunks)
        n_dup = sum(c - 1 for c in cnt.values())
        dup_chars = sum((c - 1) * (len(g) - (width - 1))
                        for g, c in cnt.items())
        out[f"{prefix}_frac"] = n_dup / len(chunks) if chunks else 0.0
        out[f"{prefix}_char_frac"] = dup_chars / n_chars if chunks else 0.0

    chunk_stats(LINE_WIDTH_WORDS, "dup_line")
    chunk_stats(PARA_LINES * LINE_WIDTH_WORDS, "dup_para")

    for n in (2, 3, 4):
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        if not grams:
            out[f"top{n}_char_frac"] = 0.0
            continue
        cnt = Counter(grams)
        # ties resolve to the lexicographically first gram
        top = min((g for g, c in cnt.items()
                   if c == max(cnt.values())))
        c = cnt[top]
        out[f"top{n}_char_frac"] = (
            0.0 if c <= 1 else (len(top) - (n - 1)) * c / n_chars)

    for n in range(5, 11):
        pos = defaultdict(list)
        for i in range(len(w) - n + 1):
            pos[" ".join(w[i:i + n])].append(i)
        covered: set[int] = set()
        for ps in pos.values():
            if len(ps) >= 2:
                for i in ps[1:]:          # first occurrence exempt
                    covered.update(range(i, i + n))
        out[f"dup{n}_char_frac"] = (
            sum(len(w[p]) for p in covered) / n_chars)
    return out


LIMITS = {
    "dup_line_frac": REP_MAX_DUP_LINE_FRAC,
    "dup_line_char_frac": REP_MAX_DUP_LINE_CHAR_FRAC,
    "dup_para_frac": REP_MAX_DUP_PARA_FRAC,
    "dup_para_char_frac": REP_MAX_DUP_PARA_CHAR_FRAC,
    **{f"top{n}_char_frac": t for n, t in REP_MAX_TOP_CHAR_FRAC.items()},
    **{f"dup{n}_char_frac": t for n, t in REP_MAX_DUP_CHAR_FRAC.items()},
}


@pytest.fixture(scope="module")
def rep(spark):
    rows = {r["doc_id"]: r
            for r in gopher_repetition(spark, SF_SMALL).collect()}
    words = {r["doc_id"]: (r["did"], r["w"])
             for r in repetition_corpus(spark, SF_SMALL).collect()}
    return rows, words


def test_signal_differential(rep):
    rows, words = rep
    assert set(rows) == set(words) and len(rows) == 500
    for doc_id, r in rows.items():
        did, w = words[doc_id]
        exp = signals(list(w))
        assert r["n_words"] == exp["n_words"] and \
            r["n_chars"] == exp["n_chars"], doc_id
        ok = True
        for name, t in LIMITS.items():
            got, want = r[name], round(exp[name], 4)
            assert abs(got - want) < 5e-4, (doc_id, name, got, exp[name])
            ok = ok and round(exp[name], 4) <= t
        assert r["repetition_pass"] == ok, doc_id


def test_arm_coverage(rep):
    rows, words = rep
    fails = Counter()
    passes = Counter()
    fam_fail = Counter()
    for doc_id, r in rows.items():
        did = words[doc_id][0]
        for name, t in LIMITS.items():
            (fails if r[name] > t else passes)[name] += 1
        if not r["repetition_pass"]:
            fam = ("tripled" if did % 7 == 3
                   else "bigram" if did % 11 == 5 else "plain")
            fam_fail[fam] += 1
    # every signal fires somewhere AND passes somewhere
    for name in LIMITS:
        assert fails[name] > 0, name
        assert passes[name] > 0, name
    # both decorated families drive failures; natural word-soup
    # repetition may trip a rare undecorated doc (legitimate — the
    # filter is doing its job) but must stay a small minority
    assert fam_fail["tripled"] > 0 and fam_fail["bigram"] > 0
    n_fail = sum(fam_fail.values())
    assert fam_fail["plain"] <= 0.1 * n_fail
    assert 0 < n_fail < len(rows)


def test_decoration_formulas(rep):
    """The corpus decoration matches the documented closed form."""
    _, words = rep
    pw = PARA_LINES * LINE_WIDTH_WORDS
    tripled = bigram = plain = 0
    for did, w in words.values():
        if did % 7 == 3:
            assert len(w) % 3 == 0 and len(w) <= 3 * pw
            third = len(w) // 3
            assert list(w[:third]) == list(w[third:2 * third]) \
                == list(w[2 * third:])
            tripled += 1
        elif did % 11 == 5:
            assert w[-40:] == w[:2] * 20
            bigram += 1
        else:
            plain += 1
    assert tripled > 0 and bigram > 0 and plain > 0
