"""Tests for curation ops: decontamination, DSIR weights, shard packing.

Each op is re-derived in plain Python from the raw parquet — ground
truth independent of both Spark and the DuckDB oracle twins.
"""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

from paddleocr_spark.functions.curation import (DECON_FLAG_FRAC, DECON_N,
                                                DECON_SPLIT_HEX,
                                                DSIR_TARGET_LANG,
                                                SHARD_BUDGET_WORDS,
                                                decontaminate, dsir_weights,
                                                pack_shards)

SF = "/root/testdata/sf0.001"


def _rows() -> list[dict]:
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "lang", "source"])
    return [{"doc_id": int(d), "lang": la, "source": s,
             "w": [w for w in str(x).lower().split(" ") if w]}
            for d, x, la, s in zip(t.column("doc_id").to_pylist(),
                                   t.column("text").to_pylist(),
                                   t.column("lang").to_pylist(),
                                   t.column("source").to_pylist())]


def _is_eval(doc_id: int) -> bool:
    h = hashlib.md5(f"decon|{doc_id}".encode()).hexdigest()
    return h[:8] < DECON_SPLIT_HEX


def test_decontaminate_matches_plain_python(spark):
    rows = _rows()
    n = DECON_N
    eval_grams = set()
    for r in rows:
        if _is_eval(r["doc_id"]):
            w = r["w"]
            for i in range(len(w) - n + 1):
                eval_grams.add(" ".join(w[i:i + n]))
    want = {}
    for r in rows:
        if _is_eval(r["doc_id"]):
            continue
        w = r["w"]
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        c = sum(g in eval_grams for g in grams)
        frac = c / len(grams) if grams else 0.0
        want[r["doc_id"]] = (len(grams), c, round(frac, 4),
                             frac >= DECON_FLAG_FRAC)
    got = {r["doc_id"]: (r["n_grams"], r["n_contam"], r["contam_frac"],
                         r["flagged"])
           for r in decontaminate(spark, SF).collect()}
    assert got == want
    # split is deterministic and the planted cross-split duplicates are
    # the flagged set — both classes must be present for the op to mean
    # anything on this corpus
    assert any(f for *_, f in want.values())
    assert any(not f for *_, f in want.values())


def test_dsir_weights_match_plain_python(spark):
    rows = _rows()
    raw: dict[str, float] = {}
    tgt: dict[str, float] = {}
    for r in rows:
        for v in r["w"]:
            raw[v] = raw.get(v, 0.0) + 1.0
            if r["lang"] == DSIR_TARGET_LANG:
                tgt[v] = tgt.get(v, 0.0) + 1.0
    vsize = float(len(raw))
    nr = sum(raw.values())
    nt = sum(tgt.values())
    want = {}
    for r in rows:
        lrs = [math.log((tgt.get(v, 0.0) + 1.0) / (nt + vsize))
               - math.log((raw[v] + 1.0) / (nr + vsize)) for v in r["w"]]
        want[r["doc_id"]] = ((round(sum(lrs) / len(lrs), 4), len(lrs))
                             if lrs else (0.0, 0))
    got = {r["doc_id"]: (r["dsir_logratio"], r["n_words"])
           for r in dsir_weights(spark, SF).collect()}
    assert got == want
    # target-language docs must score higher on average than the rest —
    # the whole point of importance weighting
    langs = {r["doc_id"]: r["lang"] for r in rows}
    t = [s for d, (s, _) in want.items() if langs[d] == DSIR_TARGET_LANG]
    o = [s for d, (s, _) in want.items() if langs[d] != DSIR_TARGET_LANG]
    assert sum(t) / len(t) > sum(o) / len(o)


def test_adaptive_quality_filter_matches_plain_python(spark):
    from paddleocr_spark.functions.curation import adaptive_quality_filter
    from paddleocr_spark.functions.textfns import quality_score

    quality = {r["doc_id"]: r["quality"]
               for r in quality_score(spark, SF).collect()}
    rows = _rows()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    thr = {}
    for lang, ids in by_lang.items():
        ordered = sorted(ids, key=lambda d: (quality[d], d))
        thr[lang] = quality[ordered[(len(ordered) + 9) // 10 - 1]]
    want = {r["doc_id"]: (r["lang"], quality[r["doc_id"]], thr[r["lang"]],
                          quality[r["doc_id"]] >= thr[r["lang"]])
            for r in rows}
    got = {r["doc_id"]: (r["lang"], r["quality"], r["lang_p10"], r["kept"])
           for r in adaptive_quality_filter(spark, SF).collect()}
    assert got == want
    # the filter must actually cut overall, and every language must keep
    # at least ~85% (a p10 cut can drop slightly more than 10% only via
    # threshold ties)
    for lang, ids in by_lang.items():
        kept = sum(want[d][3] for d in ids)
        assert kept >= int(0.85 * len(ids))
    assert any(not v[3] for v in want.values())


def test_pack_shards_matches_plain_python(spark):
    rows = _rows()
    by_src: dict[str, list[dict]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    want = {}
    for src, rs in by_src.items():
        cum = 0
        for r in sorted(rs, key=lambda x: x["doc_id"]):
            nw = len(r["w"])
            want[r["doc_id"]] = (src, nw, cum // SHARD_BUDGET_WORDS,
                                 cum % SHARD_BUDGET_WORDS)
            cum += nw
    got = {r["doc_id"]: (r["source"], r["n_words"], r["shard_id"],
                         r["shard_offset"])
           for r in pack_shards(spark, SF).collect()}
    assert got == want
    # budget actually cuts: at least one source spans >1 shard, and no
    # shard STARTS past its budget (overhang is bounded by one doc)
    assert max(s for _, _, s, _ in want.values()) >= 1
    assert all(off < SHARD_BUDGET_WORDS for *_, off in want.values())
