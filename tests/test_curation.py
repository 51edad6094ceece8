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


def test_line_dedup_matches_plain_python(spark):
    from paddleocr_spark.functions.curation import (LINE_DUP_DROP_FRAC,
                                                    LINE_WIDTH_WORDS,
                                                    line_dedup)
    W = LINE_WIDTH_WORDS
    rows = _rows()
    chunk_docs: dict[str, set[int]] = {}
    per_doc: dict[int, list[str]] = {}
    for r in rows:
        cks = [hashlib.md5(" ".join(r["w"][i * W:(i + 1) * W]).encode())
               .hexdigest() for i in range(len(r["w"]) // W)]
        per_doc[r["doc_id"]] = cks
        for c in cks:
            chunk_docs.setdefault(c, set()).add(r["doc_id"])
    want = {}
    for d, cks in per_doc.items():
        dup = sum(1 for c in cks if len(chunk_docs[c]) >= 2)
        frac = round(dup / len(cks), 4) if cks else 0.0
        want[d] = (len(cks), dup, frac, frac < LINE_DUP_DROP_FRAC)
    got = {r["doc_id"]: (r["n_lines"], r["n_dup_lines"], r["dup_frac"],
                         r["kept"])
           for r in line_dedup(spark, SF).collect()}
    assert got == want
    dropped = [d for d, v in want.items() if not v[3]]
    assert dropped, "the planted near-dup families must trip the filter"
    assert len(dropped) < len(rows) // 2


def test_c4_clean_matches_plain_python(spark):
    from paddleocr_spark.functions.curation import (BLOCKLIST,
                                                    C4_MIN_KEPT_LINES,
                                                    C4_MIN_LINE_WORDS,
                                                    C4_NO_PUNCT_NIBBLES,
                                                    LINE_WIDTH_WORDS,
                                                    c4_clean)
    W = LINE_WIDTH_WORDS
    want = {}
    for r in _rows():
        w = r["w"]
        lines = [w[i * W:(i + 1) * W]
                 for i in range((len(w) + W - 1) // W)]
        kept = [ln for ln in lines
                if len(ln) >= C4_MIN_LINE_WORDS
                and hashlib.md5(" ".join(ln).encode()).hexdigest()[0]
                not in C4_NO_PUNCT_NIBBLES]
        blocked = sum(1 for x in w if x in BLOCKLIST)
        want[r["doc_id"]] = (
            len(lines), len(kept), sum(len(ln) for ln in kept), blocked,
            len(kept) >= C4_MIN_KEPT_LINES and blocked == 0)
    got = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_words"],
                         r["n_blocked"], r["kept"])
           for r in c4_clean(spark, SF).collect()}
    assert got == want
    dropped = [d for d, v in want.items() if not v[4]]
    # both page arms live: some docs dropped, most kept, and at least
    # one drop must come from each rule (few survivors vs blocklist)
    assert 0 < len(dropped) < len(want) // 2
    assert any(want[d][3] > 0 for d in dropped)
    assert any(want[d][1] < C4_MIN_KEPT_LINES for d in dropped)
    short_tail = [v for v in want.values() if v[0] > 0 and v[1] < v[0]]
    assert short_tail, "some line must fail a retention rule"


def test_blocklist_filter_matches_plain_python(spark):
    from paddleocr_spark.functions.curation import (BLOCKLIST,
                                                    blocklist_filter)
    rows = _rows()
    want = {r["doc_id"]:
            (sum(1 for w in r["w"] if w in BLOCKLIST),)
            for r in rows}
    got = {r["doc_id"]: (r["n_blocked"],)
           for r in blocklist_filter(spark, SF).collect()}
    assert got == want
    flagged = sum(1 for v in want.values() if v[0] > 0)
    assert 0 < flagged < len(rows) // 2


def test_pii_redact_plants_and_masks(spark):
    import re
    from paddleocr_spark.functions.curation import (PII_EMAIL_RE,
                                                    PII_IP_RE, PII_PHONE_RE,
                                                    pii_redact)
    got = {r["doc_id"]: r for r in pii_redact(spark, SF).collect()}
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    for d, x in zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()):
        d = int(d)
        if d % 3 == 0:
            t0 = (f"{x} contact doc{d}@example.com +1-555-{d % 10000:04d}"
                  f" 10.{d % 256}.0.{(d * 7) % 256}")
        elif d % 3 == 1:
            t0 = f"{x} mail doc{d}@example.com"
        else:
            t0 = str(x)
        n_em = len(re.findall(PII_EMAIL_RE, t0))
        t1 = re.sub(PII_EMAIL_RE, "<EMAIL>", t0)
        n_ph = len(re.findall(PII_PHONE_RE, t1))
        t2 = re.sub(PII_PHONE_RE, "<PHONE>", t1)
        n_ip = len(re.findall(PII_IP_RE, t2))
        red = re.sub(PII_IP_RE, "<IP>", t2)
        g = got[d]
        assert (g["n_emails"], g["n_phones"], g["n_ips"]) == (
            n_em, n_ph, n_ip), d
        assert g["redacted"] == red, d
        if d % 3 == 0:
            assert n_em >= 1 and n_ph >= 1 and n_ip >= 1
            for tok in ("<EMAIL>", "<PHONE>", "<IP>"):
                assert tok in g["redacted"]
        elif d % 3 == 1:
            assert n_em >= 1 and "<EMAIL>" in g["redacted"]
        else:
            assert (n_em, n_ph, n_ip) == (0, 0, 0)
            assert g["redacted"] == t0


def test_sampling_temperature_matches_plain_python(spark):
    from paddleocr_spark.functions.curation import (SAMPLING_ALPHA,
                                                    sampling_temperature)
    rows = _rows()
    nd: dict[str, int] = {}
    nw: dict[str, int] = {}
    for r in rows:
        nd[r["lang"]] = nd.get(r["lang"], 0) + 1
        nw[r["lang"]] = nw.get(r["lang"], 0) + len(r["w"])
    tw = float(sum(nw.values()))
    p = {la: n / tw for la, n in nw.items()}
    z = sum(v ** SAMPLING_ALPHA for v in p.values())
    want = {la: (nd[la], nw[la], round(p[la], 4),
                 round(p[la] ** SAMPLING_ALPHA / z, 4),
                 round(p[la] ** SAMPLING_ALPHA / z / p[la], 4))
            for la in nw}
    got = {r["lang"]: (r["n_docs"], r["n_words"], r["share_raw"],
                       r["share_alpha"], r["boost"])
           for r in sampling_temperature(spark, SF).collect()}
    assert got == want
    # alpha < 1 compresses shares: the biggest language is down-weighted,
    # the smallest is up-weighted
    big = max(p, key=lambda la: p[la])
    small = min(p, key=lambda la: p[la])
    assert got[big][4] < 1.0 < got[small][4]


def test_ccnet_buckets_matches_plain_python(spark):
    from paddleocr_spark.functions.curation import ccnet_buckets
    from paddleocr_spark.functions.retrieval import lm_score

    lm = {r["doc_id"]: r["lm_nll"] for r in lm_score(spark, SF).collect()}
    order = sorted(lm, key=lambda d: (lm[d], d))
    n = len(order)
    t1 = lm[order[(n + 2) // 3 - 1]]
    t2 = lm[order[(2 * n + 2) // 3 - 1]]
    want = {d: (lm[d], "head" if lm[d] <= t1
                else "middle" if lm[d] <= t2 else "tail")
            for d in lm}
    got = {r["doc_id"]: (r["lm_nll"], r["bucket"])
           for r in ccnet_buckets(spark, SF).collect()}
    assert got == want
    counts = {b: sum(1 for v in want.values() if v[1] == b)
              for b in ("head", "middle", "tail")}
    assert all(c > 0 for c in counts.values())
    # tercile cuts can only drift from n/3 via score ties at a threshold
    assert counts["head"] >= n // 4 and counts["tail"] >= n // 5


def test_ccnet_buckets_approx_path(spark):
    """The scaled (quantile-sketch) seam of ccnet_buckets: with
    approx=True the two tercile cutpoints come from percentile_approx
    — the executed plan must contain NO window and NO global sort
    (the exact path's single-partition row_number is the thing the
    seam removes) — and at this corpus size the GK sketch's rank error
    (n/accuracy < 1 rank) makes the cutpoints land on real score
    values, so each bucket must agree with the exact path everywhere
    except possibly ties at a threshold value."""
    from paddleocr_spark.functions.curation import ccnet_buckets

    exact = {r["doc_id"]: (r["lm_nll"], r["bucket"])
             for r in ccnet_buckets(spark, SF).collect()}
    adf = ccnet_buckets(spark, SF, approx=True)
    plan = adf._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "percentile_approx" in plan
    # the only Sorts allowed are none at all — the bucketing is a
    # broadcast of one sketch row over the scored table
    assert "Sort " not in plan and "SortExec" not in plan, plan
    got = {r["doc_id"]: (r["lm_nll"], r["bucket"]) for r in adf.collect()}
    assert set(got) == set(exact)
    thresholds = {v[0] for d, v in exact.items()
                  if got[d][1] != exact[d][1]}
    disagree = [d for d in exact if got[d][1] != exact[d][1]]
    # any disagreement must sit exactly ON a cut value shared by other
    # docs (tie-at-threshold), never in a bucket interior
    for d in disagree:
        assert sum(1 for v in exact.values() if v[0] == exact[d][0]) >= 1
    assert len(disagree) <= max(2, len(exact) // 100), (
        len(disagree), sorted(thresholds))
    for b in ("head", "middle", "tail"):
        ne = sum(1 for v in exact.values() if v[1] == b)
        ng = sum(1 for v in got.values() if v[1] == b)
        assert abs(ne - ng) <= max(2, len(exact) // 100), (b, ne, ng)


def test_quality_classifier_matches_plain_python(spark):
    """NB training + Pareto keep replayed in plain Python. Labels come
    from the Spark gopher_rules output (itself differentialed in
    test_functions) — the replay covers everything downstream: the
    two-class token counts, add-one log-odds, per-doc mean, sigmoid,
    md5-uniform Pareto draw, and the keep decision."""
    from paddleocr_spark.functions.curation import (QC_PARETO_EXP,
                                                    quality_classifier)
    from paddleocr_spark.functions.textfns import gopher_rules

    labels = {r["doc_id"]: r["gopher_pass"]
              for r in gopher_rules(spark, SF).collect()}
    docs = {r["doc_id"]: r["w"] for r in _rows()}
    cp: dict[str, float] = {}
    cn: dict[str, float] = {}
    for d, w in docs.items():
        tgt = cp if labels[d] else cn
        for v in w:
            tgt[v] = tgt.get(v, 0.0) + 1.0
    vocab = set(cp) | set(cn)
    vs, np_, nn = float(len(vocab)), sum(cp.values()), sum(cn.values())
    lo = {v: (math.log((cp.get(v, 0.0) + 1.0) / (np_ + vs))
              - math.log((cn.get(v, 0.0) + 1.0) / (nn + vs)))
          for v in vocab}
    got = {r["doc_id"]: r for r in quality_classifier(spark, SF).collect()}
    assert set(got) == set(docs)
    n_kept = 0
    for d, w in docs.items():
        s = sum(lo[v] for v in w) / len(w) if w else 0.0
        prob = 1.0 / (1.0 + math.exp(-s))
        u = (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
             + 1.0) / 2 ** 32
        cut = 2.0 - u ** QC_PARETO_EXP
        g = got[d]
        assert g["n_words"] == len(w), d
        assert abs(g["qc_logodds"] - s) < 1e-4 + 1e-12, d
        assert abs(g["qc_prob"] - prob) < 1e-4 + 1e-12, d
        assert abs(g["pareto_cut"] - cut) < 1e-4 + 1e-12, d
        assert g["kept"] == (prob > cut), d
        n_kept += g["kept"]
    # the stochastic rule keeps a small non-degenerate slice
    assert 0 < n_kept < len(docs)


def test_corpus_stats_rollup_levels_are_consistent(spark):
    """Plain-python recompute of all three grouping levels + internal
    consistency (facet rows sum to subtotals sum to the grand total)."""
    from paddleocr_spark.functions.curation import corpus_stats

    want: dict[tuple, list] = {}
    for r in _rows():
        nw = len(r["w"])
        for key in [(r["lang"], r["source"]), (r["lang"], None),
                    (None, None)]:
            e = want.setdefault(key, [0, 0])
            e[0] += 1
            e[1] += nw
    got = {(r["lang"], r["source"]): r
           for r in corpus_stats(spark, SF).collect()}
    assert set(got) == set(want)
    for key, (nd, nw) in want.items():
        g = got[key]
        assert (g["n_docs"], g["n_words"]) == (nd, nw), key
        assert abs(g["avg_words"] - round(nw / nd, 4)) < 1e-9, key
    total = got[(None, None)]
    leaf = [g for k, g in got.items() if k[0] and k[1]]
    assert sum(g["n_docs"] for g in leaf) == total["n_docs"]
    assert sum(g["n_words"] for g in leaf) == total["n_words"]


def test_sessionize_matches_plain_python(spark):
    """Gap sessionization replayed in plain Python at full microsecond
    precision; also pins that the plan needs exactly ONE exchange (the
    lag window, the running sum, and the final group-by all share the
    user_id partitioning)."""
    import datetime as dt

    from paddleocr_spark.entry_queries import (SESSION_GAP_MIN,
                                               q_sessionize)
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id", "value"])
    by_user: dict[int, list] = {}
    for e, ts, u, v in zip(t.column("event_id").to_pylist(),
                           t.column("ts").to_pylist(),
                           t.column("user_id").to_pylist(),
                           t.column("value").to_pylist()):
        by_user.setdefault(int(u), []).append((ts, int(e), float(v)))
    gap = dt.timedelta(minutes=SESSION_GAP_MIN)
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, _, v in evs:
            if prev is None or ts - prev > gap:
                sid += 1
                want[(u, sid)] = [ts, ts, 0, 0.0]
            s = want[(u, sid)]
            s[1] = ts
            s[2] += 1
            s[3] += v
            prev = ts
    got = {(r["user_id"], r["session_idx"]): r
           for r in q_sessionize(spark, SF).collect()}
    assert set(got) == set(want)
    for key, (st, en, n, tot) in want.items():
        g = got[key]
        assert (g["session_start"], g["session_end"], g["n_events"]) \
            == (st, en, n), key
        assert abs(g["total_value"] - tot) < 1e-3, key
    # sessions really split: more sessions than users, fewer than events
    assert len(by_user) < len(want) < sum(len(v) for v in by_user.values())
    plan = q_sessionize(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_asof_join_matches_plain_python(spark):
    """Point-in-time join replayed with a per-user sweep; purchases
    before any click carry NULLs (left semantics)."""
    from paddleocr_spark.entry_queries import q_asof_join
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id", "event_type",
                               "value"])
    rows = sorted(zip(t.column("user_id").to_pylist(),
                      t.column("ts").to_pylist(),
                      t.column("event_type").to_pylist(),
                      t.column("event_id").to_pylist(),
                      t.column("value").to_pylist()))
    want, last_click = {}, {}
    for u, ts, et, e, v in rows:
        if et == "click":
            last_click[u] = (ts, v)
        elif et == "purchase":
            want[int(e)] = last_click.get(u)
    got = {r["event_id"]: r for r in q_asof_join(spark, SF).collect()}
    assert set(got) == set(want)
    n_null = 0
    for e, lc in want.items():
        g = got[e]
        if lc is None:
            assert g["click_ts"] is None and g["click_value"] is None, e
            n_null += 1
        else:
            assert g["click_ts"] == lc[0], e
            assert abs(g["click_value"] - lc[1]) < 1e-3, e
    # both branches exercised: some purchases precede any click
    assert 0 < n_null < len(want)


def test_zorder_layout_buckets_are_tight(spark):
    """Morton keys replayed in plain Python (bit-exact), and the layout
    CLAIM quantified: z-order file buckets carry far tighter (cx, cy)
    min/max ranges than a doc-hash layout with the same bucket count —
    tight ranges are what make manifest min/max stats prune files."""
    from paddleocr_spark.entry_queries import (ZORDER_BITS,
                                               ZORDER_BUCKET_SHIFT,
                                               q_span_geometry,
                                               q_zorder_layout)

    spans = q_span_geometry(spark, SF).collect()

    def morton(cx: int, cy: int) -> int:
        k = 0
        for i in range(ZORDER_BITS):
            k += ((cx >> i) & 1) << (2 * i)
            k += ((cy >> i) & 1) << (2 * i + 1)
        return k

    want: dict[int, list] = {}
    hash_layout: dict[int, list] = {}
    for r in spans:
        cx = (r["x1"] + r["x2"]) // 2
        cy = (r["y1"] + r["y2"]) // 2
        b = morton(cx, cy) >> ZORDER_BUCKET_SHIFT
        doc_bucket = int(hashlib.md5(
            str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 16
        for layout, key in ((want, b), (hash_layout, doc_bucket)):
            e = layout.setdefault(key, [0, cx, cx, cy, cy])
            e[0] += 1
            e[1], e[2] = min(e[1], cx), max(e[2], cx)
            e[3], e[4] = min(e[3], cy), max(e[4], cy)
    got = {r["bucket"]: [r["n_spans"], r["min_cx"], r["max_cx"],
                         r["min_cy"], r["max_cy"]]
           for r in q_zorder_layout(spark, SF).collect()}
    assert got == want

    def mean_area(layout) -> float:
        return sum((e[2] - e[1] + 1) * (e[4] - e[3] + 1)
                   for e in layout.values()) / len(layout)

    # the point of the op: z-buckets are spatially tight, hash buckets
    # each span the whole coordinate space
    assert mean_area(want) * 3 < mean_area(hash_layout)
