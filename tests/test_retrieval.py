"""Tests for retrieval (BM25 / tf-idf), duplicated spans, and k-means.

Every op is re-derived here in plain Python/NumPy from the raw parquet —
an in-process ground truth independent of both Spark and the DuckDB
oracle twins.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

from paddleocr_spark.functions.clustering import (KMEANS_ITERS, KMEANS_K,
                                                  kmeans_assign)
from paddleocr_spark.functions.retrieval import (BM25_B, BM25_K1, BM25_QUERY,
                                                 BM25_TOPK, DUP_SPAN_FLAG_FRAC,
                                                 DUP_SPAN_N, TFIDF_TOPK,
                                                 bm25_topk, dup_span_docs,
                                                 tfidf_terms)

SF = "/root/testdata/sf0.001"


def _docs() -> dict[int, list[str]]:
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return {int(d): [w for w in str(x).lower().split(" ") if w]
            for d, x in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist())}


def test_bm25_matches_plain_python(spark):
    docs = _docs()
    n = float(len(docs))
    avgdl = sum(len(w) for w in docs.values()) / n
    dfreq = {t: float(sum(t in w for w in docs.values()))
             for t in BM25_QUERY}
    scores = {}
    for d, w in docs.items():
        s = 0.0
        for t in BM25_QUERY:
            tf = float(w.count(t))
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(w) / avgdl))
        if s > 0:
            scores[d] = round(s, 4)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOPK]
    got = [(r["doc_id"], r["bm25"]) for r in bm25_topk(spark, SF).collect()]
    assert got == want


def test_bm25_plans_a_topk_not_a_global_sort(spark):
    plan = bm25_topk(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_tfidf_topk_matches_plain_python(spark):
    docs = _docs()
    n = float(len(docs))
    df: dict[str, float] = {}
    for w in docs.values():
        for t in set(w):
            df[t] = df.get(t, 0.0) + 1.0
    want = {}
    for d, w in docs.items():
        sc = [(round(w.count(t) * math.log(n / df[t]), 4), t)
              for t in set(w)]
        sc.sort(key=lambda p: (-p[0], p[1]))
        want[d] = [(i + 1, t, s) for i, (s, t) in enumerate(sc[:TFIDF_TOPK])]
    got: dict[int, list] = {}
    for r in tfidf_terms(spark, SF).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tfidf"]))
    for d in got:
        got[d].sort()
    assert got == {d: v for d, v in want.items() if v}


def test_dup_spans_match_plain_python(spark):
    docs = _docs()
    gram_docs: dict[tuple, set] = {}
    for d, w in docs.items():
        for i in range(len(w) - DUP_SPAN_N + 1):
            gram_docs.setdefault(tuple(w[i:i + DUP_SPAN_N]), set()).add(d)
    rows = {r["doc_id"]: r for r in dup_span_docs(spark, SF).collect()}
    assert set(rows) == set(docs)
    for d, w in docs.items():
        n_grams = max(len(w) - DUP_SPAN_N + 1, 0)
        n_dup = sum(len(gram_docs[tuple(w[i:i + DUP_SPAN_N])]) >= 2
                    for i in range(n_grams))
        r = rows[d]
        assert r["n_grams"] == n_grams and r["n_dup_grams"] == n_dup
        frac = n_dup / n_grams if n_grams else 0.0
        assert r["dup_frac"] == round(frac, 4)
        assert r["flagged"] == (frac >= DUP_SPAN_FLAG_FRAC)


def test_dup_spans_flag_a_copy_and_spare_the_unique(spark, tmp_path):
    # a whole-document copy shares every 8-gram with its original → both
    # flagged at 1.0; a doc of unique words shares none → 0.0, unflagged;
    # a 7-word doc has no 8-gram → n_grams 0, frac 0.0
    base = " ".join(f"w{i % 6}" for i in range(40))
    uniq = " ".join(f"u{i}" for i in range(40))
    rows = [(0, base), (1, base), (2, uniq), (3, "a b c d e f g")]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.mode("overwrite") \
        .parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r
           for r in dup_span_docs(spark, str(tmp_path)).collect()}
    assert got[0]["flagged"] and got[0]["dup_frac"] == 1.0
    assert got[1]["flagged"] and got[1]["dup_frac"] == 1.0
    assert not got[2]["flagged"] and got[2]["n_dup_grams"] == 0
    assert got[3]["n_grams"] == 0 and got[3]["dup_frac"] == 0.0 \
        and not got[3]["flagged"]


def _kmeans_numpy(e: np.ndarray, ids: np.ndarray,
                  k: int, iters: int) -> np.ndarray:
    order = np.argsort(ids)
    cents = e[order[:k]].copy()
    for it in range(iters):
        d = ((e[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        if it < iters - 1:
            cents = np.stack([e[assign == c].mean(axis=0)
                              for c in range(k)])
    return assign


def test_kmeans_matches_numpy_lloyd(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist())
    e = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    want = _kmeans_numpy(e, ids, KMEANS_K, KMEANS_ITERS)
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(spark, SF).collect()}
    assert len(got) == len(ids)
    mismatch = sum(got[int(i)] != int(c) for i, c in zip(ids, want))
    # float summation order may flip a genuine near-tie; none expected
    # on uniform-random embeddings
    assert mismatch == 0
    assert len(set(got.values())) == KMEANS_K


def test_kmeans_assign_argmin_is_an_aggregate_not_a_window(spark):
    plan = kmeans_assign(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    # corpus-side argmin must be the min_by hash aggregate; the only
    # window allowed is the k-row centroid numbering
    assert plan.count("Window") <= 2
    assert "min_by" in plan or "minby" in plan.lower()


def test_sample_stratified_is_the_md5_threshold_set(spark):
    import hashlib
    import pyarrow.parquet as _pq
    from paddleocr_spark.functions.retrieval import (SAMPLE_THRESHOLD_HEX,
                                                     sample_stratified)
    t = _pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "lang"])
    want = {}
    for d, lg in zip(t.column("doc_id").to_pylist(),
                     t.column("lang").to_pylist()):
        hk = hashlib.md5(f"{lg}:{d}".encode()).hexdigest()[:8]
        if hk < SAMPLE_THRESHOLD_HEX:
            want[int(d)] = (lg, hk)
    got = {r["doc_id"]: (r["lang"], r["hkey"])
           for r in sample_stratified(spark, SF).collect()}
    assert got == want
    # realized rate in the binomial neighbourhood of 25%
    assert 0.15 < len(got) / t.num_rows < 0.35


def test_sample_predicate_reaches_the_scan(spark):
    from paddleocr_spark.functions.retrieval import sample_stratified
    plan = sample_stratified(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle at all


def test_inverted_index_matches_plain_python(spark):
    from paddleocr_spark.functions.retrieval import (INDEX_POSTINGS_CAP,
                                                     inverted_index)
    docs = _docs()
    post: dict[str, list] = {}
    for d in sorted(docs):
        for t in set(docs[d]):
            post.setdefault(t, []).append(d)
    got = {r["term"]: (r["df"], r["postings"])
           for r in inverted_index(spark, SF).collect()}
    want = {t: (len(ds),
                ",".join(str(x) for x in sorted(ds)[:INDEX_POSTINGS_CAP]))
            for t, ds in post.items()}
    assert got == want


def test_lm_score_matches_plain_python(spark):
    from paddleocr_spark.functions.retrieval import lm_score
    docs = _docs()
    uni: dict[str, float] = {}
    big: dict[tuple, float] = {}
    for w in docs.values():
        for t in w:
            uni[t] = uni.get(t, 0.0) + 1.0
        for a, b in zip(w, w[1:]):
            big[(a, b)] = big.get((a, b), 0.0) + 1.0
    v = float(len(uni))
    want = {}
    for d, w in docs.items():
        nll = [-math.log((big[(a, b)] + 1.0) / (uni[a] + v))
               for a, b in zip(w, w[1:])]
        want[d] = ((round(sum(nll) / len(nll), 4), len(nll))
                   if nll else (0.0, 0))
    got = {r["doc_id"]: (r["lm_nll"], r["n_bigrams"])
           for r in lm_score(spark, SF).collect()}
    assert got == want
    # a predictable doc (repeated common bigrams) scores lower than a
    # rare-bigram one — ordering sanity over the realized corpus
    assert min(s for s, n in want.values() if n) > 0


def test_kn_lm_score_matches_plain_python(spark):
    """Interpolated Kneser-Ney bigram LM: Spark == a literal Python
    implementation of the Chen & Goodman fixed-D formula, every doc."""
    from paddleocr_spark.functions.retrieval import KN_DISCOUNT, kn_lm_score
    docs = _docs()
    big: dict[tuple, float] = {}
    for w in docs.values():
        for a, b in zip(w, w[1:]):
            big[(a, b)] = big.get((a, b), 0.0) + 1.0
    cv_dot: dict[str, float] = {}
    n1p_v: dict[str, float] = {}
    n1p_u: dict[str, float] = {}
    for (a, b), c in big.items():
        cv_dot[a] = cv_dot.get(a, 0.0) + c
        n1p_v[a] = n1p_v.get(a, 0.0) + 1.0
        n1p_u[b] = n1p_u.get(b, 0.0) + 1.0
    btypes = float(len(big))
    D = KN_DISCOUNT

    def p(a, b):
        return (max(big[(a, b)] - D, 0.0)
                + D * n1p_v[a] * n1p_u[b] / btypes) / cv_dot[a]

    want = {}
    for d, w in docs.items():
        nll = [-math.log(p(a, b)) for a, b in zip(w, w[1:])]
        want[d] = ((round(sum(nll) / len(nll), 4), len(nll))
                   if nll else (0.0, 0))
    got = {r["doc_id"]: (r["kn_nll"], r["n_bigrams"])
           for r in kn_lm_score(spark, SF).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d][1] == want[d][1], d
        assert abs(got[d][0] - want[d][0]) <= 1e-4, (d, got[d], want[d])
    # every scored position carries a true probability < 1 (positive nll)
    assert min(s for s, n in want.values() if n) > 0


def test_weighted_sample_matches_plain_python(spark):
    """A-ES weighted sampling: Spark top-k per stratum == a literal
    Python implementation, and the sample skews heavy as the algorithm
    promises."""
    import hashlib

    import duckdb

    from paddleocr_spark.functions.retrieval import WS_K, weighted_sample

    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    per_lang: dict[str, list] = {}
    weights_all: dict[str, list] = {}
    for doc_id, lang, text in rows:
        w = len([x for x in (text or "").lower().split(" ") if x])
        if w == 0:
            continue
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float(1 << 60)
        per_lang.setdefault(lang, []).append(
            (math.log(u) / w, doc_id, w))
        weights_all.setdefault(lang, []).append(w)
    want = {}
    for lang, items in per_lang.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rank, (lnkey, doc_id, w) in enumerate(items[:WS_K], 1):
            want[(lang, rank)] = (doc_id, w, round(lnkey, 6))
    got = {(r["lang"], r["rank"]): (r["doc_id"], r["weight"], r["lnkey"])
           for r in weighted_sample(spark, SF).collect()}
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], (key, got[key], want[key])
        assert got[key][1] == want[key][1]
        assert abs(got[key][2] - want[key][2]) <= 1e-6
    # the weights genuinely steer the draw: the A-ES selection must
    # differ from the unweighted (w=1) top-k over the same uniforms
    # (a per-draw mean-weight comparison would be a statistical claim —
    # too noisy for k=20 with this corpus's ~2x weight spread)
    changed = False
    for lang, items in per_lang.items():
        # unweighted draw over the SAME uniforms: key = ln(u) = lnkey*w
        unweighted = {d for _, d, _ in sorted(
            items, key=lambda t: (-(t[0] * t[2]), t[1]))[:WS_K]}
        picked = {d for (lg, _), (d, _, _) in got.items() if lg == lang}
        if picked != unweighted:
            changed = True
    assert changed


def _semdedup_numpy(eps: float):
    from paddleocr_spark.functions.similarity import (VEC_DUP_EVERY,
                                                      VEC_DUP_OFFSET)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist())
    e = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    dup = ids % VEC_DUP_EVERY == 0
    ids = np.concatenate([ids, ids[dup] + VEC_DUP_OFFSET])
    e = np.concatenate([e, e[dup]])
    order = np.argsort(ids)
    cents = e[order[:KMEANS_K]].copy()
    for it in range(KMEANS_ITERS):
        d = ((e[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        if it < KMEANS_ITERS - 1:
            cents = np.stack([e[assign == c].mean(axis=0)
                              for c in range(KMEANS_K)])
    norms = np.sqrt((e * e).sum(axis=1))
    want = {}
    for c in range(KMEANS_K):
        m = np.flatnonzero(assign == c)
        csim = np.round((e[m] * cents[c]).sum(axis=1)
                        / (norms[m] * np.linalg.norm(cents[c])), 4)
        m = m[np.lexsort((ids[m], csim))]
        for rnk, row in enumerate(m):
            prior = m[:rnk]
            ms = (np.round((e[prior] @ e[row])
                           / (norms[prior] * norms[row]), 4).max()
                  if rnk else -1.0)
            want[int(ids[row])] = (c, rnk + 1, float(ms), bool(ms < eps))
    return want


def test_semdedup_matches_numpy_replay(spark):
    from paddleocr_spark.functions.clustering import SEMDEDUP_EPS, semdedup
    want = _semdedup_numpy(SEMDEDUP_EPS)
    got = {r["vec_id"]: (r["cluster"], r["rnk"], r["max_prior_sim"],
                         r["keep"])
           for r in semdedup(spark, SF).collect()}
    assert set(got) == set(want)
    for vid, (c, rnk, ms, keep) in want.items():
        gc, grnk, gms, gkeep = got[vid]
        assert (gc, grnk, gkeep) == (c, rnk, keep), vid
        assert abs(gms - ms) < 1e-9, vid
    # the planted exact duplicates are exactly the pruned set: each has a
    # same-cluster twin with pairwise cosine 1.0 ranked earlier (tie on
    # centroid-sim broken by the smaller original vec_id)
    dropped = {v for v, (_, _, _, k) in got.items() if not k}
    assert dropped == {v for v in got if v >= 1_000_000}
    for v in dropped:
        assert got[v][2] == 1.0
