"""Product quantization: full plain-numpy replay + structural checks."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as paq

from paddleocr_spark.functions.pq import (
    IVFPQ_NPROBE,
    PQ_ITERS,
    PQ_K,
    PQ_M,
    PQ_QUERIES,
    PQ_TOPK_K,
    ivfpq_topk,
    pq_adc_topk,
    pq_codes,
)
from paddleocr_spark.functions.similarity import ivf_centroid_every

SF = "/root/testdata/sf0.001"


def _load():
    t = paq.read_table(f"{SF}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist())
    e = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], e[order]


def _train_numpy(e: np.ndarray):
    """M independent Lloyd runs over the subvector slices — the textbook
    formulation the subspace-keyed dataflow must equal."""
    n, dim = e.shape
    dsub = dim // PQ_M
    codes = np.zeros((n, PQ_M), dtype=np.int64)
    books = []
    for s in range(PQ_M):
        sv = e[:, s * dsub:(s + 1) * dsub]
        cents = sv[:PQ_K].copy()          # ids are pre-sorted by vec_id
        for it in range(PQ_ITERS):
            d = ((sv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)     # argmin ties -> smallest index
            if it < PQ_ITERS - 1:
                cents = np.stack([sv[assign == c].mean(axis=0)
                                  for c in range(PQ_K)])
        codes[:, s] = assign
        books.append(cents)
    return codes, books


def test_codes_match_numpy(spark):
    ids, e = _load()
    want, _ = _train_numpy(e)
    got = {}
    for r in pq_codes(spark, SF).collect():
        got.setdefault(r["vec_id"], {})[r["sub"]] = r["code"]
    assert len(got) == len(ids)
    mismatch = sum(got[int(v)][s] != int(want[i, s])
                   for i, v in enumerate(ids) for s in range(PQ_M))
    # float summation order may flip a genuine near-tie; none expected
    # on uniform-random embeddings
    assert mismatch == 0


def test_codes_shape(spark):
    rows = pq_codes(spark, SF).collect()
    ids, e = _load()
    assert len(rows) == len(ids) * PQ_M
    per_sub = {}
    for r in rows:
        per_sub.setdefault(r["sub"], set()).add(r["code"])
    assert set(per_sub) == set(range(PQ_M))
    for s, cs in per_sub.items():
        assert cs <= set(range(PQ_K))
        assert len(cs) > 1, f"degenerate codebook in sub {s}"


def test_adc_topk_matches_numpy(spark):
    ids, e = _load()
    codes, books = _train_numpy(e)
    dsub = e.shape[1] // PQ_M
    want = {}
    for q in range(PQ_QUERIES):
        qi = int(np.flatnonzero(ids == q)[0])
        # ADC: per-subspace distance table, fixed-order lookup sum
        dt = [((e[qi, s * dsub:(s + 1) * dsub][None, :] - books[s]) ** 2)
              .sum(axis=1) for s in range(PQ_M)]
        adc = np.zeros(len(ids))
        for s in range(PQ_M):
            adc = adc + dt[s][codes[:, s]]
        cand = [(float(adc[i]), int(v)) for i, v in enumerate(ids)
                if int(v) != q]
        cand.sort()
        want[q] = [v for _, v in cand[:PQ_TOPK_K]]
    got = {}
    for r in pq_adc_topk(spark, SF).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for q in range(PQ_QUERIES):
        assert [v for _, v in sorted(got[q])] == want[q], q


def test_ivfpq_matches_numpy(spark):
    """Full plain-numpy IVFADC replay: coarse cosine assign → residuals →
    shared PQ codebooks → nprobe probing → fixed-order ADC → top-k."""
    ids, e = _load()
    n = len(ids)
    every = ivf_centroid_every(n)
    cent_ids = [int(v) for v in ids if int(v) % every == 1]
    cents = np.stack([e[int(np.flatnonzero(ids == c)[0])]
                      for c in cent_ids])

    def cos(a, b):
        return (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    # coarse assign: cosine desc, tie -> smaller centroid_id (cent_ids
    # ascend and argmax returns the first max, which is the smaller id)
    sims = np.array([[cos(e[i], cents[j]) for j in range(len(cent_ids))]
                     for i in range(n)])
    coarse = sims.argmax(axis=1)
    residuals = e - cents[coarse]

    codes, books = _train_numpy(residuals)
    dsub = e.shape[1] // PQ_M
    want = {}
    for q in range(PQ_QUERIES):
        qi = int(np.flatnonzero(ids == q)[0])
        probe_order = sorted(range(len(cent_ids)),
                             key=lambda j: (-sims[qi, j], cent_ids[j]))
        probed = probe_order[:IVFPQ_NPROBE]
        cand = []
        for j in probed:
            qr = e[qi] - cents[j]
            dt = [((qr[s * dsub:(s + 1) * dsub][None, :] - books[s]) ** 2)
                  .sum(axis=1) for s in range(PQ_M)]
            for i in range(n):
                if coarse[i] != j or int(ids[i]) == q:
                    continue
                adc = 0.0
                for s in range(PQ_M):
                    adc = adc + dt[s][codes[i, s]]
                cand.append((adc, int(ids[i]), cent_ids[j]))
        cand.sort()
        want[q] = [(r + 1, v, c)
                   for r, (_, v, c) in enumerate(cand[:PQ_TOPK_K])]
    got = {}
    for r in ivfpq_topk(spark, SF).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["centroid_id"]))
    for q in range(PQ_QUERIES):
        assert sorted(got[q]) == want[q], q


def test_compression_is_real(spark):
    """The headline claim: M codes of log2(K) bits per vector vs dim
    floats — and the ADC neighbours still overlap brute-force ones."""
    ids, e = _load()
    bits_pq = PQ_M * int(np.log2(PQ_K))
    bits_raw = e.shape[1] * 32
    assert bits_pq <= bits_raw / 100   # >=100x compression at demo sizes
    # The ADC ranking must carry real signal despite the coarse demo
    # codebook (uniform-random 64-d data is PQ's distance-concentration
    # worst case, so exact top-k overlap is a poor yardstick): the true
    # L2 distance of the ADC-selected neighbours must sit well below the
    # corpus mean distance to the query.
    rows = [r["vec_id"] for r in pq_adc_topk(spark, SF).collect()
            if r["query_id"] == 0]
    qi = int(np.flatnonzero(ids == 0)[0])
    d = ((e - e[qi]) ** 2).sum(axis=1)
    others = [int(v) for v in ids if int(v) != 0]
    rank = {v: r for r, v in enumerate(
        sorted(others, key=lambda v: d[int(np.flatnonzero(ids == v)[0])]))}
    mean_rank = np.mean([rank[v] for v in rows])
    # random picks would average ~len(others)/2 = ~250; demand 4x better
    assert mean_rank < len(others) / 8, mean_rank
