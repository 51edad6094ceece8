"""Tests for char-level LCS P/R/F1 and the greedy detection evaluator."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from paddleocr_spark.functions.metrics import (EPS, char_prf,
                                               det_match_counts, det_eval,
                                               lcs_string)

SF = "/root/testdata/sf0.001"


def _ref_lcs_len(x: str, y: str) -> int:
    """Independent O(nm) LCS length for cross-checking."""
    m, n = len(x), len(y)
    dp = np.zeros((m + 1, n + 1), dtype=int)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i][j] = (dp[i - 1][j - 1] + 1 if x[i - 1] == y[j - 1]
                        else max(dp[i - 1][j], dp[i][j - 1]))
    return int(dp[m][n])


def test_lcs_string_is_a_true_lcs():
    cases = [("abcde", "ace"), ("kitten", "sitting"), ("", "abc"),
             ("abc", ""), ("same", "same"), ("abab", "baba"),
             ("a", "xyz"), ("xyz", "z")]
    for x, y in cases:
        s = lcs_string(x, y)
        assert len(s) == _ref_lcs_len(x, y), (x, y, s)
        # s must be a subsequence of both
        for t in (x, y):
            it = iter(t)
            assert all(c in it for c in s), (x, y, s)


def test_lcs_string_preserves_reference_quirk():
    """The reference's Hirschberg base case (rec_metric.py:46-51) is lossy
    for some inputs — ('spark rocks', 'sparse docks') has true LCS length 9
    ('spar ocks') but the reference returns 'sparocks' (8). The metric is
    DEFINED by the reference's counts, so we reproduce them, not the
    optimum."""
    assert lcs_string("spark rocks", "sparse docks") == "sparocks"
    assert _ref_lcs_len("spark rocks", "sparse docks") == 9


def test_char_prf_identity_pairs(spark):
    pairs = spark.createDataFrame(
        [("hello world", "hello world"), ("abc", "abc")],
        "pred string, target string")
    row = char_prf(pairs).collect()[0]
    # perfect prediction: everything ≈ 1 (eps-damped)
    assert row["overall_precision"] == pytest.approx(1.0, abs=1e-3)
    assert row["overall_recall"] == pytest.approx(1.0, abs=1e-3)
    assert row["mean_f1"] == pytest.approx(1.0, abs=1e-3)


def test_char_prf_matches_single_node_reference(spark):
    """Distributed counts == the reference eval_full count semantics run
    single-node in plain Python."""
    pdf = spark.read.parquet(f"{SF}/documents.parquet").limit(80).collect()
    raw = [(("x" + r["text"][:60]), r["text"][:60]) for r in pdf]
    pairs = spark.createDataFrame(raw, "pred string, target string")
    got = char_prf(pairs).collect()[0]

    label: dict = {}
    predc: dict = {}
    answer: dict = {}
    for pred, target in raw:
        pred = pred.replace(" ", "")
        target = target.replace(" ", "")
        for c in pred:
            predc[c] = predc.get(c, 0) + 1
        for c in target:
            label[c] = label.get(c, 0) + 1
        for c in lcs_string(pred, target):
            answer[c] = answer.get(c, 0) + 1
    chars = set(label) | set(predc)
    recalls, precisions, f1s = [], [], []
    for c in chars:
        r = answer.get(c, 0) / (label[c] + EPS) if c in label else 0
        if c in label:
            recalls.append(r)
        p = answer.get(c, 0) / (predc[c] + EPS) if c in predc else 0
        if c in predc:
            precisions.append(p)
        f1s.append(2 * r * p / (r + p + EPS))
    tot_l = sum(label.values())
    tot_p = sum(predc.values())
    tot_a = sum(answer.values())
    assert got["mean_recall"] == pytest.approx(
        sum(recalls) / (len(recalls) + EPS), abs=1e-4)
    assert got["mean_precision"] == pytest.approx(
        sum(precisions) / (len(precisions) + EPS), abs=1e-4)
    assert got["mean_f1"] == pytest.approx(
        sum(f1s) / (len(f1s) + EPS), abs=1e-4)
    assert got["overall_precision"] == pytest.approx(
        tot_a / (tot_p + EPS), abs=1e-4)
    assert got["overall_recall"] == pytest.approx(
        tot_a / (tot_l + EPS), abs=1e-4)


def test_det_match_counts_hand_cases():
    # two gts, one det matching the first
    gt = [[0, 0, 10, 10], [20, 20, 30, 30]]
    det = [[1, 1, 10, 10]]
    assert det_match_counts(gt, [False, False], det) == (2, 1, 1)
    # don't-care gt absorbs a det fully inside it
    gt = [[0, 0, 100, 100]]
    det = [[10, 10, 20, 20]]
    assert det_match_counts(gt, [True], det) == (0, 0, 0)
    # greedy first-come: det 0 pairs with gt 0 even if det 1 overlaps more
    gt = [[0, 0, 10, 10]]
    det = [[0, 0, 9, 10], [0, 0, 10, 10]]
    assert det_match_counts(gt, [False], det) == (1, 2, 1)
    # empty everything
    assert det_match_counts(np.empty((0, 4)), [], np.empty((0, 4))) == (0, 0, 0)


def test_det_eval_distributed_equals_kernel(spark):
    from paddleocr_spark.entry_queries import q_det_eval
    row = q_det_eval(spark, SF).collect()[0]
    assert row["n_images"] > 0
    # ln<=3 dets are 3px-jittered 25x18 boxes → IoU ≈ (22*15)/(2*450-330) ≈ 0.58 > 0.5
    # so most care-gts match; precision/recall must be high but not 1
    assert 0.5 < row["precision"] <= 1.0
    assert 0.5 < row["recall"] <= 1.0
    assert row["hmean"] == pytest.approx(
        2 * row["precision"] * row["recall"]
        / (row["precision"] + row["recall"]), abs=2e-4)


def _md5_hex(s: str, idx: int) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[idx - 1], 16)


def _ser_tags(doc_id: int, n_pos: int, which: str) -> list[str]:
    """Plain-python replay of q_ser_token_metric's closed-form tag
    synthesis, emitted as an actual IOB2 tag SEQUENCE (the shape the
    reference feeds seqeval)."""
    def anchor(p):
        a = _md5_hex(f"{doc_id}#g{p}", 1) >= 12
        if which == "g":
            return a
        return a != (_md5_hex(f"{doc_id}#n{p}", 1) == 0)

    def ext(p):
        return _md5_hex(f"{doc_id}#g{p}", 2) >= 8

    tags = ["O"] * (n_pos + 1)           # 1-indexed
    for p in range(1, n_pos + 1):
        if anchor(p):
            t = _md5_hex(f"{doc_id}#g{p}", 1) % 3
            tags[p] = f"B-t{t}"
            q = p + 1
            while q <= min(p + 2, n_pos) and not anchor(q) and ext(q):
                tags[q] = f"I-t{t}"
                q += 1
    return tags[1:]


def _conlleval_entities(tags: list[str]) -> set[tuple]:
    """Independent entity chunker implementing seqeval's default
    (conlleval) rules for BIO input: chunk starts at B-, or at I- whose
    predecessor is O / a different type; ends before O / B- / a type
    change. On VALID IOB2 this equals maximal B,I..I runs."""
    out, start, cur = set(), None, None
    for i, tag in enumerate(tags + ["O"]):
        pre, typ = (tag[0], tag[2:]) if tag != "O" else ("O", "")
        if start is not None and (pre == "O" or pre == "B" or typ != cur):
            out.add((cur, start, i - 1))
            start = None
        if pre == "B" or (pre == "I" and start is None):
            start, cur = i, typ
    return out


def test_ser_token_metric_matches_tag_sequence_replay(spark):
    """The distributed closed-form entity derivation must equal chunking
    the ACTUAL IOB2 tag sequences with conlleval rules — i.e. the no-
    windows Spark construction really is the seqeval entity metric."""
    import pandas as pd

    from paddleocr_spark.entry_queries import (SER_MAX_POS,
                                               q_ser_token_metric)

    docs = pd.read_parquet(SF + "/documents.parquet")
    n_true = n_pred = n_match = 0
    for _, row in docs.iterrows():
        n_pos = min(max(int(row.n_chars) % SER_MAX_POS + 2, 3), SER_MAX_POS)
        g = {(t, s + 1, e + 1) for t, s, e in
             _conlleval_entities(_ser_tags(int(row.doc_id), n_pos, "g"))}
        p = {(t, s + 1, e + 1) for t, s, e in
             _conlleval_entities(_ser_tags(int(row.doc_id), n_pos, "p"))}
        n_true += len(g)
        n_pred += len(p)
        n_match += len(g & p)
    got = q_ser_token_metric(spark, SF).collect()[0]
    assert (got["n_true"], got["n_pred"], got["n_match"]) == (
        n_true, n_pred, n_match)
    assert got["precision"] == pytest.approx(n_match / n_pred, abs=1e-4)
    assert got["recall"] == pytest.approx(n_match / n_true, abs=1e-4)


def test_kie_f1_metric_matches_plain_python(spark):
    """compute_f1_score (kie_metric.py:43-66) replayed: confusion matrix
    from the same md5-derived gt/argmax-pred, clip-regularized per-class
    P/R/F1, mean over the non-ignored classes."""
    import hashlib

    import pandas as pd

    from paddleocr_spark.entry_queries import (KIE_F1_C, KIE_F1_CLASSES,
                                               q_kie_f1_metric)

    docs = pd.read_parquet(SF + "/documents.parquet")
    hist = np.zeros((KIE_F1_C, KIE_F1_C))
    for d in docs.doc_id:
        h = hashlib.md5(str(int(d)).encode()).hexdigest()
        gt = (int(h[0], 16) * 16 + int(h[1], 16)) % 26
        noisy = h[2] == "0"
        scores = [
            int(hashlib.md5(f"{int(d)}:{c}".encode()).hexdigest()[:8], 16)
            + (2 ** 33 if (c == gt and not noisy) else 0)
            for c in range(KIE_F1_C)]
        pred = int(np.argmax(scores))
        hist[gt, pred] += 1
    diag = np.diag(hist)
    recalls = diag / hist.sum(1).clip(min=1)
    precisions = diag / hist.sum(0).clip(min=1)
    f1 = 2 * recalls * precisions / (recalls + precisions).clip(min=1e-8)
    want = {c: f1[c] for c in KIE_F1_CLASSES}
    got = {r["cls"]: r["f1"] for r in q_kie_f1_metric(spark, SF).collect()}
    assert set(got) == set(want)
    for c in want:
        assert got[c] == pytest.approx(want[c], abs=1e-4), c
    hm = q_kie_f1_metric(spark, SF).collect()[0]["hmean"]
    assert hm == pytest.approx(np.mean(list(want.values())), abs=1e-4)


def test_ct_match_counts_regimes():
    """The three Deteval matching regimes + don't-care filtering, on
    hand geometry: one-to-one credits 1/1, one-to-many credits fsc_k
    recall and per-candidate fsc_k precision, many-to-one the mirror;
    a '###' gt removes itself AND the det covering it."""
    from paddleocr_spark.functions.metrics import (ct_match_counts,
                                                   ct_sigma_tau)

    gt = np.array([[0, 0, 100, 40]])
    det = np.array([[3, 3, 103, 43]])
    s, t = ct_sigma_tau(gt, np.array([False]), det)
    assert ct_match_counts(s, t) == (1, 1, 1.0, 1.0, 0)

    det2 = np.array([[0, 0, 50, 40], [50, 0, 100, 40]])
    s, t = ct_sigma_tau(gt, np.array([False]), det2)
    ng, nd, r, p, _ = ct_match_counts(s, t)
    assert (ng, nd) == (1, 2)
    assert r == pytest.approx(0.8) and p == pytest.approx(1.6)

    gt2 = np.array([[0, 0, 50, 40], [50, 0, 100, 40]])
    det1 = np.array([[0, 0, 100, 40]])
    s, t = ct_sigma_tau(gt2, np.array([False, False]), det1)
    ng, nd, r, p, _ = ct_match_counts(s, t)
    assert (ng, nd) == (2, 1)
    assert r == pytest.approx(1.6) and p == pytest.approx(0.8)

    # dc gt removes the overlapping det and itself
    s, t = ct_sigma_tau(np.array([[0, 0, 100, 40]]), np.array([True]),
                        np.array([[0, 0, 100, 40]]))
    assert s.shape == (0, 0) and ct_match_counts(s, t) == (0, 0, 0.0, 0.0, 0)

    # a miss: far-off det stays counted but contributes nothing
    s, t = ct_sigma_tau(gt, np.array([False]),
                        np.array([[7000, 7000, 7100, 7040]]))
    assert ct_match_counts(s, t) == (1, 1, 0.0, 0.0, 0)


def test_distillation_metric_merge_matches_executed_reference():
    """Executes the reference DistillationMetric
    (distillation_metric.py:26-75) with a recording fake base metric —
    its only own logic is the per-key dispatch and the get_metric name
    merge (main key unprefixed, others '{key}_{sub}'), which is exactly
    the emit scheme q_distillation_metric pins."""
    src = open("/root/reference/ppocr/metrics/"
               "distillation_metric.py").read()
    for line in ("from .rec_metric import RecMetric",
                 "from .det_metric import DetMetric, DetFCEMetric",
                 "from .e2e_metric import E2EMetric",
                 "from .cls_metric import ClsMetric",
                 "from .vqa_token_ser_metric import VQASerTokenMetric",
                 "from .vqa_token_re_metric import VQAReTokenMetric"):
        assert line in src, line
        src = src.replace(line, f"# [test-injected] {line}")

    calls = []

    class _FakeRec:
        def __init__(self, main_indicator=None, **kw):
            self.seen = 0

        def reset(self):
            self.seen = 0

        def __call__(self, preds, batch, **kw):
            self.seen += 1
            calls.append(preds)

        def get_metric(self):
            return {"exact_acc": 0.5 + self.seen,
                    "norm_edit_sim": 0.25, "n": 7.0}

    import importlib
    import types
    ns = {"RecMetric": _FakeRec, "importlib": importlib}
    exec(src, ns)
    # importlib.import_module(__name__) resolves inside the exec'd
    # namespace: give it a module whose attrs ARE that namespace
    mod = types.ModuleType("ref_distillation")
    mod.RecMetric = _FakeRec
    import sys
    sys.modules["ref_distillation"] = mod
    try:
        ns["__name__"] = "ref_distillation"
        dm = ns["DistillationMetric"](key="Student",
                                      base_metric_name="RecMetric")
        dm.__call__({"Student": [1], "Teacher": [2]}, batch=[0])
        out = dm.get_metric()
    finally:
        sys.modules.pop("ref_distillation", None)
    assert out == {"exact_acc": 1.5, "norm_edit_sim": 0.25, "n": 7.0,
                   "Teacher_exact_acc": 1.5,
                   "Teacher_norm_edit_sim": 0.25, "Teacher_n": 7.0}
    assert calls == [[1], [2]]
