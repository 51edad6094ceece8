"""Quirk pins + distributed checks for the seeded random augments."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from paddleocr_spark.augments import (EAST_CROP_MAX_TRIES, crop_area,
                                      east_crop_doc, east_random_crop,
                                      split_regions)

SF = "/root/testdata/sf0.001"


def test_crop_area_occupancy_is_maxx_exclusive():
    # a box spanning x∈[10,20] leaves column 20 itself "free" (the
    # reference's w_array[minx:maxx] = 1 quirk) — with every other
    # column of a 21-wide canvas occupied, both free axes collapse to
    # {20} and the crop degenerates deterministically around it
    poly = np.array([[10.0, 10.0], [20.0, 10.0],
                     [20.0, 20.0], [10.0, 20.0]])
    rng = np.random.RandomState(0)
    h_arr = np.zeros(25, dtype=np.int32)
    w_arr = np.zeros(25, dtype=np.int32)
    pts = np.round(poly).astype(np.int32)
    w_arr[pts[:, 0].min():pts[:, 0].max()] = 1
    h_arr[pts[:, 1].min():pts[:, 1].max()] = 1
    assert w_arr[19] == 1 and w_arr[20] == 0  # exclusive right edge
    assert h_arr[19] == 1 and h_arr[20] == 0


def test_crop_area_returns_whole_canvas_after_max_tries():
    # no care polys → every candidate fails the contains-a-poly check →
    # fallback (0, 0, w, h); the RNG must still be consumed per try
    rng = np.random.RandomState(7)
    before = rng.randint(0, 2 ** 31)
    rng = np.random.RandomState(7)
    assert crop_area(100, 200, [], 0.1, EAST_CROP_MAX_TRIES, rng) \
        == (0, 0, 200, 100)
    # 10 tries × 2 axes × 2 draws consumed ⇒ stream advanced
    assert rng.randint(0, 2 ** 31) != before


def test_split_regions_drops_the_trailing_run():
    # reference quirk: the final run is never appended
    axis = np.array([0, 1, 2, 5, 6, 9])
    regions = split_regions(axis)
    assert [list(r) for r in regions] == [[0, 1, 2], [5, 6]]


def test_east_crop_doc_is_deterministic_per_seed():
    boxes = np.array([[10.0, 10.0, 200.0, 30.0],
                      [300.0, 40.0, 500.0, 55.0]])
    tags = np.array([False, False])
    a = east_crop_doc(42, boxes, tags)
    b = east_crop_doc(42, boxes, tags)
    assert a == b
    c = east_crop_doc(43, boxes, tags)
    assert a != c  # a different seed draws a different crop (here)


def test_east_random_crop_distributed_matches_single_node(spark):
    from paddleocr_spark.entry_queries import q_east_crop
    got = {(r["doc_id"], r["span_idx"]):
           (r["crop_x"], r["crop_y"], r["crop_w"], r["crop_h"],
            r["scale"], r["nx1"], r["ny1"], r["nx2"], r["ny2"],
            r["ignored"])
           for r in q_east_crop(spark, SF).collect()}
    # single-node replay over the same geometry frame
    from paddleocr_spark.pipeline import (det_keep_predicate,
                                          score_keep_predicate,
                                          with_geometry)
    from paddleocr_spark.entry_queries import _spans_exploded
    pdf = (with_geometry(_spans_exploded(spark, SF))
           .withColumn("ignored",
                       ~(det_keep_predicate() & score_keep_predicate()))
           .select("doc_id", "span_idx", "x1", "y1", "x2", "y2",
                   "ignored").toPandas()
           .sort_values(["doc_id", "span_idx"]))
    want = {}
    for doc_id, g in pdf.groupby("doc_id", sort=True):
        boxes = g[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
        ign = g["ignored"].to_numpy()
        sidx = g["span_idx"].to_numpy()
        cx, cy, cw, ch, sc, kept = east_crop_doc(
            int(str(doc_id)[4:]), boxes, ign)
        for pos, nx1, ny1, nx2, ny2 in kept:
            want[(doc_id, int(sidx[pos]))] = (
                cx, cy, cw, ch, sc, nx1, ny1, nx2, ny2, bool(ign[pos]))
    assert got == want and len(got) > 100


def test_random_crop_img_mask_quirks():
    from paddleocr_spark.augments import random_crop_img_mask
    # equal-size input returns before any draw: two different seeds give
    # identical (untouched) results
    import numpy as np
    data = {"image": np.zeros((8, 8, 3), np.uint8),
            "gt": np.ones((8, 8), np.float32)}
    a = random_crop_img_mask(1, data, "gt", {"gt"}, (8, 8))
    b = random_crop_img_mask(2, data, "gt", {"gt"}, (8, 8))
    assert a[0] is None and b[0] is None
    assert np.array_equal(a[3]["gt"], data["gt"])
    # a 3-dim array whose smallest axis is the middle one is returned
    # UNCROPPED (reference fall-through)
    weird = {"image": np.zeros((16, 16, 3), np.uint8),
             "gt": np.ones((16, 16), np.float32),
             "odd": np.zeros((16, 2, 16), np.float32)}
    i, j, forced, out = random_crop_img_mask(
        7, weird, "gt", {"gt", "odd"}, (4, 4))
    assert out["odd"].shape == (16, 2, 16)
    assert out["gt"].shape == (4, 4)
    # all-zero mask never consumes random(): the else-branch draw
    # sequence equals a fresh randint pair
    import random as _r
    z = {"image": np.zeros((16, 16, 3), np.uint8),
         "gt": np.zeros((16, 16), np.float32)}
    i, j, forced, _ = random_crop_img_mask(123, z, "gt", {"gt"}, (4, 4))
    r = _r.Random(123)
    assert not forced and (i, j) == (r.randint(0, 12), r.randint(0, 12))


# ---------------------------------------------------------------------------
# CopyPaste
# ---------------------------------------------------------------------------

def _quad(x1, y1, x2, y2):
    return [[x1, y1], [x2, y1], [x2, y2], [x1, y2]]


def test_copy_paste_all_ignored_ext_pastes_nothing():
    """select_num clamps to >= 1, but the candidate list filters ignored
    ext instances FIRST — an all-ignored ext sample pastes nothing."""
    from paddleocr_spark.augments import copy_paste_doc
    src = np.array([_quad(10, 10, 100, 40)], np.float32)
    ext = np.array([_quad(5, 5, 80, 25), _quad(50, 50, 90, 80)],
                   np.float32)
    polys, texts, ign, pasted = copy_paste_doc(
        3, src, ["a"], [False], 800, 640,
        ext, ["x", "y"], np.array([True, True]))
    assert pasted == [] and len(polys) == 1 and texts == ["a"]


def test_copy_paste_limit_false_places_without_scanning():
    """limit_paste=False draws one randint pair and places regardless of
    overlap with existing polys."""
    import random as _r

    from paddleocr_spark.augments import copy_paste_doc

    # src poly covering most of the canvas: limit_paste=True would
    # struggle; =False must still paste
    src = np.array([_quad(0, 0, 600, 700)], np.float32)
    ext = np.array([_quad(0, 0, 50, 20)], np.float32)
    polys, texts, ign, pasted = copy_paste_doc(
        11, src, ["a"], [False], 800, 640,
        ext, ["x"], np.array([False]), limit_paste=False)
    assert pasted == [0] and len(polys) == 2 and texts == ["a", "x"]


def test_copy_paste_clip_is_inclusive_of_canvas_extent():
    """The final np.clip bounds are [0, w] / [0, h] — one past the last
    pixel index, exactly as the reference writes it."""
    from paddleocr_spark.augments import copy_paste_doc
    src = np.array([_quad(-5, -5, 700, 900)], np.float32)
    polys, *_ = copy_paste_doc(
        1, src, ["a"], [False], 800, 640,
        np.zeros((0, 4, 2), np.float32), [], np.zeros(0, bool))
    assert polys[0].min() == 0.0
    assert polys[0][:, 0].max() == 640.0  # == w, not w - 1
    assert polys[0][:, 1].max() == 800.0


def test_copy_paste_non_quad_poly_trips_reference_assert():
    """get_rotate_crop_image's 4-point assert fires for point_num > 4
    ext polys (crash preserved), making the pad-to-point_num loop
    unreachable through this path — as in the reference."""
    import pytest

    from paddleocr_spark.augments import copy_paste_doc
    src = np.zeros((1, 6, 2), np.float32)
    src[0] = [[0, 0], [50, 0], [50, 0], [50, 20], [0, 20], [0, 20]]
    ext = src.copy() + 100
    with pytest.raises(AssertionError):
        copy_paste_doc(5, src, ["a"], [False], 800, 640,
                       ext, ["x"], np.array([False]))


def test_pil_rotate_expand_size_right_angles_and_diagonal():
    from paddleocr_spark.augments import pil_rotate_expand_size
    assert pil_rotate_expand_size(100, 50, 0) == (100, 50)
    assert pil_rotate_expand_size(100, 50, 180) == (100, 50)
    assert pil_rotate_expand_size(100, 50, 90) == (50, 100)
    assert pil_rotate_expand_size(100, 50, 270) == (50, 100)
    nw, nh = pil_rotate_expand_size(100, 100, 45)
    assert 141 <= nw <= 143 and 141 <= nh <= 143


def test_copy_paste_distributed_matches_single_node(spark):
    """The union-pairing plan (src keyed on own doc, ext on XOR-1
    partner) against a driver-side replay at sf0.001."""
    from paddleocr_spark import geometry as G
    from paddleocr_spark.augments import (EAST_CROP_CANVAS_MARGIN,
                                          copy_paste_doc)
    from paddleocr_spark.entry_queries import _spans_exploded, q_copy_paste
    from paddleocr_spark.pipeline import (det_keep_predicate,
                                          score_keep_predicate,
                                          with_geometry)

    got = {(r["doc_id"], r["pos"]):
           (r["pasted"], r["src_span"], r["text"], r["ignored"],
            r["x1"], r["y1"], r["x2"], r["y2"],
            r["x3"], r["y3"], r["x4"], r["y4"])
           for r in q_copy_paste(spark, SF).collect()}

    pdf = (with_geometry(_spans_exploded(spark, SF))
           .withColumn("ignored",
                       ~(det_keep_predicate() & score_keep_predicate()))
           .select("doc_id", "span_idx", "text", "ignored",
                   "x1", "y1", "x2", "y2").toPandas()
           .sort_values(["doc_id", "span_idx"]))
    groups = {d: g for d, g in pdf.groupby("doc_id", sort=True)}

    def arrays(g):
        xs = g[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
        quads = np.stack([xs[:, [0, 1]], xs[:, [2, 1]], xs[:, [2, 3]],
                          xs[:, [0, 3]]], axis=1).astype(np.float32)
        texts = [None if t is None else str(t) for t in g["text"]]
        return (quads, texts, g["ignored"].to_numpy(),
                g["span_idx"].to_numpy(), xs)

    want = {}
    n_pasted = 0
    for doc_id in sorted(groups):
        did = int(str(doc_id)[4:])
        sq, st, si, sspan, sxs = arrays(groups[doc_id])
        partner = f"doc_{did ^ 1:07d}"
        if partner in groups:
            eq, et, ei, espan, _ = arrays(groups[partner])
        else:
            eq, et, ei, espan = (np.zeros((0, 4, 2), np.float32), [],
                                 np.zeros(0, bool), np.zeros(0, np.int64))
        src_h = int(sxs[:, 3].max()) + EAST_CROP_CANVAS_MARGIN
        polys, texts, ignores, pasted = copy_paste_doc(
            did, sq, st, si, src_h, G.PAGE_WIDTH, eq, et, ei)
        n_src = len(sq)
        n_pasted += len(pasted)
        for pos in range(len(polys)):
            p = polys[pos]
            sp = (int(sspan[pos]) if pos < n_src
                  else int(espan[pasted[pos - n_src]]))
            want[(doc_id, pos)] = (
                pos >= n_src, sp, texts[pos], bool(ignores[pos]),
                p[0, 0], p[0, 1], p[1, 0], p[1, 1],
                p[2, 0], p[2, 1], p[3, 0], p[3, 1])
    assert got == want and len(got) > 50 and n_pasted > 0


# ---------------------------------------------------------------------------
# EASTProcessTrain
# ---------------------------------------------------------------------------

def test_east_validate_flips_and_force_ignores_reversed_polys():
    """A positive-shoelace (reversed) quad is re-ordered (0,3,2,1) and
    its tag FORCED True even when it was a care poly; sub-1-area quads
    drop entirely."""
    from paddleocr_spark.augments import east_validate_polys
    good = [[10, 10], [60, 10], [60, 30], [10, 30]]
    rev = [[10, 50], [10, 80], [70, 80], [70, 50]]   # positive area
    tiny = [[5, 5], [5.5, 5], [5.5, 5.5], [5, 5.5]]  # |area| < 1
    polys = np.array([good, rev, tiny], np.float32)
    out, tags = east_validate_polys(polys, np.array([False, False, False]),
                                    200, 200)
    assert out.shape == (2, 4, 2)
    assert tags.tolist() == [False, True]
    # reversed poly came back in corrected order
    assert out[1].tolist() == np.array(rev, np.float32)[(0, 3, 2, 1),
                                                        :].tolist()


def test_east_process_distributed_matches_single_node(spark):
    from paddleocr_spark import geometry as G
    from paddleocr_spark.augments import (EAST_CROP_CANVAS_MARGIN,
                                          east_process_doc)
    from paddleocr_spark.entry_queries import _spans_exploded, q_east_gt
    from paddleocr_spark.pipeline import (det_keep_predicate,
                                          score_keep_predicate,
                                          with_geometry)

    got = {r["doc_id"]: (r["status"], r["rot_cnt"], r["rd_scale"],
                         r["cx0"], r["n_out"], r["score_px"],
                         r["mask_px"], r["g8"])
           for r in q_east_gt(spark, SF).collect()}
    pdf = (with_geometry(_spans_exploded(spark, SF))
           .withColumn("ignored",
                       ~(det_keep_predicate() & score_keep_predicate()))
           .select("doc_id", "span_idx", "x1", "y1", "x2", "y2",
                   "ignored").toPandas()
           .sort_values(["doc_id", "span_idx"]))
    want = {}
    for doc_id, g in pdf.groupby("doc_id", sort=True):
        xs = g[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
        quads = np.stack([xs[:, [0, 1]], xs[:, [2, 1]], xs[:, [2, 3]],
                          xs[:, [0, 3]]], axis=1).astype(np.float32)
        o = east_process_doc(
            int(str(doc_id)[4:]), quads, g["ignored"].to_numpy(bool),
            int(xs[:, 3].max()) + EAST_CROP_CANVAS_MARGIN, G.PAGE_WIDTH)
        want[str(doc_id)] = (
            o["status"], o["rot_cnt"], o["rd_scale"],
            None if o["crop"] is None else o["crop"][0], o["n_out"],
            o["score_px"], o["mask_px"],
            None if o["geo_sums"] is None else o["geo_sums"][8])
    assert got == want and len(got) > 40


# ---------------------------------------------------------------------------
# SASTProcessTrain
# ---------------------------------------------------------------------------

def test_sast_validate_reversal_arm_is_dead_under_box_convention():
    """check_and_validate_polys gates its 16-POINT reversal on the
    minAreaRect quad's signed area — and min_area_box returns corners
    in the clockwise (negative-shoelace) convention regardless of the
    input poly's order, so the arm never fires here: a reversed 4-point
    poly validates with the box-anchored quad instead of crashing.
    (With real cv2's ccw boxPoints order the arm WOULD fire, and its
    16-index permutation crashes on any 4-point poly — the reference
    runs it only on 16-point corpora.)"""
    from paddleocr_spark.sast_gt import sast_validate_polys
    rev = np.array([[[10, 50], [10, 80], [70, 80], [70, 50]]], np.float32)
    polys, tags, hv = sast_validate_polys(rev, np.array([False]),
                                          200, 200)
    assert polys.shape == (1, 4, 2) and tags.tolist() == [False]


def test_sast_adjust_point_rotates_vertical_quads():
    from paddleocr_spark.sast_gt import adjust_point
    horiz = np.array([[0, 0], [100, 0], [100, 20], [0, 20]], np.float32)
    vert = np.array([[0, 0], [20, 0], [20, 100], [0, 100]], np.float32)
    assert np.array_equal(adjust_point(horiz.copy()), horiz)
    assert np.array_equal(adjust_point(vert.copy()),
                          vert[[1, 2, 3, 0], :])


def test_sast_gt_distributed_matches_single_node(spark):
    from paddleocr_spark import geometry as G
    from paddleocr_spark.augments import EAST_CROP_CANVAS_MARGIN
    from paddleocr_spark.entry_queries import _spans_exploded, q_sast_gt
    from paddleocr_spark.pipeline import (det_keep_predicate,
                                          score_keep_predicate,
                                          with_geometry)
    from paddleocr_spark.sast_gt import sast_process_doc

    got = {r["doc_id"]: (r["status"], r["asp_scale"], r["cx0"],
                         r["rz_scale"], r["sh"], r["sw"], r["n_out"],
                         r["score_px"], r["mask_sum"], r["v8"])
           for r in q_sast_gt(spark, SF).collect()}
    pdf = (with_geometry(_spans_exploded(spark, SF))
           .withColumn("ignored",
                       ~(det_keep_predicate() & score_keep_predicate()))
           .select("doc_id", "span_idx", "x1", "y1", "x2", "y2",
                   "ignored").toPandas()
           .sort_values(["doc_id", "span_idx"]))
    want = {}
    n_ok = 0
    for doc_id, g in pdf.groupby("doc_id", sort=True):
        xs = g[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
        xs[:, 1] *= 4
        xs[:, 3] *= 4
        quads = np.stack([xs[:, [0, 1]], xs[:, [2, 1]], xs[:, [2, 3]],
                          xs[:, [0, 3]]], axis=1).astype(np.float32)
        o = sast_process_doc(
            int(str(doc_id)[4:]), quads, g["ignored"].to_numpy(bool),
            int(xs[:, 3].max()) + EAST_CROP_CANVAS_MARGIN, G.PAGE_WIDTH)
        n_ok += o["status"] == "ok"
        want[str(doc_id)] = (
            o["status"], o["asp_scale"],
            None if o["crop"] is None else o["crop"][0],
            o["rz_scale"], o["sh"], o["sw"], o["n_out"], o["score_px"],
            o["mask_sum"],
            None if o["tvo_sums"] is None else o["tvo_sums"][8])
    assert got == want and len(got) > 40 and n_ok > 0


# ---------------------------------------------------------------------------
# FCENetTargets
# ---------------------------------------------------------------------------

def test_fce_is_true_quirk_numpy_bools_are_silently_care():
    """generate_targets splits on ``tag is True`` — an np.bool_ True
    fails the identity test, so numpy-typed tags are treated as care
    polys (verbatim reference behavior; callers pass Python bools)."""
    from paddleocr_spark.fce_gt import fce_targets_doc
    q = np.array([[[20, 30], [200, 30], [200, 80], [20, 80]]], np.float32)
    py = fce_targets_doc(q.copy(), [True], 400, 400)
    npb = fce_targets_doc(q.copy(), list(np.array([True])), 400, 400)
    # the poly's proportion (max(181,51)/400 ~ 0.45) lands in level 1
    # python True -> ignored: zeroes the effective mask, no text px
    assert py[1][0] == 0 and py[1][2] < (400 // 16) ** 2
    # np.bool_ True -> silently care: text px appear, mask untouched
    assert npb[1][0] > 0 and npb[1][2] == (400 // 16) ** 2


def test_fce_gt_distributed_matches_single_node(spark):
    from paddleocr_spark import geometry as G
    from paddleocr_spark.augments import EAST_CROP_CANVAS_MARGIN
    from paddleocr_spark.entry_queries import _spans_exploded, q_fce_gt
    from paddleocr_spark.fce_gt import fce_targets_doc
    from paddleocr_spark.pipeline import (det_keep_predicate,
                                          score_keep_predicate,
                                          with_geometry)

    got = {(r["doc_id"], r["level"]):
           (r["text_px"], r["center_px"], r["eff_px"], r["r5"], r["i5"])
           for r in q_fce_gt(spark, SF).collect()}
    pdf = (with_geometry(_spans_exploded(spark, SF))
           .withColumn("ignored",
                       ~(det_keep_predicate() & score_keep_predicate()))
           .select("doc_id", "span_idx", "x1", "y1", "x2", "y2",
                   "ignored").toPandas()
           .sort_values(["doc_id", "span_idx"]))
    want = {}
    text_seen = 0
    for doc_id, g in pdf.groupby("doc_id", sort=True):
        xs = g[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
        xs[:, 1] *= 2
        xs[:, 3] *= 2
        quads = np.stack([xs[:, [0, 1]], xs[:, [2, 1]], xs[:, [2, 3]],
                          xs[:, [0, 3]]], axis=1).astype(np.float32)
        tags = [bool(v) for v in g["ignored"]]
        out = fce_targets_doc(
            quads, tags, int(xs[:, 3].max()) + EAST_CROP_CANVAS_MARGIN,
            G.PAGE_WIDTH)
        for lv, (t_px, c_px, e_px, reals, imags) in enumerate(out):
            want[(str(doc_id), lv)] = (t_px, c_px, e_px,
                                       reals[5], imags[5])
            text_seen += t_px > 0
    assert got == want and len(got) > 120 and text_seen > 0
