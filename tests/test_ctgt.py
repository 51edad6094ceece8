"""Exec-reference differentials + pins for the CT target-generation
transcription (paddleocr_spark/ctgt.py).

The differential executes ``ppocr/data/imaug/ct_process.py`` VERBATIM
(sys.modules import stubs only) over axis-aligned rect polys under
seeded global RNGs, comparing every output map bit-for-bit with
``ct_targets_doc``.  Shim-circular spots: the rect fill / Clipper inset
/ shoelace-area axioms (the same ones the shrink/border differentials
pinned), the 3x3 erosion, the bilinear resize, and the NEAREST rotation
warp — the scale walk, shrink-offset formula, all gates and crop-window
draws, and the centripetal jaccard-argmin shift run from the reference
source for real.
"""
from __future__ import annotations

import json
import random
import sys
import types

import numpy as np

from paddleocr_spark.ctgt import (
    ct_gt_rows_for_doc, ct_label_encode, ct_targets_doc, erode3_u8,
    scale_aligned)

REF = "/root/reference/ppocr/data/imaug"


# ---------------------------------------------------------------------------
# reference loader
# ---------------------------------------------------------------------------

def _cv2_stub():
    from paddleocr_spark.cvaug import (
        INTER_LINEAR, INTER_NEAREST, get_rotation_matrix_2d, warp_affine)
    from paddleocr_spark.kernels import fill_rect
    from paddleocr_spark.pixelops import resize_bilinear

    cv2 = types.ModuleType("cv2")
    cv2.INTER_NEAREST = INTER_NEAREST
    cv2.INTER_LINEAR = INTER_LINEAR
    cv2.BORDER_CONSTANT = 0

    def _resize(img, dsize, interpolation=INTER_LINEAR):
        assert interpolation == INTER_LINEAR
        return resize_bilinear(img, dsize[1], dsize[0])

    def _draw_contours(img, contours, idx, val, thickness):
        assert idx == -1 and thickness == -1
        for c in contours:
            p = np.asarray(c, dtype=np.int64).reshape(-1, 2)
            fill_rect(img, int(p[:, 0].min()), int(p[:, 1].min()),
                      int(p[:, 0].max()), int(p[:, 1].max()), val)

    def _erode(img, kernel, iterations=1):
        assert kernel.shape == (3, 3) and (kernel == 1).all()
        out = img
        for _ in range(iterations):
            out = erode3_u8(out)
        return out

    def _warp_affine(img, m, dsize, flags=INTER_LINEAR):
        return warp_affine(img, m, dsize, flags, border_replicate=False)

    def _copy_make_border(img, top, bottom, left, right,
                          borderType=0, value=0):
        assert borderType == cv2.BORDER_CONSTANT
        pads = ((top, bottom), (left, right))
        if img.ndim == 3:
            pads = pads + ((0, 0),)
        return np.pad(img, pads, mode="constant")

    cv2.resize = _resize
    cv2.drawContours = _draw_contours
    cv2.erode = _erode
    cv2.getRotationMatrix2D = get_rotation_matrix_2d
    cv2.warpAffine = _warp_affine
    cv2.copyMakeBorder = _copy_make_border
    return cv2


class _Offset:
    """pyclipper.PyclipperOffset over axis-aligned rects (the axiom the
    shrink-map differential pinned): Execute(-d) -> inset rect or []."""

    def AddPath(self, path, jt, et):
        p = np.asarray(path, dtype=np.float64)
        self.x0, self.y0 = p[:, 0].min(), p[:, 1].min()
        self.x1, self.y1 = p[:, 0].max(), p[:, 1].max()

    def Execute(self, delta):
        from paddleocr_spark.kernels import shrink_rect
        r = shrink_rect(self.x0, self.y0, self.x1, self.y1, -delta)
        if r is None:
            return []
        x0, y0, x1, y1 = r
        return [[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]]


class _Poly:
    """Polygon3's Polygon(...).area(): shoelace."""

    def __init__(self, pts):
        p = np.asarray(pts, dtype=np.float64)
        x, y = p[:, 0], p[:, 1]
        self._area = abs(float(
            np.sum(x * np.roll(y, 1) - y * np.roll(x, 1))) / 2.0)

    def area(self):
        return self._area


class _FakePIL:
    class Image:
        @staticmethod
        def fromarray(a):
            return _FakeImg(a)


class _FakeImg:
    def __init__(self, a):
        self._a = a

    def convert(self, mode):
        assert mode == "RGB"
        return self._a


def _load_ref_ct():
    """Execute ct_process.py verbatim; returns its namespace."""
    cv2 = _cv2_stub()
    paddle = types.ModuleType("paddle")
    pv = types.ModuleType("paddle.vision")
    pvt = types.ModuleType("paddle.vision.transforms")
    pv.transforms = pvt
    paddle.vision = pv
    pyc = types.ModuleType("pyclipper")
    pyc.PyclipperOffset = _Offset
    pyc.JT_ROUND = 0
    pyc.ET_CLOSEDPOLYGON = 0
    polygon = types.ModuleType("Polygon")
    polygon.Polygon = _Poly
    scipy = types.ModuleType("scipy")
    scipy_io = types.ModuleType("scipy.io")
    scipy.io = scipy_io
    ppocr = types.ModuleType("ppocr")
    pu = types.ModuleType("ppocr.utils")
    put = types.ModuleType("ppocr.utils.utility")
    put.check_install = lambda *a, **k: None
    pu.utility = put
    ppocr.utils = pu
    pil = types.ModuleType("PIL")
    pil.Image = _FakePIL.Image
    pil_image = types.ModuleType("PIL.Image")
    pil_image.fromarray = _FakePIL.Image.fromarray
    pil.Image = pil_image

    # shrink() does `import Polygon as plg` at CALL time — this stub
    # must outlive the loader (no real dependency uses the name)
    sys.modules.setdefault("Polygon", polygon)
    mods = {"cv2": cv2, "paddle": paddle, "paddle.vision": pv,
            "paddle.vision.transforms": pvt, "pyclipper": pyc,
            "scipy": scipy, "scipy.io": scipy_io,
            "ppocr": ppocr, "ppocr.utils": pu,
            "ppocr.utils.utility": put, "PIL": pil,
            "PIL.Image": pil_image}
    saved = {m: sys.modules.get(m) for m in mods}
    sys.modules.update(mods)
    ns: dict = {}
    try:
        exec(open(f"{REF}/ct_process.py").read(), ns)
    finally:
        for m, v in saved.items():
            if v is None:
                sys.modules.pop(m, None)
            else:
                sys.modules[m] = v
    return ns


def _mk_inputs(rng, h, w, n):
    """Deterministic image + flat rect polys + words (some ignored)."""
    img = ((np.arange(h)[:, None] * 13 + np.arange(w)[None, :] * 7
            + h * w) % 256).astype(np.uint8)
    img = np.stack([img, (img * 3 + 29) % 256, (img * 5 + 71) % 256],
                   axis=-1).astype(np.uint8)
    polys, words = [], []
    for k in range(n):
        x0 = rng.randint(0, max(w - 8, 1))
        y0 = rng.randint(0, max(h - 8, 1))
        bw = rng.choice([4, 9, 20, 45, 80])
        bh = rng.choice([4, 8, 14, 30])
        x1, y1 = min(x0 + bw, w - 1), min(y0 + bh, h - 1)
        polys.append(np.array(
            [x0, y0, x1, y0, x1, y1, x0, y1], dtype=np.float64))
        words.append("###" if rng.random() < 0.3
                     else ("???" if rng.random() < 0.1 else f"t{k}"))
    return img, polys, words


def _run_ref_chain(ns, img, polys, words, seed, short_size=64,
                   target_size=(64, 64)):
    random.seed(seed)
    np.random.seed(seed)
    data = {"image": img.copy(),
            "polys": [p.copy() for p in polys],
            "texts": list(words)}
    data = ns["RandomScale"](short_size=short_size)(data)
    data = ns["MakeShrink"]()(data)
    data = ns["GroupRandomHorizontalFlip"]()(data)
    data = ns["GroupRandomRotate"]()(data)
    data = ns["GroupRandomCropPadding"](target_size=target_size)(data)
    data = ns["MakeCentripetalShift"]()(data)
    return data


def test_ct_chain_matches_executed_reference():
    ns = _load_ref_ct()
    rng = random.Random(17)
    for trial in range(40):
        h = rng.choice([40, 70, 90, 128])
        w = rng.choice([60, 100, 150, 220])
        n = rng.randint(0, 5)
        img, polys, words = _mk_inputs(rng, h, w, n)
        seed = 1000 + trial
        want = _run_ref_chain(ns, img, polys, words, seed)
        got = ct_targets_doc(img, polys, words, seed)
        assert np.array_equal(got["image"], want["image"]), trial
        for k in ("gt_kernel", "training_mask", "gt_instance",
                  "gt_kernel_instance", "training_mask_distance",
                  "gt_distance"):
            assert got[k].dtype == want[k].dtype, (trial, k)
            assert np.array_equal(got[k], want[k]), (trial, k)


def test_ct_chain_bigger_canvas_and_target():
    """Exercise the crop's text-region arm + no-crop equality path at
    the reference's own 640-ish proportions scaled down."""
    ns = _load_ref_ct()
    rng = random.Random(23)
    img, polys, words = _mk_inputs(rng, 96, 300, 6)
    for seed in range(8):
        want = _run_ref_chain(ns, img, polys, words, seed,
                              short_size=96, target_size=(96, 96))
        got = ct_targets_doc(img, polys, words, seed, short_size=96,
                             target_size=(96, 96))
        for k in ("gt_instance", "gt_distance", "training_mask"):
            assert np.array_equal(got[k], want[k]), (seed, k)
        assert np.array_equal(got["image"], want["image"]), seed


def test_scale_aligned_matches_executed_reference():
    ns = _load_ref_ct()
    op = ns["RandomScale"](short_size=64)
    img = _mk_inputs(random.Random(5), 50, 90, 0)[0]
    for scale in (0.3, 0.77, 1.0, 1.9):
        want_img, want_fh, want_fw = op.scale_aligned(img.copy(), scale)
        got_img, got_fh, got_fw = scale_aligned(img, scale)
        assert np.array_equal(got_img, want_img)
        assert got_fh == want_fh and got_fw == want_fw


def test_ct_label_encode_matches_executed_reference():
    """CTLabelEncode (label_ops.py:1787-1810) executed as a slice."""
    import os
    import textwrap
    src = open("/root/reference/ppocr/data/imaug/label_ops.py").read()
    start = src.index("class CTLabelEncode")
    stop = src.index("class CANLabelEncode")
    ns: dict = {"json": json}
    exec("import numpy as np\n" + textwrap.dedent(src[start:stop]), ns)
    op = ns["CTLabelEncode"]()
    label = json.dumps([
        {"points": [1.0, 2.0, 9.0, 2.0, 9.0, 6.0, 1.0, 6.0],
         "transcription": "abc"},
        {"points": [0.0, 0.0, 4.0, 0.0, 4.0, 3.0, 0.0, 3.0],
         "transcription": "###"}])
    want = op({"label": label})
    got = ct_label_encode(label)
    assert got is not None
    assert [p.tolist() for p in got[0]] == [
        p.tolist() for p in want["polys"]]
    assert got[1] == want["texts"]
    assert op({"label": "[]"}) is None
    assert ct_label_encode("[]") is None
    del os


def test_makeshrink_flat_poly_contract():
    """The (N,2) arrays CTLabelEncode emits CRASH MakeShrink's scale
    broadcast (ct_process.py:116-118) — the dataset must store points
    flat.  Pin both sides of the contract."""
    import pytest
    ns = _load_ref_ct()
    op = ns["MakeShrink"]()
    sq = {"image": np.zeros((32, 32, 3), np.uint8),
          "polys": [np.array([[1, 2], [9, 2], [9, 6], [1, 6]],
                             dtype=np.float64)],
          "texts": ["x"], "scale_factor": (1.0, 1.0)}
    with pytest.raises(ValueError):
        op(sq)
    flat = {"image": np.zeros((32, 32, 3), np.uint8),
            "polys": [np.array([1, 2, 9, 2, 9, 6, 1, 6],
                               dtype=np.float64)],
            "texts": ["x"], "scale_factor": (1.0, 1.0)}
    out = op(flat)
    assert int(out["image"][1].max()) == 1        # gt_instance painted


def test_erode3_matches_neighbourhood_min():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 5, (17, 23)).astype(np.uint8)
    out = erode3_u8(img)
    for y in range(17):
        for x in range(23):
            ys = slice(max(y - 1, 0), min(y + 2, 17))
            xs = slice(max(x - 1, 0), min(x + 2, 23))
            assert out[y, x] == img[ys, xs].min()


def test_ct_gt_rows_deterministic_and_shaped():
    rects = np.array([[100.0, 10.0, 260.0, 40.0],
                      [300.0, 20.0, 420.0, 55.0]])
    r1 = ct_gt_rows_for_doc("d-1", rects, [False, True], 80, 500)
    r2 = ct_gt_rows_for_doc("d-1", rects, [False, True], 80, 500)
    assert r1 == r2
    assert len(r1) == 10 and r1[0] == "d-1"
    empty = ct_gt_rows_for_doc("d-2", np.zeros((0, 4)), [], 80, 500)
    assert empty[1:] == (0, 0, 0, 0, 0, 0, 0.0, 0.0, 0)
