"""Pixel tensor-op tests (P1-P3, P5-P6, C1-C2): analytic ground truths
(axis-aligned warps equal plain crops; exact homography residuals),
quirk pins, and an exec-the-reference differential for the C1 wrapper."""

from __future__ import annotations

import os
import textwrap

import numpy as np
import pytest

from paddleocr_spark import pixelops as P
from paddleocr_spark.imagecodecs import encode_png

RNG = np.random.default_rng(17)
IMG = RNG.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)


def test_homography_maps_the_four_points_exactly():
    src = np.float32([[1, 2], [10, 1], [11, 9], [0, 8]])
    dst = np.float32([[0, 0], [8, 0], [8, 6], [0, 6]])
    m = P.get_perspective_transform(src, dst)
    for s, d in zip(src, dst):
        v = m @ np.array([s[0], s[1], 1.0])
        assert np.allclose(v[:2] / v[2], d, atol=1e-9)


def test_axis_aligned_quad_warp_equals_plain_crop():
    """Integer axis-aligned quad ⇒ translation homography ⇒ every sample
    lands on a source pixel ⇒ warp must equal numpy slicing exactly."""
    pts = np.float32([[3, 4], [13, 4], [13, 11], [3, 11]])
    crop = P.get_rotate_crop_image(IMG, pts)
    assert np.array_equal(crop, IMG[4:11, 3:13])


def test_tall_crop_rot90_quirk():
    pts = np.float32([[3, 2], [7, 2], [7, 14], [3, 14]])   # 4×12 ⇒ ≥1.5
    crop = P.get_rotate_crop_image(IMG, pts)
    assert np.array_equal(crop, np.rot90(IMG[2:14, 3:7]))


def test_degenerate_quad_yields_empty_crop():
    pts = np.float32([[5, 5], [5, 5], [5, 5], [5, 5]])
    crop = P.get_rotate_crop_image(IMG, pts)
    assert crop.size == 0


def test_resize_center_aligned_hand_case():
    # 1-D [0, 100] → 4 px: src coords (i+.5)/2−.5 = −.25,.25,.75,1.25;
    # clamped bilinear ⇒ 0, 25, 75, 100
    r = P.resize_bilinear(np.array([[0, 100]], dtype=np.uint8)[:, :, None],
                          1, 4)
    assert r.ravel().tolist() == [0, 25, 75, 100]
    # constants stay constant; identity resize is the identity
    c = np.full((5, 7, 3), 123, dtype=np.uint8)
    assert np.array_equal(P.resize_bilinear(c, 11, 13),
                          np.full((11, 13, 3), 123, np.uint8))
    assert np.array_equal(P.resize_bilinear(IMG, 20, 24), IMG)


def test_min_area_box_axis_aligned_and_rotated():
    box = P.min_area_box(np.array([[0, 0], [4, 0], [4, 3], [0, 3], [2, 1]]))
    assert set(map(tuple, box.tolist())) == {(0, 0), (4, 0), (4, 3), (0, 3)}
    sq = np.array([[5, 0], [10, 5], [5, 10], [0, 5]])      # 45° square
    b = P.min_area_box(sq)
    area = 0.5 * abs(sum(
        b[i][0] * b[(i + 1) % 4][1] - b[(i + 1) % 4][0] * b[i][1]
        for i in range(4)))
    assert abs(area - 50) < 1e-6


def test_minarea_rect_crop_axis_aligned_equals_slice():
    crop = P.get_minarea_rect_crop(IMG, [[3, 4], [13, 4], [13, 11], [3, 11]])
    assert np.array_equal(crop, IMG[4:11, 3:13])


def test_normalize_pad_chw_decode_chain():
    n = P.normalize_image(IMG)
    assert n.dtype == np.float32
    # reference order: (img*scale - mean)/std, hwc broadcast
    expect = ((IMG.astype("float32") * np.float32(1 / 255.0)
               - np.array(P.IMAGENET_MEAN).reshape(1, 1, 3).astype("float32"))
              / np.array(P.IMAGENET_STD).reshape(1, 1, 3).astype("float32"))
    assert np.array_equal(n, expect)
    ch = P.to_chw(n)
    assert ch.shape == (3, 20, 24) and np.array_equal(ch[1], n[..., 1])
    padded = P.pad_image(IMG)
    assert padded.shape == (32, 32, 3)
    assert np.array_equal(padded[:20, :24], IMG)
    assert padded[20:].sum() == 0 and padded[:, 24:].sum() == 0
    with pytest.raises(ValueError):
        P.pad_image(IMG, size=(10, 10))
    buf = encode_png(IMG)
    assert np.array_equal(P.decode_image_op(buf, "RGB"), IMG)
    assert np.array_equal(P.imread_color(buf), IMG[..., ::-1])
    assert P.decode_image_op(buf, "RGB", channel_first=True).shape \
        == (3, 20, 24)


REF = "/root/reference/tools/infer/utility.py"


@pytest.mark.skipif(not os.path.exists(REF), reason="no reference checkout")
def test_rotate_crop_matches_executed_reference():
    """Exec the REFERENCE get_rotate_crop_image with a cv2 shim backed by
    our kernels: the reference's own int-truncated size arithmetic,
    pts_std construction, and rot90 condition run for real; any drift in
    our wrapper's transcription of that logic diverges here."""
    src = open(REF).read()
    start = src.index("def get_rotate_crop_image")
    end = src.index("def get_minarea_rect_crop")
    body = textwrap.dedent(src[start:end])

    class Cv2Shim:
        BORDER_REPLICATE = object()
        INTER_CUBIC = object()

        @staticmethod
        def getPerspectiveTransform(a, b):
            return P.get_perspective_transform(a, b)

        @staticmethod
        def warpPerspective(img, m, size, borderMode=None, flags=None):
            return P.warp_perspective(img, m, size[0], size[1])

    ns = {"np": np, "cv2": Cv2Shim}
    exec(body, ns)
    ref_fn = ns["get_rotate_crop_image"]
    rng = np.random.default_rng(5)
    for _ in range(25):
        h, w = int(rng.integers(10, 30)), int(rng.integers(10, 30))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        cx, cy = w / 2, h / 2
        hw, hh = int(rng.integers(2, w // 2)), int(rng.integers(2, h // 2))
        th = rng.uniform(0, np.pi)
        ct, st = np.cos(th), np.sin(th)
        quad = np.float32([[cx + bx * ct - by * st, cy + bx * st + by * ct]
                           for bx, by in [(-hw, -hh), (hw, -hh),
                                          (hw, hh), (-hw, hh)]])
        assert np.array_equal(P.get_rotate_crop_image(img, quad.copy()),
                              ref_fn(img, quad.copy()))


def _naive_resize_bilinear(img: np.ndarray, out_h: int, out_w: int):
    """Scalar per-pixel cv2.resize INTER_LINEAR semantics — the slow
    ground truth the vectorized 1-sparse-matmul path must match bit-for-
    bit (same float64 lerps, half-up uint8 rounding)."""
    h, w = img.shape[:2]
    squeeze = img.ndim == 2
    p = img.astype(np.float64)
    if squeeze:
        p = p[:, :, None]
    c = p.shape[2]
    out = np.empty((out_h, out_w, c))
    for oy in range(out_h):
        fy = (oy + 0.5) * (h / out_h) - 0.5
        y0 = int(np.floor(fy))
        ty = fy - y0
        y0c, y1c = min(max(y0, 0), h - 1), min(max(y0 + 1, 0), h - 1)
        for ox in range(out_w):
            fx = (ox + 0.5) * (w / out_w) - 0.5
            x0 = int(np.floor(fx))
            tx = fx - x0
            x0c, x1c = min(max(x0, 0), w - 1), min(max(x0 + 1, 0), w - 1)
            for ch in range(c):
                r0 = p[y0c, x0c, ch] * (1 - ty) + p[y1c, x0c, ch] * ty
                r1 = p[y0c, x1c, ch] * (1 - ty) + p[y1c, x1c, ch] * ty
                out[oy, ox, ch] = r0 * (1 - tx) + r1 * tx
    if squeeze:
        out = out[..., 0]
    if img.dtype == np.uint8:
        return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return out.astype(img.dtype)


def test_resize_bilinear_matches_naive_scalar_bit_for_bit():
    rng = np.random.default_rng(23)
    cases = [((7, 9, 3), (31, 17)), ((12, 11, 3), (5, 8)),
             ((9, 13), (40, 21)), ((16, 8, 3), (16, 8)),
             # wide-source shapes exercise the gather path (src_w > 256)
             ((6, 300, 3), (9, 200)), ((5, 1000), (8, 512))]
    for shape, (oh, ow) in cases:
        u8 = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got, want = P.resize_bilinear(u8, oh, ow), _naive_resize_bilinear(
            u8, oh, ow)
        assert got.dtype == want.dtype and got.shape == want.shape
        assert np.array_equal(got, want), (shape, (oh, ow))
    f32 = rng.random((11, 7, 3), dtype=np.float32)
    got, want = P.resize_bilinear(f32, 19, 23), _naive_resize_bilinear(
        f32, 19, 23)
    assert got.dtype == np.float32 and np.array_equal(got, want)


def test_normalize_image_matches_elementwise_formula_bit_for_bit():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(14, 9, 3), dtype=np.uint8)
    got = P.normalize_image(img, order="hwc")
    scale = np.float32(1.0 / 255.0)
    mean = np.array(P.IMAGENET_MEAN, dtype=np.float32)
    std = np.array(P.IMAGENET_STD, dtype=np.float32)
    want = np.empty(img.shape, dtype=np.float32)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            for ch in range(3):
                v = np.float32(img[y, x, ch]) * scale
                want[y, x, ch] = (v - mean[ch]) / std[ch]
    assert got.dtype == np.float32 and np.array_equal(got, want)


def test_resize_hist_matches_resize_bilinear():
    """resize_hist_u8 must equal np.bincount over the actual
    resize_bilinear output, per channel, bit-for-bit — the histogram IS
    the resized plane's value distribution, not an approximation — for
    odd sizes, degenerate 1×1, upscale and downscale, and across block
    boundaries (block smaller / larger than out_h)."""
    from paddleocr_spark.pixelops import resize_bilinear, resize_hist_u8

    rng = np.random.default_rng(31)
    cases = [((1, 1), (800, 608)), ((3, 17), (800, 608)),
             ((16, 9), (800, 608)), ((40, 33), (800, 608)),
             ((64, 64), (31, 47)), ((200, 150), (37, 53))]
    for (h, w), (oh, ow) in cases:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        ref = resize_bilinear(img, oh, ow)
        for block in (5, 64, 4096):
            hist = resize_hist_u8(img, oh, ow, block=block)
            for c in range(3):
                assert np.array_equal(
                    hist[c],
                    np.bincount(ref[:, :, c].ravel(), minlength=256)), (
                        (h, w), (oh, ow), block, c)


def test_normalize_lut_monotone_and_exact():
    """The D6 normalize LUT is built BY normalize_image (same scalar
    roundings) and is monotone nondecreasing per channel — the premise
    of the histogram min/max shortcut in layout_preprocess_for_ref."""
    from paddleocr_spark.pixelops import _normalize_lut, normalize_image

    lut = _normalize_lut()
    ramp = np.broadcast_to(np.arange(256, dtype=np.uint8)[:, None, None],
                           (256, 1, 3)).copy()
    full = normalize_image(ramp, order="hwc")
    for c in range(3):
        assert lut[c].dtype == np.float32
        assert np.array_equal(lut[c], full[:, 0, c])
        assert np.all(np.diff(lut[c]) >= 0), c


def test_layout_preprocess_stats_match_naive_chain():
    """layout_preprocess_for_ref's histogram-derived stat rows vs a
    naive full-tensor recomputation (resize → normalize → to_chw →
    positional reductions): vmin/vmax must match EXACTLY pre-rounding
    (monotone LUT); the histogram-dot mean must agree with the
    positional float64 pairwise mean to 1e-9 before the shared 4dp
    rounding (they differ only in float64 summation order)."""
    from paddleocr_spark.imagecodecs import render_ref_image
    from paddleocr_spark.pixelops import (decode_image_op,
                                          layout_preprocess_for_ref,
                                          normalize_image, resize_op,
                                          to_chw)

    for ref in ("media://img/00003", "media://img/00042"):
        _, buf = render_ref_image(ref)
        img = decode_image_op(buf, "RGB")
        resized, _ = resize_op(img, (800, 608))
        chw = to_chw(normalize_image(resized, order="hwc"))
        got = layout_preprocess_for_ref(ref)
        for c in range(3):
            r = got[c]
            assert r[:4] == (ref, c, 800, 608)
            naive_mean = float(chw[c].mean(dtype=np.float64))
            assert abs(r[4] - round(naive_mean, 4)) <= 1e-9, (ref, c)
            assert r[5] == round(float(chw[c].min()), 4), (ref, c)
            assert r[6] == round(float(chw[c].max()), 4), (ref, c)


def test_ssim_separable_conv_matches_naive_2d():
    """_conv_sep (two 1-D gaussian passes) must equal the naive zero-
    padded 2-D convolution with the outer-product window up to float64
    roundoff, and ssim/psnr must satisfy their identities."""
    from paddleocr_spark.pixelops import (_conv_sep, _ssim_window,
                                          psnr_pair, ssim_pair)

    g = _ssim_window()
    assert g.shape == (11,) and abs(g.sum() - 1.0) < 1e-12
    w2 = np.outer(g, g)
    rng = np.random.default_rng(11)
    img = rng.random((20, 33))
    got = _conv_sep(img, g)
    pad = np.pad(img, 5)
    want = np.empty_like(img)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            want[y, x] = (pad[y:y + 11, x:x + 11] * w2).sum()
    assert np.allclose(got, want, atol=1e-12)
    assert ssim_pair(img, img) == 1.0
    assert psnr_pair(img, img) == float("inf")
    other = rng.random((20, 33))
    s = ssim_pair(img, other)
    assert -1.0 <= s < 1.0
    mse = float(((img * 255 - other * 255) ** 2).mean())
    assert psnr_pair(img, other) == pytest.approx(
        20 * np.log10(255 / np.sqrt(mse)))
