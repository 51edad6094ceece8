"""Exec-reference differentials + pins for the RandAugment
transcription (paddleocr_spark/randaug.py).

Executes ``ppocr/data/imaug/randaugment.py`` VERBATIM with a PIL stub
routed to our numpy re-derivations of the fourteen raster ops — the
level_map magnitudes, the per-layer np.random.choice walk, the stdlib
sign draws, the prob gate, and the numpy<->PIL wrapper fitting all run
from reference source; the raster ops are shim-circular (documented in
the module header).
"""
from __future__ import annotations

import random
import sys
import types

import numpy as np

from paddleocr_spark.randaug import (
    RANDAUG_OPS, autocontrast, enhance_brightness, enhance_color,
    enhance_contrast, enhance_sharpness, equalize, invert,
    pil_affine_transform, pil_rotate_gray_fill, posterize,
    rand_augment_image, randaug_for_ref, solarize)

REF = "/root/reference/ppocr/data/imaug"

_AFFINE = 0
_BICUBIC = 3
_RESAMPLE = {0: "nearest", _BICUBIC: "bicubic"}


class _Img:
    """PIL.Image.Image stand-in over a uint8 HWC numpy array."""

    def __init__(self, arr, mode="RGB"):
        self._a = np.ascontiguousarray(np.asarray(arr, np.uint8))
        self.mode = mode

    def __array__(self, dtype=None, copy=None):
        a = self._a
        if dtype is not None:
            a = a.astype(dtype)
        return a

    @property
    def size(self):
        return (self._a.shape[1], self._a.shape[0])

    def convert(self, mode):
        if mode == self.mode:
            return _Img(self._a, mode)
        if mode == "RGBA":
            assert self.mode == "RGB"
            alpha = np.full(self._a.shape[:2] + (1,), 255, np.uint8)
            return _Img(np.concatenate([self._a, alpha], axis=-1),
                        "RGBA")
        assert mode == "RGB" and self.mode == "RGBA"
        return _Img(self._a[..., :3], "RGB")

    def transform(self, size, method, coeffs, resample=0,
                  fillcolor=None):
        assert method == _AFFINE and size == self.size
        fill = fillcolor if fillcolor is not None \
            else (0,) * self._a.shape[2]
        return _Img(pil_affine_transform(
            self._a, coeffs, _RESAMPLE[resample], fill), self.mode)

    def rotate(self, angle):
        """NEAREST, expand=False, zero fill (transparent for RGBA)."""
        import math as _m
        h, w = self._a.shape[:2]
        rot = _m.radians(angle)
        ca, sa = _m.cos(rot), _m.sin(rot)
        cx, cy = w / 2.0, h / 2.0
        coeffs = (ca, sa, cx - cx * ca - cy * sa,
                  -sa, ca, cy + cx * sa - cy * ca)
        return _Img(pil_affine_transform(
            self._a, coeffs, "nearest", (0,) * self._a.shape[2]),
            self.mode)


def _composite(im1, im2, mask):
    """Image.composite with the binary alpha NEAREST rotation leaves."""
    alpha = mask._a[..., 3:4]
    assert set(np.unique(alpha)) <= {0, 255}
    return _Img(np.where(alpha == 255, im1._a, im2._a), im1.mode)


def _pil_stub():
    image_mod = types.ModuleType("PIL.Image")
    image_mod.Image = _Img
    image_mod.AFFINE = _AFFINE
    image_mod.BICUBIC = _BICUBIC
    image_mod.fromarray = lambda a: _Img(a, "RGB")
    image_mod.new = lambda mode, size, color: _Img(
        np.full((size[1], size[0], len(color)), 0, np.uint8)
        + np.array(color, np.uint8), mode)
    image_mod.composite = _composite

    enh = types.ModuleType("PIL.ImageEnhance")

    def _enh_cls(fn):
        class _E:
            def __init__(self, img):
                self._img = img

            def enhance(self, factor):
                return _Img(fn(self._img._a, factor), self._img.mode)
        return _E

    enh.Color = _enh_cls(enhance_color)
    enh.Contrast = _enh_cls(enhance_contrast)
    enh.Brightness = _enh_cls(enhance_brightness)
    enh.Sharpness = _enh_cls(enhance_sharpness)

    ops = types.ModuleType("PIL.ImageOps")
    ops.posterize = lambda img, bits: _Img(posterize(img._a, bits),
                                           img.mode)
    ops.solarize = lambda img, thr: _Img(solarize(img._a, thr),
                                         img.mode)
    ops.autocontrast = lambda img: _Img(autocontrast(img._a), img.mode)
    ops.equalize = lambda img: _Img(equalize(img._a), img.mode)
    ops.invert = lambda img: _Img(invert(img._a), img.mode)

    pil = types.ModuleType("PIL")
    pil.Image = image_mod
    pil.ImageEnhance = enh
    pil.ImageOps = ops
    return {"PIL": pil, "PIL.Image": image_mod,
            "PIL.ImageEnhance": enh, "PIL.ImageOps": ops}


def _load_ref_randaug():
    mods = _pil_stub()
    six = types.ModuleType("six")
    six.PY2 = False
    mods["six"] = six
    saved = {m: sys.modules.get(m) for m in mods}
    sys.modules.update(mods)
    ns: dict = {}
    try:
        exec(open(f"{REF}/randaugment.py").read(), ns)
    finally:
        for m, v in saved.items():
            if v is None:
                sys.modules.pop(m, None)
            else:
                sys.modules[m] = v
    return ns


def _img(h, w, tag=0):
    rng = np.random.RandomState(11000 + h * 131 + w * 17 + tag)
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_rand_augment_matches_executed_reference():
    ns = _load_ref_randaug()
    for h, w in [(32, 100), (48, 64), (26, 200)]:
        img = _img(h, w)
        for seed in range(60):        # 2 ops/seed -> all 14 ops live
            random.seed(seed)
            np.random.seed(seed)
            want = ns["RandAugment"]()({"image": img.copy()})["image"]
            got = rand_augment_image(img, seed)
            assert got.dtype == np.uint8
            assert np.array_equal(got, np.asarray(want)), (h, w, seed)


def test_raw_rand_augment_each_op_matches():
    """Drive every op name deterministically through the reference's
    own func table (construct fresh per draw)."""
    ns = _load_ref_randaug()
    img = _img(40, 120, 1)
    raw = ns["RawRandAugment"]()
    from paddleocr_spark.randaug import _apply_op, _level_map
    level = _level_map(5)
    for name in RANDAUG_OPS:
        for seed in range(4):
            random.seed(seed)
            want = raw.func[name](_wrap(ns, img), level[name])
            rng_py = random.Random(seed)
            got = _apply_op(rng_py, img.copy(), name, level[name])
            assert np.array_equal(got, np.asarray(want)), (name, seed)


def _wrap(ns, arr):
    """Build a stub PIL image through the reference module's own
    globals (its Image binding is our stub)."""
    return ns["Image"].fromarray(arr.copy())


def test_magnitude_scaling_and_gate():
    img = _img(20, 30, 2)
    # seed with rand() > 0.5 -> identity (gate)
    for seed in range(40):
        rng = np.random.RandomState(seed)
        gated = rng.rand() > 0.5
        out = rand_augment_image(img, seed)
        if gated:
            assert np.array_equal(out, img), seed


def test_op_pins():
    img = _img(16, 20, 3)
    assert np.array_equal(invert(invert(img)), img)
    assert np.array_equal(posterize(img, 8), img)
    assert (posterize(img, 1) & 0x7F).max() == 0
    assert np.array_equal(solarize(img, 256.0), img)
    s0 = solarize(img, 0)
    assert np.array_equal(s0, 255 - img)
    # brightness factor 1 = identity; 0 = black
    assert np.array_equal(enhance_brightness(img, 1.0), img)
    assert enhance_brightness(img, 0.0).max() == 0
    # autocontrast of a full-range channel is identity
    full = np.zeros((2, 256, 3), np.uint8)
    full[..., :] = np.arange(256, dtype=np.uint8)[None, :, None]
    assert np.array_equal(autocontrast(full), full)
    # equalize of a uniform histogram is (near-)identity ramp
    eq = equalize(full)
    assert abs(int(eq[..., 0].max()) - 255) <= 1


def test_translate_shifts_pixels():
    img = _img(10, 12, 4)
    out = pil_affine_transform(img, (1, 0, 3, 0, 1, 0), "nearest",
                               (128, 128, 128))
    assert np.array_equal(out[:, :9], img[:, 3:])
    assert (out[:, 9:] == 128).all()


def test_rotate_gray_fill_identity_at_zero():
    img = _img(14, 22, 5)
    assert np.array_equal(pil_rotate_gray_fill(img, 0.0), img)


def test_randaug_for_ref_rows():
    rows = randaug_for_ref("m-000042")
    assert len(rows) == 4
    for r in rows:
        assert r[2] > 0 and r[3] > 0 and 0 <= r[5] <= r[6] <= 255
    assert rows == randaug_for_ref("m-000042")
