"""Seeded-replay transcription of ``ppocr/data/imaug/randaugment.py``
(RawRandAugment / RandAugment — the ImageNet RandAugment policy over
PIL ops, the last in-repo member of the R6 augment family).

Dual-stream contract as everywhere in this family: the reference
drives global ``np.random`` (the per-layer op pick and the prob gate)
plus stdlib ``random.choice`` (the +/- sign draws inside the op
lambdas, bound at __init__ as ``rnd_ch_op`` but DRAWN at call time);
this transcription threads ``np.random.RandomState(seed)`` +
``random.Random(seed)``.

Circularity status: the level_map magnitudes, the two-layer
choice walk, the sign placement inside each op, the prob gate, and
the wrapper's numpy<->PIL fitting are genuinely differentialed by
executing the reference source verbatim (tests/test_randaug.py).  The
fourteen PIL raster ops (affine transform NEAREST/BICUBIC with
fillcolor, RGBA rotate + composite gray fill, the four ImageEnhance
blends with their degenerate images, posterize/solarize/autocontrast/
equalize/invert) are re-derived below from PIL's PUBLIC semantics
(ITU-R 601-2 integer luma, SMOOTH 3x3 border-copy filter, the
histogram-equalize n//step LUT walk, clip8 = floor(v + 0.5) clamp)
and shimmed into the exec — circular for those kernels, the same
documented trade as cvaug/recaug; exact PIL tie-rounding is
unverifiable in-container (PIL absent) and noted per-op.

Reference: hoonisone/PaddleOCR ``ppocr/data/imaug/randaugment.py``
  level_map / op table :26-110     RawRandAugment.__call__ :111-116
  RandAugment wrapper  :119-143
"""
from __future__ import annotations

import math
import random as _random

import numpy as np

__all__ = [
    "pil_affine_transform", "pil_rotate_gray_fill", "luma_l",
    "enhance_color", "enhance_contrast", "enhance_brightness",
    "enhance_sharpness", "posterize", "solarize", "autocontrast",
    "equalize", "invert", "rand_augment_image", "randaug_for_ref",
    "RANDAUG_OPS",
]


def _clip8(acc: np.ndarray) -> np.ndarray:
    """PIL clip8: (int)(v + 0.5) clamped to [0, 255]."""
    return np.clip(np.floor(acc + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# geometry (Image.transform AFFINE / Image.rotate) — PIL samples the
# inverse map at output pixel CENTERS (x+0.5, y+0.5)
# ---------------------------------------------------------------------------

def pil_affine_transform(img: np.ndarray, coeffs, resample: str,
                         fillcolor) -> np.ndarray:
    """Image.transform(size, AFFINE, (a,b,c,d,e,f), resample,
    fillcolor=...): xin = a*(x+.5) + b*(y+.5) + c (likewise yin);
    NEAREST floors the source point, BICUBIC runs Keys a=-0.5 4x4 taps
    at (xin-.5, yin-.5) with edge clamp; output pixels whose source
    point leaves the canvas take fillcolor."""
    h, w = img.shape[:2]
    a, b, c, d, e, f = (float(v) for v in coeffs)
    ys, xs = np.mgrid[0:h, 0:w]
    xin = a * (xs + 0.5) + b * (ys + 0.5) + c
    yin = d * (xs + 0.5) + e * (ys + 0.5) + f
    inside = (xin >= 0) & (xin < w) & (yin >= 0) & (yin < h)
    fill = np.array(fillcolor, dtype=np.uint8).reshape(1, 1, -1)

    if resample == "nearest":
        sx = np.clip(np.floor(xin).astype(np.int64), 0, w - 1)
        sy = np.clip(np.floor(yin).astype(np.int64), 0, h - 1)
        out = img[sy, sx]
    else:                                           # bicubic
        cx = xin - 0.5
        cy = yin - 0.5
        x0 = np.floor(cx).astype(np.int64)
        y0 = np.floor(cy).astype(np.int64)
        wx = _cubic_weights_a05(cx - x0)
        wy = _cubic_weights_a05(cy - y0)
        p = img.astype(np.float64)
        acc = np.zeros((h, w, img.shape[2]), dtype=np.float64)
        for dy in range(-1, 3):
            yy = np.clip(y0 + dy, 0, h - 1)
            row_w = wy[..., dy + 1][..., None]
            for dx in range(-1, 3):
                xx = np.clip(x0 + dx, 0, w - 1)
                acc += row_w * wx[..., dx + 1][..., None] * p[yy, xx]
        out = _clip8(acc)
    return np.where(inside[..., None], out, fill)


def _cubic_weights_a05(t: np.ndarray) -> np.ndarray:
    """Keys bicubic weights with PIL's a = -0.5 for fractional offset t
    (taps at -1, 0, +1, +2)."""
    a = -0.5
    ws = []
    for k in (-1, 0, 1, 2):
        x = np.abs(t - k)
        w = np.where(
            x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
            np.where(x < 2, a * x ** 3 - 5 * a * x ** 2 + 8 * a * x
                     - 4 * a, 0.0))
        ws.append(w)
    return np.stack(ws, axis=-1)


def pil_rotate_gray_fill(img: np.ndarray, angle: float) -> np.ndarray:
    """randaugment.py:56-60 rotate_with_fill: convert RGBA, rotate
    about the centre (NEAREST, expand=False, transparent fill), then
    composite over an all-128 canvas using the rotated alpha, back to
    the source mode.  NEAREST keeps alpha binary, so the composite
    reduces to a mask select."""
    h, w = img.shape[:2]
    rot = math.radians(angle)
    cos_a, sin_a = math.cos(rot), math.sin(rot)
    cx, cy = w / 2.0, h / 2.0
    # PIL rotate: inverse map  src = M^-1 (dst - centre) + centre
    coeffs = (cos_a, sin_a, cx - cx * cos_a - cy * sin_a,
              -sin_a, cos_a, cy + cx * sin_a - cy * cos_a)
    a, b, c, d, e, f = coeffs
    ys, xs = np.mgrid[0:h, 0:w]
    xin = a * (xs + 0.5) + b * (ys + 0.5) + c
    yin = d * (xs + 0.5) + e * (ys + 0.5) + f
    inside = (xin >= 0) & (xin < w) & (yin >= 0) & (yin < h)
    sx = np.clip(np.floor(xin).astype(np.int64), 0, w - 1)
    sy = np.clip(np.floor(yin).astype(np.int64), 0, h - 1)
    out = img[sy, sx]
    return np.where(inside[..., None], out,
                    np.uint8(128)).astype(np.uint8)


# ---------------------------------------------------------------------------
# ImageEnhance family: blend(degenerate, image, factor)
# ---------------------------------------------------------------------------

def luma_l(img: np.ndarray) -> np.ndarray:
    """PIL RGB→L: ITU-R 601-2 integer luma
    (R*19595 + G*38470 + B*7471 + 0x8000) >> 16."""
    p = img.astype(np.uint32)
    return ((p[..., 0] * 19595 + p[..., 1] * 38470 + p[..., 2] * 7471
             + 0x8000) >> 16).astype(np.uint8)


def _blend(degenerate: np.ndarray, img: np.ndarray,
           factor: float) -> np.ndarray:
    """Image.blend(d, i, f) = d + f*(i - d), clip8."""
    return _clip8(degenerate.astype(np.float64)
                  + factor * (img.astype(np.float64)
                              - degenerate.astype(np.float64)))


def enhance_color(img: np.ndarray, factor: float) -> np.ndarray:
    """ImageEnhance.Color: degenerate = L replicated across RGB."""
    gray = luma_l(img)
    return _blend(np.repeat(gray[..., None], img.shape[2], axis=-1),
                  img, factor)


def enhance_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """ImageEnhance.Contrast: degenerate = flat int(L-mean + 0.5)."""
    gray = luma_l(img)
    mean = int(float(gray.mean(dtype=np.float64)) + 0.5)
    return _blend(np.full_like(img, mean), img, factor)


def enhance_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    """ImageEnhance.Brightness: degenerate = black."""
    return _blend(np.zeros_like(img), img, factor)


_SMOOTH = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], dtype=np.float64)


def enhance_sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    """ImageEnhance.Sharpness: degenerate = SMOOTH-filtered image
    (3x3 [1 1 1; 1 5 1; 1 1 1]/13; PIL's Kernel filter leaves the
    1-px border UNfiltered — copied from the source)."""
    h, w = img.shape[:2]
    p = img.astype(np.float64)
    deg = img.copy()
    if h > 2 and w > 2:
        acc = np.zeros((h - 2, w - 2, img.shape[2]), dtype=np.float64)
        for dy in range(3):
            for dx in range(3):
                acc += _SMOOTH[dy, dx] * p[dy:dy + h - 2, dx:dx + w - 2]
        deg[1:-1, 1:-1] = _clip8(acc / 13.0)
    return _blend(deg, img, factor)


# ---------------------------------------------------------------------------
# ImageOps family
# ---------------------------------------------------------------------------

def posterize(img: np.ndarray, bits: int) -> np.ndarray:
    """ImageOps.posterize: keep the top ``bits`` bits per channel."""
    mask = ~(2 ** (8 - bits) - 1) & 0xFF
    return (img & np.uint8(mask)).astype(np.uint8)


def solarize(img: np.ndarray, threshold: float) -> np.ndarray:
    """ImageOps.solarize: invert pixels >= threshold."""
    return np.where(img < threshold, img, 255 - img).astype(np.uint8)


def autocontrast(img: np.ndarray) -> np.ndarray:
    """ImageOps.autocontrast(cutoff=0): per channel, stretch [lo, hi]
    (first/last occupied histogram bins) to [0, 255] with PIL's
    truncating LUT build; single-level channels pass through."""
    out = img.copy()
    for ch in range(img.shape[2]):
        plane = img[..., ch]
        hist = np.bincount(plane.ravel(), minlength=256)
        nz = np.nonzero(hist)[0]
        if len(nz) == 0:
            continue
        lo, hi = int(nz[0]), int(nz[-1])
        if hi <= lo:
            continue
        scale = 255.0 / (hi - lo)
        offset = -lo * scale
        lut = np.clip((np.arange(256) * scale + offset).astype(np.int64),
                      0, 255).astype(np.uint8)
        out[..., ch] = lut[plane]
    return out


def equalize(img: np.ndarray) -> np.ndarray:
    """ImageOps.equalize: PIL's exact n//step cumulative LUT per
    channel (step = (pixels - last occupied bin) // 255; identity when
    step == 0 or the channel has <= 1 occupied bin)."""
    out = img.copy()
    for ch in range(img.shape[2]):
        plane = img[..., ch]
        h = np.bincount(plane.ravel(), minlength=256).tolist()
        histo = [v for v in h if v]
        if len(histo) <= 1:
            continue
        step = (sum(histo) - histo[-1]) // 255
        if not step:
            continue
        lut = []
        n = step // 2
        for i in range(256):
            lut.append(n // step)
            n = n + h[i]
        out[..., ch] = np.clip(np.array(lut, dtype=np.int64), 0,
                               255).astype(np.uint8)[plane]
    return out


def invert(img: np.ndarray) -> np.ndarray:
    """ImageOps.invert."""
    return (255 - img).astype(np.uint8)


# ---------------------------------------------------------------------------
# the policy walk (randaugment.py:26-143)
# ---------------------------------------------------------------------------

RANDAUG_OPS = ("shearX", "shearY", "translateX", "translateY", "rotate",
               "color", "posterize", "solarize", "contrast", "sharpness",
               "brightness", "autocontrast", "equalize", "invert")

_FILL = (128, 128, 128)


def _level_map(magnitude: int) -> dict:
    abso_level = magnitude / 10
    return {
        "shearX": 0.3 * abso_level,
        "shearY": 0.3 * abso_level,
        "translateX": 150.0 / 331 * abso_level,
        "translateY": 150.0 / 331 * abso_level,
        "rotate": 30 * abso_level,
        "color": 0.9 * abso_level,
        "posterize": int(4.0 * abso_level),
        "solarize": 256.0 * abso_level,
        "contrast": 0.9 * abso_level,
        "sharpness": 0.9 * abso_level,
        "brightness": 0.9 * abso_level,
        "autocontrast": 0,
        "equalize": 0,
        "invert": 0,
    }


def _apply_op(rng_py, img, name, magnitude):
    h, w = img.shape[:2]
    if name == "shearX":
        return pil_affine_transform(
            img, (1, magnitude * rng_py.choice([-1, 1]), 0, 0, 1, 0),
            "bicubic", _FILL)
    if name == "shearY":
        return pil_affine_transform(
            img, (1, 0, 0, magnitude * rng_py.choice([-1, 1]), 1, 0),
            "bicubic", _FILL)
    if name == "translateX":
        return pil_affine_transform(
            img, (1, 0, magnitude * w * rng_py.choice([-1, 1]),
                  0, 1, 0), "nearest", _FILL)
    if name == "translateY":
        return pil_affine_transform(
            img, (1, 0, 0, 0, 1, magnitude * h * rng_py.choice([-1, 1])),
            "nearest", _FILL)
    if name == "rotate":
        return pil_rotate_gray_fill(img, magnitude)
    if name == "color":
        return enhance_color(img, 1 + magnitude * rng_py.choice([-1, 1]))
    if name == "posterize":
        return posterize(img, magnitude)
    if name == "solarize":
        return solarize(img, magnitude)
    if name == "contrast":
        return enhance_contrast(img,
                                1 + magnitude * rng_py.choice([-1, 1]))
    if name == "sharpness":
        return enhance_sharpness(img,
                                 1 + magnitude * rng_py.choice([-1, 1]))
    if name == "brightness":
        return enhance_brightness(img,
                                  1 + magnitude * rng_py.choice([-1, 1]))
    if name == "autocontrast":
        return autocontrast(img)
    if name == "equalize":
        return equalize(img)
    assert name == "invert"
    return invert(img)


def rand_augment_image(img: np.ndarray, seed: int, prob: float = 0.5,
                       num_layers: int = 2,
                       magnitude: int = 5) -> np.ndarray:
    """RandAugment (randaugment.py:119-143) as a pure (image, seed)
    function: the prob gate (np.random.rand), then num_layers rounds of
    np.random.choice over the 14-op table, each op drawing its stdlib
    sign at apply time."""
    seed32 = seed % (2 ** 32)
    rng_py = _random.Random(seed32)
    rng_np = np.random.RandomState(seed32)
    img = np.ascontiguousarray(np.asarray(img, np.uint8))
    if rng_np.rand() > prob:
        return img
    level = _level_map(magnitude)
    names = list(level.keys())
    for _ in range(num_layers):
        op_name = str(rng_np.choice(names))
        img = _apply_op(rng_py, img, op_name, level[op_name])
    return img


def randaug_for_ref(ref: str) -> list:
    """RandAugment over one rendered blob, several seeds so the gate
    and a spread of ops are live; rows (ref, seed, out_h, out_w, mean,
    vmin, vmax, crc)."""
    import zlib

    from .imagecodecs import render_ref_image
    from .pixelops import imread_color

    _, buf = render_ref_image(ref)
    img = np.tile(imread_color(buf), (2, 4, 1))
    rows = []
    for k in range(4):
        seed = zlib.crc32(f"{ref}:ra{k}".encode("utf-8"))
        out = rand_augment_image(img, seed)
        rows.append((
            ref, int(seed), int(out.shape[0]), int(out.shape[1]),
            round(float(out.mean(dtype=np.float64)), 4),
            int(out.min()), int(out.max()),
            int(zlib.crc32(np.ascontiguousarray(out).tobytes()))))
    return rows
