"""Seeded random train-time augments (SURVEY §2 R6, random family).

Transcribes ``EastRandomCropData`` — the DB/EAST training pipelines'
random text-safe crop (reference ``ppocr/data/imaug/random_crop_data.py``
:29-180, itself from WenmuZhou/DBNet.pytorch) — under a *deterministic
contract*: the reference draws from the GLOBAL ``np.random`` stream; this
transcription threads an explicit ``np.random.RandomState(seed)`` whose
MT19937 stream is identical to the global one after ``np.random.seed(seed)``.
Seeding per document id therefore reproduces the reference draw-for-draw
(the exec-ref differential in tests/test_reference_exec.py pins this), and
the operator becomes a pure function of (doc, seed) — shardable, replayable,
and oracle-checkable like every other operator in the engine.

Quirks preserved from the reference:

* ``w_array[minx:maxx] = 1`` — maxx EXCLUSIVE, so the rightmost occupied
  column of every text box stays "free" for the crop axis
  (random_crop_data.py:87,90);
* region-pair selection WITH replacement (``np.random.choice(len(regions),
  2)`` — both picks can land in the same free region, :68);
* ``random_select`` clips to ``max_size - 1`` AFTER drawing (:62-63);
* the candidate is accepted on the FIRST care poly that intersects it
  (counter + break, :114-119);
* after ``max_tries`` failures the WHOLE canvas is returned (:124);
* the keep filter in ``__call__`` tests the SCALED crop extent
  ``int(crop_w * scale)`` — not the pad size and not the unrounded
  extent (:154-155,172).

The pixel side of ``__call__`` (cv2.resize + zero-pad) carries no
extraction semantics — the output polys depend only on the crop rect and
scale — so the operator emits geometry: crop rect, scale, and each
surviving span's transformed box. Scale shape: one ``grouped_map_arrow``
pass keyed by doc_id (hash partition + within-partition sort, whole-batch
Arrow slicing — no per-group pandas), the same plan as the detector
family; the kernel is O(canvas + tries·polys) per doc.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import geometry as G

#: EastRandomCropData defaults (random_crop_data.py:128-132).
EAST_CROP_SIZE = (640, 640)
EAST_CROP_MAX_TRIES = 10
EAST_CROP_MIN_RATIO = 0.1

#: Canvas: width is the page width; height is the doc's max y2 plus this
#: margin (a strip of free rows so the h-axis always has a choice).
EAST_CROP_CANVAS_MARGIN = 20


def is_poly_outside_rect(poly: np.ndarray, x: float, y: float,
                         w: float, h: float) -> bool:
    """random_crop_data.py:38-44 verbatim semantics."""
    poly = np.array(poly)
    if poly[:, 0].max() < x or poly[:, 0].min() > x + w:
        return True
    if poly[:, 1].max() < y or poly[:, 1].min() > y + h:
        return True
    return False


def split_regions(axis: np.ndarray) -> list:
    """Runs of consecutive free indices (random_crop_data.py:47-55; note
    the trailing run is never appended — quirk preserved)."""
    regions = []
    min_axis = 0
    for i in range(1, axis.shape[0]):
        if axis[i] != axis[i - 1] + 1:
            regions.append(axis[min_axis:i])
            min_axis = i
    return regions


def random_select(axis: np.ndarray, max_size: int,
                  rng: np.random.RandomState):
    """Two draws from the free axis, clipped after (:58-64)."""
    xx = rng.choice(axis, size=2)
    xmin, xmax = np.min(xx), np.max(xx)
    return (np.clip(xmin, 0, max_size - 1),
            np.clip(xmax, 0, max_size - 1))


def region_wise_random_select(regions: list,
                              rng: np.random.RandomState):
    """Pick two regions WITH replacement, one value from each (:67-76)."""
    selected_index = list(rng.choice(len(regions), 2))
    selected_values = []
    for index in selected_index:
        # int(choice(..., size=1)) in the reference — [0] is the same
        # value without NumPy's array→scalar deprecation
        selected_values.append(int(rng.choice(regions[index], size=1)[0]))
    return min(selected_values), max(selected_values)


def crop_area(h: int, w: int, text_polys: list,
              min_crop_side_ratio: float, max_tries: int,
              rng: np.random.RandomState):
    """Text-safe crop rect over an (h, w) canvas (:79-124).

    The reference takes the image and reads only its shape; this takes
    (h, w) directly. Draw order per try: x-axis pair first, then y-axis
    pair — preserved exactly (the RNG stream is the contract).
    """
    h_array = np.zeros(h, dtype=np.int32)
    w_array = np.zeros(w, dtype=np.int32)
    for points in text_polys:
        points = np.round(points, decimals=0).astype(np.int32)
        w_array[np.min(points[:, 0]):np.max(points[:, 0])] = 1
        h_array[np.min(points[:, 1]):np.max(points[:, 1])] = 1
    h_axis = np.where(h_array == 0)[0]
    w_axis = np.where(w_array == 0)[0]
    if len(h_axis) == 0 or len(w_axis) == 0:
        return 0, 0, w, h
    h_regions = split_regions(h_axis)
    w_regions = split_regions(w_axis)
    for _ in range(max_tries):
        if len(w_regions) > 1:
            xmin, xmax = region_wise_random_select(w_regions, rng)
        else:
            xmin, xmax = random_select(w_axis, w, rng)
        if len(h_regions) > 1:
            ymin, ymax = region_wise_random_select(h_regions, rng)
        else:
            ymin, ymax = random_select(h_axis, h, rng)
        if (xmax - xmin < min_crop_side_ratio * w
                or ymax - ymin < min_crop_side_ratio * h):
            continue
        num_poly_in_rect = 0
        for poly in text_polys:
            if not is_poly_outside_rect(poly, xmin, ymin,
                                        xmax - xmin, ymax - ymin):
                num_poly_in_rect += 1
                break
        if num_poly_in_rect > 0:
            return xmin, ymin, xmax - xmin, ymax - ymin
    return 0, 0, w, h


def east_crop_doc(did: int, boxes: np.ndarray, ignored: np.ndarray,
                  size: tuple = EAST_CROP_SIZE,
                  max_tries: int = EAST_CROP_MAX_TRIES,
                  min_ratio: float = EAST_CROP_MIN_RATIO):
    """EastRandomCropData.__call__'s geometry for one document (:139-180).

    ``boxes`` is (n, 4) [x1 y1 x2 y2] in span order; ``ignored`` the P9/P10
    drop flags (the reference's ignore_tags — ignored polys don't constrain
    the crop but ARE emitted when they survive it). Returns
    (crop_x, crop_y, crop_w, crop_h, scale,
     [(span_pos, nx1, ny1, nx2, ny2), ...]).
    """
    rng = np.random.RandomState(did % (2 ** 31))
    h = (int(boxes[:, 3].max()) if len(boxes) else 0) \
        + EAST_CROP_CANVAS_MARGIN
    w = G.PAGE_WIDTH
    polys = [np.array([[b[0], b[1]], [b[2], b[1]],
                       [b[2], b[3]], [b[0], b[3]]], dtype=np.float64)
             for b in boxes]
    care = [p for p, t in zip(polys, ignored) if not t]
    crop_x, crop_y, crop_w, crop_h = crop_area(
        h, w, care, min_ratio, max_tries, rng)
    scale = min(size[0] / crop_w, size[1] / crop_h)
    sh = int(crop_h * scale)
    sw = int(crop_w * scale)
    kept = []
    for i, poly in enumerate(polys):
        q = (poly - (crop_x, crop_y)) * scale
        if not is_poly_outside_rect(q, 0, 0, sw, sh):
            kept.append((i, float(q[:, 0].min()), float(q[:, 1].min()),
                         float(q[:, 0].max()), float(q[:, 1].max())))
    return int(crop_x), int(crop_y), int(crop_w), int(crop_h), scale, kept


#: RandomCropImgMask defaults: PSE's 3/8 background-crop probability
#: (random_crop_data.py:184) and this engine's demo crop size (strictly
#: inside the 68×120 shrink-map canvas so the non-trivial path runs).
PSE_CROP_P = 3 / 8
PSE_CROP_SIZE = (32, 56)


def random_crop_img_mask(seed: int, data: dict, main_key: str,
                         crop_keys, size: tuple,
                         p: float = PSE_CROP_P):
    """RandomCropImgMask (random_crop_data.py:183-234) — the PSE training
    crop, the reference's OTHER RNG dialect (stdlib ``random``, not
    np.random). ``random.Random(seed)`` replays the reference's global
    stream after ``random.seed(seed)``.

    Returns (i, j, forced, data') where (i, j) is the crop origin and
    ``forced`` marks the text-region branch. Quirks preserved:

    * ``random.random()`` is consumed ONLY when the main mask has any
      positive pixel (the ``and`` short-circuit, :199);
    * tl/br are the mask extrema minus (th, tw), negatives clamped to 0,
      br additionally clamped to the valid origin range — so a text
      region near the top-left yields tl == br == 0 and the origin is
      forced to (0, 0) (the ``if tl < br else 0`` arms, :201-210);
    * ``random.randint`` bounds are INCLUSIVE;
    * 3-dim arrays crop channel-first or channel-last by ``argmin`` of
      the shape; a 3-dim array whose smallest axis is 1 is returned
      UNCROPPED (the fall-through arm, :227-228 — dead in the shipped
      configs, transcribed anyway);
    * equal-size inputs return untouched BEFORE any draw (:195-196).
    """
    import random as _random

    rng = _random.Random(seed)
    image = data["image"]
    h, w = image.shape[0:2]
    th, tw = size
    if w == tw and h == th:
        return None, None, False, data
    mask = data[main_key]
    forced = False
    if np.max(mask) > 0 and rng.random() > p:
        forced = True
        tl = np.min(np.where(mask > 0), axis=1) - (th, tw)
        tl[tl < 0] = 0
        br = np.max(np.where(mask > 0), axis=1) - (th, tw)
        br[br < 0] = 0
        br[0] = min(br[0], h - th)
        br[1] = min(br[1], w - tw)
        i = rng.randint(tl[0], br[0]) if tl[0] < br[0] else 0
        j = rng.randint(tl[1], br[1]) if tl[1] < br[1] else 0
    else:
        i = rng.randint(0, h - th) if h - th > 0 else 0
        j = rng.randint(0, w - tw) if w - tw > 0 else 0
    out = dict(data)
    for k in data:
        if k in crop_keys:
            if len(data[k].shape) == 3:
                if np.argmin(data[k].shape) == 0:
                    out[k] = data[k][:, i:i + th, j:j + tw]
                elif np.argmin(data[k].shape) == 2:
                    out[k] = data[k][i:i + th, j:j + tw, :]
                # else: left uncropped (reference fall-through)
            else:
                out[k] = data[k][i:i + th, j:j + tw]
    return i, j, forced, out


EAST_CROP_SCHEMA = ("doc_id string, span_idx long, ignored boolean, "
                    "crop_x long, crop_y long, crop_w long, crop_h long, "
                    "scale double, nx1 double, ny1 double, "
                    "nx2 double, ny2 double")


def east_random_crop(spans_geom: DataFrame) -> DataFrame:
    """Distributed seeded crop over the span-geometry frame.

    Input columns: doc_id (string 'doc_<n>'), span_idx, x1 y1 x2 y2,
    ignored. One output row per span surviving its document's crop.
    """
    from .operators.grouped import group_starts, grouped_map_arrow

    def emit(tbl):
        import pyarrow as pa

        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        span = tbl.column("span_idx").to_numpy(zero_copy_only=False)
        ign = tbl.column("ignored").to_numpy(zero_copy_only=False)
        xs = np.stack([tbl.column(c).to_numpy(zero_copy_only=False)
                       for c in ("x1", "y1", "x2", "y2")], axis=1)
        starts = group_starts(np.unique(doc, return_inverse=True)[1])
        bounds = list(starts) + [len(doc)]
        rows = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            did = int(str(doc[s])[4:])
            cx, cy, cw, ch, sc, kept = east_crop_doc(
                did, xs[s:e].astype(np.float64), ign[s:e])
            for pos, nx1, ny1, nx2, ny2 in kept:
                rows.append((str(doc[s]), int(span[s + pos]),
                             bool(ign[s + pos]), cx, cy, cw, ch,
                             sc, nx1, ny1, nx2, ny2))
        if not rows:
            return None
        cols = list(zip(*rows))
        names = ["doc_id", "span_idx", "ignored", "crop_x", "crop_y",
                 "crop_w", "crop_h", "scale", "nx1", "ny1", "nx2", "ny2"]
        return pa.record_batch(
            [pa.array(c) for c in cols], names=names)

    return grouped_map_arrow(
        spans_geom.select("doc_id", "span_idx", "x1", "y1", "x2", "y2",
                          "ignored"),
        ["doc_id"], ["span_idx"], emit, EAST_CROP_SCHEMA)
