"""Documented geometry constants mapping span offsets → synthetic page boxes.

FIXTURES.md §1 fixes the convention: ``y = offset DIV page_width,
x = offset MOD page_width`` with a documented page-width constant. The extent
of a span's box is derived purely from ``(kind, text)`` so that the pipeline,
the oracle, and the corpus generator all reconstruct identical geometry from
the span schema ``(kind, text, media_ref, offset)`` alone.

These stand in for the reference's detector/layout box geometry
(tools/infer/predict_det.py:336-338 quads; picodet bboxes) which our span
representation replaces (SURVEY.md §1.1).
"""

from __future__ import annotations

#: Page width in offset units (x = offset % PAGE_WIDTH).
PAGE_WIDTH = 1000

#: Box height per span kind — a text line is 10 units tall, so the
#: reference's 10px ``sorted_boxes`` tolerance (predict_system.py:143-151)
#: means "same visual row".
KIND_HEIGHT = {"text": 10, "title": 16, "table": 60, "media": 80}

#: Box width: media/table/title are fixed-width regions; text width varies
#: with content length. An EMPTY text span degenerates to width 2 — dropped by
#: the min-side>3 filter (P9, predict_det.py:209-223 semantics).
KIND_WIDTH_FIXED = {"media": 200, "table": 640, "title": 640}
TEXT_WIDTH_BASE = 300
TEXT_WIDTH_MOD = 40
EMPTY_TEXT_WIDTH = 2

#: Recognition-confidence analog (deterministic; the drop_score fixture).
#: smod = (did*7 + span_idx*173) % 1000; score_milli = 400 + smod*6 DIV 10,
#: i.e. score ∈ [0.400, 0.999] — shaped like real rec confidences (most kept,
#: ~17% below the 0.500 default) and hitting the boundary exactly at
#: smod=167 → 0.500 (kept; predict_system.py:117-125 keeps score >= drop).
SCORE_MOD = 1000
SCORE_BASE_MILLI = 400
SCORE_SPREAD_NUM = 6
SCORE_SPREAD_DEN = 10
DROP_SCORE = 0.5  # tools/infer/utility.py:100 default

#: Minimum box side kept by the det filter (P9): sides must be > 3.
MIN_SIDE = 3


def span_width(kind: str, text: str | None) -> int:
    if kind in KIND_WIDTH_FIXED:
        return KIND_WIDTH_FIXED[kind]
    n = len(text) if text else 0
    if n == 0:
        return EMPTY_TEXT_WIDTH
    return TEXT_WIDTH_BASE + (n % TEXT_WIDTH_MOD)


def span_height(kind: str) -> int:
    return KIND_HEIGHT[kind]


def span_score_milli(did: int, span_idx: int) -> int:
    smod = (did * 7 + span_idx * 173) % SCORE_MOD
    return SCORE_BASE_MILLI + (smod * SCORE_SPREAD_NUM) // SCORE_SPREAD_DEN
