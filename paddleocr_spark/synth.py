"""Deterministic interleaved-document corpus synthesis.

BASELINE.json's input_hint fixes the input table shape:
``(doc_id:string, spans:array<struct<kind,text,media_ref,offset:int>>)``.
The driver's testdata ships a plain text `documents` table instead, so we
derive the interleaved corpus from it with closed-form arithmetic on
``(doc_id, text)`` — no randomness, no row-order dependence, identical at any
parallelism. Two twin implementations:

* :func:`synth_spans` — pure Spark JVM expressions (``transform`` over
  ``sequence``; no Python UDF — stays in whole-stage codegen).
* :func:`synth_spans_pandas` — the pandas twin used by the oracle and tests.

Generator knobs follow FIXTURES.md §1: style-token injection (~spans where
(did+31i)%12 < 5), the '</strike>' survivor quirk, empty-text spans (P9
fixture), double-column docs (did%50==7, exercising sorted_layout_boxes'
double path, recovery_to_doc.py:128-135), same-row ties 4px apart (exercising
the sorted_boxes 10px bubble, predict_system.py:143-151), media-heavy skew
docs (did%211==13 moderate, did%997==13 heavy), and drop_score boundary
scores.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .geometry import PAGE_WIDTH

CHUNK = 80          #: chars per text span
MAX_CHUNKS = 64
TIE_DY = 4          #: same-row tie vertical jitter (< the 10px bubble tol)
ROW_STEP = 14       #: vertical distance between consecutive rows
ROW_BLOCK = 5       #: every ROW_BLOCK rows insert a region-breaking gap
BLOCK_GAP = 20
Y0 = 40
MEDIA_HASH_A = 2654435761  # Knuth multiplicative constant (public domain)
MEDIA_HASH_P = 100003
MEDIA_HASH_M = 2147483647


# ---------------------------------------------------------------------------
# Shared rule helpers (plain-int versions; the Spark builder mirrors these)
# ---------------------------------------------------------------------------

def _kind_of(did: int, i: int, n_chunks: int) -> str:
    if i >= n_chunks:
        return "media"
    if (did * 7 + i * 13) % 23 == 5:
        return "media"
    if i == 0 and did % 3 == 0:
        return "title"
    if (did + i) % 29 == 11:
        return "table"
    return "text"


def _styled(chunk: str, did: int, i: int) -> str:
    m = (did + 31 * i) % 12
    if m == 0:
        return "<b>" + chunk + "</b>"
    if m == 1:
        return "<i>" + chunk + "</i>"
    if m == 2:
        return "<sup>" + chunk + "</sup>"
    if m == 3:
        return chunk + "</strike>"   # the survivor quirk: never stripped
    if m == 4:
        return "<strike>" + chunk + "<strike>"
    return chunk


def _media_ref(did: int, i: int) -> str:
    return "img://h/" + format(
        ((did % MEDIA_HASH_P) * MEDIA_HASH_A + i * 97) % MEDIA_HASH_M, "X")


def _y_base(r: int) -> int:
    return Y0 + r * ROW_STEP + (r // ROW_BLOCK) * BLOCK_GAP


def _offset_of(did: int, i: int, kind: str) -> int:
    if did % 50 == 7:  # double-column doc
        col, r = i % 2, i // 2
        x1 = 10 + col * 510
        y1 = _y_base(r)
    elif (did + i) % 19 == 3 and i > 0 and kind == "text":  # same-row tie
        x1 = 60
        y1 = _y_base(i - 1) + TIE_DY
    else:
        x1 = 120
        y1 = _y_base(i)
    return y1 * PAGE_WIDTH + x1


def n_chunks_of(text_len: int) -> int:
    return min(MAX_CHUNKS, max(1, -(-text_len // CHUNK)))


def extra_media_of(did: int) -> int:
    if did % 997 == 13:
        return 400
    if did % 211 == 13:
        return 40 + did % 23
    return 0


# ---------------------------------------------------------------------------
# pandas twin (oracle side)
# ---------------------------------------------------------------------------

def synth_spans_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """(doc_id:int64, text:str) → (doc_id:str, spans:list[dict])."""
    out = []
    for did, text in zip(pdf["doc_id"].tolist(), pdf["text"].tolist()):
        src = text or ""
        n = n_chunks_of(len(src))
        total = n + extra_media_of(did)
        spans = []
        for i in range(total):
            kind = _kind_of(did, i, n)
            if kind == "media":
                t, ref = None, _media_ref(did, i)
            else:
                chunk = src[i * CHUNK:(i + 1) * CHUNK]
                ref = None
                if kind == "text":
                    if (did * 3 + i) % 41 == 17:
                        t = ""                      # P9 tiny-box fixture
                    else:
                        t = _styled(chunk, did, i)
                else:
                    t = chunk
            spans.append({
                "kind": kind, "text": t, "media_ref": ref,
                "offset": _offset_of(did, i, kind),
            })
        out.append({"doc_id": f"doc_{did:07d}", "spans": spans})
    return pd.DataFrame(out, columns=["doc_id", "spans"])


# ---------------------------------------------------------------------------
# Spark side — pure JVM expressions
# ---------------------------------------------------------------------------

def _idiv(c: Column, k: int) -> Column:
    """Integer division for non-negative ints, staying JVM-side."""
    return F.floor(c / F.lit(k)).cast("long")


def synth_spans(documents: DataFrame) -> DataFrame:
    """Spark twin of :func:`synth_spans_pandas`.

    Input: driver testdata `documents` (doc_id bigint, text string, ...).
    Output: (doc_id string, spans array<struct<kind,text,media_ref,offset>>).
    Entirely whole-stage-codegen expressions — zero Python in this stage.
    """
    did = F.col("doc_id")
    src = F.coalesce(F.col("text"), F.lit(""))
    n = F.least(
        F.lit(MAX_CHUNKS),
        F.greatest(F.lit(1), F.ceil(F.length(src) / F.lit(CHUNK)))
    ).cast("long")
    extra = (
        F.when(did % 997 == 13, F.lit(400))
        .when(did % 211 == 13, (F.lit(40) + did % 23))
        .otherwise(F.lit(0))
    ).cast("long")

    def span_of(i: Column) -> Column:
        kind = (
            F.when(i >= n, F.lit("media"))
            .when((did * 7 + i * 13) % 23 == 5, F.lit("media"))
            .when((i == 0) & (did % 3 == 0), F.lit("title"))
            .when((did + i) % 29 == 11, F.lit("table"))
            .otherwise(F.lit("text"))
        )
        chunk = src.substr((i * CHUNK + 1).cast("int"), F.lit(CHUNK))
        m = (did + 31 * i) % 12
        styled = (
            F.when(m == 0, F.concat(F.lit("<b>"), chunk, F.lit("</b>")))
            .when(m == 1, F.concat(F.lit("<i>"), chunk, F.lit("</i>")))
            .when(m == 2, F.concat(F.lit("<sup>"), chunk, F.lit("</sup>")))
            .when(m == 3, F.concat(chunk, F.lit("</strike>")))
            .when(m == 4, F.concat(F.lit("<strike>"), chunk, F.lit("<strike>")))
            .otherwise(chunk)
        )
        text = (
            F.when(kind == "media", F.lit(None).cast("string"))
            .when(kind == "text",
                  F.when((did * 3 + i) % 41 == 17, F.lit(""))
                  .otherwise(styled))
            .otherwise(chunk)
        )
        media_ref = F.when(
            kind == "media",
            F.concat(
                F.lit("img://h/"),
                F.hex(((did % MEDIA_HASH_P) * MEDIA_HASH_A + i * 97)
                      % MEDIA_HASH_M)),
        ).otherwise(F.lit(None).cast("string"))

        def y_base(r: Column) -> Column:
            return F.lit(Y0) + r * ROW_STEP + _idiv(r, ROW_BLOCK) * BLOCK_GAP

        dbl_x = F.lit(10) + (i % 2) * 510
        dbl_y = y_base(_idiv(i, 2))
        tie = ((did + i) % 19 == 3) & (i > 0) & (kind == "text")
        x1 = (
            F.when(did % 50 == 7, dbl_x)
            .when(tie, F.lit(60))
            .otherwise(F.lit(120))
        )
        y1 = (
            F.when(did % 50 == 7, dbl_y)
            .when(tie, y_base(i - 1) + TIE_DY)
            .otherwise(y_base(i))
        )
        offset = (y1 * PAGE_WIDTH + x1).cast("int")
        return F.struct(
            kind.alias("kind"), text.alias("text"),
            media_ref.alias("media_ref"), offset.alias("offset"))

    # spans first: a 'doc_id' alias earlier in the same select would shadow
    # the input column via lateral column alias resolution.
    return documents.select(
        F.transform(F.sequence(F.lit(0).cast("long"), n + extra - 1),
                    span_of).alias("spans"),
        F.format_string("doc_%07d", did).alias("doc_id"),
    ).select("doc_id", "spans")
