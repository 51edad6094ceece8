"""The flagship extraction pipeline — PP-Structure recovery path, Spark-first.

Restates the reference dataflow (SURVEY.md §3.2):

    documents → explode spans → geometry (JVM) → det filter P9 (JVM)
    → drop_score P10 (JVM) → style strip P11 (JVM regexp)
    → per-doc reading-order kernel (applyInPandas: sorted_boxes O1 +
      region segmentation D1 + sorted_layout_boxes O2 + ordered emission O5)
    → extracted (doc_id, spans array<struct<kind,text,media_ref,offset>>)

Exactly ONE shuffle end-to-end: the ``groupBy(doc_id)`` feeding the grouped
kernel. Everything before it is map-side whole-stage-codegen; the kernel
returns fully assembled documents so no re-aggregation shuffle follows.
Reference parity citations live in paddleocr_spark/kernels.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType, StructField,
                               StructType)

from . import geometry as G
from .kernels import STYLE_TOKEN_REGEX, order_document

EXTRACTED_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("spans", ArrayType(StructType([
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]))),
])


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → one row per span with its array position."""
    return documents.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "span"),
    ).select(
        "doc_id", "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def with_geometry(spans: DataFrame) -> DataFrame:
    """Derive the span box from (kind, text, offset) — geometry.py constants.

    x = offset MOD page_width, y = offset DIV page_width (FIXTURES.md §1);
    extent from kind/text length. Pure JVM expressions.
    """
    x1 = (F.col("offset") % G.PAGE_WIDTH).alias("x1")
    y1 = F.floor(F.col("offset") / G.PAGE_WIDTH).cast("int").alias("y1")
    h = (
        F.when(F.col("kind") == "text", G.KIND_HEIGHT["text"])
        .when(F.col("kind") == "title", G.KIND_HEIGHT["title"])
        .when(F.col("kind") == "table", G.KIND_HEIGHT["table"])
        .otherwise(G.KIND_HEIGHT["media"])
    )
    tlen = F.length(F.coalesce(F.col("text"), F.lit("")))
    w = (
        F.when(F.col("kind") == "media", G.KIND_WIDTH_FIXED["media"])
        .when(F.col("kind") == "table", G.KIND_WIDTH_FIXED["table"])
        .when(F.col("kind") == "title", G.KIND_WIDTH_FIXED["title"])
        .when(tlen == 0, G.EMPTY_TEXT_WIDTH)
        .otherwise(F.lit(G.TEXT_WIDTH_BASE) + tlen % G.TEXT_WIDTH_MOD)
    )
    df = spans.select("*", x1, y1, w.alias("w"), h.alias("h"))
    return df.select(
        "*",
        (F.col("x1") + F.col("w")).alias("x2"),
        (F.col("y1") + F.col("h")).alias("y2"),
    ).drop("w", "h")


def det_filter(spans: DataFrame) -> DataFrame:
    """P9: drop boxes with any side ≤ 3 px (predict_det.py:209-223)."""
    return spans.filter(
        ((F.col("x2") - F.col("x1")) > G.MIN_SIDE)
        & ((F.col("y2") - F.col("y1")) > G.MIN_SIDE))


def drop_score_filter(spans: DataFrame,
                      drop_score: float = G.DROP_SCORE) -> DataFrame:
    """P10: keep text lines iff rec-confidence ≥ drop_score
    (predict_system.py:117-125; confidence analog per geometry.py).

    Integer milli-score comparison so the 0.500 boundary is exact.
    """
    did = F.expr("CAST(substring(doc_id, 5) AS LONG)")
    smod = (did * 7 + F.col("span_idx") * 173) % G.SCORE_MOD
    milli = G.SCORE_BASE_MILLI + F.floor(
        smod * G.SCORE_SPREAD_NUM / G.SCORE_SPREAD_DEN).cast("long")
    thresh = int(round(drop_score * G.SCORE_MOD))
    return spans.filter((F.col("kind") != "text") | (milli >= thresh))


def strip_styles(spans: DataFrame) -> DataFrame:
    """P11: remove the reference style_token set — single-pass JVM regexp.

    ppstructure/predict_system.py:151-162; the token list omits '</strike>'
    (kernels.STYLE_TOKENS quirk), so the alternation does too.
    """
    return spans.withColumn(
        "text", F.regexp_replace("text", STYLE_TOKEN_REGEX, ""))


def _order_assemble(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: one document in → one assembled row out.

    Sorts input by span_idx first so the result is invariant to partition
    arrival order, then delegates to kernels.order_document (O1+D1+O2+O5).
    """
    pdf = pdf.sort_values("span_idx", kind="stable")
    rank = order_document(
        pdf["kind"].tolist(),
        pdf["x1"].to_numpy(), pdf["y1"].to_numpy(),
        pdf["x2"].to_numpy(), pdf["y2"].to_numpy(),
        G.PAGE_WIDTH,
    )
    order = rank.argsort(kind="stable")
    kinds = pdf["kind"].to_numpy()[order]
    texts = pdf["text"].to_numpy()[order]
    refs = pdf["media_ref"].to_numpy()[order]
    spans = [
        {"kind": str(k),
         "text": None if t is None else str(t),
         "media_ref": None if r is None else str(r),
         "offset": int(i)}
        for i, (k, t, r) in enumerate(zip(kinds, texts, refs))
    ]
    return pd.DataFrame(
        [[pdf["doc_id"].iloc[0], spans]], columns=["doc_id", "spans"])


def order_and_assemble(spans: DataFrame) -> DataFrame:
    """Reading-order resolution + document re-assembly (the one shuffle)."""
    return (
        spans.select("doc_id", "span_idx", "kind", "text", "media_ref",
                     "x1", "y1", "x2", "y2")
        .groupBy("doc_id")
        .applyInPandas(_order_assemble, schema=EXTRACTED_SCHEMA)
    )


def extract(documents: DataFrame,
            drop_score: float = G.DROP_SCORE) -> DataFrame:
    """documents(doc_id, spans) → extracted(doc_id, spans ordered).

    Output 'offset' = reading-order rank 0..n-1 (FIXTURES.md §2). Documents
    whose spans are all filtered out do not appear (matching the reference,
    which emits nothing for empty results, predict_system.py:84-88).
    """
    s = explode_spans(documents)
    s = with_geometry(s)
    s = det_filter(s)
    s = drop_score_filter(s, drop_score)
    s = strip_styles(s)
    return order_and_assemble(s)
