"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end span extraction (PP-Structure recovery analog).

    Loads sf0.001 documents, synthesizes the interleaved (doc_id, spans)
    corpus per BASELINE.json input_hint (paddleocr_spark/synth.py), runs the
    extraction pipeline (paddleocr_spark/pipeline.py) and returns the
    extracted table (doc_id, spans array<struct<kind,text,media_ref,offset>>)
    with offset = reading-order rank.
    """
    from paddleocr_spark.pipeline import extract
    from paddleocr_spark.synth import synth_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return extract(synth_spans(docs))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data pipeline ops (dedup / similarity / text analysis).
    Registry lives in paddleocr_spark/entry_queries.py.
    """
    from paddleocr_spark.entry_queries import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every entry in ``queries()``.

    SQL-expressible operators get a real SQL restatement; the iterative
    ones (flagship reading order, greedy NMS, LCS, greedy IoU, TEDS) read
    committed expected-output fixtures generated single-node by
    tools/make_fixtures.py at the gate SF (sf0.01).
    """
    from paddleocr_spark.entry_queries import oracle_sql as _o
    return _o()
