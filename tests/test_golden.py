"""Golden-output regression (the TIPC compare_results.py analog).

tests/golden_spans.json holds the expected span sequences for the first 100
sf0.001 documents, committed to the repo (generated once from the pandas
oracle, spot-checked by hand: title-first emission, double-column doc 7,
drop-score filtering). The Spark pipeline must reproduce them EXACTLY —
discrete equality, not allclose (test_tipc/compare_results.py:12-14 uses
allclose only because its outputs are float quads; ours are discrete).

This protects against the pipeline and the in-repo oracle drifting
together: the fixture is frozen text in git.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_spans.json")
SF = "/root/testdata/sf0.001"


def test_spark_pipeline_matches_committed_golden(spark):
    from paddleocr_spark.pipeline import extract
    from paddleocr_spark.synth import synth_spans

    with open(GOLDEN) as f:
        golden = json.load(f)

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .filter(F.col("doc_id") < 100))
    out = {r["doc_id"]: [s.asDict() for s in r["spans"]]
           for r in extract(synth_spans(docs)).collect()}

    assert set(out) == set(golden)
    for doc_id, spans in golden.items():
        assert out[doc_id] == spans, f"span sequence mismatch for {doc_id}"
