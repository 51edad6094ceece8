"""Stateful streaming dedup (applyInPandasWithState): first-seen-only
emission, cross-batch AND cross-restart state via the checkpointed state
store, deterministic within-batch tie-break."""

from __future__ import annotations

import pytest

from paddleocr_spark.streaming.stateful import (read_first_seen,
                                                streaming_dedup)

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t or "")) for i, t in rows],
        schema=DOCS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_first_seen_across_restarts(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    # batch 1: "alpha" twice (docs 7 and 3 -> min wins), "beta" once
    _write_docs(spark, inp, [(7, "alpha"), (3, "alpha"), (9, "beta")])
    streaming_dedup(spark, inp, out, cp)
    got = {r["doc_id"]: r["n_copies_in_batch"]
           for r in read_first_seen(spark, out).collect()}
    assert got == {3: 2, 9: 1}

    # batch 2 in a NEW query run (state must come from the checkpoint):
    # "alpha" again (dup of a PREVIOUS run -> suppressed), "gamma" new
    _write_docs(spark, inp, [(11, "alpha"), (12, "gamma")])
    streaming_dedup(spark, inp, out, cp)
    rows = read_first_seen(spark, out).collect()
    got = {r["doc_id"]: (r["content_hash"], r["n_copies_in_batch"])
           for r in rows}
    assert sorted(got) == [3, 9, 12], got
    assert got[12][1] == 1
    # one row per distinct content hash, ever
    assert len({h for h, _ in got.values()}) == 3

    # rerun with nothing new: a no-op (no files to drain, no re-emission)
    streaming_dedup(spark, inp, out, cp)
    assert read_first_seen(spark, out).count() == 3


def test_streaming_dedup_null_and_empty_text_collapse(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    # null text and empty text share md5('') -> one first-seen row
    _write_docs(spark, inp, [(1, None), (2, ""), (5, "x")])
    streaming_dedup(spark, inp, out, cp)
    got = {r["doc_id"]: r["n_copies_in_batch"]
           for r in read_first_seen(spark, out).collect()}
    assert got == {1: 2, 5: 1}
