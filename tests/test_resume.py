"""Lineage resume: kill after k committed partitions, rerun, assert no
duplicate and no missing documents (FIXTURES.md §5, SURVEY.md §7 step 7)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from paddleocr_spark.lineage import LINEAGE_SCHEMA, run_extract
from paddleocr_spark.pipeline import extract
from paddleocr_spark.synth import synth_spans


@pytest.fixture()
def extracted(documents):
    return extract(synth_spans(documents))


def test_resume_no_dupes_no_missing(spark, extracted, tmp_path):
    out = str(tmp_path / "out")
    full = {r["doc_id"] for r in extracted.select("doc_id").collect()}

    # first run "dies" after 5 of 16 buckets committed
    s1 = run_extract(spark, extracted, out, "run1", n_buckets=16, max_parts=5)
    assert s1["parts_done"] == 5 and s1["parts_skipped"] == 0

    # resume processes exactly the remaining 11
    s2 = run_extract(spark, extracted, out, "run2", n_buckets=16)
    assert s2["parts_done"] == 11 and s2["parts_skipped"] == 5

    got = spark.read.parquet(f"{out}/extracted")
    ids = [r["doc_id"] for r in got.select("doc_id").collect()]
    assert len(ids) == len(set(ids)), "duplicate documents after resume"
    assert set(ids) == full, "missing documents after resume"

    lin = spark.read.schema(LINEAGE_SCHEMA).parquet(f"{out}/lineage")
    per_part = lin.groupBy("part_id").count().collect()
    assert len(per_part) == 16
    assert all(r["count"] == 1 for r in per_part), "partition committed twice"
    # lineage metrics reconcile with the data
    tot = lin.agg(F.sum("doc_count"), F.sum("span_count")).collect()[0]
    assert tot[0] == len(full)
    assert tot[1] == got.select(F.sum(F.size("spans"))).collect()[0][0]

    # third run is a no-op
    s3 = run_extract(spark, extracted, out, "run3", n_buckets=16)
    assert s3["parts_done"] == 0 and s3["parts_skipped"] == 16


def test_uncommitted_bucket_is_overwritten_idempotently(spark, extracted,
                                                        tmp_path):
    """Crash between data write and lineage append: rerun overwrites the
    orphan bucket data; nothing duplicates."""
    out = str(tmp_path / "out2")
    # simulate the crash: write bucket data for 3 parts but drop their lineage
    run_extract(spark, extracted, out, "run1", n_buckets=8, max_parts=3)
    import shutil
    shutil.rmtree(f"{out}/lineage")
    # rerun from scratch: all 8 parts reprocessed, orphan data overwritten
    s = run_extract(spark, extracted, out, "run2", n_buckets=8)
    assert s["parts_done"] == 8
    got = spark.read.parquet(f"{out}/extracted")
    ids = [r["doc_id"] for r in got.select("doc_id").collect()]
    assert len(ids) == len(set(ids))


def test_snapshot_isolation_and_time_travel(spark, extracted, tmp_path):
    """snapshots.py: each run commits an atomic table version; readers of
    a pinned version never see later overwrites (time travel) nor files
    that were written but not committed (snapshot isolation) — the two
    Iceberg properties directory-listing parquet reads lack."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from paddleocr_spark import snapshots as S
    from paddleocr_spark.lineage import run_extract

    out = str(tmp_path / "snap")
    data_dir = f"{out}/extracted"
    s1 = run_extract(spark, extracted, out, "run1", n_buckets=8,
                     max_parts=3)
    assert s1["snapshot_version"] == 1
    v1 = spark.read.parquet(*[
        p for ps in S.load_manifest(out, 1)["files"].values()
        for p in ps]).count()
    s2 = run_extract(spark, extracted, out, "run2", n_buckets=8)
    assert s2["snapshot_version"] == 2

    # v2 = the whole corpus; v1 stays the 3-bucket prefix (time travel)
    all_docs = extracted.count()
    assert S.read_snapshot(spark, out, 2).count() == all_docs
    assert S.read_snapshot(spark, out, 1).count() == v1 == s1["docs"]
    assert S.read_snapshot(spark, out).count() == all_docs  # latest

    # an orphan file (written, never committed) is visible to a naive
    # directory read but INVISIBLE to every snapshot reader
    import glob
    bucket_dir = glob.glob(f"{data_dir}/part_id=*")[0]
    sample = glob.glob(f"{bucket_dir}/*.parquet")[0]
    orphan_tbl = pq.read_table(sample)
    pq.write_table(orphan_tbl, f"{bucket_dir}/orphan-uncommitted.parquet")
    naive = spark.read.parquet(data_dir).count()
    assert naive > all_docs
    assert S.read_snapshot(spark, out, 2).count() == all_docs

    # per-bucket metrics ride the manifest
    m = S.load_manifest(out)
    assert sum(b["docs"] for b in m["buckets"].values()) == all_docs

    # partition discovery restores part_id (basePath), matching the
    # naive directory read's schema
    snap_cols = set(S.read_snapshot(spark, out, 2).columns)
    assert "part_id" in snap_cols
    assert snap_cols == set(spark.read.parquet(data_dir).columns)

    # a racing committer targeting an already-published version fails
    # LOUDLY (optimistic-commit conflict) and the winner's manifest
    # survives untouched: simulate writer B who read parent=v-1 before
    # writer A published v, by pre-seeding A's manifest at B's target.
    import json
    import os

    import pytest

    v = S.current_version(out)
    winner = json.load(open(S._snap_path(out, v)))
    loser_view = dict(winner, version=v + 1)   # B thinks v+1 is free
    os.link(S._snap_path(out, v), S._snap_path(out, v + 1))  # A wins v+1
    try:
        with pytest.raises(FileExistsError):
            tmp = S._snap_path(out, v + 1) + ".tmp"
            json.dump(loser_view, open(tmp, "w"))
            try:
                os.link(tmp, S._snap_path(out, v + 1))
            finally:
                os.unlink(tmp)
        assert json.load(open(S._snap_path(out, v + 1))) == winner
    finally:
        os.unlink(S._snap_path(out, v + 1))

    # empty-table read carries the full extracted schema + part_id
    empty = S.read_snapshot(spark, str(tmp_path / "nonexistent"))
    assert "part_id" in empty.columns and "spans" in empty.columns
    assert empty.count() == 0
