"""Watermarked windowed streaming aggregation: late-data and
exactly-once semantics across restarts (streaming/windowed.py).

The sequence pins the full event-time contract:

1. run 1 over events 00:00–02:00 → watermark 01:30 → exactly the nine
   windows ending ≤ 01:30 appear in the sink (the availableNow no-data
   batch flushes finalized state before stopping);
2. run 2 adds a fresh 03:00 event (advancing the watermark to 02:30)
   AND a late 00:05 event — the late row is DROPPED (its window
   finalized in run 1: the emitted row neither changes nor duplicates,
   proving the watermark persisted in the checkpoint across the
   restart), and the four windows ending in (01:30, 02:30] finalize;
3. run 3 with no new files appends nothing (file-source progress +
   sink commit log = exactly-once).
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from paddleocr_spark.streaming.windowed import run_windowed_counts

T0 = dt.datetime(2024, 1, 1)
SCHEMA = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double, props string")


def _drop_file(spark, base: str, ind: str, name: str, rows) -> None:
    # the file source ignores non-partition subdirectories, so each
    # batch must land as a TOP-LEVEL file in the watched dir
    tmp = os.path.join(base, "tmp_" + name)
    spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m), 1, et, float(v), "{}")
         for i, (m, et, v) in enumerate(rows)],
        SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                os.path.join(ind, name + ".parquet"))


def _sink(spark, outd: str) -> dict:
    return {(r["win_start"], r["event_type"]): (r["win_end"], r["n"],
                                                r["total"])
            for r in spark.read.parquet(outd).collect()}


def test_windowed_watermark_late_drop_and_exactly_once(spark, tmp_path):
    base = str(tmp_path)
    ind, outd, ck = [os.path.join(base, x) for x in ("in", "out", "ck")]
    os.makedirs(ind)

    _drop_file(spark, base, ind, "b1",
               [(m, "click", m) for m in range(0, 121, 5)])
    n1 = run_windowed_counts(spark, ind, outd, ck)
    got1 = _sink(spark, outd)
    # watermark = 02:00 - 30min = 01:30; exactly the windows ending
    # <= 01:30 are finalized, each holding its two 5-min-grid events
    want1 = {}
    for w in range(0, 90, 10):
        start = T0 + dt.timedelta(minutes=w)
        want1[(start, "click")] = (start + dt.timedelta(minutes=10), 2,
                                   float(w + w + 5))
    assert n1 == 9 and got1 == want1

    # a watermark-advancing event plus a LATE one (00:05 < 01:30)
    _drop_file(spark, base, ind, "b2",
               [(180, "click", 7), (5, "click", 999)])
    n2 = run_windowed_counts(spark, ind, outd, ck)
    got2 = _sink(spark, outd)
    assert n2 == 13 and len(got2) == 13
    # the late row was dropped: its window's emitted row is unchanged
    # (no recount, no duplicate key — _sink would have lost one)
    assert got2[(T0, "click")] == want1[(T0, "click")]
    # run-1 rows all untouched; the four newly finalized windows
    # (ends 01:40..02:10) appear, incl. the single 02:00 event
    assert {k: v for k, v in got2.items() if k in want1} == want1
    start = T0 + dt.timedelta(minutes=120)
    assert got2[(start, "click")] == (start + dt.timedelta(minutes=10),
                                      1, 120.0)
    # the 03:00 event's own window is NOT finalized yet
    assert (T0 + dt.timedelta(minutes=180), "click") not in got2

    # nothing new -> nothing appended
    n3 = run_windowed_counts(spark, ind, outd, ck)
    assert n3 == 13 and _sink(spark, outd) == got2
