"""Streaming exact dedup with cross-batch state (applyInPandasWithState).

The batch engine's exact dedup (`functions/dedup.py::dedup_exact`) is a
single hash-groupBy — correct for a finished corpus, but a training-data
ingest is a STREAM: new document files land continuously and a duplicate
may arrive hours after its first copy. The streaming form keeps the
"have I seen this content hash" decision as per-key state in Spark's
checkpointed state store, so dedup is incremental and survives restarts:

- one exchange on ``content_hash`` (the same shuffle shape as the batch
  groupBy; the state store is hash-partitioned by the same key, so a
  key's state and its incoming rows are always co-located);
- per-key state is O(1) (first-seen doc_id + cumulative count), so
  state size grows with DISTINCT content, not stream length;
- ``Trigger.AvailableNow`` + checkpointLocation give the same
  drain-then-stop reruns as `incremental.run_incremental`: a rerun after
  new files land processes only the new files, against the state built
  by every previous run.

At 100 TB the only change is config, not shape: RocksDB state store
(``spark.sql.streaming.stateStore.providerClass``) instead of the
default in-memory/HDFS-backed one, so per-executor state spills to
local disk instead of heap.

Reference anchor: the fork's HDF5 sample cache (simple_dataset.py:217-239)
is the closest analog — a persistent "already processed" record keyed by
content — re-expressed as Spark's native stateful-streaming operator.

Emission contract (deterministic): a content hash is emitted exactly
once, in the micro-batch where it is first seen, with the smallest
doc_id of that batch's copies and the number of copies in that batch;
later batches only bump the state's cumulative counter.
"""

from __future__ import annotations

import os
from typing import Any, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .incremental import RAW_DOCUMENTS_SCHEMA

#: Output of the stateful dedup: one row per FIRST-SEEN content hash.
DEDUP_OUTPUT_SCHEMA = ("content_hash string, doc_id bigint, "
                       "n_copies_in_batch bigint")

#: Per-key state: first-seen doc_id + cumulative copies across batches.
DEDUP_STATE_SCHEMA = "first_doc_id bigint, total_seen bigint"


def _dedup_group(key: tuple,
                 pdfs: Iterable[Any],
                 state: GroupState) -> Iterator[Any]:
    """Per content-hash group function for applyInPandasWithState.

    Runs once per (key, micro-batch): counts this batch's copies, emits
    the key only if its state did not exist before this batch.
    """
    import pandas as pd

    n = 0
    min_doc = None
    for pdf in pdfs:
        if len(pdf):
            n += len(pdf)
            m = int(pdf["doc_id"].min())
            min_doc = m if min_doc is None else min(min_doc, m)
    if state.exists:
        first_doc, total = state.get
        state.update((int(first_doc), int(total) + n))
        return
    state.update((min_doc, n))
    yield pd.DataFrame({"content_hash": [key[0]],
                        "doc_id": [min_doc],
                        "n_copies_in_batch": [n]})


def streaming_dedup(spark: SparkSession, input_dir: str, out_dir: str,
                    checkpoint_dir: str) -> None:
    """Drain all unprocessed document files, emitting first-seen docs.

    Reads the raw documents shape (BASELINE.json input_hint testdata),
    keys on md5 of the text (the batch dedup_exact key), and appends one
    parquet row per NEW content hash to ``out_dir``. Rerunning after new
    files land processes only the new files against persisted state.
    """
    keyed = (spark.readStream.schema(RAW_DOCUMENTS_SCHEMA)
             .parquet(input_dir)
             .select(F.md5(F.coalesce(F.col("text"), F.lit("")))
                     .alias("content_hash"),
                     F.col("doc_id").cast("long").alias("doc_id")))
    deduped = keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)
    q = (deduped.writeStream
         .trigger(availableNow=True)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .option("path", os.path.join(out_dir, "first_seen"))
         .format("parquet")
         .start())
    q.awaitTermination()


def read_first_seen(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "first_seen"))
