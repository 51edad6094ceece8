"""Deterministic Lloyd k-means over the embeddings table.

The clustering primitive a curation pipeline runs before semantic dedup
(SemDeDup prunes within k-means cells), data mixing (cluster-balanced
sampling), and topic triage. This is the batch analog of the IVF
coarse-quantizer in ``similarity.py`` — same assign shape, but the
centroids are *learned* (Lloyd updates) instead of strided picks.

Everything is deterministic so the DuckDB twin can replay it exactly:

* init: the embeddings of the ``K`` smallest vec_ids (k-means|| needs a
  seeded RNG; a fixed-id init keeps the oracle closed-form — the
  *dataflow* per iteration is identical);
* assignment: argmin of squared L2 distance with ties broken on the
  centroid id (``min_by`` over a (dist, cid) struct — one hash
  aggregation, the same pattern as cell_match's argmin);
* update: per-dimension mean via posexplode → (cid, pos) hash agg →
  array_sort(collect_list) re-assembly (dimension-agnostic, no 64-wide
  select).

Scale shape: centroids are a k-row broadcast (k·dim doubles — MLlib
collects these to the driver; we keep them as a broadcast subplan), so
each iteration is ONE corpus scan with a k-way fan-out of narrow rows,
one map-side-combinable aggregation for the argmin, and one for the
update. No driver collect, no window over the corpus. At 10^12 rows
you'd persist the vector frame once (MLlib's KMeans caches its input —
each Lloyd pass re-scans it; here that's 3 parquet scans: init + one per
assignment) and localCheckpoint the assignment between iterations, as
neardup_components does per star-round; at 2 iterations the plan stays
shallow enough to skip both. Plan audit (sf0.01, recorded): 2
BroadcastNestedLoopJoins (the k-row centroid sides), 0 SortMergeJoins,
1 Window (the k-row centroid numbering only).

Float caveat (documented, not hidden): partial-aggregation order makes
the update means engine-divergent at ~1e-16 relative; an assignment
flips only on a near-exact distance tie between two centroids, which
uniform-random embeddings make vanishingly unlikely. The gate hashes
integer (vec_id, cluster) rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import _vecs

KMEANS_K = 8
#: Number of assignment passes (updates = iters - 1).
KMEANS_ITERS = 2

#: Squared-L2 over two double arrays; fold order is index order on both
#: engines (Spark `aggregate` left-fold / DuckDB list_sum of the
#: transformed list).
_SQDIST = ("aggregate(zip_with(e, c, (x, y) -> (x - y) * (x - y)), "
           "0D, (acc, v) -> acc + v)")


def _doubled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _vecs(spark, sf_dir).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"))


def _init_centroids(vecs: DataFrame, k: int) -> DataFrame:
    """Embeddings of the k smallest vec_ids, numbered 0..k-1 in id order."""
    picks = vecs.orderBy("vec_id").limit(k)
    from pyspark.sql import Window
    w = Window.orderBy("vec_id")
    return picks.select(
        (F.row_number().over(w) - 1).cast("long").alias("cid"),
        F.col("e").alias("c"))


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid, e): nearest centroid per vector, ties → smaller cid."""
    d = (vecs.join(F.broadcast(cents))
         .select("vec_id", "cid", "e", F.expr(_SQDIST).alias("d")))
    return (d.groupBy("vec_id")
            .agg(F.min_by("cid", F.struct("d", "cid")).alias("cid"),
                 F.first("e").alias("e")))


def _update(assigned: DataFrame) -> DataFrame:
    """Per-cluster per-dimension mean, re-assembled in dimension order."""
    dims = (assigned.select("cid", F.posexplode("e").alias("pos", "x"))
            .groupBy("cid", "pos").agg(F.avg("x").alias("m")))
    return (dims.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                 .alias("sm"))
            .select("cid",
                    F.expr("transform(sm, s -> s.m)").alias("c")))


def kmeans_assign(spark: SparkSession, sf_dir: str,
                  k: int = KMEANS_K,
                  iters: int = KMEANS_ITERS) -> DataFrame:
    """Final (vec_id, cluster) assignment after ``iters`` Lloyd passes."""
    vecs = _doubled(spark, sf_dir)
    cents = _init_centroids(vecs, k)
    assigned = _assign(vecs, cents)
    for _ in range(iters - 1):
        assigned = _assign(vecs, _update(assigned))
    return (assigned.select("vec_id",
                            F.col("cid").alias("cluster"))
            .orderBy("vec_id"))
