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


def _lloyd(vecs: DataFrame, k: int, iters: int) -> tuple[DataFrame, DataFrame]:
    """(final assignment, final centroids) after ``iters`` Lloyd passes —
    the centroids returned are exactly the ones the last assignment used."""
    cents = _init_centroids(vecs, k)
    assigned = _assign(vecs, cents)
    for _ in range(iters - 1):
        cents = _update(assigned)
        assigned = _assign(vecs, cents)
    return assigned, cents


def kmeans_assign(spark: SparkSession, sf_dir: str,
                  k: int = KMEANS_K,
                  iters: int = KMEANS_ITERS) -> DataFrame:
    """Final (vec_id, cluster) assignment after ``iters`` Lloyd passes."""
    assigned, _ = _lloyd(_doubled(spark, sf_dir), k, iters)
    return (assigned.select("vec_id",
                            F.col("cid").alias("cluster"))
            .orderBy("vec_id"))


#: SemDeDup prune threshold — same bar as embedding_neardup's pair cut.
SEMDEDUP_EPS = 0.9


def semdedup(spark: SparkSession, sf_dir: str,
             eps: float = SEMDEDUP_EPS,
             k: int = KMEANS_K,
             iters: int = KMEANS_ITERS) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup inside k-means cells.

    The published pipeline: k-means the embedding space, then *within each
    cluster* compute pairwise cosine similarities and keep, from every
    group of semantic duplicates, the example *least* similar to its
    cluster centroid. The deterministic replay here:

    * clustering: the same Lloyd passes as :func:`kmeans_assign`, run over
      the dup-injected corpus (:func:`~.similarity.neardup_corpus`) so the
      planted duplicates exercise the prune;
    * within-cluster order: ascending cosine-to-centroid (the paper's
      low-centroid-similarity-first keep rule), rounded to 4 decimals like
      every cross-engine cosine in this repo, ties → ``vec_id``;
    * prune rule: a row is dropped iff any *earlier-ordered* row in its
      cluster has pairwise cosine ≥ ``eps`` (the paper's upper-triangular
      max over the per-cluster similarity matrix).

    Output: one row per vector — (vec_id, cluster, rnk, max_prior_sim,
    keep); ``max_prior_sim`` is −1.0 for each cluster's first-ranked row.

    Scale shape: the within-cluster self-join is SemDeDup's real cost
    profile — the paper bounds it by scaling K with N (50k clusters for
    LAION) so per-cluster work stays ~constant; here K is the demo-sized
    :data:`KMEANS_K`. The join is an equi-join on ``cluster`` (hash
    co-partitioned, map-side-combinable ``max`` aggregate, no driver
    collect); for skewed clusters the LSH-bucketed
    :func:`~.similarity.embedding_neardup` path is the fallback. Per-pair
    rows carry the two 64-dim vectors — at production scale you'd dedup
    to PCA'd/quantized codes first, exactly as the paper does.
    """
    from .similarity import _dot, _norm, neardup_corpus

    vecs = neardup_corpus(spark, sf_dir).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"))
    assigned, cents = _lloyd(vecs, k, iters)

    sim = (assigned.join(F.broadcast(cents), "cid")
           .select("vec_id", F.col("cid").alias("cluster"), "e",
                   F.round(_dot("e", "c") / (_norm("e") * _norm("c")), 4)
                   .alias("csim")))
    from pyspark.sql import Window
    w = Window.partitionBy("cluster").orderBy("csim", "vec_id")
    # the ranked frame feeds both self-join sides AND the final output —
    # checkpoint it so the Lloyd chain runs once, not three times (same
    # plan-reuse pattern as neardup_components' per-round checkpoint)
    r = sim.select("vec_id", "cluster", "e",
                   F.row_number().over(w).cast("long").alias("rnk")) \
        .localCheckpoint(eager=False)

    lhs = r.select("vec_id", "cluster", "rnk", F.col("e").alias("ei"))
    rhs = r.select(F.col("cluster").alias("cluster"),
                   F.col("rnk").alias("rnk_j"), F.col("e").alias("ej"))
    prior_max = (lhs.join(rhs, "cluster")
                 .filter(F.col("rnk_j") < F.col("rnk"))
                 .groupBy("vec_id")
                 .agg(F.max(F.round(_dot("ei", "ej")
                                    / (_norm("ei") * _norm("ej")), 4))
                      .alias("ms")))

    return (r.join(prior_max, "vec_id", "left")
            .select("vec_id", "cluster", "rnk",
                    F.coalesce("ms", F.lit(-1.0)).alias("max_prior_sim"),
                    (F.coalesce("ms", F.lit(-1.0)) < F.lit(eps))
                    .alias("keep"))
            .orderBy("vec_id"))
