"""Similarity search over an embedding column (array<float>).

* :func:`ann_cosine_topk` — brute-force cosine top-k, the exactness baseline:
  broadcast the (small) query set against the corpus, dot products via
  ``zip_with``/``aggregate`` higher-order functions (JVM-side, no Python).
  At 10^12 scale the query side is always the broadcast side.
* :func:`ann_lsh_buckets` — the scale path: random-hyperplane LSH codes
  (deterministic md5-derived hyperplanes), bucket equi-join + rank within
  bucket, turning O(N·Q) into O(N + Q·bucket_size).
* :func:`embedding_neardup` — embedding-cosine near-duplicate detection over
  a corpus with injected duplicate vectors (bucket-join, cos ≥ threshold).

Dot-product folds are ordered (aggregate folds left-to-right), so results are
deterministic at any parallelism; cosines are rounded to 4dp as part of the
output contract (FP summation order differs across engines).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Number of random hyperplanes (LSH code bits).
LSH_PLANES = 8
#: Near-dup injection: every k-th vector re-appears under vec_id+offset.
VEC_DUP_OFFSET = 1_000_000
VEC_DUP_EVERY = 10
#: Brute-force demo: how many query vectors.
TOPK_QUERIES = 8
TOPK_K = 10


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .select("vec_id", "embedding"))


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")


def _norm(a: str):
    return F.expr(
        f"sqrt(aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * "
        f"CAST(x AS DOUBLE)))")


def cosine_col(a: str, b: str):
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_cosine_topk(spark: SparkSession, sf_dir: str,
                    n_queries: int = TOPK_QUERIES,
                    k: int = TOPK_K) -> DataFrame:
    """Brute-force cosine top-k: queries (vec_id < n_queries) vs the corpus.

    Broadcast the query side; rank by (cosine desc, vec_id) for determinism.
    Output: (query_id, rank, vec_id, cosine) — cosine rounded 4dp.
    """
    corpus = _vecs(spark, sf_dir)
    queries = (corpus.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q")))
    scored = (corpus.crossJoin(F.broadcast(queries))
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id",
                      cosine_col("q", "embedding").alias("cos")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "vec_id", F.round("cos", 4).alias("cosine")))


def lsh_code_col(vec: str = "embedding", planes: int = LSH_PLANES):
    """Random-hyperplane LSH code: bit p = sign of <w_p, x> where the
    hyperplane weight w_p[d] = hexdigit(md5(p||':'||d)) / 7.5 - 1 ∈ [-1, 1]
    (deterministic, engine-portable — no RNG)."""
    return F.expr(
        "aggregate(sequence(0, {pm}), 0L, (code, p) -> code + "
        "CASE WHEN aggregate(sequence(0, size({v}) - 1), 0D, (acc, d) -> "
        "  acc + ((instr('0123456789abcdef', substring("
        "    md5(concat(p, ':', d)), 1, 1)) - 1) / 7.5 - 1.0) "
        "    * CAST(element_at({v}, d + 1) AS DOUBLE)) > 0 "
        "THEN CAST(power(2, p) AS BIGINT) ELSE 0L END)".format(
            pm=planes - 1, v=vec))


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket assignment + per-bucket population (the ANN index build)."""
    vecs = _vecs(spark, sf_dir).select(
        "vec_id", lsh_code_col().alias("bucket"))
    return (vecs.groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_vecs"),
                 F.min("vec_id").alias("min_vec_id")))


def neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ injected duplicate vectors (deterministic)."""
    vecs = _vecs(spark, sf_dir)
    dups = (vecs.filter(F.col("vec_id") % VEC_DUP_EVERY == 0)
            .select((F.col("vec_id") + VEC_DUP_OFFSET).alias("vec_id"),
                    "embedding"))
    return vecs.unionByName(dups)


def embedding_neardup(spark: SparkSession, sf_dir: str,
                      threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH-bucket join (scale path):
    only vectors in the same hyperplane bucket are compared exactly."""
    vecs = neardup_corpus(spark, sf_dir).select(
        "vec_id", "embedding", lsh_code_col().alias("bucket"))
    a = vecs.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("ea"), "bucket")
    b = vecs.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("eb"), "bucket")
    return (a.join(b, "bucket")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b",
                    F.round(cosine_col("ea", "eb"), 4).alias("cosine"))
            .filter(F.col("cosine") >= threshold))


#: IVF coarse quantizer: deterministic centroid sample + probe count.
IVF_CENTROID_EVERY = 31
IVF_NPROBE = 2
IVF_QUERIES = 4
IVF_K = 5


def ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic coarse centroids: every 31st vector (~3% of corpus).

    A real deployment k-means-refines these; the IVF *mechanics* (assign →
    probe → rank within probed cells) are identical and that is what the
    oracle checks. Deterministic selection keeps Spark and DuckDB equal."""
    return (_vecs(spark, sf_dir)
            .filter(F.col("vec_id") % IVF_CENTROID_EVERY == 1)
            .select(F.col("vec_id").alias("centroid_id"),
                    F.col("embedding").alias("c")))


def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index build: each vector → nearest centroid by cosine.

    Broadcast the (tiny) centroid set against the corpus — at 10^12 vectors
    this is the only scan of the big side; the result is the partition key
    for cell-local search. Ties rank by centroid_id for determinism."""
    from pyspark.sql.window import Window
    vecs = _vecs(spark, sf_dir)
    cents = ivf_centroids(spark, sf_dir)
    scored = (vecs.crossJoin(F.broadcast(cents))
              .select("vec_id", "centroid_id",
                      cosine_col("embedding", "c").alias("cos")))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("centroid_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "centroid_id",
                    F.round("cos", 4).alias("cosine")))


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: probe the NPROBE nearest cells per query, exact-rank
    only the vectors inside them (the O(N) → O(N/cells · nprobe) path)."""
    from pyspark.sql.window import Window
    vecs = _vecs(spark, sf_dir)
    cents = ivf_centroids(spark, sf_dir)
    assign = ivf_assign(spark, sf_dir).select("vec_id", "centroid_id")

    queries = (vecs.filter(F.col("vec_id") < IVF_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q")))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("centroid_id"))
    probes = (queries.crossJoin(F.broadcast(cents))
              .select("query_id", "q", "centroid_id",
                      cosine_col("q", "c").alias("qcos"))
              .withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= IVF_NPROBE)
              .select("query_id", "q", "centroid_id"))

    cand = (probes.join(assign, "centroid_id")
            .filter(F.col("vec_id") != F.col("query_id"))
            .join(vecs, "vec_id")
            .select("query_id", "vec_id",
                    cosine_col("q", "embedding").alias("cos")))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= IVF_K)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "vec_id", F.round("cos", 4).alias("cosine")))
