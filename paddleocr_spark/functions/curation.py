"""Corpus-curation operators: decontamination, importance weighting,
and deterministic shard packing.

Three more moves a training-data pipeline makes between "raw corpus" and
"training shards":

* :func:`decontaminate` — benchmark n-gram decontamination (the
  GPT-3/PaLM-style 13-gram overlap check, here at the corpus's 8-gram
  shingle width): every training document is scored by the fraction of
  its word n-grams that also appear in a held-out evaluation split, and
  flagged when the overlap crosses a threshold. On this corpus the
  flagged set is exactly the planted near-duplicates that straddle the
  train/eval split — which is precisely the leak the op exists to catch.
* :func:`dsir_weights` — hashed-unigram importance weights in the style
  of DSIR (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): per-document mean log-likelihood ratio
  between a target distribution (here the ``zh``-labeled subset) and
  the raw-corpus distribution, both add-one smoothed over the raw
  vocabulary. Downstream sampling keeps documents proportional to the
  exponentiated weight; we emit the per-doc log ratio.
* :func:`pack_shards` — deterministic token-budget shard packing: within
  each source, documents are laid out in doc_id order and cut into
  shards of ``SHARD_BUDGET_WORDS`` words by their starting offset (the
  "write the corpus as ~equal-token shards" step before tokenization).

All pure JVM expressions. Scale shapes:

* decontaminate: shingles travel as md5 digests (16-byte keys, never the
  raw gram text); the eval-gram table is the product of a distinct over
  the (small) eval split and joins the train grams on the digest — a
  plain equi-join that co-partitions, with map-side-combinable counts on
  both sides. At 10^12 docs the eval-gram digest set is a build-once
  artifact (like the dedup band table).
* dsir: the "model" is two unigram hash-aggregations over one exploded
  pass; the per-word log-ratio table is vocabulary-sized and rides a
  broadcast into the scoring join; the per-doc mean is one hash agg.
* pack_shards: one cumulative-sum window per source partition — the
  shuffle carries (source) keys only, and at web scale the source is
  the natural write-partition so the window never crosses machines.

DuckDB twins live in ``entry_queries.py``; column names and 4dp rounding
are part of the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .retrieval import _doc_words
from .textfns import docs_table

#: Decontamination shingle width (words), the deterministic eval-split
#: rate (md5-threshold, '40000000'/2^32 = exactly 25%), and the overlap
#: fraction at which a training document is flagged as contaminated.
DECON_N = 8
DECON_SPLIT_HEX = "40000000"
DECON_FLAG_FRAC = 0.5

#: DSIR target facet: documents whose lang equals this value form the
#: target distribution.
DSIR_TARGET_LANG = "zh"

#: Shard packing budget in whitespace words.
SHARD_BUDGET_WORDS = 256


def _with_eval_split(d: DataFrame) -> DataFrame:
    """Tag each doc with its deterministic train/eval split membership."""
    return d.withColumn(
        "is_eval",
        F.expr(f"substr(md5(concat('decon|', cast(doc_id as string))), "
               f"1, 8) < '{DECON_SPLIT_HEX}'"))


def decontaminate(spark: SparkSession, sf_dir: str,
                  n: int = DECON_N) -> DataFrame:
    """Benchmark-overlap decontamination over the deterministic split.

    A training document's *contaminated* gram positions are those whose
    word n-gram also occurs anywhere in the eval split. Emits every
    train-split document with its gram count, contaminated count, 4dp
    contaminated fraction, and the drop flag at ``DECON_FLAG_FRAC``.
    Documents shorter than n words carry zero grams and are never
    flagged (nothing to leak at this shingle width).
    """
    d = _with_eval_split(_doc_words(spark, sf_dir))
    grams = (d.where(F.expr(f"size(w) >= {n}"))
             .select("doc_id", "is_eval", F.explode(F.expr(
                 f"transform(sequence(1, size(w) - {n - 1}), "
                 f"i -> md5(concat_ws(' ', slice(w, i, {n}))))"
             )).alias("gkey")))
    eval_grams = (grams.where("is_eval").select("gkey").distinct())
    contam = (grams.where(~F.col("is_eval"))
              .join(eval_grams, "gkey", "left_semi")
              .groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_contam")))
    totals = (d.where(~F.col("is_eval")).select(
        "doc_id",
        F.greatest(F.expr(f"size(w) - {n - 1}"), F.lit(0))
        .cast("long").alias("n_grams")))
    out = (totals.join(contam, "doc_id", "left")
           .select("doc_id", "n_grams",
                   F.coalesce("n_contam", F.lit(0))
                   .cast("long").alias("n_contam")))
    frac = F.when(F.col("n_grams") > 0,
                  F.col("n_contam").cast("double")
                  / F.col("n_grams").cast("double")).otherwise(0.0)
    return out.select(
        "doc_id", "n_grams", "n_contam",
        F.round(frac, 4).alias("contam_frac"),
        (frac >= DECON_FLAG_FRAC).alias("flagged"))


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR-style importance log-ratio.

    With target counts c_t over the ``DSIR_TARGET_LANG`` subset and raw
    counts c_r over the whole corpus, both add-one smoothed over the raw
    vocabulary V:

        weight(d) = (1/|d|) Σ_{w∈d} ln( (c_t(w)+1)/(n_t+V)
                                      / ((c_r(w)+1)/(n_r+V)) )

    Every document is scored (target docs too — resampling draws from
    the whole corpus). Empty documents carry weight 0.0.
    """
    d = docs_table(spark, sf_dir).select(
        "doc_id", "lang",
        F.expr("filter(split(lower(text), ' '), w -> w != '')").alias("w"))
    tok = d.select("doc_id", "lang", F.explode("w").alias("v"))
    raw = tok.groupBy("v").agg(F.count("*").cast("double").alias("cr"))
    tgt = (tok.where(F.col("lang") == DSIR_TARGET_LANG)
           .groupBy("v").agg(F.count("*").cast("double").alias("ct")))
    stats = raw.agg(
        F.count("*").cast("double").alias("vsize"),
        F.sum("cr").alias("nr"))
    tstats = tgt.agg(F.coalesce(F.sum("ct"), F.lit(0.0)).alias("nt"))
    ratios = (raw.join(tgt, "v", "left")
              .join(F.broadcast(stats))
              .join(F.broadcast(tstats))
              .select("v", (
                  F.log((F.coalesce("ct", F.lit(0.0)) + 1.0)
                        / (F.col("nt") + F.col("vsize")))
                  - F.log((F.col("cr") + 1.0)
                          / (F.col("nr") + F.col("vsize"))))
                  .alias("lr")))
    per_doc = (tok.join(F.broadcast(ratios), "v")
               .groupBy("doc_id")
               .agg(F.round(F.avg("lr"), 4).alias("dsir_logratio"),
                    F.count("*").cast("long").alias("n_words")))
    return (d.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("dsir_logratio", F.lit(0.0))
                    .alias("dsir_logratio"),
                    F.coalesce("n_words", F.lit(0))
                    .cast("long").alias("n_words")))


def adaptive_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive quality filtering (decile-threshold form).

    A fixed global quality cutoff over-filters whichever language the
    heuristics are worst calibrated for, so curation pipelines set the
    cutoff PER FACET: here each language keeps documents scoring at or
    above its own 10th-percentile quality. The threshold is an exact
    order statistic — the value at integer rank ceil(n/10) under the
    total order (quality, doc_id) — computed with pure integer
    arithmetic (``(n + 9) DIV 10``), so there are no interpolation
    semantics to disagree about across engines.

    Emits every document with its language, 4dp quality, the language's
    threshold, and the keep decision.

    Scale shape: one row_number window partitioned by lang (the natural
    facet partition; an exact per-facet order statistic requires a
    per-facet sort — at 10^12 docs you'd swap in a mergeable quantile
    sketch and accept approximation, which this exact form degrades to
    gracefully since only the threshold row changes); the per-lang
    threshold table is facet-sized and broadcasts back into the
    per-doc decision join.
    """
    from .textfns import quality_score

    qs = quality_score(spark, sf_dir).select("doc_id", "quality")
    d = (docs_table(spark, sf_dir).select("doc_id", "lang")
         .join(qs, "doc_id"))
    win = Window.partitionBy("lang").orderBy("quality", "doc_id")
    ranked = (d.withColumn("rk", F.row_number().over(win))
              .withColumn("n_docs",
                          F.count("*").over(Window.partitionBy("lang"))))
    thr = (ranked.where(F.expr("rk = (n_docs + 9) DIV 10"))
           .select("lang", F.col("quality").alias("lang_p10")))
    return (d.join(F.broadcast(thr), "lang")
            .select("doc_id", "lang", "quality", "lang_p10",
                    (F.col("quality") >= F.col("lang_p10")).alias("kept")))


def pack_shards(spark: SparkSession, sf_dir: str,
                budget: int = SHARD_BUDGET_WORDS) -> DataFrame:
    """Deterministic per-source token-budget shard assignment.

    Documents are laid out in doc_id order within each source; a doc's
    shard is its starting word offset divided by the budget (so a shard
    may overhang its budget by at most one document — the standard
    sequential-packing contract). Emits the shard id, the doc's starting
    offset within its shard, and its word count.
    """
    d = docs_table(spark, sf_dir).select(
        "doc_id", "source",
        F.expr("size(filter(split(lower(text), ' '), w -> w != ''))")
        .cast("long").alias("n_words"))
    win = (Window.partitionBy("source").orderBy("doc_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = d.withColumn("cum", F.sum("n_words").over(win))
    start = F.col("cum") - F.col("n_words")
    return cum.select(
        "doc_id", "source", "n_words",
        F.floor(start / budget).cast("long").alias("shard_id"),
        (start % budget).cast("long").alias("shard_offset"))
