"""Deterministic cardinality sketches (HyperLogLog).

At 10^12 documents, exact ``count_distinct`` over high-cardinality keys
(vocabulary, shingles, media refs) is its own shuffle-heavy job; the
production answer is a mergeable sketch. Spark ships HLL++ inside
``approx_count_distinct``, but its register layout is engine-internal —
useless for a cross-engine oracle. This module implements the published
HyperLogLog estimator (Flajolet, Fusy, Gandouet, Meunier 2007) from
scratch with a DETERMINISTIC, engine-neutral register construction, so
the DuckDB twin computes the IDENTICAL registers and the gate hashes the
estimate itself:

* item hash = the top 15 hex digits of md5 (a 60-bit integer both
  engines derive with the same string ops — the bloom-filter trick);
* bucket = top ``HLL_P`` bits, rho = leading-zero count of the low
  ``60 - HLL_P`` bits + 1, computed with an integer-only bit-length
  CASE ladder (no float log2 — its ulp behavior near powers of two is
  not portable across engines);
* registers = ``max(rho)`` per (group, bucket) — one map-side-combinable
  aggregate; merging shards is register-wise max, the property that
  makes the sketch an artifact like the dedup band table;
* estimate = alpha_m * m^2 / sum(2^-M_j) with the small-range
  linear-counting correction (E <= 2.5m and V > 0 -> m * ln(m/V));
  the 64-bit-hash convention drops the large-range correction.

The gate query sketches the per-language distinct 3-shingle count and
emits the exact count next to it, so the oracle pins BOTH the register
pipeline and the published estimator's accuracy (rel_err column).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textfns import docs_table

#: Register-index bits: m = 2^p registers per group.
HLL_P = 12
HLL_M = 1 << HLL_P
#: Bits in the md5-derived item hash (15 hex digits).
HLL_HASH_BITS = 60
#: alpha_m for m >= 128 (the published constant).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

_LOW_BITS = HLL_HASH_BITS - HLL_P


def _hash60_sql(expr: str) -> str:
    """60-bit integer from md5's top 15 hex digits (engine-neutral:
    ``conv`` on Spark, the same digit-by-digit fold on DuckDB — here the
    Spark spelling)."""
    return f"conv(substring(md5({expr}), 1, 15), 16, 10)"


def _bitlen_case(expr: str, bits: int) -> str:
    """Integer-only bit_length ladder: largest k with 2^(k-1) <= x,
    0 for x = 0. Pure comparisons — bit-identical on any engine."""
    arms = " ".join(
        f"WHEN {expr} >= {1 << (k - 1)} THEN {k}"
        for k in range(bits, 0, -1))
    return f"CASE {arms} ELSE 0 END"


def hll_register_exprs() -> tuple[str, str]:
    """(bucket, rho) SQL expressions over a 60-bit hash column ``h``."""
    bucket = f"CAST(h DIV {1 << _LOW_BITS} AS INT)"
    low = f"(h % {1 << _LOW_BITS})"
    rho = f"({_LOW_BITS} + 1 - {_bitlen_case(low, _LOW_BITS)})"
    return bucket, rho


def hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct 3-shingle cardinality: HLL estimate next to
    the exact count (rel_err pins the published estimator's accuracy).

    Scale shape: ONE exploded shingle pass; the sketch is a (lang,
    bucket) max-aggregate (map-side combinable, 4096 rows per group —
    mergeable register-wise, the artifact shape); the estimate folds the
    registers with one more tiny aggregate. The exact branch (for the
    oracle's rel_err) is the expensive count_distinct the sketch
    replaces at 10^12 — at production scale you ship ONLY the register
    table.
    """
    d = docs_table(spark, sf_dir).select(
        "doc_id", "lang",
        F.expr("filter(split(lower(text), ' '), w -> w != '')").alias("w"))
    sh = (d.where(F.expr("size(w) >= 3"))
          .select("lang", F.explode(F.expr(
              "transform(sequence(1, size(w) - 2), "
              "i -> concat_ws(' ', slice(w, i, 3)))")).alias("g")))
    hashed = sh.select(
        "lang", "g", F.expr(f"CAST({_hash60_sql('g')} AS LONG)").alias("h"))
    bucket, rho = hll_register_exprs()
    regs = (hashed
            .select("lang", F.expr(bucket).alias("b"),
                    F.expr(rho).alias("r"))
            .groupBy("lang", "b").agg(F.max("r").alias("m_j")))
    # 2^-m_j summed as INTEGER multiples of 2^-(LOW_BITS+1): exact and
    # aggregation-order-independent, so both engines fold the registers
    # to the identical double regardless of row order (a float power()
    # sum would round once magnitudes spread past 53 bits).
    top = _LOW_BITS + 1                                # max rho
    folded = (regs.groupBy("lang").agg(
        F.count("*").alias("nonzero"),
        F.sum(F.expr(f"shiftleft(1L, {top} - m_j)")).alias("s_int")))
    m = float(HLL_M)
    s = (F.col("s_int") / F.lit(float(1 << top))
         + (F.lit(m) - F.col("nonzero")))              # empty regs add 2^0
    raw = F.lit(HLL_ALPHA * m * m) / s
    v = F.lit(m) - F.col("nonzero")                    # zero registers
    est = F.when((raw <= 2.5 * m) & (v > 0),
                 F.lit(m) * F.log(F.lit(m) / v)).otherwise(raw)
    exact = (sh.groupBy("lang")
             .agg(F.count_distinct("g").cast("long").alias("exact")))
    return (folded.join(exact, "lang")
            .select("lang",
                    F.col("exact"),
                    F.round(est, 4).alias("hll_estimate"),
                    F.round(F.abs(est - F.col("exact"))
                            / F.col("exact"), 4).alias("rel_err"))
            .orderBy("lang"))


def hll_error_bound() -> float:
    """The published standard error for m registers: 1.04 / sqrt(m)."""
    return 1.04 / math.sqrt(HLL_M)
