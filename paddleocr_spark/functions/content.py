"""DOM-heuristic main-content extraction (jusText-style boilerplate strip).

The north rule's extraction triad is "HTML boilerplate strip, PDF/layout
parse, DOM heuristics"; the pipeline covers the first two (``style_strip``,
``pdfcodec``) and this module supplies the third: the published jusText
block-classification algorithm (Pomikalek 2011, "Removing Boilerplate and
Duplicate Content from Web Corpora"; the reference implementation is the
public ``justext`` package, core.py) re-expressed as pure Spark JVM
expressions + window functions. No reference-repo counterpart — this row is
the training-data-pipeline tier, same as the dedup/curation family.

Shape of the query (one pass, hash-gates every stage):

1. **Synthesize** a deterministic HTML page per document from the corpus
   word list (closed-form in ``(did, b, k)`` — nav/aside/footer link farms,
   h1/h2 headings, main ``<p>`` blocks with stopword injection, one ``(c)``
   block per 17 docs). Same twin-generator discipline as ``synth.py``.
2. **Serialize** to one HTML string and **parse it back** with regexes
   (block segmentation by tag, tag strip, anchor-text extraction) — the
   DuckDB twin predicts every feature from the generator formulas WITHOUT
   parsing, so the serialize->parse path itself is hash-gated (the
   ``media_decode`` pattern).
3. **Classify** context-free per block (link density, copyright marker,
   length, stopword density -> bad/short/neargood/good with jusText's
   published defaults), then run the full **context-sensitive revision**:
   short-heading promotion within MAX_HEADING_DISTANCE chars of a good
   block, the short-block neighbour vote (with the neargood-chain arm),
   the neargood pass, and the final bad-heading re-promotion.

The revision in the published algorithm is a sequential per-document loop;
here every pass is a window expression:

* "nearest good/bad neighbour skipping {short, neargood}" is
  ``last/first(CASE WHEN cls IN ('good','bad') ...) IGNORE NULLS`` over
  unbounded preceding/following frames (boundary default 'bad');
* the heading-distance scan ("walk forward summing block lengths until
  > MAX_HEADING_DISTANCE, promote on the first good") collapses to
  ``min(CASE WHEN good THEN cum_prev END) OVER (following) - cum <= D``
  because the cumulative length is monotone, so the nearest following
  good block is the one minimizing the distance;
* the sequential neargood pass collapses to a closed form: within a
  maximal run of neargood blocks between good/bad anchors P and N, the
  first block's outcome (bad iff P==N=='bad', else good) propagates to
  every later member — by induction the whole run gets exactly
  ``CASE WHEN P='bad' AND N='bad' THEN 'bad' ELSE 'good' END`` — which is
  what the window form computes directly. The literal sequential
  transcription is differential-tested against this form in
  ``tests/test_content.py``.

Scale shape: one FileScan (doc_id + text only), synthesis/serialize/parse/
features all HOF + regexp expressions inside whole-stage codegen, ONE hash
exchange on doc_id for the window stack (every window shares the same
partition+order spec), per-doc work bounded by <= 12 blocks. No Python, no
driver state; at 10^12 docs this is scan-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textfns import QUALITY_STOPWORDS, docs_table, words_col

#: jusText published defaults (justext/core.py, classify_paragraphs /
#: revise_paragraph_classification keyword defaults).
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.30
STOPWORDS_HIGH = 0.32
MAX_LINK_DENSITY = 0.2
MAX_HEADING_DISTANCE = 200

#: Stoplist for the stopword-density feature (the corpus is the driver's
#: synthetic English-ish word soup, so the quality-score list is the
#: natural stoplist; injection makes the density arms non-degenerate).
STOPLIST = QUALITY_STOPWORDS

# the (did + k) % 8 injection formula in _TOK assumes exactly 8 stopwords
assert len(STOPLIST) == 8


def _sql_stop_array() -> str:
    return "array(" + ", ".join(f"'{w}'" for w in STOPLIST) + ")"


# ---------------------------------------------------------------------------
# Deterministic HTML synthesis (closed form in (did, b, k); the DuckDB twin
# mirrors these formulas verbatim — keep the two in lockstep)
# ---------------------------------------------------------------------------

#: role(b): evaluated in order; nb = 6 + did % 7 blocks per page.
_ROLE = ("CASE WHEN {b} = 0 THEN 'nav' "
         "WHEN {b} = nb - 1 THEN 'footer' "
         "WHEN (did + {b}) % 5 = 2 THEN 'h' "
         "WHEN (did * 3 + {b}) % 11 = 7 THEN 'aside' "
         "ELSE 'p' END")

#: words per block, by role.
_WN = ("CASE {role} WHEN 'nav' THEN 6 WHEN 'footer' THEN 5 "
       "WHEN 'h' THEN 2 + (did + {b}) % 3 "
       "WHEN 'aside' THEN 4 + (did + {b}) % 4 "
       "ELSE 8 + (did * 7 + {b} * 5) % 56 END")

#: token text at position k (role 'p' gets stopword injection + the one
#: copyright block per did%17==9 page).
_TOK = ("CASE WHEN {role} = 'p' AND did % 17 = 9 AND {b} = 2 AND {k} = 0 "
        "THEN '©2026' "
        "WHEN {role} = 'p' AND (did + {b}) % 2 = 0 AND ({k} + {b}) % 3 = 0 "
        "THEN element_at({stop}, (did + {k}) % 8 + 1) "
        "WHEN {role} = 'p' AND (did + {b}) % 2 = 1 AND ({k} + {b}) % 5 = 0 "
        "THEN element_at({stop}, (did + {k}) % 8 + 1) "
        "ELSE element_at(wl, (did * 13 + {b} * 29 + {k}) % W + 1) END")

#: link flag at position k, by role (headings never carry links).
_LINKED = ("CASE WHEN {role} IN ('nav', 'footer') THEN {k} % 2 = 0 "
           "WHEN {role} = 'aside' THEN {k} % 3 = 0 "
           "WHEN {role} = 'p' THEN (did + 17 * {b} + 3 * {k}) % 37 = 3 "
           "ELSE false END")

_OPEN = ("CASE {role} WHEN 'nav' THEN '<div class=\"nav\">' "
         "WHEN 'aside' THEN '<div class=\"aside\">' "
         "WHEN 'footer' THEN '<footer>' "
         "WHEN 'h' THEN CASE WHEN {b} = 1 THEN '<h1>' ELSE '<h2>' END "
         "ELSE '<p>' END")

_CLOSE = ("CASE {role} WHEN 'nav' THEN '</div>' WHEN 'aside' THEN '</div>' "
          "WHEN 'footer' THEN '</footer>' "
          "WHEN 'h' THEN CASE WHEN {b} = 1 THEN '</h1>' ELSE '</h2>' END "
          "ELSE '</p>' END")


def synth_html_expr() -> str:
    """SQL expression building the page HTML from (did, wl, W, nb).

    NOTE: the word-array column is ``wl``, not ``w`` — Spark resolves
    column names case-insensitively, so a ``w`` array column and the ``W``
    size column would collide (withColumn("W") silently replaces ``w``).

    Nested HOFs: transform over blocks, transform over token positions;
    linked tokens wrap in ``<a href="#{b}_{k}">``; tokens join with a
    single space, blocks concatenate back-to-back.
    """
    role = _ROLE.format(b="b")
    tok = _TOK.format(role=role, b="b", k="k", stop=_sql_stop_array())
    linked = _LINKED.format(role=role, b="b", k="k")
    tok_html = (f"CASE WHEN {linked} THEN concat('<a href=\"#', b, '_', k, "
                f"'\">', {tok}, '</a>') ELSE {tok} END")
    wn = _WN.format(role=role, b="b")
    block = (f"concat({_OPEN.format(role=role, b='b')}, "
             f"array_join(transform(sequence(0, {wn} - 1), "
             f"k -> {tok_html}), ' '), "
             f"{_CLOSE.format(role=role, b='b')})")
    return (f"array_join(transform(sequence(0, nb - 1), b -> {block}), '')")


# ---------------------------------------------------------------------------
# The query: synthesize -> serialize -> parse -> classify -> revise
# ---------------------------------------------------------------------------

# NB: doubled backslash — this string is embedded in a SQL single-quoted
# literal, whose escape pass halves it back to the \1 backreference.
_BLOCK_RE = r"<(p|h1|h2|div|footer)[^>]*>.*?</\\1>"
_ANCHOR_RE = r"<a[^>]*>([^<]*)</a>"


def main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block jusText classification over the synthesized corpus HTML.

    Output: one row per block with the parsed text, the context-free and
    final classes, and the rounded feature densities; ``kept`` marks the
    main-content selection (final class 'good').
    """
    from ..pipeline import ensure_input_parallelism

    # Widen BEFORE the synth/regex projections: the HTML serialize +
    # block regex-parse are per-char work attached to the scan stage,
    # and the sf corpus arrives as ONE file/task (the utf8-chain lesson,
    # PERF.md). At production scale the scan is already wide → no-op.
    base = (ensure_input_parallelism(docs_table(spark, sf_dir))
            .select("doc_id",
                    F.col("doc_id").cast("int").alias("did"),
                    words_col().alias("wl"))
            .withColumn("W", F.size("wl"))
            .where(F.col("W") >= 1)
            .withColumn("nb", F.expr("6 + did % 7")))

    html = base.select("doc_id", F.expr(synth_html_expr()).alias("html"))

    # Parse the serialized page back: block segmentation + tag strip +
    # anchor-text extraction (regex-only; never peeks at the generator).
    blocks = (html
              .select("doc_id",
                      F.posexplode(F.expr(
                          f"regexp_extract_all(html, '{_BLOCK_RE}', 0)"))
                      .alias("block_idx", "raw")))
    feat = (blocks
            .withColumn("tag", F.expr(
                "regexp_extract(raw, '^<([a-z0-9]+)', 1)"))
            .withColumn("inner", F.expr(
                "regexp_replace(regexp_replace(raw, '^<[^>]*>', ''), "
                "'</[^>]*>$', '')"))
            .withColumn("text", F.expr(
                "regexp_replace(inner, '<[^>]*>', '')"))
            .withColumn("len_text", F.length("text"))
            .withColumn("link_chars", F.expr(
                f"aggregate(regexp_extract_all(inner, '{_ANCHOR_RE}', 1), "
                f"0, (a, x) -> a + length(x))"))
            .withColumn("wlist", F.expr(
                "filter(split(text, ' '), x -> x != '')"))
            .withColumn("n_words", F.size("wlist"))
            .withColumn("stop_n", F.expr(
                f"size(filter(wlist, x -> "
                f"array_contains({_sql_stop_array()}, x)))"))
            .withColumn("heading", F.col("tag").isin("h1", "h2"))
            .drop("raw", "inner", "wlist"))

    link_d = F.col("link_chars") / F.col("len_text")
    stop_d = F.col("stop_n") / F.col("n_words")
    cf = (F.when(link_d > MAX_LINK_DENSITY, "bad")
          .when(F.col("text").contains("©")
                | F.col("text").contains("&copy"), "bad")
          .when(F.col("len_text") < LENGTH_LOW,
                F.when(F.col("link_chars") > 0, "bad").otherwise("short"))
          .when(stop_d >= STOPWORDS_HIGH,
                F.when(F.col("len_text") > LENGTH_HIGH, "good")
                .otherwise("neargood"))
          .when(stop_d >= STOPWORDS_LOW, "neargood")
          .otherwise("bad"))
    feat = feat.withColumn("cf", cf)

    w = Window.partitionBy("doc_id").orderBy("block_idx")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    w_next = w.rowsBetween(1, Window.unboundedFollowing)

    def prev_in(cls_col, vals):
        return F.coalesce(
            F.last(F.when(F.col(cls_col).isin(*vals), F.col(cls_col)),
                   ignorenulls=True).over(w_prev), F.lit("bad"))

    def next_in(cls_col, vals):
        return F.coalesce(
            F.first(F.when(F.col(cls_col).isin(*vals), F.col(cls_col)),
                    ignorenulls=True).over(w_next), F.lit("bad"))

    # cumulative length: cum[i] = sum(len_text[0..i]); the scan distance
    # from heading i to candidate j is cum[j-1] - cum[i].
    s1 = (feat
          .withColumn("cum", F.sum("len_text").over(
              w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("cum_prev", F.col("cum") - F.col("len_text")))

    # step 2 — good headings: short heading -> neargood when a cf-good
    # block lies within MAX_HEADING_DISTANCE chars ahead.
    s2 = (s1
          .withColumn("ng_cum0", F.min(
              F.when(F.col("cf") == "good", F.col("cum_prev"))).over(w_next))
          .withColumn("cls1", F.when(
              F.col("heading") & (F.col("cf") == "short")
              & (F.col("ng_cum0") - F.col("cum") <= MAX_HEADING_DISTANCE),
              "neargood").otherwise(F.col("cf"))))

    # step 3 — short revision (snapshot semantics: every neighbour scan
    # reads cls1, never the pass's own output).
    s3 = (s2
          .withColumn("p_ign", prev_in("cls1", ["good", "bad"]))
          .withColumn("n_ign", next_in("cls1", ["good", "bad"]))
          .withColumn("p_ng", prev_in("cls1", ["good", "bad", "neargood"]))
          .withColumn("n_ng", next_in("cls1", ["good", "bad", "neargood"])))
    s3 = s3.withColumn("cls2", F.when(F.col("cls1") != "short", F.col("cls1"))
                       .otherwise(
        F.when((F.col("p_ign") == "good") & (F.col("n_ign") == "good"),
               "good")
        .when((F.col("p_ign") == "bad") & (F.col("n_ign") == "bad"), "bad")
        .when(((F.col("p_ign") == "bad") & (F.col("p_ng") == "neargood"))
              | ((F.col("n_ign") == "bad") & (F.col("n_ng") == "neargood")),
              "good")
        .otherwise("bad")))

    # step 4 — neargood pass (closed form of the sequential loop; proof in
    # the module docstring, differential in tests/test_content.py).
    s4 = (s3
          .withColumn("p2", prev_in("cls2", ["good", "bad"]))
          .withColumn("n2", next_in("cls2", ["good", "bad"])))
    s4 = s4.withColumn("cls3", F.when(
        F.col("cls2") == "neargood",
        F.when((F.col("p2") == "bad") & (F.col("n2") == "bad"), "bad")
        .otherwise("good")).otherwise(F.col("cls2")))

    # step 5 — more good headings: revision-demoted heading -> good when a
    # (post-revision) good block lies within the distance budget ahead.
    s5 = (s4
          .withColumn("ng_cum3", F.min(
              F.when(F.col("cls3") == "good", F.col("cum_prev"))).over(w_next))
          .withColumn("final", F.when(
              F.col("heading") & (F.col("cls3") == "bad")
              & (F.col("cf") != "bad")
              & (F.col("ng_cum3") - F.col("cum") <= MAX_HEADING_DISTANCE),
              "good").otherwise(F.col("cls3"))))

    return s5.select(
        "doc_id",
        F.col("block_idx").cast("bigint").alias("block_idx"),
        "tag", "text",
        F.col("cf").alias("cf_class"),
        F.col("final").alias("final_class"),
        (F.col("final") == "good").alias("kept"),
        F.col("len_text").cast("bigint").alias("len_text"),
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round(link_d, 4).alias("link_density"),
        F.round(stop_d, 4).alias("stop_density"))
