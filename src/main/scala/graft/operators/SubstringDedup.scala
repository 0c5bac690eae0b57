package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document exact-substring duplicate detection — the k-gram
  * merge formulation of suffix-array training-data dedup (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better"):
  * any word k-gram that occurs more than once in the corpus marks a
  * duplicated window, and the union of overlapping/adjacent duplicated
  * windows per document is a maximal duplicated span.
  *
  * This is exactly the substring criterion the suffix-array approach
  * computes, re-expressed relationally so it shuffles instead of
  * building a global in-memory suffix array (which does not exist at
  * 100 TB):
  *
  *   1. tokenize per row (narrow, no shuffle);
  *   2. one gram per (doc, offset) via posexplode — the gram itself is
  *      immediately collapsed to a 16-hex-char hash prefix so the
  *      exploded relation and the shuffle that follows carry ~24 bytes
  *      per token, never the text;
  *   3. ONE shuffle on the gram key: a whole-partition window count
  *      tags every (doc, offset) with its gram's corpus count in the
  *      same exchange that a count-aggregate would need, where the
  *      agg-then-join-back formulation would shuffle the gram relation
  *      twice and recompute the explode subtree for the probe side;
  *      rows with count < 2 (the overwhelming majority) are dropped
  *      right after;
  *   4. per-doc interval union via one window pass: window starts p₁<p₂
  *      chain into one span iff p₂ − p₁ ≤ k (⇔ [p₂, p₂+k−1] overlaps or
  *      touches the chain's end), so `lag` + running sum give maximal
  *      spans without any interval-merge loop.
  *
  * Hash choice is the caller's: md5-prefix for DuckDB-matchable oracle
  * queries, xxhash64 for the production path (same plan shape; the
  * 64-bit key halves shuffle width). A 16-hex md5 prefix (64 bits) has
  * ~2⁻³² collision mass at a billion distinct grams — collisions only
  * ever ADD a candidate window, and only matter at all if two colliding
  * grams are each singletons, so the span output is robust to them.
  *
  * Reference scope: the reference repo has only whole-row dedup
  * (`exceptAll`, `dropDuplicates` — Capstone notebook cell 17); this
  * operator is part of the LLM-pipeline extension surface alongside
  * MinHash/SimHash/semantic dedup in [[Dedup]] and [[Similarity]].
  */
object SubstringDedup {

  /** Shared tokenizer (identical to the q300 boilerplate family so the
    * gram universe is consistent across text operators). */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z]+"), w => length(w) > 0)

  /** 64-bit md5 prefix of a gram — matches DuckDB's
    * `substring(md5(x), 1, 16)` bit-for-bit (both emit lowercase hex). */
  def md5Gram(gram: Column): Column = substring(md5(gram), 1, 16)

  /** xxhash64 gram key — the production-scale variant (no DuckDB twin). */
  def xxGram(gram: Column): Column = xxhash64(gram)

  /** Maximal duplicated spans per document.
    *
    * Output: (idCol, start_tok, end_tok, span_toks) — token offsets are
    * 0-based inclusive over the [[tokens]] tokenization; span_toks =
    * end − start + 1. Only documents containing at least one duplicated
    * window appear.
    */
  def spans(docs: DataFrame, idCol: String, textCol: String, k: Int,
            gramKey: Column => Column = md5Gram): DataFrame = {
    require(k >= 2, s"substring window k=$k must be >= 2")
    val toked = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
    // (doc, 0-based window offset, gram key); sequence index i IS the
    // offset, so posexplode's position column equals it directly.
    val grams = toked.select(
      col(idCol),
      posexplode(transform(
        sequence(lit(0), size(col("toks")) - k),
        i => gramKey(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
        .as(Seq("pos", "gram")))
    // Corpus-duplicated window starts: total gram occurrences >= 2
    // (counts within-doc repetition too — self-repeated boilerplate is
    // just as duplicated as cross-doc text, matching the suffix-array
    // criterion). A whole-partition window count shuffles the gram
    // relation ONCE, where the groupBy-then-join-back formulation would
    // shuffle it twice and recompute the tokenize/explode subtree for
    // the probe side.
    val hits = grams
      .withColumn("c",
        count(lit(1)).over(Window.partitionBy("gram")))
      .filter(col("c") >= 2)
      .select(col(idCol), col("pos"))
    // Interval union in one window pass (see scaladoc for the p2-p1<=k
    // chaining proof). The closing groupBy keys on (id, run), which the
    // doc-window's hash(id) partitioning already clusters — no third
    // exchange.
    val w = Window.partitionBy(idCol).orderBy("pos")
    hits
      .withColumn("newrun",
        when(col("pos") - lag("pos", 1).over(w) <= k, 0).otherwise(1))
      .withColumn("run", sum("newrun").over(w))
      .groupBy(col(idCol), col("run"))
      .agg(min("pos").as("start_tok"),
           (max("pos") + (k - 1)).as("end_tok"))
      .withColumn("span_toks", col("end_tok") - col("start_tok") + 1)
      .drop("run")
  }

  /** SCRUB the duplicated spans out of each document — the transform
    * half of the Lee et al. pipeline (their dedup DELETES the
    * duplicated substrings rather than dropping whole documents,
    * because most affected docs are mostly unique). Tokens covered by
    * any [[spans]] interval are removed; the remainder re-joins with
    * single spaces. Per-doc span lists are tiny (collect_list of a few
    * (start, end) structs — bounded state per row, not corpus state),
    * and the keep/drop decision is a row-local indexed filter with an
    * interval `exists` probe, so beyond the spans computation itself
    * the scrub adds one small aggregate + one broadcast-sized join.
    * Output: (idCol, n_toks, kept_toks, scrubbed) for EVERY input
    * document (span-free docs pass through untouched). */
  def scrub(docs: DataFrame, idCol: String, textCol: String, k: Int,
            gramKey: Column => Column = md5Gram): DataFrame = {
    val sp = spans(docs, idCol, textCol, k, gramKey)
      .groupBy(idCol)
      .agg(sort_array(collect_list(
        struct(col("start_tok"), col("end_tok")))).as("__sp"))
    val emptySpans =
      array().cast("array<struct<start_tok:int,end_tok:int>>")
    val kept = filter(col("__t"), (t, i) =>
      !exists(col("__sp"), s =>
        i >= s.getField("start_tok") && i <= s.getField("end_tok")))
    docs
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .join(sp, Seq(idCol), "left")
      .withColumn("__sp", coalesce(col("__sp"), emptySpans))
      .select(col(idCol),
        size(col("__t")).as("n_toks"),
        size(kept).as("kept_toks"),
        concat_ws(" ", kept).as("scrubbed"))
  }

  /** Per-document duplicated-mass profile over [[spans]]: span count,
    * duplicated token mass, total tokens, duplicated fraction. Only
    * documents with >= 1 span appear (join back against the tokenized
    * side, which stays narrow). */
  def profile(docs: DataFrame, idCol: String, textCol: String, k: Int,
              gramKey: Column => Column = md5Gram): DataFrame = {
    val nTok = docs.select(col(idCol),
      size(tokens(col(textCol))).as("n_toks"))
    spans(docs, idCol, textCol, k, gramKey)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
           sum("span_toks").as("dup_toks"))
      .join(nTok, idCol)
      .withColumn("dup_frac",
        round(col("dup_toks").cast("double") / col("n_toks"), 6))
  }
}
