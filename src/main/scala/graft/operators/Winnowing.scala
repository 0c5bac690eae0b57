package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): slide a window of `w`
  * consecutive k-gram hashes over each document and keep the MINIMUM
  * hash of every window (rightmost position on ties). The selected
  * set is a position-aware fingerprint sketch with the winnowing
  * guarantee: any shared token run of length >= w + k − 1 between two
  * documents contains a full window in both, so both select that
  * window's minimum — the shared hash value is guaranteed to appear
  * in both fingerprint sets. Density is bounded: selections per
  * window never exceed 1, and the expected density is 2/(w+1).
  *
  * 100 TB shape: everything here is per-row array math inside one
  * codegen'd projection — tokenize, gram-hash, window-min, distinct —
  * with ZERO shuffles; the corpus never rides an exchange. Cross-doc
  * matching on the emitted fingerprints is a plain equi-join on
  * 32-bit hash keys, the same banded-candidate shape as the MinHash
  * path (and [[Dedup.dropHotBuckets]] applies verbatim if a
  * fingerprint goes viral).
  *
  * Tie-break construction: each gram's 32-bit md5 hash h at 1-based
  * position i is packed as c = h·2³¹ + (2³¹ − i). `min` over packed
  * keys picks the smallest hash and, among equal hashes, the LARGEST
  * position — the standard "rightmost min" winnowing rule — in one
  * comparison; h = c >> 31 recovers the hash. Positions must stay
  * below 2³¹ (a 2-billion-token document; far past any real row).
  *
  * The md5 family keeps every value DuckDB-replayable
  * (`('0x' || substr(md5(g),1,8))::BIGINT`, q396's oracle); swap
  * [[gramKey]] for an xxhash64 variant for production runs where no
  * oracle twin is needed.
  *
  * Reference scope: the reference repo has whole-row dedup only
  * (Capstone notebook cell 17); winnowing is part of the extension
  * surface next to [[SubstringDedup]] (which catches the same >= k
  * exact substrings exhaustively — winnowing trades that exhaustive
  * recall for a ~2/(w+1)-density sketch you can store per document).
  */
object Winnowing {

  /** 2³¹ — the pack base for (hash, position). */
  val Shift: Long = 2147483648L

  /** 32-bit md5 gram hash (first 8 hex chars) — DuckDB-replayable. */
  def gramKey(gram: Column): Column =
    conv(substring(md5(encode(gram, "UTF-8")), 1, 8), 16, 10).cast("long")

  /** Per-document packed winnowing selections.
    *
    * Output: (idCol, n_grams, sel) where `sel` is the distinct packed
    * (hash, position) selections in first-window order. Documents with
    * fewer than k + w − 1 tokens (no complete window) are dropped.
    */
  def selections(docs: DataFrame, idCol: String, textCol: String,
                 k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowing needs k>=1, w>=1; got k=$k w=$w")
    val packed = docs
      .select(col(idCol), SubstringDedup.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k + w - 1)
      .select(col(idCol),
        transform(sequence(lit(1), size(col("toks")) - (k - 1)), i =>
          gramKey(concat_ws(" ", slice(col("toks"), i, lit(k)))) * Shift +
            (lit(Shift) - i)).as("c"))
    packed.select(col(idCol), size(col("c")).as("n_grams"),
      array_distinct(
        transform(sequence(lit(1), size(col("c")) - (w - 1)), j =>
          array_min(slice(col("c"), j, lit(w))))).as("sel"))
  }

  /** Distinct fingerprint HASHES per document (position stripped) —
    * the join key set for cross-document matching. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, w: Int): DataFrame =
    selections(docs, idCol, textCol, k, w)
      .select(col(idCol),
        explode(array_distinct(
          transform(col("sel"), c => shiftright(c, 31)))).as("fp"))

  /** Per-document winnowing profile (q396): gram/window/selection
    * counts, selection density vs the 2/(w+1) expectation, and the
    * fingerprint-set extrema that pin values for the oracle. */
  def profile(docs: DataFrame, idCol: String, textCol: String,
              k: Int, w: Int): DataFrame =
    selections(docs, idCol, textCol, k, w)
      .select(col(idCol),
        col("n_grams").cast("long").as("n_grams"),
        (col("n_grams") - (w - 1)).cast("long").as("n_windows"),
        size(col("sel")).cast("long").as("n_selected"),
        array_distinct(transform(col("sel"), c => shiftright(c, 31)))
          .as("fps"))
      .select(col(idCol), col("n_grams"), col("n_windows"),
        col("n_selected"),
        size(col("fps")).cast("long").as("n_fp"),
        round(col("n_selected").cast("double") / col("n_windows"), 6)
          .as("sel_density"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
}
