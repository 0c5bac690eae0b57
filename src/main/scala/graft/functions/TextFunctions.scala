package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, quality ratios, language-ID scoring.
  *
  * Everything composes from codegen'd built-ins (split/regexp/higher-order
  * array functions) — no UDFs, so the whole feature computation stays
  * inside WholeStageCodegen and columns prune to the single `text` read.
  * Each helper has an exact ANSI-SQL twin used by the DuckDB oracles
  * (queries/Text.scala).
  */
object TextFunctions {

  /** Whitespace tokens; trim first so leading blanks don't create an
    * empty head token (matches DuckDB regexp_split_to_array(trim(.))). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Type-token ratio (lexical diversity): distinct / total whitespace
    * tokens as a double — the adaptive quality gate's ranking signal.
    * DuckDB twin: CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks). */
  def typeTokenRatio(c: Column): Column = {
    val t = tokens(c)
    size(array_distinct(t)).cast("double") / size(t)
  }

  /** BPE-ish lexer tokens: letter runs | digit runs | single symbols. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Distinct word n-grams from a pre-split token array. Caller filters
    * size(toks) >= n (sequence() rejects an empty range). */
  def wordShingles(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))

  /** Distinct character n-grams. Caller filters length >= n. */
  def charShingles(c: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), length(c) - lit(n - 1)),
      i => substring(c, i, n)))

  private def substring(c: Column, pos: Column, len: Int): Column =
    c.substr(pos, lit(len))

  /** Characters surviving the class-filter, as a count. */
  def countMatching(c: Column, keepClass: String): Column =
    length(regexp_replace(c, s"[^$keepClass]", ""))

  def punctCount(c: Column): Column = countMatching(c, ".,;:!?")

  def nonSpaceCharCount(c: Column): Column =
    length(regexp_replace(c, "\\s", ""))

  /** How many tokens are in `words` (stopword scoring). */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: the heuristic is the operator under
    * test, not a real langid model. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "y"),
    "fr" -> Seq("le", "les", "et", "une"))

  /** CJK character count (zh marker). */
  def cjkCount(c: Column): Column =
    length(regexp_replace(c, "[^\\u4e00-\\u9fff]", ""))

  /** Predicted language: zh if any CJK chars, else argmax of marker
    * counts with a fixed tie-break order (en > de > es > fr). */
  def predictLang(text: Column): Column = {
    val toks = tokens(lower(text))
    val s    = langMarkers.map { case (l, ws) => l -> stopwordCount(toks, ws) }.toMap
    when(cjkCount(text) > 0, "zh")
      .when(s("en") >= greatest(s("de"), s("es"), s("fr")), "en")
      .when(s("de") >= greatest(s("es"), s("fr")), "de")
      .when(s("es") >= s("fr"), "es")
      .otherwise("fr")
  }

  /** Canonical text normalization for fingerprinting: collapse
    * whitespace, lowercase, trim. */
  def normalize(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Deterministic 128-bit document fingerprint (md5 of normalized
    * text, hex). encode() pins UTF-8 bytes so Spark and DuckDB agree. */
  def fingerprint(c: Column): Column = md5(encode(normalize(c), "UTF-8"))
}
