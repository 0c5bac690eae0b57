package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram language identification — the real langid model
  * TextFunctions.predictLang's scaladoc admits it is not (that one is
  * a stopword-density test; this is the fastText/langid.py shape: a
  * literal-weight linear model over character n-gram counts).
  *
  * Model = per language, a handful of (trigram, integer weight)
  * literals. Score(lang) = Σ_t w_t · occurrences(t, text) where the
  * occurrence count is the classic replace trick
  * length(s) − length(replace(s, t, '')) — an exact integer multiple
  * of 3 left undivided (every pattern is exactly 3 chars, so the
  * common factor cannot change any argmax). Prediction = argmax with
  * ties broken toward the alphabetically earlier language, "und" when
  * every score is zero (ISO 639-3 for undetermined).
  *
  * Spark shape: the model is driver-side literals inlined into ONE
  * codegen projection (replace/length are codegen'd built-ins) — zero
  * shuffles, zero joins, zero UDFs, exactly the QualityClassifier
  * discipline; scores are pure Long arithmetic so the argmax is
  * float-free and the DuckDB oracle reproduces it bit-for-bit.
  *
  * Text is normalized first (lowercase, collapsed whitespace) and
  * padded with one leading/trailing space so word-boundary trigrams
  * like " th" / "le " fire at line edges too.
  *
  * Reference scope: the reference has no text classification at all;
  * extension surface next to QualityClassifier (SURVEY.md §2.9).
  */
object LangId {

  /** Default model: discriminative function-word trigrams per
    * language, weights hand-set to favor precision on the planted
    * fixtures (a real deployment fits them offline; the plan shape
    * does not change). All patterns are EXACTLY 3 characters. */
  val defaultModel: Seq[(String, Seq[(String, Long)])] = Seq(
    "de" -> Seq("der" -> 4L, "ein" -> 3L, "sch" -> 4L, "ich" -> 4L,
                "und" -> 5L, "die" -> 4L, " zu" -> 3L, "en " -> 2L),
    "en" -> Seq("the" -> 5L, " th" -> 3L, "ing" -> 4L, "and" -> 4L,
                " of" -> 4L, "ion" -> 3L, " to" -> 3L, " is" -> 3L),
    "es" -> Seq(" el" -> 4L, "los" -> 4L, "que" -> 4L, "ado" -> 3L,
                " la" -> 3L, "ión" -> 4L, " es" -> 3L, " un" -> 2L),
    "fr" -> Seq("les" -> 4L, " le" -> 3L, "eau" -> 4L, "ent" -> 3L,
                "une" -> 4L, " et" -> 4L, "ais" -> 3L, " la" -> 3L))

  /** Lowercased, whitespace-collapsed, space-padded match surface. */
  def surface(text: Column): Column =
    concat(lit(" "), lower(trim(regexp_replace(text, "\\s+", " "))), lit(" "))

  /** Occurrences of a literal 3-char pattern, times 3 (undivided).
    * Literal `replace` built-in — no regex engine in the per-row loop. */
  private def occ3(s: Column, pattern: String): Column =
    (length(s) - length(replace(s, lit(pattern), lit("")))).cast("long")

  /** Integer score for one language over a pre-normalized surface. */
  def scoreExpr(s: Column, terms: Seq[(String, Long)]): Column =
    terms.map { case (t, w) => occ3(s, t) * lit(w) }
      .reduce(_ + _)

  /** Predicted language over a pre-normalized surface: argmax score,
    * ties to the alphabetically earlier language (the model Seq must
    * be sorted by language), "und" when all scores are zero. */
  def predictExpr(scores: Seq[(String, Column)]): Column = {
    val zero = scores.map(_._2).reduce(greatest(_, _)) <= 0
    val argmax = scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), rest) =>
        val later = scores.drop(i + 1).map(_._2)
        if (later.isEmpty) rest
        else when(s >= later.reduce(greatest(_, _)), lang).otherwise(rest)
    }
    when(zero, "und").otherwise(argmax)
  }

  /** Score + classify every document: adds score_<lang> columns (Long)
    * and pred_lang. One codegen projection, zero shuffles. */
  def classify(docs: DataFrame, textCol: String,
               model: Seq[(String, Seq[(String, Long)])] = defaultModel)
      : DataFrame = {
    require(model.forall(_._2.forall(_._1.length == 3)),
      "every LangId pattern must be exactly 3 characters (undivided x3 " +
        "counts cancel in the argmax only at a single shared length)")
    val sorted = model.sortBy(_._1)
    val s = surface(col(textCol))
    val scored = sorted.foldLeft(docs) { case (df, (lang, terms)) =>
      df.withColumn(s"score_$lang", scoreExpr(s, terms))
    }
    scored.withColumn("pred_lang",
      predictExpr(sorted.map { case (lang, _) => lang -> col(s"score_$lang") }))
  }

  /** MIXED-LANGUAGE SEGMENTATION: per-chunk language with run-length
    * merge — the mC4 page-level-vs-span-level langid question made an
    * operator. [[Chunker]] cuts each document into non-overlapping
    * `chunkTokens`-token windows, every chunk classifies independently
    * (the same one-projection model as [[classify]]), and maximal runs
    * of consecutive same-language chunks merge into spans (lag →
    * boundary flag → running sum, one per-document window pass — a
    * document is bounded, so the window partition is too).
    *
    * Output: (id, span_idx, span_lang, start_chunk, start_tok,
    * n_chunks, n_tokens) — one row per span, span_idx 0-based in
    * chunk order. A monolingual document comes back as one span; the
    * integer scores keep the whole thing engine-exact. */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int,
            model: Seq[(String, Seq[(String, Long)])] = defaultModel)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = classify(
      Chunker.chunk(docs, idCol, textCol, chunkTokens, overlap = 0),
      "chunk_text", model)
    val w = Window.partitionBy(col(idCol)).orderBy(col("chunk_idx"))
    chunks
      .withColumn("__prev", lag(col("pred_lang"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__prev") =!= col("pred_lang"), 1L)
          .otherwise(0L))
      .withColumn("span_idx",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .groupBy(col(idCol), col("span_idx"))
      .agg(min(col("pred_lang")).as("span_lang"),
        min(col("chunk_idx")).cast("long").as("start_chunk"),
        min(col("start_tok")).cast("long").as("start_tok"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"))
  }
}
