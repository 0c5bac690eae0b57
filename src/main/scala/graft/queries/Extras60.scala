package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.QualityClassifier

/** Round-8 pack, part 3: model-based quality filtering (q386) — the
  * learned-classifier gate next to q22's rule stack.
  */
object Extras60 extends QueryPack {

  // exact mirror of TextFunctions.tokens (q22's oracle precedent —
  // no empty-filter: split of trimmed text never yields one)
  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  // --------------------------------------------------------------- q386
  /** fastText-style quality scoring: a literal-weight linear model over
    * exact count-ratio features (saturating length, stopword density,
    * punctuation share, lexical diversity) with a sigmoid gate —
    * featurize→dot→sigmoid is ONE row-local codegen projection, zero
    * shuffles at any corpus scale (the model is bytes of driver
    * state). The oracle rebuilds the identical features and weight
    * sum in the same term order, so scores match through round(6). */
  private def q386(s: SparkSession, dir: String): DataFrame =
    QualityClassifier.filter(Tables(s, dir)("documents"), "text")
      .select(col("doc_id"),
        round(col("quality_score"), 6).as("quality_score"), col("kept"))
      .orderBy("doc_id")

  private val q386Sql =
    s"""WITH f AS (
         SELECT doc_id,
           CAST(len($toksSql) AS DOUBLE) AS n_tok,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(len(list_filter($toksSql,
             t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE) AS n_stop,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
             AS DOUBLE) AS n_punct,
           CAST(len(list_distinct($toksSql)) AS DOUBLE) AS n_distinct
         FROM documents),
       z AS (
         SELECT doc_id,
           -1.2 + (n_tok / (n_tok + 50.0)) * 2.4
                + (n_stop / greatest(n_tok, 1.0)) * 6.0
                + (n_punct / greatest(n_chars, 1.0)) * -8.0
                + (n_distinct / greatest(n_tok, 1.0)) * 1.5 AS z
         FROM f)
       SELECT doc_id,
              round(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
              CAST(CASE WHEN 1.0 / (1.0 + exp(-z)) >= 0.5
                   THEN 1 ELSE 0 END AS INT) AS kept
       FROM z ORDER BY doc_id"""

  override def queries: Map[String, QueryFn] = Map(
    "q386_quality_model" -> q386 _)

  override def oracles: Map[String, String] = Map(
    "q386_quality_model" -> q386Sql)
}
