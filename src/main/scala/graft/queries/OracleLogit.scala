package graft.queries

/** Shared DuckDB fragments for the quality classifier's default model
  * ([[graft.operators.QualityClassifier.defaultFeatures]] +
  * [[graft.operators.QualityClassifier.DefaultWeights]]) — one source
  * of truth for every oracle that replays the featurize→logit
  * projection (q386, q424, q426, q484), the OracleVec/OracleSketch
  * consolidation discipline: a feature or weight change now breaks all
  * four oracles at once instead of silently drifting one.
  */
object OracleLogit {

  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  /** The feature CTE body over `documents`: exact token / char /
    * stopword / punct / distinct counts as doubles. `selectCols` is the
    * leading pass-through select list (e.g. "doc_id" or
    * "doc_id, source" or "n_chars AS raw_chars"). */
  def featuresSql(selectCols: String): String =
    s"""SELECT $selectCols,
           CAST(len($toksSql) AS DOUBLE) AS n_tok,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(len(list_filter($toksSql,
             t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE) AS n_stop,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
             AS DOUBLE) AS n_punct,
           CAST(len(list_distinct($toksSql)) AS DOUBLE) AS n_distinct
         FROM documents"""

  /** defaultModel's logit z over [[featuresSql]]'s columns — IEEE tree
    * matching QualityClassifier.logitExpr's term order exactly. */
  val zExprSql: String =
    """-1.2 + (n_tok / (n_tok + 50.0)) * 2.4
                + (n_stop / greatest(n_tok, 1.0)) * 6.0
                + (n_punct / greatest(n_chars, 1.0)) * -8.0
                + (n_distinct / greatest(n_tok, 1.0)) * 1.5"""
}
