package graft.queries

/** Shared DuckDB oracle fragments for the [[graft.operators.LangId]]
  * family — the normalized match surface, the literal-replace trigram
  * score, and the sorted-argmax CASE — so the langid-composed oracles
  * (q445/q446/q449/q452) share one source of truth instead of four
  * drifting copies (the OracleVec / OracleLouvain consolidation
  * discipline).
  */
private[queries] object OracleLangId {

  import graft.operators.LangId

  /** LangId.surface over an arbitrary text expression. */
  def surfaceSql(textExpr: String): String =
    s"' ' || lower(trim(regexp_replace($textExpr, '\\s+', ' ', 'g'))) || ' '"

  /** One language's integer score over a pre-normalized surface
    * column `s`: Σ w·(len(s) − len(replace(s, t, ''))) — the same
    * undivided ×3 counts as LangId.scoreExpr. */
  def scoreSql(terms: Seq[(String, Long)], s: String = "s"): String =
    terms.map { case (t, w) =>
      val q = t.replace("'", "''")
      s"$w * (length($s) - length(replace($s, '$q', '')))"
    }.mkString(" + ")

  /** Select-list fragment `<score> AS score_<lang>, ...` for a model,
    * langs in sorted order (the classify column order). */
  def scoreListSql(model: Seq[(String, Seq[(String, Long)])] = LangId.defaultModel,
                   s: String = "s"): String =
    model.sortBy(_._1)
      .map { case (l, terms) => s"${scoreSql(terms, s)} AS score_$l" }
      .mkString(",\n           ")

  /** The argmax CASE over score_<lang> columns: 'und' when nothing
    * fires, ties to the alphabetically earlier language (langs must
    * be the sorted model keys — LangId.classify sorts). */
  def predCaseSql(langs: Seq[String]): String = {
    val sorted = langs.sorted
    val cols = sorted.map(l => s"score_$l")
    val zero = s"greatest(${cols.mkString(", ")}) <= 0"
    val arms = sorted.init.zipWithIndex.map { case (l, i) =>
      val later = cols.drop(i + 1)
      val rhs = if (later.size == 1) later.head
                else s"greatest(${later.mkString(", ")})"
      s"WHEN score_$l >= $rhs THEN '$l'"
    }
    s"""CASE WHEN $zero THEN 'und'
                   ${arms.mkString("\n                   ")}
                   ELSE '${sorted.last}' END"""
  }
}
