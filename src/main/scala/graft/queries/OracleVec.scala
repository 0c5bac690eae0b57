package graft.queries

/** Shared DuckDB-oracle SQL generators for dense-vector math — ONE
  * source for the cosine/hyperplane fragments that must stay
  * bit-identical to [[graft.functions.VectorFunctions]] (double
  * promotion before the sequential fold, zero-norm guard) and to
  * [[graft.operators.Similarity.hyperplane]]'s literal replay (the
  * shortest-repr 'e0' suffix keeps DuckDB parsing the exact double).
  * New packs must use these instead of re-declaring the strings; the
  * older packs (Extras58/61 era) carry their own identical copies and
  * can migrate opportunistically.
  */
private[queries] object OracleVec {

  /** Σ aᵢ·bᵢ as DuckDB's sequential double fold over `dim` slots. */
  def dotSql(a: String, b: String, dim: Int = 64): String =
    s"list_sum(list_transform(generate_series(1, $dim), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def normSql(v: String, dim: Int = 64): String =
    s"sqrt(${dotSql(v, v, dim)})"

  /** Cosine with the zero-norm guard, matching VectorFunctions.cosine. */
  def cosSql(a: String, b: String, dim: Int = 64): String =
    s"""CASE WHEN ${normSql(a, dim)} * ${normSql(b, dim)} = 0 THEN 0.0
        ELSE ${dotSql(a, b, dim)} / (${normSql(a, dim)} * ${normSql(b, dim)}) END"""

  /** A Scala double as a DuckDB DOUBLE literal: shortest repr with an
    * 'e0' suffix so DuckDB parses it as DOUBLE (a bare decimal would
    * be DECIMAL-exact and can sit one ulp off the IEEE value Spark
    * computes — e.g. 0.025*0.025). */
  def doubleLit(d: Double): String = {
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  /** Hyperplane `bit` of the shared SRP family as a DuckDB list
    * literal (doubles round-tripped via [[doubleLit]]). */
  def hpList(bit: Int, dim: Int = 64): String =
    graft.operators.Similarity.hyperplane(bit, dim)
      .map(doubleLit)
      .mkString("[", ", ", "]")

  /** The packed SRP signature of `vecCol` as one SQL expression —
    * DuckDB twin of [[graft.operators.Similarity.srpSignature]] (bit b
    * set iff v·hyperplane_b > 0). Callers CAST the sum to BIGINT. */
  def sigExprSql(bits: Int, vecCol: String = "embedding",
                 dim: Int = 64): String =
    (0 until bits)
      .map(b => s"CASE WHEN ${dotSql(vecCol, s"(${hpList(b, dim)})")} > 0 THEN ${1 << b} ELSE 0 END")
      .mkString(" + ")

  /** Neighborhood-mean SQL twin of MarginScoring.nbrAvg over a kNN
    * relation (query_id, neighbor_id, cos, rank): fold the k cosines
    * in rank order (`list(... ORDER BY rank)` → list_sum), so the sum
    * is the same fixed IEEE tree as the Spark sorted fold — never a
    * partition-order avg(). */
  def nbrAvgSql(rel: String): String =
    s"SELECT query_id, list_sum(list_transform(" +
    s"list({'r': rank, 'c': cos} ORDER BY rank), e -> e.c)) / count(*)" +
    s" AS nbr_avg FROM $rel GROUP BY query_id"
}
