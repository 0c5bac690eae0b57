package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RecordLinkage

/** Round-4 surface, part 30: record linkage. */
object Extras34 extends QueryPack {

  // --------------------------------------------------------------- q250
  /** Blocked fuzzy record linkage: link a deliberately-mutilated probe
    * set (names minus their first two characters) back to the clean
    * part-name domain. Blocking on the trailing word keeps the
    * comparison quadratic only within a block; the best match per
    * probe is deterministic (dist, then name). */
  private def q250(s: SparkSession, dir: String): DataFrame = {
    val names = Tables(s, dir)("part")
      .select(col("p_name").as("nm")).distinct()
    val probes = names.filter(length(col("nm")) > 8)
      .select(substring(col("nm"), 3, 1000000).as("probe")).distinct()
    RecordLinkage.linkBest(probes, "probe", names, "nm")
      .select(col("probe"), col("nm").as("match_name"), col("dist"))
      .orderBy("probe")
  }

  private val q250Sql =
    """WITH names AS (SELECT DISTINCT p_name AS nm FROM part),
       probes AS (SELECT DISTINCT substr(nm, 3) AS probe FROM names
                  WHERE length(nm) > 8),
       cand AS (
         SELECT p.probe, n.nm, levenshtein(p.probe, n.nm) AS dist
         FROM probes p JOIN names n
           ON regexp_extract(p.probe, '[a-z]+$')
              = regexp_extract(n.nm, '[a-z]+$')
         WHERE levenshtein(p.probe, n.nm) <= 3),
       best AS (
         SELECT probe, nm AS match_name, dist,
                row_number() OVER (PARTITION BY probe
                                   ORDER BY dist, nm) AS rn
         FROM cand)
       SELECT probe, match_name, dist FROM best WHERE rn = 1
       ORDER BY probe"""

  override def queries: Map[String, QueryFn] = Map(
    "q250_record_linkage" -> q250 _)

  override def oracles: Map[String, String] = Map(
    "q250_record_linkage" -> q250Sql)
}
