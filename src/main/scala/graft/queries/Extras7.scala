package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 3: Spark-4 array mutation family and the
  * mask() PII redaction function. DuckDB-oracled (the oracle spells the
  * mutations with list slicing/filters where DuckDB lacks a direct
  * twin).
  */
object Extras7 extends QueryPack {

  // --------------------------------------------------------------- q124
  /** Array mutation family — append/prepend/insert/remove/compact/
    * repeat over a per-document token prefix. All narrow per-row
    * expressions (one projection, no shuffle, codegen'd). */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val base = slice(split(col("text"), " "), 1, 4)
    d.select(col("doc_id"), base.as("base"))
      .select(col("doc_id"),
        array_join(array_append(col("base"), lit("zz")), "|").as("appended"),
        array_join(array_prepend(col("base"), lit("aa")), "|").as("prepended"),
        array_join(array_insert(col("base"), lit(2), lit("mid")), "|").as("inserted"),
        array_join(array_remove(col("base"), element_at(col("base"), 1)), "|")
          .as("removed"),
        array_join(array_compact(transform(col("base"),
          x => nullif(x, element_at(col("base"), 2)))), "|").as("compacted"),
        array_join(array_repeat(element_at(col("base"), 1), 3), "|")
          .as("repeated"))
      .orderBy(col("doc_id"))
  }

  private val q124Sql =
    """WITH b AS (
         SELECT doc_id, string_split(text, ' ')[1:4] AS base
         FROM documents)
       SELECT doc_id,
         array_to_string(base || ['zz'], '|') AS appended,
         array_to_string(['aa'] || base, '|') AS prepended,
         array_to_string(base[1:1] || ['mid'] || base[2:], '|') AS inserted,
         array_to_string(list_filter(base, x -> x != base[1]), '|')
           AS removed,
         array_to_string(list_filter(list_transform(base,
           x -> nullif(x, base[2])), x -> x IS NOT NULL), '|') AS compacted,
         array_to_string(list_transform(range(3), i -> base[1]), '|')
           AS repeated
       FROM b ORDER BY doc_id"""

  // --------------------------------------------------------------- q125
  /** mask() PII redaction — structure-preserving character masking
    * (upper→X, lower→x, digit→n), the reversible-shape sibling of
    * q78's regex scrubbing: length and word boundaries survive, so
    * downstream tokenization statistics stay meaningful. The oracle
    * spells the same mapping as global regex passes. */
  private def q125(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val synthetic = concat(lit("User"), col("user_id"),
      lit(" card 4111-1111: OK"))
    e.filter(col("event_type") === "signup")
      .select(col("event_id"), mask(synthetic).as("masked"),
        mask(synthetic, lit("U"), lit("l"), lit("9"), lit("#")).as("custom"))
      .orderBy(col("event_id"))
  }

  private val q125Sql =
    """WITH s AS (
         SELECT event_id,
                'User' || user_id || ' card 4111-1111: OK' AS raw
         FROM events WHERE event_type = 'signup')
       SELECT event_id,
         regexp_replace(regexp_replace(regexp_replace(raw,
           '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
           AS masked,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
           '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '9', 'g'),
           '[^Ul9]', '#', 'g') AS custom
       FROM s ORDER BY event_id"""

  override def queries: Map[String, QueryFn] = Map(
    "q124_array_mutations" -> q124,
    "q125_mask_pii" -> q125)

  override def oracles: Map[String, String] = Map(
    "q124_array_mutations" -> q124Sql,
    "q125_mask_pii" -> q125Sql)
}
