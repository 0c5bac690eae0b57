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

  // --------------------------------------------------------------- q126
  /** String manipulation, part 2: split_part / translate / overlay /
    * left / right / repeat / instr / multi-char lpad / initcap. DuckDB
    * lacks overlay and initcap — the oracle emulates both with slicing
    * and per-word case mapping, pinning the exact semantics rather than
    * skipping them. */
  private def q126(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val base = expr("left(text, 40)")
    d.select(col("doc_id"), base.as("t"), col("source"))
      .select(col("doc_id"),
        split_part(col("t"), lit(" "), lit(2)).as("second_word"),
        translate(col("t"), "aeiou", "AEIOU").as("vowels_up"),
        overlay(col("t"), lit("XX"), lit(3)).as("overlaid"),
        expr("left(t, 5)").as("l5"),
        expr("right(t, 5)").as("r5"),
        repeat(expr("left(t, 2)"), 3).as("rep"),
        instr(col("t"), "a").as("first_a"),
        lpad(col("source"), 8, ".").as("padded"),
        initcap(expr("left(t, 20)")).as("titled"))
      .orderBy(col("doc_id"))
  }

  private val q126Sql =
    """WITH b AS (
         SELECT doc_id, left(text, 40) AS t, source FROM documents)
       SELECT doc_id,
         split_part(t, ' ', 2) AS second_word,
         translate(t, 'aeiou', 'AEIOU') AS vowels_up,
         left(t, 2) || 'XX' || t[5:] AS overlaid,
         left(t, 5) AS l5,
         right(t, 5) AS r5,
         repeat(left(t, 2), 3) AS rep,
         CAST(instr(t, 'a') AS INT) AS first_a,
         lpad(source, 8, '.') AS padded,
         array_to_string(list_transform(string_split(left(t, 20), ' '),
           w -> upper(w[1]) || lower(w[2:])), ' ') AS titled
       FROM b ORDER BY doc_id"""

  // --------------------------------------------------------------- q127
  /** Exact math family — floor/ceil/sign/abs/positive mod/perfect-square
    * sqrt/integer power: every output is exactly representable, so the
    * check is bit-exact with no rounding tolerance (transcendentals are
    * deliberately excluded — libm vs DuckDB differ in the last ulp). */
  private def q127(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    o.select(col("o_orderkey"),
        floor(col("o_totalprice")).cast("long").as("fl"),
        ceil(col("o_totalprice")).cast("long").as("ce"),
        signum(col("o_totalprice") - 150000).cast("int").as("sg"),
        abs(col("o_custkey") - 1000).as("ab"),
        pmod(col("o_orderkey"), lit(7)).as("m7"),
        sqrt(pow(pmod(col("o_orderkey"), lit(10)), 2)).cast("int").as("rt"),
        pow(lit(2), pmod(col("o_orderkey"), lit(10))).cast("long").as("p2"))
      .orderBy(col("o_orderkey"))
  }

  private val q127Sql =
    """SELECT o_orderkey,
         CAST(floor(o_totalprice) AS BIGINT) AS fl,
         CAST(ceil(o_totalprice) AS BIGINT) AS ce,
         CAST(sign(o_totalprice - 150000) AS INT) AS sg,
         CAST(abs(o_custkey - 1000) AS BIGINT) AS ab,
         CAST(o_orderkey % 7 AS BIGINT) AS m7,
         CAST(sqrt(power(o_orderkey % 10, 2)) AS INT) AS rt,
         CAST(power(2, o_orderkey % 10) AS BIGINT) AS p2
       FROM orders ORDER BY o_orderkey"""

  override def queries: Map[String, QueryFn] = Map(
    "q124_array_mutations" -> q124,
    "q125_mask_pii" -> q125,
    "q126_string_funcs2" -> q126,
    "q127_math_exact" -> q127)

  override def oracles: Map[String, String] = Map(
    "q124_array_mutations" -> q124Sql,
    "q125_mask_pii" -> q125Sql,
    "q126_string_funcs2" -> q126Sql,
    "q127_math_exact" -> q127Sql)
}
