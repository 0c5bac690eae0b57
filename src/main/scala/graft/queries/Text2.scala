package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text coverage, part 2 (round 2): TF-IDF term scoring and the regex
  * scalar-function family — the remaining text-pipeline primitives a
  * training-data engine needs beyond round 1's token/quality/lang-id/
  * fingerprint set.
  */
object Text2 extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("documents")

  // ---------------------------------------------------------------- q58
  /** TF-IDF: tokenize → term frequency per doc → document frequency →
    * tf·ln((N+1)/(df+1)) → top-3 terms per sampled doc. The df side is
    * vocabulary-sized, so it broadcasts; at 100 TB the tf table is the
    * only large shuffle (one hash-agg on (doc, term)). Ties broken by
    * term so ranking is engine-independent. */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val nDocs = d.count() // vocabulary-free scalar; one cheap count job
    val tokens = d.select(col("doc_id"),
      explode(filter(split(lower(col("text")), "[^a-z]+"), x => x =!= ""))
        .as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.filter(pmod(col("doc_id"), lit(25)) === 0)
      .join(broadcast(df), Seq("term"))
      .withColumn("tfidf",
        col("tf") * log((lit(nDocs) + 1.0) / (col("df") + lit(1.0))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"),
              round(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  private val q58Sql =
    """WITH tok AS (
         SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x != '')) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       n AS (SELECT count(*) AS n_docs FROM documents),
       scored AS (
         SELECT doc_id, term,
           tf * ln((n_docs + 1.0) / (df + 1.0)) AS tfidf
         FROM tf JOIN df USING (term) CROSS JOIN n
         WHERE doc_id % 25 = 0),
       ranked AS (
         SELECT doc_id, term, tfidf,
           ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, term) AS rk
         FROM scored)
       SELECT doc_id, CAST(rk AS INT) AS rk, term, round(tfidf, 6) AS tfidf
       FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk"""

  // ---------------------------------------------------------------- q59
  /** Regex scalar family: extract / extract-all / replace. Patterns kept
    * to the common subset of Java regex and RE2 so both engines compile
    * them identically. */
  private def q59(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(pmod(col("doc_id"), lit(25)) === 0)
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
        size(regexp_extract_all(col("text"), lit("[a-z]*(?:an|en|in)\\b"), lit(0)))
          .as("n_nasal_words"),
        regexp_replace(substring(col("text"), 1, 60), "[aeiou]", "_")
          .as("devoweled_head"))
      .orderBy(col("doc_id"))

  private val q59Sql =
    """SELECT doc_id,
       regexp_extract(text, '^([a-z]+)', 1) AS first_word,
       CAST(len(regexp_extract_all(text, '[a-z]*(?:an|en|in)\b', 0)) AS INT)
         AS n_nasal_words,
       regexp_replace(substring(text, 1, 60), '[aeiou]', '_', 'g')
         AS devoweled_head
       FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id"""

  // ---------------------------------------------------------------- q70
  /** Binary-column scalar family — the byte-level plumbing multimodal
    * columns ride on: utf8 encode, base64/hex render, byte length, and
    * a base64 round trip back to text. All codegen'd built-ins. */
  private def q70(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(pmod(col("doc_id"), lit(25)) === 0)
      .select(
        col("doc_id"),
        base64(encode(substring(col("text"), 1, 16), "UTF-8")).as("b64_head"),
        hex(encode(substring(col("text"), 1, 8), "UTF-8")).as("hex_head"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        decode(unbase64(base64(encode(substring(col("text"), 1, 16), "UTF-8"))),
               "UTF-8").as("roundtrip"))
      .orderBy(col("doc_id"))

  private val q70Sql =
    """SELECT doc_id,
       to_base64(encode(substring(text, 1, 16))) AS b64_head,
       hex(encode(substring(text, 1, 8))) AS hex_head,
       CAST(strlen(text) AS INT) AS n_bytes,
       decode(from_base64(to_base64(encode(substring(text, 1, 16))))) AS roundtrip
       FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id"""

  override val queries: Map[String, QueryFn] = Map(
    "q58_tfidf"         -> q58 _,
    "q59_regex_extract" -> q59 _,
    "q70_binary_funcs"  -> q70 _)

  override val oracles: Map[String, String] = Map(
    "q58_tfidf"         -> q58Sql,
    "q59_regex_extract" -> q59Sql,
    "q70_binary_funcs"  -> q70Sql)
}
