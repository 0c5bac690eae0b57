package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 23: document-length deciles, character
  * trigram profiles, and inter-centroid separation matrices.
  */
object Extras27 extends QueryPack {

  // --------------------------------------------------------------- q211
  /** Document-length deciles per language: ntile(10) over n_chars with
    * deterministic tie-breaks, reduced to per-decile bounds — the
    * length-filter calibration table for corpus curation. */
  private def q211(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    d.select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy("lang", "decile")
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
           count(lit(1)).as("n"))
      .orderBy("lang", "decile")
  }

  private val q211Sql =
    """WITH t AS (
         SELECT lang, n_chars,
                ntile(10) OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS decile
         FROM documents)
       SELECT lang, decile, min(n_chars) AS lo, max(n_chars) AS hi,
              count(*) AS n
       FROM t GROUP BY 1, 2 ORDER BY 1, 2"""

  // --------------------------------------------------------------- q212
  /** Character-trigram profile: the 15 most frequent letter trigrams in
    * English documents — the feature table behind n-gram language ID
    * (q23), made inspectable. Trigram generation is a per-row sequence
    * fan-out (no joins); the count is one hash aggregate. */
  private def q212(s: SparkSession, dir: String): DataFrame = {
    // lower(text) hoisted OUT of the lambda: inside it, every sequence
    // element re-lowered the whole document (O(len²) byte copying per
    // doc); projected once it's O(len)
    val d = Tables(s, dir)("documents").filter(col("lang") === "en")
      .select(lower(col("text")).as("lt"))
    d.select(explode(expr(
        """transform(sequence(1, greatest(length(lt) - 2, 0)),
           i -> substring(lt, i, 3))""")).as("tri"))
      .filter(col("tri").rlike("^[a-z]{3}$"))
      .groupBy("tri").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("tri"))
      .limit(15)
  }

  private val q212Sql =
    """WITH tris AS (
         SELECT substring(lower(text), i, 3) AS tri
         FROM documents,
              unnest(range(1, greatest(len(lower(text)) - 1, 1))) AS t(i)
         WHERE lang = 'en'),
       clean AS (
         SELECT tri FROM tris WHERE regexp_matches(tri, '^[a-z]{3}$'))
       SELECT tri, count(*) AS n
       FROM clean GROUP BY 1 ORDER BY n DESC, tri LIMIT 15"""

  // --------------------------------------------------------------- q213
  /** Inter-centroid separation: squared distances between label
    * centroids (upper triangle) — with q196's intra-cluster dispersion
    * this is the Davies-Bouldin-style cluster-quality pair. Centroid
    * algebra stays at (label, dim) grain; the 10×10 matrix join is
    * trivially broadcast. */
  private def q213(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    val cent = e.select(col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v", col("v").cast("double"))
      .groupBy("label", "dim").agg(avg("v").as("c"))
    val a = cent.select(col("label").as("la"), col("dim"), col("c").as("ca"))
    val b = cent.select(col("label").as("lb"), col("dim"), col("c").as("cb"))
    a.join(b, "dim").filter(col("la") < col("lb"))
      .groupBy("la", "lb")
      .agg(round(sum((col("ca") - col("cb")) * (col("ca") - col("cb"))), 6)
        .as("d2"))
      .orderBy("la", "lb")
  }

  private val q213Sql =
    """WITH flat AS (
         SELECT label, t.dim, embedding[t.dim + 1]::DOUBLE AS v
         FROM embeddings, unnest(range(len(embedding))) AS t(dim)),
       cent AS (
         SELECT label, dim, avg(v) AS c FROM flat GROUP BY 1, 2)
       SELECT a.label AS la, b.label AS lb,
              round(sum((a.c - b.c) * (a.c - b.c)), 6) AS d2
       FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
       GROUP BY 1, 2 ORDER BY 1, 2"""

  override def queries: Map[String, QueryFn] = Map(
    "q211_length_deciles"   -> q211 _,
    "q212_char_trigrams"    -> q212 _,
    "q213_centroid_separation" -> q213 _)

  override def oracles: Map[String, String] = Map(
    "q211_length_deciles"   -> q211Sql,
    "q212_char_trigrams"    -> q212Sql,
    "q213_centroid_separation" -> q213Sql)
}
