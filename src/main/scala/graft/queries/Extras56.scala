package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SubstringDedup

/** Round-7 pack, part 3: feature-engineering statistics — mutual
  * information between categorical features (q365, completing the
  * dependence ladder next to chi-square q218, eta-squared q342 and JS
  * divergence q284) and the hashing-trick bucket audit (q366, the
  * collision/load table that sizes a feature-hashed vectorizer).
  */
object Extras56 extends QueryPack {

  // --------------------------------------------------------------- q365
  /** Mutual information between event type and 6-hour day band, in
    * nats: MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))). All probabilities are
    * exact integer counts divided once; the ln argument is the exact
    * integer ratio (n·N)/(n_x·n_y), so both engines evaluate the same
    * double to the bit. One grouped aggregate + three window sums over
    * the (|X|·|Y|)-row joint table — the marginals never rescan the
    * fact. Per-cell terms plus the headline MI on every row. */
  private def q365(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events").select(
      col("event_type").as("x"),
      floor(hour(col("ts")) / 6).cast("int").as("band"))
    val joint = e.groupBy("x", "band").agg(count(lit(1)).as("n"))
    val wx = Window.partitionBy("x")
    val wy = Window.partitionBy("band")
    val wall = Window.partitionBy(lit(1))
    val out = joint
      .withColumn("nx", sum("n").over(wx))
      .withColumn("ny", sum("n").over(wy))
      .withColumn("nn", sum("n").over(wall))
    val term = (col("n").cast("double") / col("nn")) *
      log((col("n") * col("nn")).cast("double") / (col("nx") * col("ny")))
    out.select(col("x"), col("band").cast("long").as("band"),
        col("n").cast("long").as("n"),
        round(col("n").cast("double") / col("nn"), 6).as("p_xy"),
        term.as("mi_term"))
      .withColumn("mi_total",
        round(sum("mi_term").over(Window.partitionBy(lit(1))), 6))
      .withColumn("mi_term", round(col("mi_term"), 6))
      .orderBy("x", "band")
  }

  private val q365Sql =
    """WITH ev AS (
         SELECT event_type AS x,
                CAST(floor(hour(ts) / 6.0) AS INTEGER) AS band
         FROM events),
       joint AS (SELECT x, band, count(*) AS n FROM ev GROUP BY x, band),
       m AS (
         SELECT x, band, n,
                sum(n) OVER (PARTITION BY x) AS nx,
                sum(n) OVER (PARTITION BY band) AS ny,
                sum(n) OVER () AS nn
         FROM joint),
       t AS (
         SELECT x, CAST(band AS BIGINT) AS band, CAST(n AS BIGINT) AS n,
                round(CAST(n AS DOUBLE) / nn, 6) AS p_xy,
                (CAST(n AS DOUBLE) / nn)
                  * ln(CAST(n * nn AS DOUBLE) / (nx * ny)) AS mi_term
         FROM m)
       SELECT x, band, n, p_xy,
              round(mi_term, 6) AS mi_term,
              round(sum(mi_term) OVER (), 6) AS mi_total
       FROM t ORDER BY x, band"""

  // --------------------------------------------------------------- q366
  /** Hashing-trick bucket audit: every corpus token hashes into one of
    * 64 buckets (md5-uniform, the engine's replayable hash family) with
    * a ±1 sign from the next md5 nibble — exactly the signed feature
    * hashing of Weinberger et al. 2009. The output is the table that
    * sizes a hashed vectorizer: per-bucket occurrence load, distinct
    * tokens (collisions), and the signed mass whose cancellation is the
    * trick's variance control. One explode + one 64-group hash-agg; at
    * 100 TB the shuffle carries (bucket, token-hash) pairs, never text. */
  private def q366(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir)("documents")
      .select(explode(SubstringDedup.tokens(col("text"))).as("tok"))
    val h = md5(concat(col("tok"), lit("-fh")))
    val hashed = toks.select(
      (conv(substring(h, 1, 8), 16, 10).cast("long") % 64).as("bucket"),
      when(substring(h, 9, 1) < "8", 1L).otherwise(-1L).as("sign"),
      col("tok"))
    hashed.groupBy("bucket")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("tok")).as("n_distinct"),
        sum("sign").as("signed_mass"))
      .crossJoin(toks.agg(count(lit(1)).as("total")))
      .select(col("bucket"),
        col("n_occurrences").cast("long").as("n_occurrences"),
        col("n_distinct").cast("long").as("n_distinct"),
        col("signed_mass").cast("long").as("signed_mass"),
        round(col("n_occurrences").cast("double") / col("total"), 6)
          .as("load_share"))
      .orderBy("bucket")
  }

  private val q366Sql =
    """WITH toks AS (
         SELECT unnest(list_filter(
                  regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '')) AS tok
         FROM documents),
       hashed AS (
         SELECT ('0x' || substr(md5(tok || '-fh'), 1, 8))::BIGINT % 64
                  AS bucket,
                CASE WHEN substr(md5(tok || '-fh'), 9, 1) < '8'
                     THEN 1 ELSE -1 END AS sign,
                tok
         FROM toks),
       g AS (
         SELECT bucket, count(*) AS n_occurrences,
                count(DISTINCT tok) AS n_distinct,
                sum(sign) AS signed_mass
         FROM hashed GROUP BY bucket),
       tot AS (SELECT count(*) AS total FROM toks)
       SELECT bucket,
              CAST(n_occurrences AS BIGINT) AS n_occurrences,
              CAST(n_distinct AS BIGINT) AS n_distinct,
              CAST(signed_mass AS BIGINT) AS signed_mass,
              round(CAST(n_occurrences AS DOUBLE) / total, 6) AS load_share
       FROM g, tot ORDER BY bucket"""

  override def queries: Map[String, QueryFn] = Map(
    "q365_mutual_info"  -> q365 _,
    "q366_feature_hash" -> q366 _)

  override def oracles: Map[String, String] = Map(
    "q365_mutual_info"  -> q365Sql,
    "q366_feature_hash" -> q366Sql)
}
