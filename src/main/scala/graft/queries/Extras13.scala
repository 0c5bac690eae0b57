package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 9: corpus-curation breadth — line-level dedup
  * stats, vocabulary/OOV analysis, class weighting, temperature-scaled
  * source mixing, width_bucket binning.
  */
object Extras13 extends QueryPack {

  // --------------------------------------------------------------- q153
  /** CCNet-style line-level dedup profile: explode docs into trimmed
    * non-empty lines, count global occurrences of each exact line, and
    * report the duplicated-line ratio per source. The line-text groupBy
    * is the only corpus-wide shuffle; everything after runs on the
    * (line → count) reduce. At 100 TB you'd hash the line to 64 bits
    * first (q45's rolling hash) — the exact-text form is the
    * oracle-able contract. */
  private def q153(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val lines = d.select(col("doc_id"), col("source"),
        explode(split(col("text"), "\n")).as("raw"))
      .select(col("doc_id"), col("source"), trim(col("raw")).as("line"))
      .filter(col("line") =!= "")
    val cnt = lines.groupBy("line").agg(count(lit(1)).as("occ"))
    lines.join(cnt, "line")
      .groupBy("source")
      .agg(count(lit(1)).as("n_lines"),
           sum(when(col("occ") > 1, 1).otherwise(0)).as("n_dup_lines"),
           round(sum(when(col("occ") > 1, 1).otherwise(0)) /
             count(lit(1)).cast("double"), 6).as("dup_ratio"))
      .orderBy("source")
  }

  private val q153Sql =
    """WITH lines AS (
         SELECT doc_id, source, trim(l) AS line
         FROM documents, unnest(string_split(text, chr(10))) AS u(l)
         WHERE trim(l) <> ''),
       cnt AS (SELECT line, count(*) AS occ FROM lines GROUP BY 1)
       SELECT source, count(*) AS n_lines,
              CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dup_lines,
              round(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END)
                    / count(*)::DOUBLE, 6) AS dup_ratio
       FROM lines JOIN cnt USING (line)
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q154
  /** Vocabulary coverage: build the top-1000 corpus vocabulary by
    * frequency (deterministic tie-break on token), then measure each
    * language's out-of-vocabulary token rate. The vocab is a rank
    * window over the token reduce and broadcasts into the coverage
    * join — the classic build-small-probe-big shape. */
  private def q154(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = d.select(col("lang"),
        explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(col("tok") =!= "")
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    val w = Window.orderBy(desc("n"), col("tok"))
    val vocab = freq.withColumn("r", row_number().over(w))
      .filter(col("r") <= 1000).select("tok")
    toks.join(broadcast(vocab.withColumn("in_v", lit(1))), Seq("tok"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
           round(sum(when(col("in_v").isNull, 1).otherwise(0)) /
             count(lit(1)).cast("double"), 6).as("oov_rate"))
      .orderBy("lang")
  }

  private val q154Sql =
    """WITH toks AS (
         SELECT lang, tok
         FROM documents,
              unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(tok)
         WHERE tok <> ''),
       freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
       vocab AS (
         SELECT tok FROM (
           SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS r
           FROM freq) x WHERE r <= 1000)
       SELECT lang, count(*) AS n_tokens,
              round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                    / count(*)::DOUBLE, 6) AS oov_rate
       FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q155
  /** Inverse-frequency class weights over the embedding labels:
    * w = N / (k · n_class), the standard imbalance correction fed to a
    * trainer. One tiny reduce + a cross-count — breadth entry for the
    * label-stats family. */
  private def q155(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    val cls = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    cls
      .withColumn("weight", round(
        sum("n").over(wAll) / (count(lit(1)).over(wAll) * col("n")), 6))
      .orderBy("label")
  }

  private val q155Sql =
    """WITH cls AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)
       SELECT label, n,
              round(sum(n) OVER () / (count(*) OVER () * n)::DOUBLE, 6)
                AS weight
       FROM cls ORDER BY label"""

  // --------------------------------------------------------------- q156
  /** Temperature-scaled source mixing (alpha = 0.3): upweight rare
    * sources for training by renormalizing p^alpha — the multilingual
    * sampling trick. Reports raw share, scaled share, and the
    * effective sample count at 10k draws. */
  private def q156(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val src = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    src
      .withColumn("p", col("n") / sum("n").over(wAll))
      .withColumn("q", pow(col("p"), 0.3))
      .withColumn("mix", round(col("q") / sum("q").over(wAll), 6))
      .select(col("source"), col("n"), round(col("p"), 6).as("p"),
        col("mix"),
        round(col("q") / sum("q").over(wAll) * 10000, 2).as("eff_10k"))
      .orderBy("source")
  }

  private val q156Sql =
    """WITH src AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       scaled AS (
         SELECT source, n, n / sum(n) OVER ()::DOUBLE AS p,
                pow(n / sum(n) OVER ()::DOUBLE, 0.3) AS q
         FROM src)
       SELECT source, n, round(p, 6) AS p,
              round(q / sum(q) OVER (), 6) AS mix,
              round(q / sum(q) OVER () * 10000, 2) AS eff_10k
       FROM scaled ORDER BY source"""

  // --------------------------------------------------------------- q157
  /** width_bucket equal-width binning of order quantities into 10
    * buckets over [0, 50) — the built-in the equi-WIDTH histogram
    * family hangs off (q50 hand-rolls the same arithmetic; this pins
    * the builtin's edge semantics: below-range → 0, at-or-above hi →
    * n+1). */
  private def q157(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
    li.select(width_bucket(col("l_quantity"), lit(0), lit(50), lit(10))
        .as("bucket"), col("l_quantity"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("bucket")
  }

  private val q157Sql =
    """SELECT CASE WHEN l_quantity < 0 THEN 0
                   WHEN l_quantity >= 50 THEN 11
                   ELSE CAST(floor(l_quantity / 5) AS BIGINT) + 1 END AS bucket,
              count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q153_line_dedup"   -> q153 _,
    "q154_vocab_oov"    -> q154 _,
    "q155_class_weight" -> q155 _,
    "q156_mix_temp"     -> q156 _,
    "q157_width_bucket" -> q157 _)

  override def oracles: Map[String, String] = Map(
    "q153_line_dedup"   -> q153Sql,
    "q154_vocab_oov"    -> q154Sql,
    "q155_class_weight" -> q155Sql,
    "q156_mix_temp"     -> q156Sql,
    "q157_width_bucket" -> q157Sql)
}
