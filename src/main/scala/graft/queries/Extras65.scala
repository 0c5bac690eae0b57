package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SubstringDedup

/** Round-8 pack, part 8: importance-weighted data selection (q406).
  */
object Extras65 extends QueryPack {

  // --------------------------------------------------------------- q406
  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by the log-likelihood ratio of a TARGET-domain hashed
    * unigram model (source `src0`, the q366 hashing trick: 64 md5
    * buckets) against the whole-corpus model, Laplace(+1) smoothed —
    * logw = Σ_b n_db · (ln p_t(b) − ln p_c(b)) — and keep the top-20
    * most target-like documents. Determinism discipline: bucket
    * counts and totals are exact integers; each ln term is one
    * ln of an integer-derived ratio; and the per-doc sum folds the
    * (bucket, term) list in SORTED bucket order on both engines, so
    * no float-summation order diverges. 100 TB shape: the two
    * 64-row bucket models broadcast, totals are the precedented 1-row
    * scalar cross join, the corpus shuffles once on (doc, bucket),
    * and the top-20 is a TakeOrdered — no global sort. */
  private def q406(s: SparkSession, dir: String): DataFrame = {
    val B = 64
    val d = Tables(s, dir)("documents")
    val tk = d.select(col("doc_id"), col("source"),
        explode(SubstringDedup.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(encode(col("tok"), "UTF-8")), 1, 8), 16, 10)
          .cast("long") % B).as("bucket"))
    val db = tk.groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
    val t = tk.filter(col("source") === "src0")
      .groupBy("bucket").agg(count(lit(1)).as("tb"))
    val c = tk.groupBy("bucket").agg(count(lit(1)).as("cb"))
    val tot = t.agg(sum("tb").as("tt"))
      .crossJoin(c.agg(sum("cb").as("ct")))
    val terms = db
      .join(broadcast(t), Seq("bucket"), "left")
      .join(broadcast(c), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("bucket"), col("n"),
        (col("n") * (log((coalesce(col("tb"), lit(0L)) + 1).cast("double") /
            (col("tt") + B)) -
          log((col("cb") + 1).cast("double") / (col("ct") + B))))
          .as("term"))
    val perDoc = terms
      .groupBy("doc_id")
      .agg(sum("n").cast("long").as("n_toks"),
        aggregate(
          transform(sort_array(collect_list(struct(col("bucket"), col("term")))),
            e => e.getField("term")),
          lit(0.0), (acc, x) => acc + x).as("lw"))
      .withColumn("logw", round(col("lw"), 6))
    perDoc
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_toks"), col("logw"))
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(20)
  }

  private val q406Sql = {
    val B = 64
    s"""WITH toks AS (
         SELECT doc_id, source,
                list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '') AS t
         FROM documents),
       tk AS MATERIALIZED (
         SELECT doc_id, source,
                ('0x' || substr(md5(u.tok), 1, 8))::BIGINT % $B AS bucket
         FROM toks, unnest(t) AS u(tok)),
       db AS (SELECT doc_id, bucket, count(*) AS n
              FROM tk GROUP BY 1, 2),
       tm AS MATERIALIZED (
         SELECT bucket, count(*) AS tb FROM tk
         WHERE source = 'src0' GROUP BY 1),
       cm AS MATERIALIZED (
         SELECT bucket, count(*) AS cb FROM tk GROUP BY 1),
       tot AS (SELECT (SELECT sum(tb) FROM tm) AS tt,
                      (SELECT sum(cb) FROM cm) AS ct),
       terms AS (
         SELECT db.doc_id, db.bucket, db.n,
                db.n * (ln((coalesce(tm.tb, 0) + 1) /
                           CAST(tot.tt + $B AS DOUBLE)) -
                        ln((cm.cb + 1) /
                           CAST(tot.ct + $B AS DOUBLE))) AS term
         FROM db LEFT JOIN tm ON tm.bucket = db.bucket
                 JOIN cm ON cm.bucket = db.bucket
                 CROSS JOIN tot),
       per_doc AS (
         SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_toks,
                round(list_sum(list_transform(
                  list({'b': bucket, 'v': term} ORDER BY bucket),
                  e -> e.v)), 6) AS logw
         FROM terms GROUP BY doc_id)
       SELECT p.doc_id, d.source, p.n_toks, p.logw
       FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
       ORDER BY p.logw DESC, p.doc_id LIMIT 20"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q406_dsir_weights" -> q406 _)

  override def oracles: Map[String, String] = Map(
    "q406_dsir_weights" -> q406Sql)
}
