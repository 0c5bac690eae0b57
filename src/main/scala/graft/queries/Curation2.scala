package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Round-3 training-data-pipeline coverage: the curation operators an
  * LLM data platform runs between "raw crawl" and "training shards" —
  * benchmark decontamination, deterministic hash sampling, sequence
  * packing, PII scrubbing, and weighted source mixing. All five are
  * DuckDB-oracled.
  *
  * Scale notes (100 TB framing) are on each query: the common theme is
  * that every operator here is a single narrow pass or one
  * broadcast-able join — none requires a corpus-sized shuffle beyond
  * what the semantics force.
  */
object Curation2 extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("documents")

  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  // ---------------------------------------------------------------- q75
  /** Benchmark decontamination — flag corpus documents sharing any
    * distinct word-3-gram with a "benchmark" set (docs with
    * doc_id % 97 == 0 stand in for an eval suite). The scalable shape
    * is an inverted-index join on the shingle: the benchmark side is
    * tiny by construction (eval suites are KBs against a 100 TB
    * corpus), so Spark broadcasts it and the corpus side streams
    * through map-side — no corpus shuffle at all. */
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val sh = docs(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
              explode(TextFunctions.wordShingles(col("toks"), 3)).as("sh"))
    val bench = sh.filter(pmod(col("doc_id"), lit(97)) === 0)
      .withColumnRenamed("doc_id", "bench_id")
    val cand = sh.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    cand.join(broadcast(bench), "sh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sh")).as("n_hit_ngrams"),
           countDistinct(col("bench_id")).as("n_bench_docs"))
      .orderBy(col("doc_id"))
  }

  private val q75Sql =
    s"""WITH base AS (
         SELECT doc_id, $toksSql AS toks FROM documents
         WHERE len($toksSql) >= 3),
       sh AS (
         SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
         FROM base)
       SELECT c.doc_id,
         count(DISTINCT c.sh) AS n_hit_ngrams,
         count(DISTINCT b.doc_id) AS n_bench_docs
       FROM sh c JOIN sh b ON c.sh = b.sh
       WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
       GROUP BY c.doc_id ORDER BY c.doc_id"""

  // ---------------------------------------------------------------- q76
  /** Deterministic stratified sampling — per-language keep rates
    * applied via an md5-derived per-row bucket instead of RNG, so the
    * sample is reproducible run-to-run, engine-to-engine, and under
    * retries/re-partitioning (rng-based sample() is none of those).
    * Pure map-side: at 100 TB this is a full-scan filter with zero
    * shuffle, and the same bucket column later supports consistent
    * train/eval splits. */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(encode(concat(lit("smp:"), col("doc_id").cast("string")),
        "UTF-8")), 1, 8), 16, 10).cast("long"), lit(1000))
    val rate = when(col("lang") === "en", 200)
      .when(col("lang") === "de", 350)
      .when(col("lang") === "es", 500)
      .when(col("lang") === "fr", 650)
      .otherwise(800)
    docs(s, dir)
      .withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  private val q76Sql =
    """WITH b AS (
         SELECT doc_id, lang,
           ('0x' || substr(md5('smp:' || doc_id), 1, 8))::BIGINT % 1000 AS bucket
         FROM documents)
       SELECT doc_id, lang, bucket FROM b
       WHERE bucket < CASE lang WHEN 'en' THEN 200 WHEN 'de' THEN 350
         WHEN 'es' THEN 500 WHEN 'fr' THEN 650 ELSE 800 END
       ORDER BY doc_id"""

  // ---------------------------------------------------------------- q77
  /** Sequence packing — group per-language doc streams into contiguous
    * 512-token training bins by running token count (the sort+cumsum
    * packing used for pretraining shard assembly). One window pass per
    * language partition; at scale the partition key is
    * (lang, shard-range) so no single window sees unbounded data, and
    * the cumulative sum never materializes the token arrays. */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
              TextFunctions.tokenCount(col("text")).as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("tok")) / lit(512)))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("tok")).as("bin_tokens"),
           min(col("doc_id")).as("first_doc"),
           max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("bin"))
  }

  private val q77Sql =
    s"""WITH t AS (
         SELECT doc_id, lang, len($toksSql) AS tok FROM documents),
       c AS (
         SELECT doc_id, lang, tok,
           sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM t)
       SELECT lang, CAST(floor((cum - tok) / 512.0) AS BIGINT) AS bin,
         count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS bin_tokens,
         min(doc_id) AS first_doc, max(doc_id) AS last_doc
       FROM c GROUP BY 1, 2 ORDER BY lang, bin"""

  // ---------------------------------------------------------------- q78
  /** PII scrubbing — regex redaction of emails and phone numbers with
    * per-document redaction counts. The corpus text carries no PII, so
    * each doc is salted with a deterministic fake email + phone first
    * (doc_id-derived), then scrubbed; output is the md5 of the scrubbed
    * text so the oracle pins the EXACT post-redaction bytes. Pure
    * map-side single pass — the 100 TB cost is one codegen'd regex scan,
    * no shuffle. */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val salted = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    docs(s, dir)
      .withColumn("salted", salted)
      .select(
        col("doc_id"),
        md5(encode(regexp_replace(regexp_replace(col("salted"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"), "UTF-8")).as("scrubbed_md5"),
        size(regexp_extract_all(col("salted"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("salted"), lit(phoneRe), lit(0))).as("n_phones"))
      .orderBy(col("doc_id"))
  }

  private val q78Sql =
    """WITH s AS (
         SELECT doc_id,
           text || ' contact user' || doc_id || '@example.com or +1-555-' ||
             lpad((doc_id % 10000)::VARCHAR, 4, '0') AS salted
         FROM documents)
       SELECT doc_id,
         md5(regexp_replace(regexp_replace(salted,
           '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
           '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5,
         CAST(len(regexp_extract_all(salted,
           '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
         CAST(len(regexp_extract_all(salted, '\+1-555-[0-9]{4}')) AS INT) AS n_phones
       FROM s ORDER BY doc_id"""

  // ---------------------------------------------------------------- q79
  /** Weighted source mixing — deterministic weighted round-robin
    * interleave of per-source document streams (training-mix assembly:
    * upweight curated sources, downweight crawl). Each row's mix
    * position is rank-within-source / weight; the global order of that
    * position IS the mix. Per-source rank is a partitioned window (no
    * global window), and the final global sort is exactly the sort any
    * shard-writer does anyway. */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val weight = when(col("source").isin("src0", "src1"), 4.0)
      .when(col("source").isin("src2", "src3"), 2.0)
      .otherwise(1.0)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs(s, dir)
      .withColumn("pos",
        round(row_number().over(w) / weight, 4))
      .select(col("doc_id"), col("source"), col("pos"))
      .orderBy(col("pos"), col("source"), col("doc_id"))
      .limit(200)
  }

  private val q79Sql =
    """WITH r AS (
         SELECT doc_id, source,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
           CASE WHEN source IN ('src0','src1') THEN 4.0
                WHEN source IN ('src2','src3') THEN 2.0 ELSE 1.0 END AS w
         FROM documents)
       SELECT doc_id, source, round(rk / w, 4) AS pos
       FROM r ORDER BY pos, source, doc_id LIMIT 200"""

  override def queries: Map[String, QueryFn] = Map(
    "q75_decontaminate" -> q75 _,
    "q76_sample_hash"   -> q76 _,
    "q77_pack_sequences" -> q77 _,
    "q78_pii_scrub"     -> q78 _,
    "q79_mix_weighted"  -> q79 _)

  override def oracles: Map[String, String] = Map(
    "q75_decontaminate" -> q75Sql,
    "q76_sample_hash"   -> q76Sql,
    "q77_pack_sequences" -> q77Sql,
    "q78_pii_scrub"     -> q78Sql,
    "q79_mix_weighted"  -> q79Sql)
}
