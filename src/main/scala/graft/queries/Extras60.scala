package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.QualityClassifier

/** Round-8 pack, part 3: model-based quality filtering (q386) — the
  * learned-classifier gate next to q22's rule stack.
  */
object Extras60 extends QueryPack {

  // exact mirror of TextFunctions.tokens (q22's oracle precedent —
  // no empty-filter: split of trimmed text never yields one)
  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  // --------------------------------------------------------------- q386
  /** fastText-style quality scoring: a literal-weight linear model over
    * exact count-ratio features (saturating length, stopword density,
    * punctuation share, lexical diversity) with a sigmoid gate —
    * featurize→dot→sigmoid is ONE row-local codegen projection, zero
    * shuffles at any corpus scale (the model is bytes of driver
    * state). The oracle rebuilds the identical features and weight
    * sum in the same term order, so scores match through round(6). */
  private def q386(s: SparkSession, dir: String): DataFrame =
    QualityClassifier.filter(Tables(s, dir)("documents"), "text")
      .select(col("doc_id"),
        round(col("quality_score"), 6).as("quality_score"), col("kept"))
      .orderBy("doc_id")

  // feature counts + logit weights from OracleLogit — shared with
  // q424/q426/q484 so the classifier oracles cannot drift per-query
  private val q386Sql =
    s"""WITH f AS (
         ${OracleLogit.featuresSql("doc_id")}),
       z AS (
         SELECT doc_id,
           ${OracleLogit.zExprSql} AS z
         FROM f)
       SELECT doc_id,
              round(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
              CAST(CASE WHEN 1.0 / (1.0 + exp(-z)) >= 0.5
                   THEN 1 ELSE 0 END AS INT) AS kept
       FROM z ORDER BY doc_id"""

  // --------------------------------------------------------------- q387
  /** SOFT dedup — duplicate-aware sampling weights instead of hard
    * removal (the D4/SemDeDup-ablation alternative): every member of
    * an exact-dup cluster of size s keeps weight 1/s, so the cluster
    * contributes ONE document's worth of probability mass while
    * preserving in-cluster variety. Per-source rollup of raw vs
    * effective docs/tokens and the inflation ratio — the number that
    * says how over-counted each source is. One fingerprint hash-agg
    * (the q07/q377 shuffle) + a broadcast-size cluster join. */
  private def q387(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir)("documents")
    val clusters = docs.groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("sz"))
    docs.withColumn("fp", md5(col("text")))
      .join(clusters, "fp")
      .withColumn("w", lit(1.0) / col("sz"))
      .withColumn("n_tok", size(graft.functions.TextFunctions.tokens(col("text"))))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        round(sum("w"), 6).as("docs_effective"),
        sum("n_tok").cast("long").as("n_tokens"),
        round(sum(col("n_tok") * col("w")), 6).as("tokens_effective"),
        round(sum("n_tok") / sum(col("n_tok") * col("w")), 6)
          .as("inflation"))
      .orderBy("source")
  }

  private val q387Sql =
    s"""WITH cl AS (
         SELECT md5(text) AS fp, count(*) AS sz
         FROM documents GROUP BY md5(text)),
       d AS (
         SELECT source, 1.0 / sz AS w,
                len($toksSql) AS n_tok
         FROM documents JOIN cl ON md5(text) = cl.fp)
       SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              round(sum(w), 6) AS docs_effective,
              CAST(sum(n_tok) AS BIGINT) AS n_tokens,
              round(sum(n_tok * w), 6) AS tokens_effective,
              round(sum(n_tok) / sum(n_tok * w), 6) AS inflation
       FROM d GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------- q388
  /** INCREMENTAL snapshot dedup — new docs (doc_id % 2 = 1) gated
    * against the accumulated old corpus (doc_id % 2 = 0) with
    * [[graft.operators.Dedup.minhashGate]]: new×old candidates only,
    * never old×old — the recurring-crawl shape where the old side's
    * band index is built once. md5 family + raw band keys so the
    * oracle replays the exact candidate set. */
  private def q388(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val docs = Tables(s, dir)("documents").filter(length(col("text")) >= 5)
    def sigs(df: DataFrame) = Dedup.minhashSignaturesComposed(
      df.select(col("doc_id"),
        graft.functions.TextFunctions.charShingles(col("text"), 5).as("__sh")),
      "doc_id", "__sh", 16, Dedup.mdBaseHash)
    // one signature pass over the corpus, split after materialization
    // (each side is read twice by the gate — bands + scoring re-join)
    val allSigs = sigs(docs).localCheckpoint()
    val newSigs = allSigs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val oldSigs = allSigs.filter(pmod(col("doc_id"), lit(2)) === 0)
    Dedup.minhashGate(newSigs, oldSigs, "doc_id", k = 16, bands = 4,
        threshold = 0.5, hashBandKeys = false)
      .select(col("in_id").as("new_id"), col("idx_id").as("old_id"),
        round(col("est_jaccard"), 6).as("est_jaccard"))
      .orderBy("new_id", "old_id")
  }

  private val q388Sql = {
    val P = graft.functions.expressions.MinHashSignature.P
    val sigList = (0 until 16)
      .map { i =>
        val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    val agree = (1 to 16)
      .map(i => s"CASE WHEN na.sig[$i] = ob.sig[$i] THEN 1 ELSE 0 END")
      .mkString(" + ")
    val bandKey = (1 to 4)
      .map(j => s"sig[4 * t.b + $j]::VARCHAR")
      .mkString(" || ',' || ")
    s"""WITH d AS (
         SELECT doc_id,
           list_transform(
             list_distinct(list_transform(generate_series(1, length(text) - 4),
               i -> substring(text, i, 5))),
             s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % $P) AS hx
         FROM documents WHERE length(text) >= 5),
       sigs AS MATERIALIZED (SELECT doc_id, $sigList AS sig FROM d),
       bands AS MATERIALIZED (
         SELECT doc_id, t.b AS band_idx, $bandKey AS band_key
         FROM sigs, unnest(generate_series(0, 3)) AS t(b)),
       cand AS (
         SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
         FROM bands n JOIN bands o
           ON n.band_idx = o.band_idx AND n.band_key = o.band_key
         WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0),
       est AS (
         SELECT new_id, old_id, ($agree) / 16.0 AS e
         FROM cand
         JOIN sigs na ON na.doc_id = new_id
         JOIN sigs ob ON ob.doc_id = old_id)
       SELECT new_id, old_id, round(e, 6) AS est_jaccard
       FROM est WHERE e >= 0.5 ORDER BY new_id, old_id"""
  }

  // --------------------------------------------------------------- q395
  /** Lexicon/blocklist gate — the list-based filter stage next to the
    * statistical (q22/q386) and regex (q78) gates: a curated term list
    * broadcasts as a literal set, each document reports its distinct
    * hits and hit mass, and the gate trips past a threshold. Pure
    * map-side (array_intersect against a literal array — no join, no
    * shuffle); at 100 TB a large lexicon would broadcast as a real
    * table or Bloom filter with the same plan shape. The list here is
    * a stand-in quality lexicon over corpus-frequent terms so every sf
    * has both gated and clean docs. */
  private def q395(s: SparkSession, dir: String): DataFrame = {
    val lexicon = Seq("forbidden", "restricted", "classified",
      "data", "sample", "common")
    val toks = graft.operators.SubstringDedup.tokens(col("text"))
    val hits = array_sort(array_intersect(array_distinct(toks),
      typedLit(lexicon)))
    Tables(s, dir)("documents")
      .select(col("doc_id"),
        size(hits).as("n_hit_terms"),
        size(filter(toks, t => t.isInCollection(lexicon))).as("hit_mass"),
        concat_ws(",", hits).as("hit_terms"))
      .withColumn("gated", (col("n_hit_terms") >= 2).cast("int"))
      .filter(col("n_hit_terms") > 0)
      .orderBy("doc_id")
  }

  private val q395Sql = {
    val lex = "['forbidden', 'restricted', 'classified', 'data', 'sample', 'common']"
    val toksAz =
      "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> w <> '')"
    s"""WITH d AS (
         SELECT doc_id,
           list_sort(list_intersect(list_distinct($toksAz), $lex))
             AS hits,
           len(list_filter($toksAz, t -> list_contains($lex, t)))
             AS hit_mass
         FROM documents)
       SELECT doc_id,
              CAST(len(hits) AS INT) AS n_hit_terms,
              CAST(hit_mass AS INT) AS hit_mass,
              array_to_string(hits, ',') AS hit_terms,
              CAST(CASE WHEN len(hits) >= 2 THEN 1 ELSE 0 END AS INT)
                AS gated
       FROM d WHERE len(hits) > 0 ORDER BY doc_id"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q386_quality_model" -> q386 _,
    "q387_soft_dedup" -> q387 _,
    "q388_incremental_dedup" -> q388 _,
    "q395_blocklist_gate" -> q395 _)

  override def oracles: Map[String, String] = Map(
    "q386_quality_model" -> q386Sql,
    "q387_soft_dedup" -> q387Sql,
    "q388_incremental_dedup" -> q388Sql,
    "q395_blocklist_gate" -> q395Sql)
}
