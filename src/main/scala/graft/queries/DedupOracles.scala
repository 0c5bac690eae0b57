package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Oracle-able MinHash and SimHash variants.
  *
  * The production operators (q26/q27) hash with xxhash64, which DuckDB
  * doesn't implement — their driver check is rows-only. These twins use
  * an md5-derived hash family (md5 is identical in both engines; the
  * first 8 hex chars convert via Spark `conv(_,16,10)` / DuckDB
  * `('0x'||_)::BIGINT`), so the SAME sketch mathematics hash-matches
  * the DuckDB oracle end-to-end: signature minima, positionwise
  * agreement estimates, bit-vote signs. Slower hash family — these are
  * correctness anchors, the performant path stays q26/q27.
  */
object DedupOracles extends QueryPack {

  private val K = 16 // permutations / bits — keeps the generated SQL sane

  /** H(prefix:s) = int64 of first 8 md5 hex chars. */
  private def mdHash(prefix: String, s: Column): Column =
    conv(substring(md5(encode(concat(lit(prefix), s), "UTF-8")), 1, 8), 16, 10)
      .cast("long")

  private def mdHashSql(prefix: String, s: String): String =
    s"(('0x' || substr(md5('$prefix' || $s), 1, 8))::BIGINT)"

  // ---------------------------------------------------------------- q43
  /** MinHash similarity estimation, oracle-checkable: ONE md5 base hash
    * per shingle, then the SAME affine permutation family as the
    * production operator (MinHashSignature.coef over the Mersenne
    * prime) — so the oracle verifies the production sketch mathematics,
    * only the base hash differs. Positionwise agreement / k over all
    * same-source pairs of the doc_id%10 subsample. */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val P = graft.functions.expressions.MinHashSignature.P
    val base = graft.operators.Spread.byKey(
        Tables(s, dir)("documents")
          .filter(pmod(col("doc_id"), lit(10)) === 0 && length(col("text")) >= 5),
        col("doc_id"))
      .select(col("doc_id"), col("source"),
              transform(TextFunctions.charShingles(col("text"), 5),
                        sh => pmod(mdHash("", sh), lit(P))).as("hx"))
    val sig = array((0 until K).map { i =>
      val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
      array_min(transform(col("hx"), x => pmod(lit(a) * x + lit(b), lit(P))))
    }: _*)
    // materialized once: BOTH self-join sides read the signatures —
    // without this the shingle+md5 subtree evaluates twice
    val sigs = base.select(col("doc_id"), col("source"), sig.as("sig"))
      .localCheckpoint()
    val est = (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
                           b => b)).cast("double") / K).as("est")
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              round(est, 4).as("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q43Sql = {
    val P = graft.functions.expressions.MinHashSignature.P
    val sigList = (0 until K)
      .map { i =>
        val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    val agree = (1 to K)
      .map(i => s"CASE WHEN a.sig[$i] = b.sig[$i] THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH d AS (
         SELECT doc_id, source,
           list_transform(
             list_distinct(list_transform(generate_series(1, length(text) - 4),
               i -> substring(text, i, 5))),
             s -> ${mdHashSql("", "s")} % $P) AS hx
         FROM documents WHERE doc_id % 10 = 0 AND length(text) >= 5),
       sigs AS (SELECT doc_id, source, $sigList AS sig FROM d)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(($agree) / ${K}.0, 4) AS est_jaccard
       FROM sigs a JOIN sigs b
         ON a.source = b.source AND a.doc_id < b.doc_id
       ORDER BY doc_a, doc_b"""
  }

  // ---------------------------------------------------------------- q44
  /** 16-bit SimHash signatures, oracle-checkable: per-token md5-family
    * hash, bit votes ±1, sign per bit → packed int. */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables(s, dir)("documents")
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"),
              explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), mdHash("", col("tok")).as("h"))
    val votes = (0 until K).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val packed = (0 until K)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), packed.as("simhash16"))
      .orderBy(col("doc_id"))
  }

  private val q44Sql = {
    val votes = (0 until K)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(", ")
    val packed = (0 until K)
      .map(b => s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (
         SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         FROM documents WHERE doc_id % 10 = 0),
       h AS (SELECT doc_id, ${mdHashSql("", "tok")} AS h FROM tok),
       v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
       SELECT doc_id, CAST($packed AS BIGINT) AS simhash16
       FROM v ORDER BY doc_id"""
  }

  // ---------------------------------------------------------------- q45
  /** Karp-Rabin rolling (polynomial) document fingerprint: a sequential
    * fold h = (h·131 + code(cᵢ)) mod P over the normalized text — the
    * incremental-hash primitive behind windowed content chunking. Both
    * engines fold left-to-right, so the oracle is exact. Computed by
    * the native RollingHash expression: the composable
    * aggregate∘transform∘substr form is O(n²) per row (each substr
    * rescans the UTF8 prefix — measured 33 s at sf0.1 vs <1 s fused). */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    val norm = TextFunctions.normalize(col("text"))
    Tables(s, dir)("documents")
      .select(col("doc_id"),
              graft.functions.expressions.RollingHash.rollingHash(norm)
                .as("rolling_hash"),
              length(norm).as("n_norm_chars"))
      .orderBy(col("doc_id"))
  }

  private val q45Sql = {
    val P = graft.functions.expressions.MinHashSignature.P
    val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    s"""WITH n AS (SELECT doc_id, $norm AS t FROM documents)
       SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, length(t)),
               i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
           (acc, c) -> (acc * 131 + c) % $P) AS rolling_hash,
         CAST(length(t) AS INT) AS n_norm_chars
       FROM n ORDER BY doc_id"""
  }

  override val queries: Map[String, QueryFn] = Map(
    "q43_minhash_oracle" -> q43 _,
    "q44_simhash_oracle" -> q44 _,
    "q45_rolling_hash"   -> q45 _)

  override val oracles: Map[String, String] = Map(
    "q43_minhash_oracle" -> q43Sql,
    "q44_simhash_oracle" -> q44Sql,
    "q45_rolling_hash"   -> q45Sql)
}
