package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.BpeTrainer

/** Round-8 pack, part 2: distributed BPE tokenizer training (q381) —
  * the learned-subword companion of q21's fixed-lexer token stats.
  */
object Extras59 extends QueryPack {

  private val Merges = 8

  // --------------------------------------------------------------- q381
  /** First 8 BPE merges learned from the documents corpus: per
    * iteration, the most frequent adjacent symbol pair over the word
    * dictionary (ties lexicographic on the pair), then a greedy
    * leftmost rewrite of every word. Runs the DISTRIBUTED loop
    * (localThreshold = 0) so the driver-verified path is the scale
    * shape: one corpus tokenize+count shuffle, then vocab-bounded
    * pair aggregates with a localCheckpoint lineage cut per merge.
    *
    * The oracle unrolls the identical small-step computation: per
    * merge, a pair-count CTE + top-1 CTE + a RECURSIVE-CTE greedy
    * walk over each word's symbol array (two-pointer i/i+2 skip —
    * provably the same rewrite as the engine's fold, see
    * [[BpeTrainer.mergeOnce]]). Every multiply-referenced CTE is
    * MATERIALIZED (DuckDB 1.0 inlines otherwise and the chain
    * expands exponentially). */
  private def q381(s: SparkSession, dir: String): DataFrame =
    BpeTrainer.train(Tables(s, dir)("documents"), "text", merges = Merges)
      .orderBy("merge_rank")

  // shared unrolled CTE chain (base tokenization + per-merge
  // pair-count / top-1 / recursive-walk steps) for q381 and q383
  private val chainSql: String = {
    val base =
      """WITH toks AS (
           SELECT unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             w -> w <> '')) AS w
           FROM documents),
         s0 AS MATERIALIZED (
           SELECT w, count(*) AS cnt,
                  list_transform(generate_series(1, length(w)),
                                 i -> substring(w, i, 1)) AS syms
           FROM toks GROUP BY w)"""
    val steps = (1 to Merges).map { k =>
      s""",
         pc$k AS MATERIALIZED (
           SELECT syms[i] AS l, syms[i + 1] AS r, sum(cnt) AS pc
           FROM s${k - 1}, unnest(generate_series(1, len(syms) - 1)) AS u(i)
           WHERE len(syms) >= 2 GROUP BY 1, 2),
         top$k AS MATERIALIZED (
           SELECT l, r, pc FROM pc$k ORDER BY pc DESC, l, r LIMIT 1),
         s$k AS MATERIALIZED (
           WITH RECURSIVE walk AS (
             SELECT w, cnt, syms, 1 AS i, CAST([] AS VARCHAR[]) AS acc
             FROM s${k - 1}
             UNION ALL
             SELECT w, cnt, syms,
               CASE WHEN i < len(syms) AND syms[i] = (SELECT l FROM top$k)
                         AND syms[i + 1] = (SELECT r FROM top$k)
                    THEN i + 2 ELSE i + 1 END,
               CASE WHEN i < len(syms) AND syms[i] = (SELECT l FROM top$k)
                         AND syms[i + 1] = (SELECT r FROM top$k)
                    THEN list_append(acc, (SELECT l || r FROM top$k))
                    ELSE list_append(acc, syms[i]) END
             FROM walk WHERE i <= len(syms))
           SELECT w, cnt, acc AS syms FROM walk WHERE i = len(syms) + 1)"""
    }.mkString
    base + steps
  }

  private val q381Sql: String = {
    val sel = (1 to Merges).map { k =>
      s"""SELECT $k AS merge_rank, l AS left_sym, r AS right_sym,
              CAST(pc AS BIGINT) AS pair_count FROM top$k"""
    }.mkString("\n       UNION ALL\n       ")
    chainSql + "\n       " + sel + "\n       ORDER BY merge_rank"
  }

  // --------------------------------------------------------------- q383
  /** BPE train→apply round trip: segment every corpus word with the
    * q381-learned merges (rank order, greedy leftmost). Applying the
    * merges to the training corpus replays exactly the training
    * rewrites, so the oracle reads the CTE chain's FINAL symbol state
    * — the cheap SQL proof that the engine's nested fold chain equals
    * the per-merge recursive walks. */
  private def q383(s: SparkSession, dir: String): DataFrame =
    BpeTrainer.segment(Tables(s, dir)("documents"), "text", merges = Merges)
      .orderBy("word")

  private[queries] val q383Sql: String =
    chainSql +
      s"""
       SELECT w AS word, CAST(cnt AS BIGINT) AS n_occurrences,
              CAST(len(syms) AS INT) AS n_subwords,
              array_to_string(syms, ' ') AS segmented
       FROM s$Merges ORDER BY word"""

  // --------------------------------------------------------------- q384
  /** Overlapping-window chunking over documents (64-token windows,
    * 16-token overlap) with a per-doc coverage rollup so the driver
    * checks both the window math and the no-degenerate-tail rule at
    * every sf. Pure map-side — the long-context prep shape. */
  private def q384(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunker
      .chunk(Tables(s, dir)("documents"), "doc_id", "text",
        chunkTokens = 64, overlap = 16)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum("n_tokens").cast("long").as("tok_sum"),
        max("start_tok").cast("int").as("last_start"),
        min("n_tokens").cast("int").as("min_chunk"))
      .orderBy("doc_id")

  private val q384Sql =
    """WITH d AS (
         SELECT doc_id,
                regexp_split_to_array(trim(text), '\s+') AS t
         FROM documents),
       starts AS (
         SELECT doc_id, t, u.s AS start_tok
         FROM d, unnest(generate_series(0,
                greatest(len(t) - 16 - 1, 0), 48)) AS u(s)),
       chunks AS (
         SELECT doc_id, start_tok,
                len(list_slice(t, start_tok + 1, start_tok + 64)) AS n_tokens
         FROM starts)
       SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_chunks,
              CAST(sum(n_tokens) AS BIGINT) AS tok_sum,
              CAST(max(start_tok) AS INT) AS last_start,
              CAST(min(n_tokens) AS INT) AS min_chunk
       FROM chunks GROUP BY doc_id ORDER BY doc_id"""

  // --------------------------------------------------------------- q385
  /** Tokenizer FERTILITY per language — subwords emitted per word
    * under the q381-learned vocabulary, the number that prices a
    * tokenizer choice (training cost and context usage scale with
    * it). Join shape: the segmented dictionary is vocab-bounded →
    * broadcast; the per-language word counts are one corpus
    * tokenize+count aggregate. */
  private def q385(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir)("documents")
    val seg = BpeTrainer.segment(docs, "text", merges = Merges)
    val langWords = docs
      .select(col("lang"),
        explode(graft.operators.SubstringDedup.tokens(col("text"))).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
    langWords
      .join(broadcast(seg.select(col("word"), col("n_subwords"))), "word")
      .groupBy("lang")
      .agg(sum("cnt").cast("long").as("n_words"),
        sum(col("cnt") * col("n_subwords")).cast("long").as("n_subwords"),
        round(sum(col("cnt") * col("n_subwords")).cast("double") /
          sum("cnt"), 6).as("fertility"))
      .orderBy("lang")
  }

  private val q385Sql: String =
    chainSql +
      s""",
       lang_words AS (
         SELECT lang, unnest(list_filter(
           regexp_split_to_array(lower(text), '[^a-z]+'),
           w -> w <> '')) AS word
         FROM documents),
       lw AS (SELECT lang, word, count(*) AS cnt
              FROM lang_words GROUP BY lang, word)
       SELECT lang,
              CAST(sum(lw.cnt) AS BIGINT) AS n_words,
              CAST(sum(lw.cnt * len(syms)) AS BIGINT) AS n_subwords,
              round(CAST(sum(lw.cnt * len(syms)) AS DOUBLE) / sum(lw.cnt), 6)
                AS fertility
       FROM lw JOIN s$Merges ON lw.word = s$Merges.w
       GROUP BY lang ORDER BY lang"""

  override def queries: Map[String, QueryFn] = Map(
    "q381_bpe_train" -> q381 _,
    "q383_bpe_segment" -> q383 _,
    "q384_doc_chunks" -> q384 _,
    "q385_bpe_fertility" -> q385 _)

  override def oracles: Map[String, String] = Map(
    "q381_bpe_train" -> q381Sql,
    "q383_bpe_segment" -> q383Sql,
    "q384_doc_chunks" -> q384Sql,
    "q385_bpe_fertility" -> q385Sql)
}
