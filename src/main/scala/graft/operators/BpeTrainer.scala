package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Distributed BPE-merge tokenizer training (Sennrich et al. 2016) —
  * the missing rung under the engine's token statistics (q21 assumes a
  * FIXED lexer; this learns the subword vocabulary that lexer would
  * use).
  *
  * Classic BPE: start from characters, repeatedly merge the most
  * frequent adjacent symbol pair (greedy leftmost, non-overlapping),
  * emit the ordered merge list. The standard scale trick applies: the
  * loop runs over the WORD DICTIONARY (word, count), not the corpus —
  * one corpus-wide tokenize+count shuffle up front, then every
  * iteration touches only vocab-bounded rows. At 100 TB the corpus pass
  * is the only corpus-sized job; iterations aggregate a dictionary that
  * is orders of magnitude smaller (and per-word work shrinks as merges
  * consume symbols).
  *
  * Iteration shape (the [[PageRank]]/[[Hits]] discipline):
  *   - pair counting: one zip_with(syms, tail(syms)) explode +
  *     hash-aggregate over the dict — map-side combinable;
  *   - top-1 selection: orderBy(pc desc, l, r).limit(1) to the driver —
  *     bounded state (one row), and inherently sequential: merge k+1's
  *     counts depend on merge k's rewrite, so this round-trip is the
  *     algorithm, not an artifact;
  *   - merge rewrite: a row-local fold (aggregate HOF) — greedy
  *     leftmost by construction: a freshly merged token (the string
  *     l||r) can never re-match l in the same pass, so the fold equals
  *     the two-pointer walk; localCheckpoint per iteration cuts the
  *     nested-HOF lineage (plan depth stays O(1) in merges).
  *
  * `localThreshold > 0` opts into a driver-side loop when the dict is
  * at or below that many words — identical math, deterministic
  * (sorted-word accumulation), the [[Hits.run]] bounded-graph pattern
  * for corpora whose vocabulary fits comfortably on the driver.
  *
  * Ties in pair frequency break lexicographically on (left, right), so
  * training is deterministic on any corpus.
  */
object BpeTrainer {

  private val outSchema = StructType(Seq(
    StructField("merge_rank", IntegerType, nullable = false),
    StructField("left_sym", StringType, nullable = false),
    StructField("right_sym", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false)))

  /** Greedy leftmost single-merge rewrite as a row-local fold. CaseWhen
    * short-circuits, so element_at(acc, -1) never evaluates on the
    * empty accumulator (ANSI mode would throw). */
  private def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) === 0, array(s))
        .when(element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** The ordered merge table after up to `merges` merges (fewer if the
    * dictionary runs out of adjacent pairs).
    * Output: (merge_rank, left_sym, right_sym, pair_count). */
  def train(docs: DataFrame, textCol: String, merges: Int,
            localThreshold: Long = 0L): DataFrame = {
    require(merges > 0, "merges must be positive")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(SubstringDedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

    val learned =
      if (localThreshold > 0L && dictFits(words, localThreshold))
        trainLocal(words, merges)
      else
        trainDistributed(words, merges)

    spark.createDataFrame(
      java.util.Arrays.asList(learned.map { case (k, l, r, pc) =>
        Row(k, l, r, pc)
      }: _*), outSchema)
  }

  /** APPLY the learned vocabulary: train `merges` merges, then rewrite
    * the word dictionary through them in rank order (one projection of
    * nested [[mergeOnce]] folds — row-local, no shuffle beyond the
    * dict build). Output: (word, n_occurrences, n_subwords, segmented)
    * — the segmentation a BPE tokenizer built from this corpus would
    * produce for every corpus word, i.e. the train→apply round trip.
    * Because apply replays exactly the training rewrites on the same
    * corpus, the result equals the training loop's final symbol state
    * (which is how the SQL oracle reproduces it). */
  def segment(docs: DataFrame, textCol: String, merges: Int,
              localThreshold: Long = 0L): DataFrame = {
    val learned = train(docs, textCol, merges, localThreshold)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    segmentWith(docs, textCol, learned.toSeq)
  }

  /** Apply an ALREADY-LEARNED merge table (rank order) — the serve
    * side of the persisted-tokenizer contract ([[ModelStore.saveBpe]]):
    * a production tokenizer is trained once and applied to every
    * corpus thereafter, so apply must not re-run the training loop.
    * Same greedy leftmost fold as [[segment]] (which delegates here),
    * so fresh-fit and persisted-serve outputs are bit-identical. */
  def segmentWith(docs: DataFrame, textCol: String,
                  learned: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(explode(SubstringDedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val syms0: Column = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    val symsN = learned.foldLeft(syms0) { case (c, (l, r)) =>
      mergeOnce(c, l, r)
    }
    words.select(col("w").as("word"),
      col("cnt").cast("long").as("n_occurrences"),
      size(symsN).as("n_subwords"),
      concat_ws(" ", symsN).as("segmented"))
  }

  private def dictFits(words: DataFrame, threshold: Long): Boolean =
    // limit+count instead of a full count: stop scanning the dict the
    // moment it provably exceeds the threshold
    words.limit(math.min(threshold + 1L, Int.MaxValue.toLong).toInt)
      .count() <= threshold

  private def trainDistributed(words: DataFrame,
                               merges: Int): Seq[(Int, String, String, Long)] = {
    var seqs = words.select(col("w"), col("cnt"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"))
      .localCheckpoint()
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= merges && !exhausted) {
      val top = seqs.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("pc"))
        .orderBy(desc("pc"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pc) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        out += ((k, l, r, pc))
        seqs = seqs
          .withColumn("syms", mergeOnce(col("syms"), l, r))
          .localCheckpoint()
        k += 1
      }
    }
    out.result()
  }

  private def trainLocal(words: DataFrame,
                         merges: Int): Seq[(Int, String, String, Long)] = {
    val dict = words.orderBy("w").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var seqs: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= merges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), pc) = counts.minBy { case ((l, r), pc) => (-pc, l, r) }
        out += ((k, l, r, pc))
        val m = l + r
        seqs = seqs.map { case (syms, c) =>
          val b = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += m; i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), c)
        }
        k += 1
      }
    }
    out.result()
  }
}
