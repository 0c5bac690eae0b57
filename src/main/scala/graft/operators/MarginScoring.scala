package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ratio-margin scoring for parallel-corpus (bitext) mining — Artetxe &
  * Schwenk 2019 ("Margin-based Parallel Corpus Mining with Multilingual
  * Sentence Embeddings"), the criterion behind CCMatrix/CCAligned-scale
  * mining. Raw cosine is a poor mining score because some embeddings sit
  * in dense "hubs" where EVERY cosine is high; the margin normalizes each
  * pair's cosine by the average similarity of both endpoints to their own
  * k-nearest neighbors:
  *
  *   margin(x, y) = cos(x, y) / ((avgNNcos_k(x) + avgNNcos_k(y)) / 2)
  *
  * so a pair only scores > 1 when it is closer than its neighborhoods'
  * ambient density — the hub penalty falls out automatically.
  *
  * The operator takes the two kNN RELATIONS as inputs rather than raw
  * vectors, so any [[Similarity]] kNN slots in: `bruteForceTopK` for an
  * exact (and SQL-oracle-able) run, `srpTopK`/`srpMultiProbeTopK`/
  * `ivfTopK` for the 100 TB path — margin algebra is identical either
  * way, and the expensive step (the kNN) stays the caller's choice of
  * index. At scale both sides' kNN are banded equi-joins (corpus never
  * shuffles all-pairs) and this operator adds only two hash-aggregates
  * (k rows per id each) plus two equi-joins on id — no new scale risk.
  *
  * Reference scope: the capstone has no vector ops; this is the
  * training-data extension surface (mining aligned pairs for translation
  * / contrastive pretraining corpora).
  */
object MarginScoring {

  /** Margin-score every forward candidate pair.
    *
    * `fwd`: kNN relation src→tgt with columns (query_id, neighbor_id,
    * cos, rank) — query_id is a src id, neighbor_id a tgt id.
    * `bwd`: kNN relation tgt→src, same shape. `bwd` must cover every
    * tgt id appearing as a fwd neighbor (run it over the full tgt side).
    *
    * Output: (src_id, tgt_id, cos, margin) for every fwd pair — one row
    * per (query, neighbor) in `fwd`.
    */
  def scorePairs(fwd: DataFrame, bwd: DataFrame): DataFrame = {
    val fa = nbrAvg(fwd).withColumnRenamed("nbr_avg", "fwd_avg")
    val ba = nbrAvg(bwd).withColumnRenamed("nbr_avg", "bwd_avg")
      .withColumnRenamed("query_id", "neighbor_id")
    fwd.join(fa, "query_id")
      .join(ba, "neighbor_id")
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
              col("cos"),
              (col("cos") / ((col("fwd_avg") + col("bwd_avg")) / 2.0))
                .as("margin"))
  }

  /** Per-query neighborhood mean folded in RANK order — a plain
    * avg(cos) sums k doubles in partition order, so the low bits vary
    * run-to-run and engine-to-engine; folding the collected k-row
    * (bounded) neighborhood sorted by rank makes the sum one fixed
    * IEEE tree, the same sorted-fold discipline as
    * [[TemperatureMix.allocate]]'s weight total. Oracles mirror it
    * with `list_sum(list(... ORDER BY rank))`. */
  private def nbrAvg(rel: DataFrame): DataFrame =
    rel.groupBy(col("query_id"))
      .agg((aggregate(
          array_sort(collect_list(struct(col("rank").as("r"),
            col("cos").as("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c"))
        / count(lit(1))).as("nbr_avg"))

  /** The mined bitext: each src's single best candidate by margin,
    * kept only when the (6-dp rounded) margin clears `minMargin`
    * (Artetxe & Schwenk use ~1.06 on LASER embeddings). Rounding
    * BEFORE the rank makes the tie-break (tgt_id asc) robust to
    * last-ulp float divergence across engines; the same rounded
    * value is what callers compare downstream.
    *
    * Output: (src_id, tgt_id, cos, margin) — cos and margin rounded
    * to 6 dp, one row per surviving src.
    */
  def bestPairs(fwd: DataFrame, bwd: DataFrame,
                minMargin: Double): DataFrame = {
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc, col("tgt_id"))
    scorePairs(fwd, bwd)
      .select(col("src_id"), col("tgt_id"),
              round(col("cos"), 6).as("cos"),
              round(col("margin"), 6).as("margin"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("margin") >= minMargin)
      .drop("rk")
  }

  /** The INTERSECTION mining strategy (Artetxe & Schwenk §3.2): keep a
    * pair only when each side is the other's margin-best — src's best
    * tgt AND tgt's best src. Strictest of the published strategies
    * (highest precision, used when the downstream trainer can't absorb
    * mis-alignments). Both directions use the same rounded-margin /
    * id tie-break as [[bestPairs]], so mutuality is engine-exact.
    *
    * Each leg scores its own forward relation: src→tgt margins come
    * from (fwd, bwd), tgt→src margins from (bwd, fwd) — the SAME two
    * kNN inputs, no extra index work.
    */
  def mutualPairs(fwd: DataFrame, bwd: DataFrame,
                  minMargin: Double): DataFrame = {
    val srcBest = bestPairs(fwd, bwd, minMargin)
    val tgtBest = bestPairs(bwd, fwd, minMargin)
      .select(col("src_id").as("tgt_id"), col("tgt_id").as("src_id"))
    srcBest.join(tgtBest, Seq("src_id", "tgt_id"))
  }
}
