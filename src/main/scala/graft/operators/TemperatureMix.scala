package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-sampled source mixing (the T5/mT5 n^α family — Raffel
  * et al. 2020 §3.4.3, Xue et al. 2021): allocate a global budget B
  * across sources with per-source shares ∝ n_i^α. α=1 is proportional
  * (pure empirical mix), α=0 is uniform, and intermediate α up-weights
  * small sources without the hard cap UniMax (q423) applies — the two
  * operators are the standard alternatives a data card compares.
  *
  * Counts are EXACT largest-remainder apportionment of the weights
  * (every source gets floor(B·w_i/W); the leftover units go to the
  * largest fractional remainders, ties to the lexicographically
  * smaller source), so allocations are integers summing to exactly B.
  *
  * Cross-engine determinism: α is restricted to QUARTERS (α = q/4).
  * n^(q/4) is computed as a fixed tree of IEEE-exact operations —
  * n^(q div 4) by repeated multiplication (the q440 pow discipline)
  * times (sqrt(sqrt(n)))^(q mod 4), also repeated multiplication.
  * Every operation in the tree (*, /, sqrt) is correctly rounded
  * under IEEE 754, unlike libm pow/exp whose last-ulp behavior
  * differs between engines — so DuckDB writing the same tree
  * reproduces every weight bit-for-bit. α=1 and α=0 degenerate to
  * exact integer weights. The weight total W folds in ascending key
  * order (the q406 sorted-fold discipline) so float summation order
  * cannot diverge either.
  *
  * Scale shape: the per-source count table is S rows (S = number of
  * sources, tiny by definition); everything here is arithmetic over
  * that table plus one rank window — the corpus itself is touched
  * only by the upstream groupBy().count(). Reference scope: the
  * reference has no sampling operators at all (SURVEY.md §2.9);
  * extension surface next to UniMax/StratifiedSplit.
  */
object TemperatureMix {

  /** n^(alphaQuarters/4) as the fixed IEEE-exact expression tree
    * described above. alphaQuarters = 0 → 1.0, 4 → n exactly. */
  def weightExpr(n: Column, alphaQuarters: Int): Column = {
    require(alphaQuarters >= 0, s"negative α not supported: $alphaQuarters")
    val whole = alphaQuarters / 4
    val frac  = alphaQuarters % 4
    val nd    = n.cast("double")
    val root  = sqrt(sqrt(nd)) // n^(1/4), two correctly-rounded sqrts
    val wholePart = (1 to whole).foldLeft(lit(1.0): Column)((a, _) => a * nd)
    (1 to frac).foldLeft(wholePart)((a, _) => a * root)
  }

  /** Exact-count temperature allocation over a per-key count table.
    *
    * @param counts (keyCol, nCol) — one row per source, n > 0
    * @return (keyCol, n, alloc) with sum(alloc) = budget exactly. */
  def allocate(counts: DataFrame, keyCol: String, nCol: String,
               budget: Long, alphaQuarters: Int): DataFrame = {
    val base = counts.select(col(keyCol), col(nCol).cast("long").as("n"))
    // W = Σ w_i folded in ascending key order: collect the S-row table
    // into one sorted array and fold — deterministic summation order
    // on an S-row frame, never corpus-sized
    val w = weightExpr(col("n"), alphaQuarters)
    val weighted = base.withColumn("__w", w)
    val tot = weighted
      .agg(aggregate(
        array_sort(collect_list(struct(col(keyCol).as("k"), col("__w").as("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("__tw"))
    val quota = weighted.crossJoin(broadcast(tot))
      .withColumn("__q", lit(budget.toDouble) * col("__w") / col("__tw"))
      .withColumn("__fq", floor(col("__q")).cast("long"))
      .withColumn("__rem", col("__q") - col("__fq"))
    val wRem = Window.orderBy(col("__rem").desc, col(keyCol))
    quota
      .withColumn("__extras", lit(budget) - sum("__fq").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__bonus",
        when(row_number().over(wRem) <= col("__extras"), 1L).otherwise(0L))
      .select(col(keyCol), col("n"),
        (col("__fq") + col("__bonus")).as("alloc"))
  }

  /** Per-group variant of [[allocate]]: one INDEPENDENT largest-
    * remainder allocation per `groupCol` value — the shape of a
    * source-holdout ablation manifest (S what-if mixes planned in one
    * DataFrame instead of S driver loops) or per-snapshot re-mixes.
    * Same IEEE-exact weight tree; the weight total folds in ascending
    * key order WITHIN each group; remainder ranking and the extras
    * count are per-group windows. Each group's allocations sum to
    * exactly `budget`.
    *
    * Scale shape: the input is (groups × keys) rows — both bounded by
    * definition (sources, snapshots); all windows partition by the
    * group key. */
  def allocateGrouped(counts: DataFrame, groupCol: String, keyCol: String,
                      nCol: String, budget: Long,
                      alphaQuarters: Int): DataFrame = {
    val base = counts.select(col(groupCol), col(keyCol),
      col(nCol).cast("long").as("n"))
    val w = weightExpr(col("n"), alphaQuarters)
    val weighted = base.withColumn("__w", w)
    val tot = weighted.groupBy(col(groupCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col(keyCol).as("k"), col("__w").as("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("__tw"))
    val quota = weighted.join(tot, Seq(groupCol))
      .withColumn("__q", lit(budget.toDouble) * col("__w") / col("__tw"))
      .withColumn("__fq", floor(col("__q")).cast("long"))
      .withColumn("__rem", col("__q") - col("__fq"))
    val wRem = Window.partitionBy(col(groupCol))
      .orderBy(col("__rem").desc, col(keyCol))
    quota
      .withColumn("__extras", lit(budget) - sum("__fq").over(
        Window.partitionBy(col(groupCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__bonus",
        when(row_number().over(wRem) <= col("__extras"), 1L).otherwise(0L))
      .select(col(groupCol), col(keyCol), col("n"),
        (col("__fq") + col("__bonus")).as("alloc"))
  }

  /** EXECUTE an allocation: the budget-exact temperature-mixed sample
    * itself. Each source bucket's rows rank in the deterministic
    * md5-hash order (q76's sampling hash used as a RANK rather than a
    * rate, so per-bucket counts hit the [[allocate]] quota EXACTLY
    * instead of in expectation) and the first `alloc` rows survive;
    * re-runs, retries, and engines all select the same rows. An
    * undersupplied bucket (alloc > n — possible for tiny sources at
    * α < 1, where n^α up-weights them past their size) yields all its
    * rows; a production run resolves the shortfall by epoching that
    * source, which is a training-loader concern, not a sampling one.
    *
    * Scale shape: one S-row broadcast of the allocation table plus one
    * rank window per source partition — the same per-key window
    * discipline as StratifiedSplit and the funnel's domain cap. The
    * md5 order is uniform, so at extreme per-source cardinality the
    * window input can first be cut map-side to a hash-prefix cushion
    * (> alloc/n by construction) before ranking; the rank itself is
    * what makes the count exact.
    *
    * Output: the sampled rows, original columns. */
  def sample(docs: DataFrame, keyCol: String, idCol: String,
             budget: Long, alphaQuarters: Int): DataFrame = {
    val counts = docs.groupBy(keyCol)
      .agg(count(lit(1)).as("__n"))
    val alloc = allocate(counts, keyCol, "__n", budget, alphaQuarters)
      .select(col(keyCol), col("alloc").as("__alloc"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(concat(lit("tmx:"), col(idCol).cast("string"))), col(idCol))
    docs.join(broadcast(alloc), Seq(keyCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__alloc"))
      .drop("__rk", "__alloc")
  }

  /** [[sample]] WITH EPOCHING — the full mT5 mechanism: a bucket whose
    * quota exceeds its size repeats (small languages see multiple
    * epochs rather than silently under-filling the budget). Every row
    * of an undersupplied bucket emits floor(alloc/n) times (epochs
    * 0..floor−1), and the remaining alloc mod n units draw by the same
    * md5 rank as [[sample]] at epoch floor(alloc/n) — so per-bucket
    * output counts equal the allocation EXACTLY in all cases and the
    * total equals the budget. A bucket with alloc <= n degenerates to
    * [[sample]] with a constant 0 epoch column. Same plan shape as
    * [[sample]] plus one posexplode of a per-row epoch sequence
    * (map-side; the sequence length is the bucket's epoch count, a
    * small integer by construction).
    *
    * Output: sampled rows with an `epoch` column (0-based). */
  def sampleWithEpochs(docs: DataFrame, keyCol: String, idCol: String,
                       budget: Long, alphaQuarters: Int): DataFrame = {
    val counts = docs.groupBy(keyCol)
      .agg(count(lit(1)).as("__n"))
    val alloc = allocate(counts, keyCol, "__n", budget, alphaQuarters)
      .select(col(keyCol), col("n").as("__n"), col("alloc").as("__alloc"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(concat(lit("tmx:"), col(idCol).cast("string"))), col(idCol))
    // integral DIV, not double division-then-floor — exact at any size
    val full = expr("__alloc DIV __n")
    val rem = col("__alloc") % col("__n")
    docs.join(broadcast(alloc), Seq(keyCol))
      .withColumn("__rk", row_number().over(w))
      // epochs 0..full-1 unconditionally, plus epoch `full` for the
      // first `rem` rows in md5 rank order; sequence(0, full) always
      // has at least one element, and the filter trims the tail epoch
      .withColumn("epoch",
        explode(sequence(lit(0L), full)))
      .filter(col("epoch") < full ||
        (col("epoch") === full && col("__rk") <= rem))
      .drop("__rk", "__n", "__alloc")
  }
}
