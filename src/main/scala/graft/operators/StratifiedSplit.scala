package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified train/val/test assignment with EXACT per-stratum counts
  * — the splitter a dataset card can cite: within every stratum the
  * split sizes are the largest-remainder apportionment of the
  * requested percentages (each split gets floor(n·pct/100), and the
  * leftover rows go to the splits with the largest integer
  * remainders), so a 10-doc stratum at 80/10/10 yields exactly
  * 8/1/1 — never the 10/0/0 a per-row hash split can produce on small
  * strata, and never a fractional expectation.
  *
  * Everything is INTEGER arithmetic (n·pct is an exact Long, /100 and
  * %100 are integer ops), so quotas are engine-identical by
  * construction — no floor(n · 0.8) double hazard. Row order within a
  * stratum is the deterministic md5("spl:" || id) hash (ties by id),
  * the same reproducible-under-retries discipline as the pipeline's
  * hash sampler; re-running on the same data reassigns identically.
  *
  * Scale shape: one count aggregate per stratum, a splits-explode
  * over the TINY stratum table, and one rank window per stratum over
  * the data — the only corpus-sized work. Skewed strata are exactly
  * the partitions the rank window must order anyway.
  *
  * Caveat the cluster-split audit (q402/q417) owns: hash-ordering
  * does NOT respect near-dup clusters; dedup before you split, or
  * feed cluster representatives as the id.
  */
object StratifiedSplit {

  /** @param splits (name, percent) in priority order, summing to 100;
    *               remainder ties break toward the EARLIER split.
    * @return (idCol, stratumCol, split) one row per input row. */
  def assign(df: DataFrame, idCol: String, stratumCol: String,
             splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, s"percents must sum to 100: $splits")
    val cnt = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    val splitRows = array(splits.zipWithIndex.map { case ((nm, pct), k) =>
      struct(lit(k).as("k"), lit(nm).as("split"), lit(pct.toLong).as("pct"))
    }: _*)
    // `div` is Spark's INTEGER division (`/` on longs detours through
    // double); prod stays exact Long for any real stratum size
    val q0 = cnt.select(col(stratumCol), col("n"), explode(splitRows).as("s"))
      .select(col(stratumCol), col("n"), col("s.k").as("k"),
        col("s.split").as("split"),
        (col("n") * col("s.pct")).as("prod"))
      .select(col(stratumCol), col("n"), col("k"), col("split"),
        expr("prod div 100").as("floorq"),
        (col("prod") % 100).as("rem"))
    val wRem = Window.partitionBy(stratumCol)
      .orderBy(col("rem").desc, col("k"))
    val wCum = Window.partitionBy(stratumCol).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val quotas = q0
      .withColumn("extras",
        (col("n") - sum("floorq").over(Window.partitionBy(stratumCol))))
      .withColumn("bonus",
        when(row_number().over(wRem) <= col("extras"), 1L).otherwise(0L))
      .withColumn("quota", col("floorq") + col("bonus"))
      .withColumn("cum", sum("quota").over(wCum))
      .select(col(stratumCol), col("k"), col("split"),
        (col("cum") - col("quota")).as("lo"), col("cum").as("hi"))
    val wRank = Window.partitionBy(stratumCol)
      .orderBy(md5(concat(lit("spl:"), col(idCol).cast("string"))), col(idCol))
    df.select(col(idCol), col(stratumCol))
      .withColumn("__rk", row_number().over(wRank).cast("long"))
      .join(quotas, Seq(stratumCol))
      .filter(col("__rk") > col("lo") && col("__rk") <= col("hi"))
      .select(col(idCol), col(stratumCol), col("split"))
  }
}
