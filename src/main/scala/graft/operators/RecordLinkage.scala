package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: candidate pairs form only WITHIN a
  * blocking key (so the quadratic comparison never leaves a block),
  * score by edit distance, and keep each left record's single best
  * match with a total-order tie-break.
  *
  * Scale shape: the join hashes on the block key — at 100 TB the cost
  * is one shuffle per side plus per-block products, so blocker choice
  * (selectivity) is the tuning knob; the best-match window partitions
  * by the left key, which the block join already co-located up to the
  * block→key refinement.
  */
object RecordLinkage {

  /** Default blocker: the trailing word — robust to leading-edge noise
    * in entity names. */
  def lastToken(c: Column): Column = regexp_extract(c, "[a-z]+$", 0)

  /** For each left row, the single best (lowest edit distance, then
    * lexicographically first) right match within the same block, at
    * most `maxDist` edits away. Output: left columns + `match_<right>`
    * + `dist`. */
  def linkBest(left: DataFrame, leftCol: String,
               right: DataFrame, rightCol: String,
               maxDist: Int = 3,
               blocker: Column => Column = lastToken): DataFrame = {
    val cand = left
      .withColumn("__lblk", blocker(col(leftCol)))
      .join(right.withColumn("__rblk", blocker(col(rightCol))),
        col("__lblk") === col("__rblk"))
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol)))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy(col(leftCol))
      .orderBy(col("dist"), col(rightCol))
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__lblk", "__rblk")
  }
}
