package graft.functions

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.Encoders

import graft.GraftTestBase
import graft.functions.expressions.MinHashSignature

class CountMinSketchSpec extends GraftTestBase {
  import spark.implicits._

  private val P = MinHashSignature.P
  private val d = 4
  private val w = 32

  private def items: Seq[Long] =
    (Seq.fill(100)(7L) ++ Seq.fill(40)(13L) ++ Seq.fill(5)(99L)
      ++ (0L until 50L)).map(h => ((h % P) + P) % P)

  private def sketchOf(parts: Int): Array[Long] = {
    val cms = F.udaf(new CountMinSketch(d, w), Encoders.scalaLong)
    items.toDF("h").repartition(parts)
      .agg(cms(F.col("h")).as("sk"))
      .as[Array[Long]].head()
  }

  test("estimates never undercount and bound the heavy hitter tightly") {
    val sk = sketchOf(4)
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size }
    exact.foreach { case (h, n) =>
      val est = CountMinSketch.estimate(sk, d, w, h)
      assert(est >= n, s"undercount for $h: $est < $n")
    }
    // the 100-count item cannot be inflated past total mass
    assert(CountMinSketch.estimate(sk, d, w, 7L) <= items.size)
  }

  test("sketch is partitioning-invariant (merge is exact addition)") {
    assert(sketchOf(1).toSeq == sketchOf(8).toSeq)
  }

  test("sketch equals the relational simulation (per-row bucket sums)") {
    val sk = sketchOf(4)
    val sim = new Array[Long](d * w)
    items.foreach { h =>
      (0 until d).foreach { r =>
        val (a, b) = MinHashSignature.coef(r)
        val x = (a * h + b) % P
        sim(r * w + (((x % w) + w) % w).toInt) += 1
      }
    }
    assert(sk.toSeq == sim.toSeq)
  }
}
