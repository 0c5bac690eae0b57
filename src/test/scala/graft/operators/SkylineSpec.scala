package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftTestBase

class SkylineSpec extends GraftTestBase {

  /** Quadratic reference dominance check, the definition itself. */
  private def bruteSkyline(pts: Seq[(Long, Int, Double)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx <= x && by <= y && (bx < x || by < y)
      }
    }.map(_._1).toSet

  test("matches the quadratic dominance definition on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(30), (rnd.nextInt(500) / 10.0)))
    val df = pts.toDF("id", "x", "y").repartition(7)
    val got = Skyline.skyline2D(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == bruteSkyline(pts))
  }

  test("duplicate frontier points all survive; dominated ties do not") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, 5.0), (2L, 1, 5.0),  // duplicates on the frontier
      (3L, 1, 6.0),                // same x, worse y -> dominated
      (4L, 2, 5.0),                // worse x, same y -> dominated
      (5L, 2, 4.0), (6L, 3, 1.0)   // frontier steps
    ).toDF("id", "x", "y").repartition(3)
    val got = Skyline.skyline2D(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L, 6L))
  }

  test("local prune pass never drops a global frontier point") {
    import spark.implicits._
    // adversarial layout: global frontier points scattered so each hash
    // partition sees mostly-dominated neighbors
    val pts = (0 until 300).map { i =>
      (i.toLong, i % 25, ((300 - i) % 40) + (i % 3) * 0.5)
    }
    val df = pts.toDF("id", "x", "y").repartition(11)
    val got = Skyline.skyline2D(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == bruteSkyline(pts))
  }
}
