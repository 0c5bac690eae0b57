package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Pins the privacy-operator contracts: suppression exactly removes
  * at-risk groups, and the DP noise is deterministic per (key, salt)
  * while changing with the salt. */
class AnonymizeSpec extends GraftTestBase {
  import spark.implicits._

  // qid group "a" has 6 rows, "b" has 3, "c" has 1
  private def df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
    .zipWithIndex.map { case (g, i) => (i.toLong, g) }
    .toDF("id", "qid")

  test("kAnonymityProfile counts groups and flags those below k") {
    val p = Anonymize.kAnonymityProfile(df, Seq("qid"), 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2))).toMap
    assert(p == Map("a" -> ((6L, 0)), "b" -> ((3L, 1)), "c" -> ((1L, 1))))
  }

  test("kSuppress removes exactly the at-risk groups") {
    val out = Anonymize.kSuppress(df, Seq("qid"), 5)
    assert(out.count() == 6)
    assert(out.select("qid").distinct().collect().map(_.getString(0)).toSeq
      == Seq("a"))
  }

  test("kSuppress is null-safe: a rare NULL-qid group is suppressed too") {
    // NULL is a group to groupBy but not to an equality join — the
    // suppression anti-join must use <=> or exactly the rarest (most
    // identifying) rows survive.
    val withNull = df.union(Seq((99L, null.asInstanceOf[String]))
      .toDF("id", "qid"))
    val out = Anonymize.kSuppress(withNull, Seq("qid"), 5)
    assert(out.count() == 6)
    assert(out.filter(col("qid").isNull).count() == 0,
      "NULL-qid singleton escaped suppression")
  }

  test("laplace noise is deterministic per (key, salt) and salt-sensitive") {
    val keys = (0 until 100).map(_.toString).toDF("k")
    def noise(salt: String) = keys
      .select(Anonymize.laplaceNoise(col("k"), salt, 2.0).as("n"))
      .collect().map(_.getDouble(0)).toSeq
    val a = noise("s1")
    assert(a == noise("s1"))
    assert(a != noise("s2"))
    // symmetric-ish and finite: no NaN/Inf, both signs present
    assert(a.forall(x => !x.isNaN && !x.isInfinite))
    assert(a.exists(_ > 0) && a.exists(_ < 0))
    // Laplace(b=2): ~75% of mass inside |x| <= 2*ln(2)*2 ≈ 2.77; be loose
    assert(a.count(x => math.abs(x) <= 6.0) >= 80)
  }

  test("dpCounts clamps releases at zero and keeps true counts intact") {
    val out = Anonymize.dpCounts(df, "qid", epsilon = 0.5, salt = "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set("a", "b", "c"))
    assert(out("a")._1 == 6L && out("b")._1 == 3L && out("c")._1 == 1L)
    assert(out.values.forall(_._2 >= 0L))
  }
}
