package graft.queries

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, SparkEntry, Tables}

/** Round-9 additions: the Kneser-Ney perplexity filter's
  * discrimination property (q437) and q436's output sanity beyond
  * what LouvainSpec pins at the operator level. */
class Round9ClosersSpec extends GraftTestBase {

  test("q437 KN perplexity separates a fluent doc from a token-salad twin") {
    import spark.implicits._
    val corpus = Tables(spark, sf001)("documents")
    // FLUENT plant: a greedy maximum-probability walk over the
    // corpus's own bigram graph (always the most frequent successor)
    // — every step is a high-count bigram. SALAD plant: the same
    // NUMBER of tokens drawn from the vocabulary in hash order —
    // near-uniform unigram profile, adjacencies that barely exist.
    // KN perplexity must split them wide; a unigram signal cannot.
    val toksByDoc = corpus.select("text").collect()
      .map(_.getString(0).toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
    val big = scala.collection.mutable.Map.empty[(String, String), Int]
    val uni = scala.collection.mutable.Map.empty[String, Int]
    toksByDoc.foreach { t =>
      t.foreach(w => uni(w) = uni.getOrElse(w, 0) + 1)
      t.sliding(2).foreach { case Array(a, b) =>
        big((a, b)) = big.getOrElse((a, b), 0) + 1
      case _ => }
    }
    val n = 60
    var w = uni.toSeq.maxBy(t => (t._2, t._1))._1
    val walk = scala.collection.mutable.ArrayBuffer(w)
    while (walk.length < n) {
      val nxt = big.collect { case ((a, b), c) if a == w => (c, b) }
      w = if (nxt.isEmpty) uni.toSeq.maxBy(t => (t._2, t._1))._1
          else nxt.toSeq.maxBy { case (c, b) => (c, b) }._2
      walk += w
    }
    val fluent = walk.mkString(" ")
    val salad = uni.keys.toSeq
      .sortBy(s => scala.util.hashing.MurmurHash3.stringHash(s))
      .take(n).mkString(" ")
    val docs = corpus.unionByName(Seq(
      (500001L, fluent, "en", "srcF", fluent.length.toLong),
      (500002L, salad, "en", "srcF", salad.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val tmp = java.nio.file.Files.createTempDirectory("kn_src").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stage")
    val part = new java.io.File(s"$tmp/_stage").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$tmp/documents.parquet"))
    val ppl = SparkEntry.queries("q437_kn_perplexity")(spark, tmp)
      .filter(col("doc_id") >= 500001L)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("perplexity")).toMap
    assert(ppl.size == 2, s"plants missing from output: $ppl")
    assert(ppl(500002L) > ppl(500001L) * 1.5,
      s"shuffled ${ppl(500002L)} not clearly above fluent ${ppl(500001L)}")
  }

  test("q440 tuner: (8,8) is the balanced optimum, (4,16) the min-FN (dedup) choice") {
    val rows = SparkEntry.queries("q440_lsh_tuner")(spark, sf001).collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Int]("b")) ->
        ((r.getAs[Double]("fp_mass_uniform"),
          r.getAs[Double]("fn_mass_uniform"),
          r.getAs[Double]("total_err")))).toMap
    assert(rows.size == 7)
    val best = rows.minBy(_._2._3)._1
    assert(best == ((8, 8)), s"balanced optimum $best")
    // the committed minhashDedup default (r=4, b=16): lowest FN among
    // configs that keep FP below 0.3 — the recall-first dedup trade
    val affordable = rows.filter(_._2._1 < 0.3)
    assert(affordable.minBy(_._2._2)._1 == ((4, 16)),
      s"min-FN affordable config ${affordable.minBy(_._2._2)._1}")
    // S-curve sanity: FN decreases as bands grow at fixed k
    assert(rows((4, 16))._2 < rows((8, 8))._2 &&
      rows((8, 8))._2 < rows((16, 4))._2)
  }

  test("q442 duplicate families nest and coarsen across the cut ladder") {
    val rows = SparkEntry.queries("q442_dup_families")(spark, sf001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // tighter cuts refine looser ones: same fam_tight => same fam_mid,
    // same fam_mid => same fam_loose (edge sets shrink with the cut)
    assert(rows.groupBy(_._3).values.forall(_.map(_._2).distinct.size == 1))
    assert(rows.groupBy(_._2).values.forall(_.map(_._1).distinct.size == 1))
    val n = Seq(rows.map(_._1).distinct.size, rows.map(_._2).distinct.size,
      rows.map(_._3).distinct.size)
    assert(n(0) <= n(1) && n(1) <= n(2), s"family counts $n")
    assert(n(0) < rows.length, "no near-dup families found at the loose cut")
  }

  test("q436 louvain output: every nation labeled, labels are member nationkeys") {
    val rows = SparkEntry.queries("q436_louvain")(spark, sf001).collect()
    assert(rows.length == 25)
    val byComm = rows.groupBy(_.getAs[Long]("community"))
    // each community's label is one of its own members' nationkeys
    byComm.foreach { case (label, members) =>
      assert(members.exists(_.getAs[Int]("n_nationkey").toLong == label),
        s"community $label has no member with that key")
    }
    // the optimizer actually merged something (not all singletons)
    assert(byComm.size < 25, s"still ${byComm.size} singleton communities")
  }
}
