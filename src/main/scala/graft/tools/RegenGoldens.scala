package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SaveMode

import graft.{GraftSession, SparkEntry}

/** Regenerates the committed golden snapshots under /root/repo/golden/.
  *
  * Why goldens exist at all: the production MinHash/SimHash scale paths
  * (q343/q344) hash with Spark's xxhash64, which DuckDB cannot reproduce
  * — so their driver oracle is a committed-parquet compare instead of a
  * recomputation. The snapshots are generated ONCE from the same query
  * code the driver runs (testdata is deterministic, seed=42, read-only;
  * TESTDATA.md), and their math is independently pinned by DedupSpec's
  * bit-equality checks plus the fully-oracled md5 twins (q26/q27,
  * q43/q44). GoldenScaleSpec re-runs the queries against the committed
  * files on every `sbt test`, so silent drift cannot survive a round.
  *
  * One flat file per (query, sf): golden/<query>/sf<sf>.parquet — a
  * single parquet file (not a Spark directory) so the DuckDB oracle can
  * read it with one constant read_parquet() call.
  */
object RegenGoldens {

  /** Queries whose oracle is a golden-file compare, with the scale
    * factors the driver may verify at (t1 smoke sf0.001, t2 correctness
    * sf0.01, bench sf0.1 — TESTDATA.md). */
  val goldenQueries: Seq[String] =
    Seq("q343_minhash_scale", "q344_simhash_scale", "q346_kmeans_semdedup",
        "q358_ivfpq_ann", "q477_ivfpq_recall", "q478_classifier_fit",
        "q483_ivfpq_rerank", "q486_score_recalibration",
        "q488_ivfpq_tuning", "q489_isotonic_recalibration",
        "q490_calibration_scorecard")
  val sfs: Seq[String] = Seq("0.001", "0.01", "0.1")

  def goldenFile(name: String, sf: String): String =
    s"/root/repo/golden/$name/sf$sf.parquet"

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val tmp = Files.createTempDirectory("graft-golden").toString
    for (q <- goldenQueries; sf <- sfs) {
      val df = SparkEntry.queries(q)(spark, s"/root/testdata/sf$sf")
      val stage = s"$tmp/$q-$sf"
      // coalesce(1) after the query's orderBy: range-partitioned sorted
      // output concatenates in partition order, so the single file keeps
      // the global ordering the oracle's ORDER BY expects.
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
      val listing = Files.list(Paths.get(stage))
      val part =
        try listing.toArray.map(_.toString)
          .filter(p => p.endsWith(".parquet") && p.contains("part-"))
        finally listing.close()
      require(part.length == 1, s"expected 1 part file in $stage, got ${part.length}")
      val dest = Paths.get(goldenFile(q, sf))
      Files.createDirectories(dest.getParent)
      Files.copy(Paths.get(part.head), dest, StandardCopyOption.REPLACE_EXISTING)
      println(s"[golden] $q sf$sf -> $dest (${Files.size(dest)} bytes)")
    }
    spark.stop()
  }
}
