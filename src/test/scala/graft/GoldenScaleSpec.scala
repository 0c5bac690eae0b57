package graft

import java.nio.file.{Files, Paths}

import graft.tools.RegenGoldens

/** Freshness guard for the committed golden snapshots backing the
  * xxhash64 scale queries' driver oracles (q343/q344): re-runs each
  * golden query against live testdata and asserts row-for-row equality
  * with the committed file, at the smoke (sf0.001) and correctness
  * (sf0.01) scale factors the driver verifies at. If pipeline code or
  * testdata drifts, this fails locally before the driver's compare can
  * go silently red. Regenerate with `runMain graft.tools.RegenGoldens`.
  */
class GoldenScaleSpec extends GraftTestBase {

  // all three committed SFs: the driver verifies at sf0.001/sf0.01 and
  // benches at sf0.1 — a drift that only manifests at bench volume
  // (AQE behavior, broadcast thresholds) must fail HERE, not there
  for (q <- RegenGoldens.goldenQueries; sf <- RegenGoldens.sfs) {
    test(s"$q sf$sf matches committed golden") {
      val path = RegenGoldens.goldenFile(q, sf)
      assert(Files.exists(Paths.get(path)), s"missing golden $path")
      val live = SparkEntry.queries(q)(spark, s"/root/testdata/sf$sf")
        .collect().map(_.toSeq).toSeq
      val gold = spark.read.parquet(path).collect().map(_.toSeq).toSeq
      assert(live == gold,
        s"$q sf$sf drifted from committed golden (${live.size} live vs ${gold.size} golden rows)")
    }
  }
}
