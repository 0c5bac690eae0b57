package graft.queries

import graft.SparkEntry
import graft.GraftTestBase

/** Meta-guards over the whole query suite: naming, numbering, and the
  * oracle contract — a refactor can't silently drop an oracle or
  * register two queries under one key. */
class SuiteIntegritySpec extends GraftTestBase {

  private val names = SparkEntry.queries.keys.toSeq

  test("every query follows the qNNN_name convention with a unique number") {
    val pat = "^q(\\d+)_[a-z0-9_]+$".r
    val nums = names.map {
      case pat(n) => n.toInt
      case bad    => fail(s"query name '$bad' violates qNNN_name"); -1
    }
    val dups = nums.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query numbers: $dups")
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query carries an oracle (minus the xxhash64 scale twins)") {
    // q26/q27 run the production sketch pipelines with the md5 base-hash
    // family (identical in DuckDB → true oracles). q343/q344 are the
    // SAME pipelines on the xxhash64 scale hashes, registered so the
    // driver benches the 100 TB path — DuckDB has no Spark-compatible
    // xxhash64, so they get the contract's weaker rows-only check; their
    // math is pinned by DedupSpec + the md5 twins + q43/q44.
    val allowRowsOnly = Set("q343_minhash_scale", "q344_simhash_scale")
    val unoracled =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- allowRowsOnly
    assert(unoracled.isEmpty, s"oracle-less queries: $unoracled")
  }

  test("the q172/q173/q176 numbering gaps stay intentional (no others below the max)") {
    val pat = "^q(\\d+)_.*$".r
    val nums = names.collect { case pat(n) => n.toInt }.toSet
    val gaps = (1 to nums.max).filterNot(nums.contains)
    assert(gaps == Seq(172, 173, 176), s"unexpected numbering gaps: $gaps")
  }
}
