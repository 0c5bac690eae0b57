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

  test("every registered query carries an oracle — no rows-only checks left") {
    // Since round 7 even the xxhash64 scale twins (q343/q344, which
    // DuckDB cannot recompute) carry committed golden-parquet oracles
    // (GoldenOracle.sql + RegenGoldens + GoldenScaleSpec freshness), so
    // the set of oracle-less queries must stay EMPTY.
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"oracle-less queries: $unoracled")
  }

  test("the q172/q173/q176 numbering gaps stay intentional (no others below the max)") {
    val pat = "^q(\\d+)_.*$".r
    val nums = names.collect { case pat(n) => n.toInt }.toSet
    val gaps = (1 to nums.max).filterNot(nums.contains)
    assert(gaps == Seq(172, 173, 176), s"unexpected numbering gaps: $gaps")
  }
}
