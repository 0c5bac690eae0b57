package graft.streaming

import graft.{GraftTestBase, Tables}
import graft.pipelines.CurationPipeline
import graft.sources.GraftCatalog

/** The streaming curation twin must reproduce the batch funnel on the
  * same corpus: the gates use the same distillates, the cap uses the
  * same deterministic hash order, and the MERGE admission converges
  * under replay (exactly-once by doc_id key). */
class StreamingCurationSpec extends GraftTestBase {

  private val Cap = 7L

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.gcur", classOf[GraftCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcur.db")
    spark.sql(s"DROP TABLE IF EXISTS gcur.db.$name")
    spark.sql(s"""CREATE TABLE gcur.db.$name
                  (doc_id BIGINT, source STRING, lang STRING, sampled BOOLEAN)""")
    s"gcur.db.$name"
  }

  test("drained stream equals the batch curation funnel (capped)") {
    val table = freshTable("curated")
    StreamingCuration.curateToTable(spark, sf001, table, domainCap = Cap)

    val (packed, funnel) = CurationPipeline.run(
      spark, Tables(spark, sf001)("documents"), domainCap = Cap)
    val f = funnel.map(r => r.stage -> r.docs).toMap

    // post-cap admission count matches the batch domain_cap stage
    assert(spark.table(table).count() == f("domain_cap"))
    // sampled flag reproduces the batch hash_sample stage — and since
    // the single-file source drains as ONE batch, the cap's hash order
    // matches the batch window exactly, so MEMBERSHIP agrees, not just
    // counts
    val streamed = spark.table(table).filter("sampled")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    assert(streamed.size.toLong == f("hash_sample"))
  }

  test("replaying the drain converges instead of duplicating (MERGE exactly-once)") {
    val table = freshTable("curated_replay")
    StreamingCuration.curateToTable(spark, sf001, table, domainCap = Cap)
    val first = spark.table(table).orderBy("doc_id").collect().map(_.toString).toSeq
    // second drain over the same corpus: every row MERGE-matches, the
    // cap counts see the already-admitted rows, nothing changes
    StreamingCuration.curateToTable(spark, sf001, table, domainCap = Cap)
    val second = spark.table(table).orderBy("doc_id").collect().map(_.toString).toSeq
    assert(first == second)
  }

  test("uncapped drain matches the uncapped batch membership") {
    val table = freshTable("curated_uncapped")
    StreamingCuration.curateToTable(spark, sf001, table)
    val (packed, funnel) = CurationPipeline.run(
      spark, Tables(spark, sf001)("documents"))
    val f = funnel.map(r => r.stage -> r.docs).toMap
    assert(spark.table(table).count() == f("domain_cap"))
    val streamed = spark.table(table).filter("sampled")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
  }
}
