package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** SQL/source surface, part 3: the built-in XML file format (Spark 4
  * folds spark-xml into sql-core), the hidden `_metadata` file-source
  * struct, and lateral column aliases.
  */
class SqlSurfaceSpec3 extends GraftTestBase {

  test("XML file format round-trips a table (rowTag)") {
    val dir = Files.createTempDirectory("xml_rt").toFile.getAbsolutePath
    val nation = Tables(spark, sf001)("nation")
    nation.write.mode("overwrite")
      .option("rowTag", "nation").format("xml").save(s"$dir/n")
    val back = spark.read.option("rowTag", "nation").format("xml")
      .load(s"$dir/n")
    val got = back.select("n_nationkey", "n_name", "n_regionkey")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val want = nation.collect()
      .map(r => (r.getInt(0).toLong, r.getString(1), r.getInt(2).toLong))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("_metadata exposes file provenance on parquet scans") {
    val df = spark.read.parquet(s"$sf001/region.parquet")
      .select(col("r_regionkey"), col("_metadata.file_name").as("fn"),
        col("_metadata.file_size").as("sz"),
        col("_metadata.row_index").as("ri"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1).endsWith(".parquet")))
    assert(rows.forall(_.getLong(2) > 0))
    // row_index is the in-file ordinal: per file it covers 0..n-1
    val perFile = rows.groupBy(_.getString(1)).values
    perFile.foreach { rs =>
      val idx = rs.map(_.getLong(3)).sorted
      assert(idx.toSeq == (0L until idx.length).toSeq)
    }
    // _metadata is hidden: SELECT * must NOT include it
    assert(!spark.read.parquet(s"$sf001/region.parquet")
      .columns.contains("_metadata"))
  }

  test("lateral column aliases: a select-list alias is visible to later expressions") {
    Tables(spark, sf001).registerAll()
    val lca = spark.sql(
      """SELECT l_extendedprice * (1 - l_discount) AS net,
                net * (1 + l_tax) AS gross
         FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10""")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val explicit = spark.sql(
      """SELECT l_extendedprice * (1 - l_discount) AS net,
                l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross
         FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10""")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(lca.toSeq == explicit.toSeq)
    // chains through aggregates too
    val agg = spark.sql(
      """SELECT sum(l_quantity) AS s, s / count(*) AS mean_qty
         FROM lineitem""").head
    assert(agg.getDouble(1) > 0)
  }
}
