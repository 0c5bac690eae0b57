package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.functions.expressions.InterleaveBits

class ZOrderSpec extends GraftTestBase {

  test("interleave_bits is the Morton curve (known values, both exec paths)") {
    import spark.implicits._
    // (x=0b11, y=0b01) -> z = y1 x1 y0 x0 = 0b0111 = 7
    val df = Seq((3, 1), (0, 0), (1, 1)).toDF("x", "y")
      .select(InterleaveBits.interleaveBits(Seq(col("x"), col("y"))).as("z"))
    assert(df.as[Long].collect().toSeq == Seq(7L, 0L, 3L))
    // interpreted path agrees with codegen
    val e = InterleaveBits(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(3),
      org.apache.spark.sql.catalyst.expressions.Literal(1)))
    assert(e.eval(null) == 7L)
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectWithSubqueries {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("z-ordered layout prunes scans on BOTH clustered dimensions") {
    val li = graft.Tables(spark, sf001)("lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val total = li.count()
    val (pkLo, pkHi) = (1, 20)   // ~10% of part keys
    val (skLo, skHi) = (1, 2)    // ~20% of supp keys

    val zDir = java.nio.file.Files.createTempDirectory("graft_zo").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_lin").toString
    ZOrder.clusterWrite(li, Seq("l_partkey", "l_suppkey"), 8, zDir)
    // control: linear clustering on partkey only
    li.repartitionByRange(8, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    val onPart = (d: DataFrame) =>
      d.filter(col("l_partkey").between(pkLo, pkHi))
    val onSupp = (d: DataFrame) =>
      d.filter(col("l_suppkey").between(skLo, skHi))
    val zRead  = spark.read.parquet(zDir)
    val linRead = spark.read.parquet(linDir)

    // identical results either layout
    assert(onPart(zRead).count() == onPart(linRead).count())
    assert(onSupp(zRead).count() == onSupp(linRead).count())

    // partkey filter: both layouts prune (linear is optimal here)
    assert(scanRows(onPart(zRead)) < total,
      "z-order lost partkey pruning entirely")
    // suppkey filter: linear-on-partkey layout scans ~everything —
    // every file spans all suppkeys; z-order keeps a bounding box on
    // suppkey too and must scan strictly less
    val zSupp = scanRows(onSupp(zRead))
    val linSupp = scanRows(onSupp(linRead))
    assert(linSupp >= (total * 0.9).toLong,
      s"control unexpectedly pruned suppkey: $linSupp of $total")
    assert(zSupp <= (linSupp * 0.7).toLong,
      s"z-order did not prune suppkey: z=$zSupp linear=$linSupp")
  }

  test("schema and content survive the layout transform") {
    val li = graft.Tables(spark, sf001)("lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val z = ZOrder.zorderBy(li, Seq("l_partkey", "l_suppkey"), 4)
    assert(z.schema == li.schema)
    assert(z.count() == li.count())
    assert(z.agg(sum("l_orderkey")).head.getLong(0) ==
      li.agg(sum("l_orderkey")).head.getLong(0))
  }
}
