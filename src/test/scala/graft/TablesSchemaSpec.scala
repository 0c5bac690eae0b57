package graft

import org.apache.spark.sql.types._

/** The testdata contract: the driver regenerates `/root/testdata`
  * between rounds and has already shifted physical encodings once
  * (round 5: `events.ts` went from TIMESTAMP(NANOS)-as-long to
  * TIMESTAMP_MICROS, silently failing 76 queries at analysis time).
  * This spec turns any future layout drift into ONE actionable failure
  * naming the table and column, instead of a diffuse blast radius.
  *
  * Asserts the NORMALIZED schema (what every operator consumes via
  * Tables), not the physical encoding — Tables.normalizeTs is allowed
  * to absorb encoding churn; a column disappearing or changing logical
  * type is what must fail loudly.
  */
class TablesSchemaSpec extends GraftTestBase {

  private def fieldTypes(table: String): Map[String, DataType] =
    Tables(spark, sf001)(table).schema.fields
      .map(f => f.name -> f.dataType).toMap

  private def assertContract(table: String, expected: (String, DataType)*): Unit = {
    val got = fieldTypes(table)
    expected.foreach { case (name, dt) =>
      assert(got.contains(name), s"$table: expected column '$name' missing — " +
        s"testdata layout changed (present: ${got.keys.toSeq.sorted.mkString(", ")})")
      assert(got(name) == dt,
        s"$table.$name: expected $dt, scanned ${got(name)} — testdata layout changed")
    }
  }

  test("events normalizes to the engine contract regardless of parquet encoding") {
    assertContract("events",
      "event_id"   -> LongType,
      "ts"         -> TimestampType, // normalizeTs output, never NTZ/raw long
      "user_id"    -> LongType,
      "event_type" -> StringType,
      "value"      -> DoubleType,
      "props"      -> StringType)
  }

  test("documents/embeddings carry the curation-pipeline columns") {
    assertContract("documents",
      "doc_id"  -> LongType,
      "text"    -> StringType,
      "lang"    -> StringType,
      "source"  -> StringType,
      "n_chars" -> LongType)
    assertContract("embeddings",
      "vec_id"    -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label"     -> IntegerType)
  }

  test("TPC-H tables keep their join keys and measure types") {
    assertContract("region",   "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertContract("nation",   "n_nationkey" -> IntegerType,
                               "n_regionkey" -> IntegerType, "n_name" -> StringType)
    assertContract("customer", "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
                               "c_acctbal" -> DoubleType)
    assertContract("supplier", "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    assertContract("part",     "p_partkey" -> LongType, "p_retailprice" -> DoubleType)
    // order/ship dates ship as TIMESTAMP_MICROS (NTZ) — date semantics
    // are derived in queries; the scan type is what the contract pins
    assertContract("orders",   "o_orderkey" -> LongType, "o_custkey" -> LongType,
                               "o_totalprice" -> DoubleType,
                               "o_orderdate" -> TimestampNTZType)
    assertContract("lineitem", "l_orderkey" -> LongType, "l_partkey" -> LongType,
                               "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
                               "l_extendedprice" -> DoubleType,
                               "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                               "l_shipdate" -> TimestampNTZType)
  }
}
