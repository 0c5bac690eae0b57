package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * One parquet file per table under `/root/testdata/sf{N}/`. Parquet scans
  * are self-describing (reference pattern S1, `etl.py:154`), so no explicit
  * schema is needed; Catalyst prunes columns and pushes filters into the
  * scan automatically.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // Schema inference (parquet footer read + file listing) costs ~100 ms
  // per table; a benchmark or SQL query that touches all ten tables pays
  // >1 s per invocation without this. The plan object is immutable, so
  // caching per (session, path) is safe; keying on the session keeps
  // plans from leaking across sessions.
  private def t(name: String): DataFrame =
    Tables.dfCache.getOrElseUpdate((spark, s"$dir/$name.parquet"),
      spark.read.parquet(s"$dir/$name.parquet"))

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy nanosAsLong) and
    * convert with integer division — `ts div 1000` keeps full precision
    * where a double division of ~1.7e18 ns would lose the low bits
    * (double mantissa is 53 bits, ulp ≈ 256 ns there). */
  private def eventsRaw: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    eventsRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  def apply(name: String): DataFrame =
    if (name == "events") events else t(name)

  /** Register every table as a temp view for the SQL surface
    * (reference exposes both DSL and `spark.sql`, SURVEY.md §3.3).
    * Routes through `apply` so the events view carries the same
    * micros-timestamp `ts` as the DataFrame surface (not raw BIGINT
    * nanos), and sets the nanosAsLong conf up front so a fresh session
    * doesn't trip on the eager TIMESTAMP(NANOS) footer read. */
  def registerAll(): Unit =
    if (!Tables.registered.get(spark).contains(dir)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Tables.names.foreach(n => apply(n).createOrReplaceTempView(n))
      Tables.registered.put(spark, dir)
    }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val dfCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  /** Which sf-dir each session's temp views currently point at. */
  private val registered =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]
}
