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

  /** The driver has shipped `events.ts` under several physical parquet
    * encodings across rounds (TIMESTAMP(NANOS) read as raw longs via
    * legacy nanosAsLong; TIMESTAMP_MICROS isAdjustedToUTC=0, which Spark
    * scans as TIMESTAMP_NTZ). Branch on the scanned type instead of
    * assuming one, so a testdata regeneration can't silently break every
    * events consumer. */
  private def eventsRaw: DataFrame = {
    // Harmless for micros data; required if the nanos encoding returns
    // (without it the footer read itself throws).
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
  def events: DataFrame     = Tables.normalizeTs(eventsRaw)
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

  /** Normalize an events-shaped frame's `ts` to the session TimestampType
    * regardless of how the parquet encoded it:
    *   - LongType: legacy TIMESTAMP(NANOS) read as raw nanos — integer
    *     `div 1000` keeps full precision where a double division of
    *     ~1.7e18 ns would lose the low bits (53-bit mantissa, ulp ≈ 256 ns).
    *   - TimestampNTZType: TIMESTAMP_MICROS isAdjustedToUTC=0 — the cast
    *     is value-preserving under the engine's UTC session zone
    *     (GraftSession), and lands on the same micros DuckDB reads.
    *   - TimestampType: already there. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts scanned as unsupported type $other — testdata layout changed again; " +
        "extend Tables.normalizeTs for the new encoding")
    }
  }

  private val dfCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  /** Which sf-dir each session's temp views currently point at. */
  private val registered =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]
}
