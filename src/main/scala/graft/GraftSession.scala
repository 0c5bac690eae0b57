package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the reference's single entry point (`etl.py:20-31`
  * `create_spark_session`) but with scale-appropriate defaults: AQE on,
  * shuffle partitions sized to the local core count instead of the
  * reference's default 200 (SURVEY.md §6 — the reference's 4-row dims were
  * written as 200-partition shuffles), UTC session time zone so date
  * extraction is oracle-stable.
  *
  * Hive support (reference `etl.py:30`) is intentionally absent: the
  * reference never creates or queries a Hive table (SURVEY.md §2.1 S9).
  */
object GraftSession {

  /** Builder with graft defaults applied; caller may override. */
  def builder(cpus: Int = defaultCpus): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int = defaultCpus): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(4)
}
