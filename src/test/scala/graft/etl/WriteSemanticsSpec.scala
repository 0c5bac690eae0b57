package graft.etl

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Write/read semantics a lakehouse job leans on daily:
  * dynamic partition overwrite (replace ONLY the partitions present in
  * this batch — the idempotent daily-reload primitive) and mergeSchema
  * reads across files written with evolving schemas.
  */
class WriteSemanticsSpec extends GraftTestBase {

  test("dynamic partition overwrite replaces only the written partitions") {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    val dir = java.nio.file.Files.createTempDirectory("graft_dpo").toString
    import spark.implicits._
    try {
      val day1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
        .toDF("id", "day", "v")
      day1.write.partitionBy("day").mode("overwrite").parquet(dir)

      // STATIC overwrite (the default) of one day's reload would drop
      // the whole table; dynamic replaces just that partition dir
      spark.conf.set(key, "dynamic")
      val day2reload = Seq((3L, "2024-01-02", 99.0)).toDF("id", "day", "v")
      day2reload.write.partitionBy("day").mode("overwrite").parquet(dir)

      // partition-column type inference turns day into a DATE on read;
      // compare through a string cast
      val got = spark.read.parquet(dir).orderBy("id")
        .select(col("id"), col("day").cast("string"), col("v"))
        .collect().map(_.toSeq).toSeq
      assert(got == Seq(
        Seq(1L, "2024-01-01", 10.0),   // untouched partition survives
        Seq(3L, "2024-01-02", 99.0)))  // reloaded partition replaced

      // control: static mode drops the unlisted partition too
      spark.conf.set(key, "static")
      day2reload.write.partitionBy("day").mode("overwrite").parquet(dir)
      assert(spark.read.parquet(dir).select("day").distinct().count() == 1)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("mergeSchema reads files written under an evolved schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ms").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "s").write.parquet(s"$dir/p=1")
    // later writer added a column
    Seq((2L, "b", 3.5)).toDF("id", "s", "score").write.parquet(s"$dir/p=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "s", "score", "p"))
    val rows = merged.orderBy("id")
      .select("id", "s", "score").collect().map(_.toSeq).toSeq
    assert(rows == Seq(Seq(1L, "a", null), Seq(2L, "b", 3.5)))

    // default read (no mergeSchema) picks one footer — score may be
    // absent; the explicit-schema read is the scale-safe alternative
    // (no footer race) and must agree with the merged view
    val explicit = spark.read.schema(merged.schema).parquet(dir)
    assert(explicit.orderBy("id").select("id", "s", "score")
      .collect().map(_.toSeq).toSeq == rows)
  }
}
