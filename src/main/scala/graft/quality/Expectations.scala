package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test / Deequ-check
  * shape): a rule list compiles into ONE aggregate per table — ten
  * rules on `lineitem` cost exactly one scan with ten conditional
  * counters riding the same map-side partials, not ten jobs. Only
  * referential rules join (broadcast of the violation probe against
  * the reference key set's aggregate — an anti-join per FK rule).
  *
  * Output grain: one row per rule — (rule_id, tbl, rule, n_violations,
  * passed) — so the expectation run is itself a relational result a
  * driver can diff, store, or alert on.
  *
  * Reference scope: generalizes the capstone's hand-rolled checks
  * (`qhi.py:20-91` — row counts, null profile, FK join-counts) into
  * the declarative form a platform runs per ingestion batch.
  */
object Expectations {

  sealed trait Rule {
    def id: String
    def table: String
    def describe: String
  }
  /** Column must be non-null. */
  final case class NotNull(id: String, table: String, col: String) extends Rule {
    def describe = s"not_null($col)"
  }
  /** Column values must be unique (nulls count as violations of none). */
  final case class Unique(id: String, table: String, col: String) extends Rule {
    def describe = s"unique($col)"
  }
  /** Column must fall in [lo, hi] (nulls violate). */
  final case class InRange(id: String, table: String, col: String,
                           lo: Double, hi: Double) extends Rule {
    def describe = s"in_range($col, $lo, $hi)"
  }
  /** Column must be one of the allowed values (nulls violate). */
  final case class InSet(id: String, table: String, col: String,
                         values: Seq[String]) extends Rule {
    def describe = s"in_set($col)"
  }
  /** Every non-null value must exist in refTable.refCol. */
  final case class ForeignKey(id: String, table: String, col: String,
                              refTable: String, refCol: String) extends Rule {
    def describe = s"fk($col -> $refTable.$refCol)"
  }

  /** Violation counter for the single-aggregate rules. */
  private def counter(r: Rule): Column = r match {
    case NotNull(_, _, c) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case Unique(_, _, c) =>
      count(col(c)) - countDistinct(col(c))
    case InRange(_, _, c, lo, hi) =>
      sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L).otherwise(0L))
    case InSet(_, _, c, vs) =>
      sum(when(col(c).isNull || !col(c).isin(vs: _*), 1L).otherwise(0L))
    case _: ForeignKey =>
      throw new IllegalArgumentException("FK rules are join-evaluated")
  }

  /** Evaluate `rules` over `tables` (name → DataFrame). Returns
    * (rule_id, tbl, rule, n_violations, passed), ordered by rule_id. */
  def run(spark: SparkSession, tables: Map[String, DataFrame],
          rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.run needs at least one rule")
    import spark.implicits._
    val (fkRules, aggRules) = rules.partition(_.isInstanceOf[ForeignKey])

    // one aggregate per table, all of its rules as parallel counters
    val aggFrames = aggRules.groupBy(_.table).map { case (t, rs) =>
      val counters = rs.zipWithIndex.map { case (r, i) =>
        counter(r).cast("long").as(s"v$i")
      }
      val row = tables(t).agg(counters.head, counters.tail: _*)
      val pairs = rs.zipWithIndex.map { case (r, i) =>
        struct(lit(r.id).as("rule_id"), lit(r.table).as("tbl"),
          lit(r.describe).as("rule"), col(s"v$i").as("n_violations"))
      }
      row.select(explode(array(pairs: _*)).as("e")).select("e.*")
    }

    // FK rules: anti-join violation counts (reference side aggregates to
    // its distinct keys first — broadcastable by construction)
    val fkFrames = fkRules.collect { case r: ForeignKey =>
      val refKeys = tables(r.refTable).select(col(r.refCol).as("__k")).distinct()
      tables(r.table).select(col(r.col).as("__k"))
        .filter(col("__k").isNotNull)
        .join(refKeys, Seq("__k"), "left_anti")
        .agg(count(lit(1)).cast("long").as("n_violations"))
        .select(lit(r.id).as("rule_id"), lit(r.table).as("tbl"),
          lit(r.describe).as("rule"), col("n_violations"))
    }

    (aggFrames ++ fkFrames)
      .reduce(_ unionByName _)
      .withColumn("passed", (col("n_violations") === 0L).cast("int"))
      .orderBy("rule_id")
  }
}
