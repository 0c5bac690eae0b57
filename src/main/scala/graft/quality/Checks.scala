package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Data-quality checks, re-expressed with fixed semantics.
  *
  * Reference: `qhi.py` — `data_exists` (row-count check, qhi.py:20-37),
  * `check_integrity` (FK inner-join counts, qhi.py:39-91), and the
  * notebook's one-pass 28-column null profile (NB:283-284, cell 12).
  *
  * Divergences from the reference, both intentional (SURVEY.md §2.10 B4):
  *   - `check_integrity` returned the AND of *failure* flags (True meant
  *     "everything failed"). Here each FK edge yields an unambiguous
  *     orphan-key count (0 = pass), computed with a left-anti join instead
  *     of the reference's inverted inner-join-count-==-0 test.
  *   - results come back as DataFrames so they compose with the rest of a
  *     plan instead of printing to the console.
  *
  * All checks are single-pass distributed aggregates — no driver-side
  * loops; the null profile is one wide partial+final aggregate regardless
  * of column count.
  */
object Checks {

  /** Per-column null/NaN fraction in ONE pass (reference A3).
    * `avg(CASE WHEN bad THEN 1 ELSE 0 END)` folds the reference's
    * `count(when(...))/total` two-step into a single aggregate. `isnan`
    * only applies to floating columns (it errors on dates/strings). */
  def nullProfile(df: DataFrame, scale: Int = 6): DataFrame = {
    val aggs: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val c   = col(f.name)
      val bad = f.dataType match {
        case DoubleType | FloatType => c.isNull || isnan(c)
        case _                      => c.isNull
      }
      round(avg(when(bad, 1.0).otherwise(0.0)), scale).as(f.name)
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Row-count per table (reference `data_exists`): (table_name, n_rows). */
  def rowCounts(spark: SparkSession, tables: Seq[(String, DataFrame)]): DataFrame = {
    val counted = tables.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_rows")).select(lit(name).as("table_name"), col("n_rows"))
    }
    counted.reduce(_.union(_)).orderBy("table_name")
  }

  /** Zero-cost pipeline observability: attach named metrics to a
    * DataFrame with `observe()` — Spark's CollectMetrics operator
    * accumulates them DURING whatever action runs the plan, so quality
    * numbers (row count, null count, value bounds) cost no extra pass
    * over the data, unlike rowCounts/nullProfile which are their own
    * jobs. Read the result from the returned observation after the
    * action completes. At 100 TB "free metrics on the write job" vs "a
    * second full scan" is the whole game for pipeline QA. */
  def observed(df: DataFrame, name: String, metrics: Map[String, Column])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty, "observed() needs at least one metric column")
    val obs = org.apache.spark.sql.Observation(name)
    val exprs = metrics.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }
    (df.observe(obs, exprs.head, exprs.tail: _*), obs)
  }

  /** One FK edge: child[fk] must exist in parent[pk]. */
  final case class FkEdge(name: String, child: DataFrame, fk: String,
                          parent: DataFrame, pk: String)

  /** FK integrity with fixed semantics: per edge, the count of DISTINCT
    * child keys with no parent (0 = intact). Distinct-before-join keeps
    * the anti-join input small (reference's own trick, qhi.py:53), and the
    * parent side is a key list Catalyst can broadcast. Null FKs are not
    * orphans (SQL FK semantics).
    *
    * Deliberately NOT fused into one pass per child table: each edge's
    * scan prunes to a single FK column (columnar IO ≈ free per edge)
    * and the distinct compresses map-side before any join, whereas a
    * fused multi-edge aggregate needs an Expand over the full fact
    * (k× the rows, no pre-join compression) — measured 2x slower at
    * sf0.1, and the same argument holds on columnar storage at scale. */
  def fkIntegrity(edges: Seq[FkEdge]): DataFrame = {
    val perEdge = edges.map { e =>
      val orphans = e.child.select(col(e.fk).as("k")).na.drop().distinct()
        .join(e.parent.select(col(e.pk).as("k")).distinct(), Seq("k"), "left_anti")
      orphans.agg(count(lit(1)).as("orphan_keys"))
        .select(lit(e.name).as("fk_edge"), col("orphan_keys"))
    }
    perEdge.reduce(_.union(_)).orderBy("fk_edge")
  }
}
