package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._

/** Input-layout guard for compute-heavy map stages (optimization guide
  * §2.5, "input skew: one huge unsplittable file … repartition
  * immediately after the read").
  *
  * A parquet scan parallelizes at ROW-GROUP granularity: a table
  * written as one file with one row group plans as ONE scan task no
  * matter what `spark.sql.files.maxPartitionBytes` or
  * `minPartitionNum` say, and every per-row pipeline Catalyst fuses
  * above that scan — shingle md5, winnowing window minima, signature
  * folds — serializes on a single core while the rest of the session
  * idles. Measured on the sf0.1 bench: every input table is a
  * single-row-group file, so each md5-family query's dominant cost
  * was one core of 32 doing all the hashing.
  *
  * The guard is ADAPTIVE, not a local-mode constant: it compares the
  * scan's actual partition count against the session's default
  * parallelism and redistributes ONLY when the input under-splits.
  * On a production 100 TB layout (thousands of row groups) the
  * condition is false and the guard contributes nothing to the plan;
  * when it does fire, the one narrow exchange it inserts costs a
  * single pass over rows that an expensive projection was about to
  * serialize on anyway — exactly the guide's remedy for unsplittable
  * inputs. Keys are hashed (never round-robin) so the row→partition
  * map is deterministic under task retries (SPARK-38388 discipline)
  * and no sort-before-repartition is paid.
  *
  * Scope guard: the partition-count probe (`df.rdd`) is only free on
  * MAP-ONLY plans (scan/checkpoint + project/filter/generate) — under
  * AQE, materializing the RDD of a plan that already contains
  * exchanges would eagerly execute its upstream stages and then throw
  * that work away. Non-map-only inputs are therefore returned
  * unchanged: they sit downstream of a shuffle and already run at the
  * session's shuffle parallelism.
  */
object Spread {

  private def mapOnly(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case _: Project | _: Filter | _: Generate | _: SubqueryAlias =>
      p.children.forall(mapOnly)
    case _ => false
  }

  /** `df` hash-redistributed on `key` across the session's default
    * parallelism — a no-op (returns `df` unchanged, no exchange) when
    * the plan already has at least that many partitions or is not a
    * map-only scan pipeline. */
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (!mapOnly(df.queryExecution.analyzed)) df
    else if (df.rdd.getNumPartitions >= p) df
    else df.repartition(p, key)
  }
}
