package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector ("graftrange"): a deterministic
  * synthetic long-range table used to demonstrate the full connector
  * contract — TableProvider → ScanBuilder → Batch → PartitionReader —
  * with BOTH pushdown surfaces implemented:
  *
  *   - [[SupportsPushDownRequiredColumns]]: the reader materializes
  *     only requested columns (a `select(sum(id))` never computes
  *     `val`).
  *   - [[SupportsPushDownFilters]]: range predicates on `id`
  *     (>, >=, <, <=, =) narrow the scan bounds AT PLANNING TIME, so
  *     partitions outside the predicate range are never created — the
  *     DSv2 analogue of parquet row-group pruning. Residual filters are
  *     returned to Spark for post-evaluation.
  *
  * Schema: id BIGINT, val DOUBLE (= ((id*2654435761) mod 1000003) /
  * 1000003.0 — exact integer arithmetic, so any engine reproduces it
  * bit-for-bit), bucket INT (= id mod 32).
  *
  * Options: start (default 0), end (exclusive, default 1000),
  * slices (#input partitions, default 8). At scale, `slices` maps to
  * cluster parallelism and each partition is an independent reader —
  * the same contract a real sharded source (JDBC ranges, Kafka
  * partitions, object-store listings) implements.
  */
class GraftRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftRangeTable(
      properties.asScala.getOrElse("start", "0").toLong,
      properties.asScala.getOrElse("end", "1000").toLong,
      properties.asScala.getOrElse("slices", "8").toInt,
      properties.asScala.getOrElse("partitionBy", "range") == "bucket",
      properties.asScala.getOrElse("rowsPerBatch", "100").toLong)
}

object GraftRangeSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("bucket", IntegerType, nullable = false)))

  def valOf(id: Long): Double = ((id * 2654435761L) % 1000003L).toDouble / 1000003.0
  def bucketOf(id: Long): Int = (id % 32L).toInt
}

class GraftRangeTable(start: Long, end: Long, slices: Int,
                      bucketed: Boolean = false,
                      rowsPerBatch: Long = 100L)
    extends Table with SupportsRead {
  override def name(): String = s"graftrange($start,$end)"
  override def schema(): StructType = GraftRangeSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
                    TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(start, end, slices, bucketed, rowsPerBatch)
}

class GraftRangeScanBuilder(start: Long, end: Long, slices: Int,
                            bucketed: Boolean = false,
                            rowsPerBatch: Long = 100L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {

  private var lo: Long = start
  private var hi: Long = end // exclusive
  private var schema: StructType = GraftRangeSource.fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark passes fields in the table's column order; empty schema
    // (count(*)) is legal and yields zero-column rows.
    schema = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _                                 => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  // Ungrouped COUNT(*) / MIN(id) / MAX(id) are answerable from the
  // (already filter-narrowed) range bounds in O(1) — COMPLETE pushdown:
  // the scan returns one final row and no range is ever enumerated.
  // Spark only offers aggregates here after every filter was accepted,
  // so the bounds are final. Anything else (grouping, val aggregates)
  // is declined and executes as a normal scan.
  private var aggFuncs: Option[Seq[String]] = None

  private def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case n: NamedReference => n.fieldNames.sameElements(Array("id"))
      case _                 => false
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall {
      case _: CountStar => true
      case m: Min       => isId(m.column)
      case m: Max       => isId(m.column)
      case _            => false
    }

  override def pushAggregation(agg: Aggregation): Boolean =
    supportCompletePushDown(agg) && {
      aggFuncs = Some(agg.aggregateExpressions.toSeq.map {
        case _: CountStar => "count"
        case _: Min       => "min"
        case _: Max       => "max"
      })
      true
    }

  override def build(): Scan = aggFuncs match {
    case Some(funcs) => new GraftRangeAggScan(lo, hi, funcs)
    case None if bucketed => new GraftRangeBucketedScan(lo, hi, schema)
    case None =>
      // Shard granularity is fixed by the ORIGINAL range (like parquet
      // row groups): pushdown then PRUNES shards instead of re-splitting
      // the narrowed range, so a narrow predicate plans fewer partitions.
      val shard = math.max(1L, (math.max(1L, end - start) + slices - 1) / slices)
      new GraftRangeScan(lo, hi, shard, schema, rowsPerBatch)
  }
}

/** Completely-pushed aggregate scan: one partition, one O(1) row. */
class GraftRangeAggScan(lo: Long, hi: Long, funcs: Seq[String])
    extends Scan with Batch {
  private val n = math.max(0L, hi - lo)
  override def readSchema(): StructType = StructType(
    funcs.zipWithIndex.map { case (f, i) =>
      StructField(s"agg_$i", LongType, nullable = f != "count")
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"graftrange-agg [$lo, $hi) ${funcs.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftRangePartition(0, 0))
  override def createReaderFactory(): PartitionReaderFactory = {
    val row = InternalRow.fromSeq(funcs.map {
      case "count" => n
      case "min"   => if (n == 0) null else lo
      case "max"   => if (n == 0) null else hi - 1
    })
    new GraftRangeSingleRowFactory(row)
  }
}

class GraftRangeSingleRowFactory(row: InternalRow)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

case class GraftRangePartition(from: Long, until: Long) extends InputPartition

/** One input partition per `bucket` value (id ≡ bucket mod 32), carrying
  * its partition key for storage-partitioned joins. */
case class GraftBucketPartition(bucket: Int, lo: Long, hi: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

/** Bucket-partitioned scan (`partitionBy=bucket`): reports
  * KeyGroupedPartitioning(identity(bucket)) so Spark's storage-partitioned
  * join machinery (spark.sql.sources.v2.bucketing.enabled) can co-locate
  * two such scans and plan an equi-join on `bucket` (+ more keys) with NO
  * shuffle on either side — the DSv2 successor to Hive bucketing, and the
  * contract a 100 TB sharded store implements so that fact-fact joins
  * never re-shuffle. Filter pushdown still narrows [lo, hi) inside every
  * bucket; column pruning applies unchanged.
  */
class GraftRangeBucketedScan(lo: Long, hi: Long, schema: StructType)
    extends Scan with Batch with SupportsReportPartitioning {
  private val nb = 32
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graftrange-bucketed [$lo, $hi) buckets=$nb cols=${schema.fieldNames.mkString(",")}"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("bucket")), nb)

  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(nb)(b => GraftBucketPartition(b, lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBucketReaderFactory(schema, nb)
}

class GraftBucketReaderFactory(schema: StructType, nb: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftBucketPartition]
    val gens: Array[Long => Any] = schema.fieldNames.map {
      case "id"     => (id: Long) => id
      case "val"    => (id: Long) => GraftRangeSource.valOf(id)
      case "bucket" => (id: Long) => GraftRangeSource.bucketOf(id)
    }
    // First id >= lo with id mod nb == bucket, then stride by nb.
    val first = {
      val r = ((part.bucket - part.lo) % nb + nb) % nb
      part.lo + r
    }
    new PartitionReader[InternalRow] {
      private var cur = first - nb
      override def next(): Boolean = { cur += nb; cur < part.hi }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(cur)))
      override def close(): Unit = ()
    }
  }
}

class GraftRangeScan(lo: Long, hi: Long, shard: Long, schema: StructType,
                     rowsPerBatch: Long = 100L)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftRangeMicroBatchStream(lo, hi, shard, rowsPerBatch, schema)
  override def description(): String =
    s"graftrange [$lo, $hi) shard=$shard cols=${schema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    if (hi <= lo) Array.empty
    else Iterator.iterate(lo)(_ + shard).takeWhile(_ < hi)
      .map(from => GraftRangePartition(from, math.min(from + shard, hi)))
      .toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(schema)
}

class GraftRangeReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftRangePartition]
    // Column generators resolved once per reader, not per row.
    val gens: Array[Long => Any] = schema.fieldNames.map {
      case "id"     => (id: Long) => id
      case "val"    => (id: Long) => GraftRangeSource.valOf(id)
      case "bucket" => (id: Long) => GraftRangeSource.bucketOf(id)
    }
    new PartitionReader[InternalRow] {
      private var cur = part.from - 1
      override def next(): Boolean = { cur += 1; cur < part.until }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(cur)))
      override def close(): Unit = ()
    }
  }
}

/** Micro-batch streaming read over the same range table — the third leg
  * of the connector contract (batch read, batch write via GraftMemorySink,
  * streaming read). Models an append-only source: each trigger exposes up
  * to `rowsPerBatch` new ids, until the configured `end` (a bounded
  * backlog, so test drains terminate; an unbounded feed is end=MaxValue).
  *
  * Offsets are plain long watermarks into the id range, serialized as
  * JSON — exactly-once comes from Spark persisting (start, end] offset
  * pairs in the checkpoint WAL and replaying a batch IDENTICALLY after a
  * crash: planInputPartitions(start, end) is a pure function of the
  * offsets, and readers are deterministic in the ids. Column pruning and
  * id-range filter pushdown compose with streaming unchanged (the
  * ScanBuilder narrowed [lo, hi) before toMicroBatchStream is called).
  *
  * At 100 TB scale this is the Kafka-shaped contract: latestOffset
  * advances with the upstream log, each micro-batch fans out one shard
  * per `slices`-sized id stripe, and commit() is where a real source
  * would trim its retention.
  */
class GraftRangeMicroBatchStream(lo: Long, hi: Long, shard: Long,
                                 rowsPerBatch: Long, schema: StructType)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private case class RangeOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  override def initialOffset(): Offset = RangeOffset(lo)

  /** SupportsAdmissionControl: Spark hands back the current (possibly
    * checkpoint-restored) position every trigger, so the head the
    * source reports is a PURE function of (start, rowsPerBatch) — no
    * instance state to lose across restarts. A stateful one-arg
    * latestOffset() is the restart bug waiting to happen: a fresh
    * instance would restart its counter and re-admit old ranges. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[RangeOffset].v
    val next = from + math.min(rowsPerBatch, hi - from)
    RangeOffset(math.min(hi, next))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl route expected")

  override def reportLatestOffset(): Offset = RangeOffset(hi)

  override def deserializeOffset(json: String): Offset =
    RangeOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from  = start.asInstanceOf[RangeOffset].v
    val until = end.asInstanceOf[RangeOffset].v
    if (until <= from) Array.empty
    else Iterator.iterate(from)(_ + shard).takeWhile(_ < until)
      .map(f => GraftRangePartition(f, math.min(f + shard, until)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(schema)

  override def commit(end: Offset): Unit = () // a real log would trim here
  override def stop(): Unit = ()
}
