package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructType}

/** DSv2 FunctionCatalog functions for the graft catalog.
  *
  * These resolve through SQL as `gcat.system.<fn>(...)`: the analyzer
  * asks the catalog to BIND the unbound function against the actual
  * argument schema (overload resolution + arity/type validation happen
  * here, at analysis time, not at runtime), and the bound result is
  * planned like a built-in — scalar functions through their `invoke`
  * magic method, aggregates through Spark's V2Aggregator with full
  * partial/merge map-side combine.
  *
  * The scalar impls are TOP-LEVEL classes whose `invoke` lives on the
  * companion object: scalac emits a `public static` forwarder for it on
  * the companion CLASS, so `V2ExpressionUtils.resolveScalarFunction`
  * finds a static magic method and plans a `StaticInvoke` — a direct
  * static call on unboxed primitives inside whole-stage codegen. (A
  * nested Scala `object` impl would instead take the instance-`Invoke`
  * path against a `Foo$Bar$` class name that Janino cannot compile,
  * silently degrading every call to interpreted `produceResult`.)
  */
object GraftCatalogFunctions {

  /** floor(x*100 + 0.5) — the library's summation-order-proof money
    * map (see q204), exposed to SQL as a catalog scalar function. */
  object Cents extends UnboundFunction {
    override def name(): String = "cents"
    override def description(): String =
      "cents(x DOUBLE) -> BIGINT: exact integer cents, floor(x*100+0.5)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 1)
        throw new UnsupportedOperationException(
          s"cents takes exactly 1 argument, got ${inputType.fields.length}")
      inputType.fields(0).dataType match {
        case DoubleType => new GraftCentsFn
        case dt => throw new UnsupportedOperationException(
          s"cents expects DOUBLE, got ${dt.simpleString}")
      }
    }
  }

  /** clamp(x, lo, hi) with bind-time overload resolution: one unbound
    * name, two bound implementations picked by the argument types. */
  object Clamp extends UnboundFunction {
    override def name(): String = "clamp"
    override def description(): String =
      "clamp(x, lo, hi) -> x bounded to [lo, hi]; BIGINT or DOUBLE"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 3)
        throw new UnsupportedOperationException(
          s"clamp takes exactly 3 arguments, got ${inputType.fields.length}")
      val types = inputType.fields.map(_.dataType)
      if (types.forall(_ == LongType)) new GraftClampLongFn
      else if (types.forall(_ == DoubleType)) new GraftClampDoubleFn
      else throw new UnsupportedOperationException(
        s"clamp expects all-BIGINT or all-DOUBLE arguments, got " +
          types.map(_.simpleString).mkString(", "))
    }
  }

  /** cents_sum(x DOUBLE) -> DOUBLE: aggregates exact integer cents and
    * divides once at the end — the whole money-math discipline as ONE
    * catalog aggregate. Long state makes update/merge associative and
    * commutative, so Spark's partial aggregation (map-side combine +
    * final merge after the shuffle) is exact regardless of row order
    * or partitioning. */
  object CentsSum extends UnboundFunction {
    override def name(): String = "cents_sum"
    override def description(): String =
      "cents_sum(x DOUBLE) -> DOUBLE: order-independent currency sum"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 1 ||
          inputType.fields(0).dataType != DoubleType)
        throw new UnsupportedOperationException(
          "cents_sum expects exactly one DOUBLE argument")
      CentsSumImpl
    }
  }

  private object CentsSumImpl
      extends AggregateFunction[java.lang.Long, java.lang.Double] {
    override def inputTypes(): Array[DataType] = Array(DoubleType)
    override def resultType(): DataType = DoubleType
    override def name(): String = "cents_sum"
    override def canonicalName(): String = "graft.cents_sum"
    override def isResultNullable: Boolean = false
    override def newAggregationState(): java.lang.Long = 0L
    override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) state
      else state + math.floor(input.getDouble(0) * 100 + 0.5).toLong
    override def merge(left: java.lang.Long, right: java.lang.Long): java.lang.Long =
      left + right
    override def produceResult(state: java.lang.Long): java.lang.Double =
      state.toDouble / 100
  }

  val all: Map[String, UnboundFunction] = Map(
    "cents"     -> Cents,
    "clamp"     -> Clamp,
    "cents_sum" -> CentsSum)
}

/** Bound `cents`: the static `invoke` forwarder (from the companion)
  * is what codegen calls. */
final class GraftCentsFn extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(DoubleType)
  override def resultType(): DataType = LongType
  override def name(): String = "cents"
  override def canonicalName(): String = "graft.cents"
  override def isResultNullable: Boolean = false
  // interpreted fallback (also exercised by unit tests)
  override def produceResult(input: InternalRow): java.lang.Long =
    GraftCentsFn.invoke(input.getDouble(0))
}

object GraftCentsFn {
  /** magic method: static forwarder on class GraftCentsFn → StaticInvoke */
  def invoke(x: Double): Long = math.floor(x * 100 + 0.5).toLong
}

final class GraftClampLongFn extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType, LongType, LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "clamp"
  override def canonicalName(): String = "graft.clamp.long"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): java.lang.Long =
    GraftClampLongFn.invoke(input.getLong(0), input.getLong(1), input.getLong(2))
}

object GraftClampLongFn {
  def invoke(x: Long, lo: Long, hi: Long): Long = math.min(math.max(x, lo), hi)
}

final class GraftClampDoubleFn extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] = Array(DoubleType, DoubleType, DoubleType)
  override def resultType(): DataType = DoubleType
  override def name(): String = "clamp"
  override def canonicalName(): String = "graft.clamp.double"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): java.lang.Double =
    GraftClampDoubleFn.invoke(input.getDouble(0), input.getDouble(1), input.getDouble(2))
}

object GraftClampDoubleFn {
  def invoke(x: Double, lo: Double, hi: Double): Double =
    math.min(math.max(x, lo), hi)
}
