package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/
  * NFKD) of a string column — the preprocessing stage every production
  * text pipeline runs BEFORE tokenization (composed vs decomposed
  * accents, compatibility forms of ligatures/fullwidth digits), which
  * Spark has no built-in for.
  *
  * Row-local, zero-shuffle; the JDK's `java.text.Normalizer` implements
  * the Unicode normalization spec, so results agree codepoint-for-
  * codepoint with DuckDB's utf8proc-based `nfc_normalize()` — giving
  * the NFC form a true cross-engine oracle (q392). The fast path is
  * free: `Normalizer.isNormalized` short-circuits already-normalized
  * text (ASCII corpora pay one scan, no allocation).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form $form")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val f = Normalizer.Form.valueOf(form)

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  override protected def nullSafeEval(in: Any): Any =
    compute(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNorm", this,
      classOf[UnicodeNormalize].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  def nfc(c: Column): Column = of(c, "NFC")
  def nfkc(c: Column): Column = of(c, "NFKC")
  def of(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(
      ColumnBridge.expression(c.cast("string")), form))
}
