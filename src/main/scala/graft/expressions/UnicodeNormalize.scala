package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * Catalyst expression — the canonicalization pass every multilingual
  * corpus needs before hashing, deduplication, or tokenization (the same
  * byte sequence can arrive precomposed U+00E1 or decomposed
  * `a`+U+0301; un-normalized, identical documents fingerprint apart).
  *
  * Spark has no built-in for this (a Scala UDF would box every row and
  * fence whole-stage codegen). The generated code stays inside the
  * WholeStageCodegen span and calls one static helper with a
  * pre-resolved `Normalizer.Form` reference — the standard shape of
  * Spark's own string expressions. Fast path: a pure-ASCII value
  * (numBytes == numChars) is invariant under every normalization form
  * and is returned as-is without materializing a java.lang.String, so
  * on mostly-ASCII corpora the per-row cost is two field reads.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got $form")

  @transient private lazy val javaForm = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.norm(input.asInstanceOf[UTF8String], javaForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", javaForm,
      classOf[Normalizer.Form].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnicodeNormalize.norm($c, $formRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static worker the generated code calls. ASCII fast path first:
    * UTF-8 bytes == chars ⇔ every code point < 0x80, and ASCII is a
    * fixed point of all four normalization forms.
    */
  def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    if (s.numBytes() == s.numChars()) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Column API: `unicode_normalize(col, "NFC")`. */
  def unicode_normalize(text: Column, form: String = "NFC"): Column =
    toColumn(UnicodeNormalize(toExpression(text), form))
}
