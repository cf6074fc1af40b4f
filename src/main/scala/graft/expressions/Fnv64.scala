package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash of a string, sign-bit-cleared (range [0, 2⁶³)) —
  * the engine's cheap PORTABLE dispersal hash for shingle fingerprints,
  * minhash bases, band keys, and sketch bucketing.
  *
  * Why it exists: the portable-hash tier was md5 — expressible in any
  * engine, but a full crypto digest plus a 32-char hex rendering plus a
  * `conv(substring(...))` re-parse PER ROW. On gram-scale inputs
  * (one hash per shingle occurrence) that digest dominated the whole
  * query's CPU, and under a contended scheduler the inflated
  * task-seconds turned into multi-second wall spikes. FNV-1a is one
  * xor-multiply per byte in flat longs — zero allocation, fully inside
  * whole-stage codegen, ~20× less CPU — while staying exactly
  * reproducible in plain SQL (see [[Fnv64.sql]]), which crypto-strength
  * alternatives (xxhash64) are not. Dispersal quality is all these call
  * sites need; none of them wants collision *resistance*.
  *
  * Portability contract: the value is defined over the string's UTF-8
  * BYTES; the SQL oracle form iterates CODEPOINTS (plain SQL cannot
  * cheaply iterate bytes), so the two agree exactly on ASCII input.
  * Every call site feeds ASCII (lowercased `\s+`-split tokens of the
  * fixture corpora, decimal-cast ids, literal salts). Keep md5 for any
  * hash whose input may be non-ASCII.
  *
  * NULL input → NULL (null-intolerant unary). Empty string → the FNV
  * offset basis with the sign bit cleared, same in both forms.
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override def nullSafeEval(input: Any): Any =
    Fnv64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${Fnv64.Helper}.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fnv64 {
  private[expressions] val Helper: String =
    Fnv64.getClass.getName.stripSuffix("$") + "$.MODULE$"

  /** FNV-1a offset basis / prime (Fowler–Noll–Vo, public domain spec). */
  val OffsetBasis: Long = 0xcbf29ce484222325L
  val Prime: Long = 0x100000001b3L // 1099511628211

  /** FNV-1a over the UTF-8 bytes, sign bit cleared. Called from
    * generated code: static-shaped, zero allocation.
    */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes
    var h = OffsetBasis
    var i = 0
    while (i < n) {
      h = (h ^ (s.getByte(i) & 0xffL)) * Prime
      i += 1
    }
    h & Long.MaxValue
  }

  /** Column-API entry point. */
  def fnv64(c: Column): Column = toColumn(Fnv64(toExpression(c)))

  /** The SAME hash as a plain-SQL expression over `e` (DuckDB dialect:
    * lambda fold over codepoints, mod-2⁶⁴ arithmetic through a 128-bit
    * intermediate — 64×40-bit products stay well inside HUGEINT).
    * Kept adjacent to [[hash]] so the two definitions can only drift
    * visibly. ASCII-equal to the byte form above; see class doc.
    *
    * The `list_filter(_, c -> c <> '')` guard exists for ONE input: the
    * empty string, where DuckDB's `string_split('', '')` yields `['']`
    * and `unicode('')` is −1 — folding that sentinel would diverge from
    * the byte form's "empty → offset basis". Non-empty input never
    * produces an empty element (every split part is a single char), so
    * the filter is a no-op there. Pinned by Fnv64Spec's property test.
    */
  def sql(e: String): String =
    s"""CAST(list_reduce(list_prepend(14695981039346656037::HUGEINT,
       |  list_transform(list_filter(string_split($e, ''), c -> c <> ''),
       |                 c -> unicode(c)::HUGEINT)),
       |  (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
       |            % 18446744073709551616::HUGEINT)
       |  % 9223372036854775808::HUGEINT AS BIGINT)""".stripMargin
}
