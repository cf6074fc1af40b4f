package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The minimum md5 over a text's word n-gram shingles — the 1-hash
  * MinHash special case used as a rolling document fingerprint — in ONE
  * expression: tokenize, shingle, hash, and min-track in a single pass
  * with no intermediate array, no explode, and no aggregation.
  *
  * The composed form (`min(md5(g))` grouped after exploding
  * [[WordShingles]]) materializes every shingle as a row and pays a
  * hash shuffle per document; this evaluates to the same value (md5-hex
  * min is the byte-wise unsigned min, and min over repeats equals min
  * over distincts) at scan speed. NULL when the text has fewer than `n`
  * tokens, matching the explode_outer/min-over-empty convention.
  *
  * Tokenization is char-for-char identical to [[WordShingles]] (split on
  * `\s+` runs, leading/trailing empties kept, single-space joins).
  * Implements real `doGenCode` (a static-helper call), NOT
  * CodegenFallback — a fallback forces the whole scan stage out of
  * whole-stage codegen (measured +50% stage CPU when SimhashSignature
  * was in the same position).
  */
case class MinShingleHash(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_shingle_hash"

  override def nullSafeEval(input: Any): Any =
    MinShingleHash.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val helper = MinShingleHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $helper.compute($text, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleHash {
  /** Unsigned lexicographic byte compare — equivalent to comparing the
    * lowercase-hex renderings, so the min digest IS the min hex string.
    */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Null when the text has fewer than `n` tokens (the expression's
    * NULL channel). Called from generated code; keep it allocation-lean.
    */
  def compute(input: UTF8String, n: Int): UTF8String = {
    val text = input.toLowerCase.toString
    val tokens = ShingleText.tokenize(text)
    if (tokens.length < n) return null
    val md = ShingleText.localMd.get()
    var min: Array[Byte] = null
    var t = 0
    val sb = new java.lang.StringBuilder
    while (t <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(t + j))
        j += 1
      }
      val d = md.digest(sb.toString.getBytes("UTF-8")) // digest() resets
      if (min == null || lessThan(d, min)) min = d
      t += 1
    }
    val hex = new java.lang.StringBuilder(32)
    min.foreach { b =>
      hex.append(Character.forDigit((b >> 4) & 0xf, 16))
      hex.append(Character.forDigit(b & 0xf, 16))
    }
    UTF8String.fromString(hex.toString)
  }

  def minShingleHash(text: Column, n: Int): Column =
    toColumn(MinShingleHash(toExpression(text), n))
}
