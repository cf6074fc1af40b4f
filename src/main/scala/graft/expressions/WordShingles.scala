package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a lowercased text column — the native
  * form of `array_distinct(transform(sequence(...), i => array_join(
  * slice(split(lower(text), "\\s+"), i, n), " ")))` (TextAnalysis
  * .shinglesHof).
  *
  * The built-in formulation nests four interpreted higher-order array
  * functions plus a regex split per row; this expression is a single
  * char-scan pass with no regex and no intermediate arrays, preserving
  * the exact semantics: split on Java-regex `\s+` runs (space, \t, \n,
  * \x0B, \f, \r), leading/trailing empty tokens kept as `split` does,
  * n-grams joined with a single space, distinct by first occurrence.
  * Implements real `doGenCode` (a static-helper call), NOT
  * CodegenFallback: a fallback expression forces its whole stage out
  * of whole-stage codegen, and this one sits at the head of the
  * shingle-heavy family's scan stages (q22, q26–q28, q44, q47) —
  * the same conversion bought SimhashSignature's stage −50% CPU.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val helper = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($text, $n, $distinct);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Never null for a non-null input (an under-`n`-token text yields an
    * empty array). Called from generated code; tokenization is the
    * shared [[ShingleText.tokenize]] char-scan (`\s+`-run split).
    */
  def compute(input: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    // UTF8String.toLowerCase for exact parity with the lower() builtin
    val text = input.toLowerCase.toString
    val tokens = ShingleText.tokenize(text)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val out =
      if (distinct) mutable.LinkedHashSet.empty[UTF8String]
      else mutable.ArrayBuffer.empty[UTF8String]
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
      out += UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  def shingles(text: Column, n: Int): Column =
    toColumn(WordShingles(toExpression(text), n))

  /** All shingles including repeats — the repetition-scoring input. */
  def shinglesAll(text: Column, n: Int): Column =
    toColumn(WordShingles(toExpression(text), n, distinct = false))
}
