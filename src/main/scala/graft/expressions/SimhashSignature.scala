package graft.expressions


import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The md5-vote SimHash signature of a shingle set in ONE per-row pass —
  * the scan-stage form of the explode → 32-sum-aggregate plan in
  * [[graft.functions.DedupOps.simhashSignatures]].
  *
  * The composed form materializes every (doc, shingle) pair as a row and
  * shuffles them all into a 32-column partial aggregate — at sf0.1 that
  * is ~2.5 M exploded rows and the single most expensive job of every
  * SimHash-family query (13.9 CPU-seconds profiled). The signature is a
  * pure function of one document's shingle array, so this expression
  * folds the votes inside the scan: no explode, no shuffle, no
  * aggregation state.
  *
  * Bit-for-bit identical to the SQL spelling (and therefore to the
  * DuckDB oracle): per shingle g, v = value of the FIRST 8 HEX CHARS of
  * md5(g) (bytes 0–3 of the digest, big-endian — exactly
  * `conv(substring(md5(g),1,8),16,10)`); signature bit i reads vote bit
  * `4·(7 − i/4) + i%4` of v (hex char p, 1-based, is nibble 8−p); bit i
  * of the result is set iff the ±1 vote sum is STRICTLY positive (a
  * tied vote clears the bit, matching `when(s_i > 0)`).
  *
  * NULL for a null or EMPTY array: the composed form's explode drops
  * shingle-less documents, so callers filter nulls to keep the same row
  * set. Null ELEMENTS are skipped (md5(null) votes null in the composed
  * form — sum ignores it); an all-null array yields signature 0, again
  * matching `when(null > 0) → 0` per bit. Implements real `doGenCode` (a static-helper call), NOT
  * CodegenFallback: a fallback expression forces its whole stage out of
  * whole-stage codegen, and here that stage also carries the shingle
  * generation and the downstream chunk explode — measured +50% stage
  * CPU with fallback, erasing the shuffle win.
  */
case class SimhashSignature(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 32, s"simhash bits must be in [1,32], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val sig = SimhashSignature.compute(input.asInstanceOf[ArrayData], bits)
    if (sig < 0L) null else sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = SimhashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $helper.compute($arr, $bits);
         |if (${ev.value} < 0L) { ${ev.isNull} = true; ${ev.value} = 0L; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashSignature {
  /** −1 for an empty array (the expression maps it to NULL — valid
    * signatures occupy [0, 2³²), so the sign is a free error channel).
    * Called from generated code; keep it allocation-lean.
    */
  def compute(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    if (n == 0) return -1L
    val md = ShingleText.localMd.get()
    val cnt = new Array[Int](bits)
    var m = 0 // non-null shingles: the composed form's md5(null) votes null
    var g = 0
    while (g < n) {
      if (!arr.isNullAt(g)) {
        m += 1
        val d = md.digest(arr.getUTF8String(g).getBytes) // digest() resets
        val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var i = 0
        while (i < bits) {
          // vote-bit position for signature bit i: hex char p (1-based)
          // of the md5 prefix is nibble 8−p of v (see class doc)
          cnt(i) += ((v >>> (4 * (7 - i / 4) + i % 4)) & 1L).toInt
          i += 1
        }
      }
      g += 1
    }
    // all-null array: the composed form's votes are all-null sums, and
    // `when(s_i > 0)` clears every bit — signature 0, row kept
    var sig = 0L
    var i = 0
    while (i < bits) {
      // vote sum = cnt·(+1) + (m−cnt)·(−1) = 2·cnt − m; bit set iff > 0
      if (2 * cnt(i) > m) sig |= 1L << i
      i += 1
    }
    sig
  }

  def simhashSignature(shingles: Column, bits: Int = 32): Column =
    toColumn(SimhashSignature(toExpression(shingles), bits))
}
