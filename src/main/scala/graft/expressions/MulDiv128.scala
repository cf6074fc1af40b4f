package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for `floor(a * b / m)` computed through an
  * exact 128-bit intermediate — fixed-point arithmetic whose PRODUCT
  * overflows BIGINT but whose quotient fits.
  *
  * Why it exists: the engine's integer-exact scoring formulas (BM25
  * contribution ppm, proportional allocations) multiply corpus-scale
  * counts before dividing, so the natural SQL spelling needs
  * DECIMAL(38,0) carriers. Spark backs >18-digit decimals with
  * java.math.BigDecimal — every row allocates, and on a
  * candidate-pair-scale input the hot aggregate turns into a GC storm
  * (profiled on the BM25 decontamination query: 22.4 s of a 23.6
  * CPU-second stage was garbage collection). This expression keeps the
  * exact same value — Math.multiplyHigh gives the full 128-bit product,
  * a shift-subtract loop divides it by the 64-bit divisor — in flat
  * longs with zero allocation, inside whole-stage codegen.
  *
  * Contract (mirrors SQL `div` semantics on the widened product):
  *  - any NULL input → NULL;
  *  - requires a ≥ 0, b ≥ 0, m > 0 (the fixed-point formulas this
  *    serves are sign-free) — violations return NULL rather than a
  *    wrong magnitude;
  *  - a quotient above Long.MaxValue returns NULL (caller's scaling is
  *    broken; never wraps silently).
  *
  * Composition note: `floor(floor(x/p)/q) == floor(x/(p*q))` for
  * positive integers, so a divisor whose PRODUCT overflows BIGINT can
  * be applied as `muldiv128(a, b, p) div q` — used by
  * [[graft.functions.Bm25.contribPpm]] where p,q each fit a long but
  * p·q may not at corpus scale.
  */
case class MulDiv128(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second, third).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint, bigint), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "muldiv128"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = first.eval(input)
    val b = second.eval(input)
    val m = third.eval(input)
    if (a == null || b == null || m == null) null
    else {
      val r = MulDiv128.mulDiv(a.asInstanceOf[Long], b.asInstanceOf[Long],
        m.asInstanceOf[Long])
      if (r < 0L) null else r
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val helper = MulDiv128.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $helper.mulDiv($a, $b, $m);
         |if (${ev.value} < 0L) { ${ev.isNull} = true; ${ev.value} = 0L; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MulDiv128 {
  /** floor(a*b/m) for a,b ≥ 0, m > 0; −1 on contract violation or
    * quotient overflow (valid results are always ≥ 0, so the sign bit
    * is a free error channel — the expression maps it to NULL).
    * Called from generated code: keep it static-shaped and branch-lean.
    */
  def mulDiv(a: Long, b: Long, m: Long): Long = {
    if (a < 0L || b < 0L || m <= 0L) return -1L
    val hi = Math.multiplyHigh(a, b) // a,b ≥ 0 ⇒ signed == unsigned product
    val lo = a * b
    if (hi == 0L) {
      // single-word fast path — the common case once callers split
      // their factors sensibly; lo is the full product read unsigned
      val q = java.lang.Long.divideUnsigned(lo, m)
      if (q < 0L) -1L else q
    } else {
      if (java.lang.Long.compareUnsigned(hi, m) >= 0) return -1L // q ≥ 2^64
      // shift-subtract over the significant bits only: invariant
      // r < m ≤ 2^63−1, so (r<<1)|bit never wraps past unsigned range
      var r = hi
      var q = 0L
      var i = 63
      while (i >= 0) {
        r = (r << 1) | ((lo >>> i) & 1L)
        if (java.lang.Long.compareUnsigned(r, m) >= 0) {
          r -= m
          q |= (1L << i)
        }
        i -= 1
      }
      if (q < 0L) -1L else q // bit 63 set ⇒ quotient > Long.MaxValue
    }
  }
}
