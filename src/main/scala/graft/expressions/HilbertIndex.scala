package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the Hilbert-curve index of an (x, y)
  * cell over a 2^bits-square grid, with whole-stage codegen
  * (`doGenCode` emits the classic reflect/swap loop as straight-line
  * Java).
  *
  * This is the third (and fastest) form of the transform in the
  * engine: the nested-Column unroll ([[graft.sources.ZOrder
  * .hilbertValue]]) grows ~5× per bit and is guarded to tiny grids;
  * the per-bit projection chain ([[graft.sources.ZOrder.withHilbert]])
  * is linear in `bits` but still pays ~6·bits attribute bindings per
  * row. Here the whole transform is ONE codegen'd loop — arbitrary
  * depth (bits ≤ 31) at constant plan size, the preferred-extension
  * order from the design notes applied: built-ins first, a native
  * Expression where the built-in form can't stay on the fast path.
  * All three forms are spec-pinned equal cell-for-cell.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  /** The reference transform (public algorithm): per bit high→low,
    * extract (rx, ry), accumulate s²·((3·rx) ⊕ ry), reflect+swap.
    */
  private[expressions] def transform(x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      val s = 1L << b
      val rx = (x >> b) & 1L
      val ry = (y >> b) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      b -= 1
    }
    d
  }

  override def nullSafeEval(xv: Any, yv: Any): Any =
    transform(xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val b = ctx.freshName("hb")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
        long $x = $xv & ${(1L << bits) - 1}L;
        long $y = $yv & ${(1L << bits) - 1}L;
        long $d = 0L;
        for (int $b = ${bits - 1}; $b >= 0; $b--) {
          long $s = 1L << $b;
          long $rx = ($x >> $b) & 1L;
          long $ry = ($y >> $b) & 1L;
          $d += $s * $s * ((3L * $rx) ^ $ry);
          if ($ry == 0L) {
            if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
            long $t = $x; $x = $y; $y = $t;
          }
        }
        ${ev.value} = $d;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    toColumn(HilbertIndex(toExpression(x), toExpression(y), bits))
}
