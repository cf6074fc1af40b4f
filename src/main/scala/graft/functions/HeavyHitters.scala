package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy hitters: a bounded-memory one-pass frequency sketch
  * as a typed Aggregator (the "novel sketch" extension point — Spark has
  * HLL and CMS built in, but no heavy-hitters summary).
  *
  * Guarantees (k counters): any key with true frequency > n/(k+1) is
  * present in the output, and every reported count is an under-estimate
  * by at most n/(k+1). Mergeable (the partial sketches combine with the
  * same bound), so it runs as a normal two-phase aggregate: map-side
  * partials over each partition, one tiny merge — the shape that turns a
  * full 100 TB groupBy-count skew scan into a single pass with k counters
  * per partition.
  *
  * Output counts depend on encounter order (inherent to MG), so this is
  * a diagnostic operator (skew profiling, hot-key detection), not an
  * oracle-verified query: HeavyHittersSpec checks the guarantees instead.
  */
object HeavyHitters {

  type Buf = mutable.HashMap[String, Long]

  final case class MisraGries(k: Int) extends Aggregator[String, Buf, Map[String, Long]] {
    require(k >= 1)

    override def zero: Buf = mutable.HashMap.empty

    override def reduce(b: Buf, key: String): Buf = {
      // null keys are skipped, matching built-in aggregate semantics —
      // without this a null in the stream becomes a null map key the
      // output encoder cannot serialize (runtime crash at eval)
      if (key == null) return b
      if (b.contains(key)) b(key) += 1L
      else if (b.size < k) b(key) = 1L
      else {
        // decrement-all step, dropping exhausted counters
        val dead = mutable.ArrayBuffer.empty[String]
        b.keysIterator.foreach { kk =>
          val v = b(kk) - 1L
          if (v <= 0L) dead += kk else b(kk) = v
        }
        dead.foreach(b.remove)
      }
      b
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      b2.foreach { case (kk, v) => b1(kk) = b1.getOrElse(kk, 0L) + v }
      if (b1.size > k) {
        // subtract the (k+1)-th largest count from everyone (batch form
        // of decrement-all), keep survivors
        val cut = b1.values.toSeq.sorted(Ordering[Long].reverse)(k)
        val dead = b1.iterator.collect { case (kk, v) if v - cut <= 0L => kk }.toSeq
        b1.keysIterator.toSeq.foreach(kk => if (!dead.contains(kk)) b1(kk) -= cut)
        dead.foreach(b1.remove)
      }
      b1
    }

    override def finish(b: Buf): Map[String, Long] = b.toMap

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column API: `df.agg(heavy_hitters($"key", 10))` → map<key, count>. */
  def heavy_hitters(key: Column, k: Int): Column =
    udaf(MisraGries(k), Encoders.STRING).apply(key)
}
