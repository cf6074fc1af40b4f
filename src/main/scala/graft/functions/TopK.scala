package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-buffer top-k aggregation: keeps the k best (sim, id) entries
  * per group in a sorted buffer of size ≤ k, ordered by sim DESC with id
  * ASC tie-break — the exact semantics of
  * `row_number() over (partition by g order by sim desc, id) <= k`.
  *
  * The window form shuffles EVERY scored row to its group's reducer — for
  * ANN ranking that is |queries|·|corpus| rows through the exchange. As a
  * typed Aggregator it runs as a normal two-phase aggregate: map-side
  * partials truncate to k entries before the shuffle, so the exchange
  * carries |groups| buffers of ≤ k entries regardless of corpus size.
  * That is the difference between an ANN ranking that scales with the
  * corpus and one that scales with the candidate count.
  *
  * Exact, not approximate: top-k under a total order is mergeable
  * (truncating partials can never evict a global top-k entry, since any
  * entry it beats locally it also beats globally).
  */
object TopK {

  /** One scored candidate. `sim` should already be rounded to the
    * precision the caller ranks at, so order is engine-portable.
    */
  final case class Scored(sim: Double, id: Long)

  /** sim DESC, id ASC — the deterministic ranking order. */
  private val ord: Ordering[Scored] = Ordering.by((s: Scored) => (-s.sim, s.id))

  final case class TopKAgg(k: Int)
      extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    require(k >= 1, s"k must be positive, got $k")

    override def zero: List[Scored] = Nil

    // buffer invariant: sorted by `ord`, length ≤ k
    override def reduce(b: List[Scored], a: Scored): List[Scored] =
      // NaN is the null sentinel installed by the Column API: a null
      // similarity is "no score" and never ranks (the primitive field
      // would otherwise decode null as 0.0 — a legitimate-looking rank)
      if (a.sim.isNaN) b else insert(b, a)

    override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
      b2.foldLeft(b1)(insert)

    override def finish(b: List[Scored]): Seq[Scored] = b

    private def insert(b: List[Scored], a: Scored): List[Scored] =
      if (b.lengthCompare(k) >= 0 && ord.gteq(a, b.last)) b // below the cut
      else {
        val (better, worse) = b.span(x => ord.lt(x, a))
        (better ::: a :: worse).take(k)
      }

    override def bufferEncoder: Encoder[List[Scored]] =
      ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** Column API: `df.groupBy(g).agg(top_k($"sim", $"id", 5))` →
    * array<struct<sim double, id bigint>> sorted best-first. Candidates
    * with a NULL (or NaN) similarity are dropped, not ranked-last as the
    * `row_number` window form would — an unscored candidate has no
    * place in a top-k. A NULL id is dropped the same way (the NaN-sim
    * sentinel): the primitive Long field would otherwise decode it as
    * 0 — a legitimate-looking phantom neighbor_id 0 in the ranking.
    */
  def top_k(sim: Column, id: Column, k: Int): Column =
    udaf(TopKAgg(k), Encoders.product[Scored])
      .apply(
        org.apache.spark.sql.functions.when(id.isNull,
            org.apache.spark.sql.functions.lit(Double.NaN))
          .otherwise(org.apache.spark.sql.functions.coalesce(sim,
            org.apache.spark.sql.functions.lit(Double.NaN))), id)

  /** One scored candidate with an EXACT integer score. */
  final case class ScoredL(score: Long, id: Long)

  private val ordL: Ordering[ScoredL] =
    Ordering.by((s: ScoredL) => (-s.score, s.id))

  /** The [[TopKAgg]] buffer over exact BIGINT scores: a Double carrier
    * silently collapses scores past 2^53 (two BM25 score_ppm values one
    * apart cast to the SAME double, so ties break by id instead of true
    * score — at nd ~ 10⁹ docs a few rare-term contributions cross
    * that line). NULL scores are dropped via the Long.MinValue sentinel
    * (legitimate scores are non-negative by the callers' contract).
    */
  final case class TopKAggL(k: Int)
      extends Aggregator[ScoredL, List[ScoredL], Seq[ScoredL]] {
    require(k >= 1, s"k must be positive, got $k")
    override def zero: List[ScoredL] = Nil
    override def reduce(b: List[ScoredL], a: ScoredL): List[ScoredL] =
      if (a.score == Long.MinValue) b else insert(b, a)
    override def merge(b1: List[ScoredL], b2: List[ScoredL]): List[ScoredL] =
      b2.foldLeft(b1)(insert)
    override def finish(b: List[ScoredL]): Seq[ScoredL] = b
    private def insert(b: List[ScoredL], a: ScoredL): List[ScoredL] =
      if (b.lengthCompare(k) >= 0 && ordL.gteq(a, b.last)) b
      else {
        val (better, worse) = b.span(x => ordL.lt(x, a))
        (better ::: a :: worse).take(k)
      }
    override def bufferEncoder: Encoder[List[ScoredL]] =
      ExpressionEncoder[List[ScoredL]]()
    override def outputEncoder: Encoder[Seq[ScoredL]] =
      ExpressionEncoder[Seq[ScoredL]]()
  }

  /** Exact-integer top-k: `array<struct<score bigint, id bigint>>`
    * sorted best-first, bit-exact at ANY score magnitude. NULL scores
    * are dropped, like [[top_k]].
    */
  def top_k_exact(score: Column, id: Column, k: Int): Column =
    udaf(TopKAggL(k), Encoders.product[ScoredL])
      .apply(
        // NULL id dropped via the same sentinel as NULL score (see
        // top_k: primitive decode would alias it to id 0)
        org.apache.spark.sql.functions.when(id.isNull,
            org.apache.spark.sql.functions.lit(Long.MinValue))
          .otherwise(org.apache.spark.sql.functions.coalesce(
            score.cast("long"),
            org.apache.spark.sql.functions.lit(Long.MinValue))), id)
}
