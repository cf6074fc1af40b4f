package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram sketch over an integer column — the
  * streaming/distributed quantile-estimation primitive (the reason
  * `approx_percentile` exists), with every step exact enough to sit
  * under a DuckDB oracle.
  *
  * The sketch is a (bin, cnt) table of ≤ `bins` rows: one
  * map-combinable groupBy, so executors pre-aggregate partial
  * histograms and the exchange carries histograms, never rows — and two
  * shards' sketches merge by plain `cnt` addition ([[HistogramSketchSpec]]
  * asserts split-build == whole-build, the q114 CMS discipline).
  * Quantile estimates walk the running total to the first bin covering
  * rank ⌈q·N⌉ and report that bin's upper edge: a BIGINT whose error is
  * bounded by one bin width — the bound the q122 oracle audits against
  * the exact interpolated percentile.
  *
  * Bin assignment is pure integer arithmetic (`(v-lo)·bins div span`),
  * so any engine reproduces the sketch bit-for-bit. The running total
  * runs over ≤ `bins` rows — bounded by construction, like sketch
  * driver traffic, never by data.
  */
object HistogramSketch {

  /** Build the (bin, cnt) histogram of `valueCol` (integer-valued) over
    * the closed domain [lo, hi].
    *
    * PRECONDITION: every value is NON-NULL and lies in [lo, hi] — the
    * callers derive (lo, hi) from the data's own min/max, which
    * guarantees the range but NOT nullity (min/max ignore nulls): a
    * NULL value mints a NULL bin — [[quantiles]] and [[ksStat]] reject
    * it loudly (rejectNullBin), so null-bearing columns must be
    * filtered before sketching. An
    * out-of-domain value is NOT detected: below-lo values alias into
    * low bins and above-hi values mint bins past `bins-1`, both
    * silently distorting quantiles — a caller binning against a FIXED
    * domain (not data-derived) must clamp or filter first. No clamp
    * here: the bin expression is replayed verbatim by the SQL oracles,
    * and the two sides must stay formula-identical.
    */
  def sketch(df: DataFrame, valueCol: String, bins: Int, lo: Long,
      hi: Long): DataFrame =
    df.select(expr(s"(($valueCol - $lo) * $bins) div ${hi - lo + 1}")
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** Two-sample KS distance straight from two sketches over the SAME
    * binning — drift testing at sketch cost: snapshots keep their
    * ≤bins-row histograms and compare WITHOUT rescanning either corpus
    * (the exact-KS q135 needs both full CDFs; this needs 2·bins
    * integers). Same integer carrier as q135: the distance is
    * max|cumA·nB − cumB·nA| with a DECIMAL(38,0) ppm divide; its error
    * vs exact KS is bounded by one bin's probability mass. Every
    * aggregate and the cumulative walk are bounded by `bins`, never by
    * data. Returns one row (na, nb, d_num, d_ppm).
    */
  def ksStat(skA: DataFrame, skB: DataFrame): DataFrame = {
    val m = graft.CacheScope.persisted(
      skA.select(col("bin"), col("cnt").as("ca"))
        .join(skB.select(col("bin"), col("cnt").as("cb")), Seq("bin"), "full_outer")
        .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb")))
    rejectNullBin(m)
    m.withColumn("cuma", sum("ca").over(Window.orderBy("bin")))
      .withColumn("cumb", sum("cb").over(Window.orderBy("bin")))
      .crossJoin(broadcast(m.agg(sum("ca").as("na"), sum("cb").as("nb"))))
      .groupBy("na", "nb")
      // cum·n cross-products scale with BOTH corpus masses (na·nb at
      // ~3e9 docs a side crosses 2^63): the products run in
      // DECIMAL(38,0) and only the max casts back (the q213/q253
      // cast-first discipline — values identical below the output's
      // own Long ceiling)
      .agg(max(abs(expr("CAST(cuma AS DECIMAL(38,0)) * nb") -
          expr("CAST(cumb AS DECIMAL(38,0)) * na")))
        .cast("bigint").as("d_num"))
      .select(col("na"), col("nb"), col("d_num"),
        expr("(CAST(d_num AS DECIMAL(38,0)) * 1000000)" +
          " div (CAST(na AS DECIMAL(38,0)) * nb)").as("d_ppm"))
  }

  /** A NULL bin (minted by a NULL input value — see [[sketch]]'s
    * precondition) sorts before bin 0 in the cumulative walks and
    * silently shifts every rank; reject it deterministically instead.
    * One tiny driver job over an already-persisted ≤bins-row frame —
    * the PrefixSum null-check discipline.
    */
  private def rejectNullBin(sk: DataFrame): Unit = {
    val nulls = sk.filter(col("bin").isNull).count()
    require(nulls == 0L,
      "HistogramSketch: NULL bin in the sketch — the value column " +
        "contained NULLs; filter them before sketching (min/max-derived " +
        "domains do not exclude nulls)")
  }

  /** Estimate the `qPermille` quantiles (e.g. 500 = median) from a
    * sketch: per q, the upper edge of the first bin whose cumulative
    * count reaches q·N/1000, plus the one-bin-width error bound.
    */
  def quantiles(sk: DataFrame, qPermille: Seq[Int], bins: Int, lo: Long,
      hi: Long): DataFrame = {
    val span = hi - lo + 1
    // the sketch aggregation feeds the cumulative walk AND the total —
    // persist the ≤bins rows rather than re-running the build twice
    val skP = graft.CacheScope.persisted(sk)
    rejectNullBin(skP)
    val cum = skP
      .withColumn("cum", sum("cnt").over(Window.orderBy("bin")))
      .crossJoin(broadcast(skP.agg(sum("cnt").as("n"))))
    cum
      .select(col("bin"), col("cum"), col("n"),
        explode(array(qPermille.map(q => lit(q.toLong)): _*)).as("q_permille"))
      // rank comparison in DECIMAL(38,0): cum·1000 and q·n scale with
      // the corpus row count (wraps past ~9.2e15 rows in BIGINT);
      // exact integer comparison, so values are unchanged in-domain
      .filter(expr("CAST(cum AS DECIMAL(38,0)) * 1000" +
        " >= CAST(q_permille AS DECIMAL(38,0)) * n"))
      .groupBy("q_permille").agg(min("bin").as("bin"))
      .select(col("q_permille"),
        // bin b holds v with (v-lo)·bins div span == b, so its TRUE
        // upper edge is lo + ⌈(b+1)·span/bins⌉ − 1 — the ceiling via
        // `+ bins − 1`; the floor form understated the edge by up to 1
        // whenever bins ∤ (b+1)·span, making est_hi a value the true
        // quantile could exceed
        expr(s"$lo + ((bin + 1) * $span + $bins - 1) div $bins - 1")
          .as("est_hi"),
        lit(span / bins + 1).as("bin_width"))
  }
}
