package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing. Random `sample()`/`sampleBy()`
  * draws depend on partition layout and seed plumbing — unreproducible
  * across runs, engines, and cluster sizes. Hash-based sampling decides
  * membership from the ROW ITSELF (a stable id hashed into a bucket), so
  * the same row is kept or dropped everywhere: results are reproducible
  * at any parallelism, auditable row-by-row, and stable across reruns of
  * a 100 TB pipeline (a rerun samples the identical subcorpus — critical
  * when downstream training data must not silently shift).
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from the salted md5 of the id's
    * string form. The salt decorrelates independent sampling decisions
    * (two different salts give two independent subsamples).
    */
  def hashBucket(id: Column, buckets: Int = 100, salt: String = ""): Column =
    (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("bigint") % buckets).cast("int")

  /** Deterministic fractional upsampling (oversampling with replacement)
    * for epoch weighting: a row with weight w appears floor(w) times,
    * plus once more iff its hash bucket falls under the fractional part —
    * so a 2.3-weighted stratum is seen 2.3× per epoch IN EXPECTATION
    * while every individual decision is a pure function of the row id
    * (reruns and engines agree row-for-row; nothing depends on partition
    * layout). The repeat is `explode(sequence(...))` at the scan — no
    * shuffle, no driver involvement — and `epoch` numbers the copies so
    * downstream shuffling/packing can treat them as distinct samples.
    * This is how quality-weighted data budgets are realized in LLM
    * pretraining mixes (high-quality sources repeated 2-5×).
    *
    * `weightsPctX100` maps stratum → weight in hundredths (230 = 2.3×) —
    * integers keep the oracle arithmetic exact. Unlisted strata default
    * to 100 (seen exactly once).
    */
  def epochUpsample(df: DataFrame, stratumCol: Column, idCol: Column,
      weightsPctX100: Map[String, Int], defaultPctX100: Int = 100,
      salt: String = ""): DataFrame = {
    require((defaultPctX100 +: weightsPctX100.values.toSeq).forall(_ >= 0),
      "weights are non-negative hundredths")
    val w = weightsPctX100.foldLeft(lit(defaultPctX100)) { case (acc, (k, v)) =>
      when(stratumCol === lit(k), lit(v)).otherwise(acc)
    }
    val base = floor(w / 100).cast("int")
    val extra = when(hashBucket(idCol, 100, salt) < (w % 100), 1).otherwise(0)
    df.withColumn("n_epochs", (base + extra).cast("bigint"))
      .filter(col("n_epochs") >= 1)
      .withColumn("epoch",
        explode(sequence(lit(1L), col("n_epochs"))))
  }

  /** Per-stratum deterministic subsample: keep a row iff its hash bucket
    * falls below the stratum's percentage. `ratesPct` maps stratum value →
    * keep-percentage (0-100); unlisted strata fall back to `defaultPct`.
    * One scan, no shuffle, no state — the filter composes with pushdown
    * and runs at scan speed on any corpus size.
    */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
      ratesPct: Map[String, Int], defaultPct: Int = 0,
      salt: String = ""): DataFrame = {
    require(ratesPct.values.forall(r => r >= 0 && r <= 100),
      "rates are percentages in [0,100]")
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(stratumCol === lit(k), lit(v)).otherwise(acc)
    }
    df.withColumn("sample_bucket", hashBucket(idCol, 100, salt))
      .filter(col("sample_bucket") < rate)
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): hashed unigram
    * bucket counts over a target subcorpus vs the raw corpus give a
    * per-bucket importance ratio; each document's weight is the sum of
    * its tokens' bucket ratios, and selection keeps the top-weighted
    * documents (the ones that "look like" the target distribution).
    *
    * Deviation from the paper, for engine-exactness: the paper sums
    * log p_target/p_raw over features, but engines disagree on log's
    * last bits, so the add-1-smoothed ratio is carried as a floor-scaled
    * integer (‰ units, `(tgt+1)·N_raw·1000 div (raw+1)·N_tgt`) and the
    * document weight stays in exact BIGINT arithmetic — monotone in each
    * bucket's likelihood ratio and bit-identical on any engine or
    * partitioning. (Sum-of-ratios vs sum-of-logs ranks differently in
    * corners, which a fixed-point log table could close; the pipeline
    * shape — the part that matters at 100 TB — is identical.) The
    * document weight is LENGTH-NORMALIZED (mean per-token ratio, in
    * micro units): the raw sum is length-biased — a long off-target
    * document outscores a short on-target one — which measurably
    * inverted the selection on the test corpus before normalization.
    *
    * Scale shape: the bucket-stats table is `width` rows (one bounded
    * map-combinable groupBy of the token stream), the grand totals are
    * one aggregate row, and both broadcast back onto the token stream —
    * the corpus shuffles only on (doc_id) for the final per-document
    * sum. Returns (doc_id, weight) for every document with at least one
    * token (a zero-token document has no feature evidence and no
    * defined mean ratio, so it carries no row).
    */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      width: Int = 4096, scalePerMille: Long = 1000L,
      tokenAudits: Seq[Column] = Nil): DataFrame = {
    // the bucketed token stream feeds the stats pass and the scoring
    // join — persist it, or the tokenize+hash scan runs twice. The scan
    // is widened FIRST ([[graft.Par.toCores]]): the md5-per-token
    // hashing is per-row CPU inside the scan projection, serial on a
    // one-split input (measured 3.0 task-CPU-s at 1-way on the
    // one-row-group fixture); doc_id clustering also pre-shapes the
    // cache for the final per-document aggregate.
    val toks = graft.CacheScope.persisted(
      graft.Par.toCores(docs, col("doc_id"))
        .select(col("doc_id"), isTarget.as("is_target"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .withColumn("bucket",
          conv(substring(md5(col("tok")), 1, 15), 16, 10)
            .cast("bigint") % width))
    val stats = toks.groupBy("bucket").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tgt"),
      count(lit(1)).as("raw"))
    val tot = stats.agg(sum("tgt").as("nt"), sum("raw").as("nr"))
    // the likelihood-ratio product rides a DECIMAL(38,0) carrier (the
    // q110/q116 device): nr is the TOTAL corpus token count, so at the
    // 100 TB / trillions-of-tokens scale a plain BIGINT product wraps
    // silently (ANSI off) and inverts the selection. The integral `div`
    // lands back in BIGINT, so emitted values — and the q115 oracle
    // hash — are unchanged wherever the old arithmetic didn't overflow.
    val scored = stats.crossJoin(broadcast(tot))
      .select(col("bucket"),
        expr(s"(CAST(tgt + 1 AS DECIMAL(38,0)) * nr * $scalePerMille)" +
          s" div (CAST(raw + 1 AS DECIMAL(38,0)) * nt)").as("score"))
    // `tokenAudits`: optional extra aggregates over the per-document
    // token stream (each row exposes `tok`), computed in the SAME final
    // pass — a caller needing e.g. a per-doc term count alongside the
    // weight (q115's n_dup audit column) would otherwise re-tokenize
    // the whole corpus and pay a second doc-keyed join
    toks.join(broadcast(scored), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("score").cast("decimal(38,0)")).as("sum_score"),
        count(lit(1)).as("n_tokens") +: tokenAudits: _*)
      .withColumn("weight", expr("(sum_score * 1000) div n_tokens"))
      .drop("sum_score", "n_tokens")
  }

  /** Weight-proportional SYSTEMATIC sampling: lay the corpus on a number
    * line where each row owns an interval as wide as its integer weight
    * (exclusive prefix sum in `orderCols` order), then take every
    * step-th point (step = totalW div nSamples, offset = step div 2).
    * A row is drawn once per sample point inside its interval, so
    * inclusion probability is exactly proportional to weight, heavy rows
    * can be drawn multiple times (`n_picks` > 1 — epoch semantics, like
    * [[epochUpsample]]), and the whole draw is a pure integer function
    * of (data, order) — no RNG, identical on any engine or partitioning.
    * This is the classic PPS-systematic design (probability proportional
    * to size; Madow 1949), the deterministic counterpart of weighted
    * reservoir sampling.
    *
    * Scale shape: the prefix sum is the bucketed [[graft.operators.PrefixSum]]
    * (never a single-partition window), the total is ONE broadcast
    * scalar, and the pick count is a pure projection — the corpus
    * shuffles once (range-bucketing), then streams. Requires
    * totalW >= nSamples (step >= 1; with ANSI off a zero step nulls
    * `div` and every row silently drops — callers size nSamples below
    * the weight mass).
    */
  def systematicSample(df: DataFrame, orderCols: Seq[Column],
      weightCol: Column, nSamples: Long): DataFrame = {
    val base = df.withColumn("weight", weightCol.cast("bigint"))
    val withCum = graft.operators.PrefixSum.exclusiveRunningTotal(
      base, orderCols, col("weight"), "cum_before")
    val tot = base.agg(sum(col("weight")).cast("bigint").as("tw"))
    withCum.crossJoin(broadcast(tot))
      .withColumn("step", expr(s"tw div ${nSamples}L"))
      .withColumn("off", expr("step div 2"))
      // g(x) = #{sample points < x} = (x + step - off - 1) div step —
      // numerator >= 0 for x >= 0, so truncating div == floor div in any
      // engine; capped at nSamples so a trailing remainder interval
      // cannot invent an (nSamples+1)-th point
      .withColumn("n_picks",
        least(expr("(cum_before + weight + step - off - 1) div step"),
            lit(nSamples))
          - least(expr("(cum_before + step - off - 1) div step"),
            lit(nSamples)))
      .filter(col("n_picks") >= 1)
      .drop("tw", "step", "off")
  }

  /** EXACT integer square root (⌊√v⌋) of a non-negative BIGINT column
    * with v < 2⁵³: floor of the double sqrt, then a ±1 integer
    * correction. Doubles represent every integer below 2⁵³ exactly and
    * IEEE sqrt is correctly rounded there, so the float result is
    * within one integer of truth and the correction — pure integer
    * comparisons — re-anchors it exactly. Engine-independent: any
    * correctly-rounded sqrt yields the same corrected value, so DuckDB
    * and Spark agree bit-for-bit (the floor-before-cast discipline of
    * q167 applied to square roots). Needed wherever a σ (not σ²) rides
    * an exact integer pipeline: Neyman allocation (q262), integer
    * stddev bounds.
    */
  def isqrt(v: Column): Column = {
    val s0 = floor(sqrt(v.cast("double"))).cast("bigint")
    val s1 = when(s0 * s0 > v, s0 - 1).otherwise(s0)
    when((s1 + 1) * (s1 + 1) <= v, s1 + 1).otherwise(s1)
  }
}
