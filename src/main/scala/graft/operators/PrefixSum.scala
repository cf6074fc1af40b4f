package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix-sum (running total) over a global ordering — the
  * scan primitive behind surrogate-key assignment, sequence packing, and
  * offset/byte-position bookkeeping.
  *
  * A naive `sum(x) over (order by k)` window has no partition key: Spark
  * plans it as a SINGLE task holding the whole dataset ("WindowExec: No
  * Partition Defined"), which serializes a 100 TB scan through one
  * executor thread. Instead: range-bucket the ordering column with
  * approximate quantiles (any monotone bucketing yields the identical
  * global result — boundaries need not be exact), window WITHIN buckets
  * in parallel, and add per-bucket base offsets from a bounded
  * aggregation. Two driver-side actions move <= `buckets` numbers each —
  * never data — and the result is bit-identical to the single-partition
  * window at any parallelism.
  */
object PrefixSum {

  /** True iff the leading order expression resolves to a natively
    * numeric type, so double-cast bucket boundaries order EXACTLY like
    * the window's own sort. Strings (even all-digit ones), dates, and
    * anything else fall back to a single bucket — see the call sites.
    */
  private def numericLead(df: DataFrame, lead: Column): Boolean =
    df.select(lead).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]

  /** Append `outName` = exclusive running total of `valueCol` (the sum of
    * all values STRICTLY BEFORE each row) in ascending `orderCols` order.
    *
    * Requirements: `orderCols` must be a total order (ties would make
    * "before" ambiguous in any engine), `valueCol` non-null, and the
    * leading order column numeric-castable for bucket spread (a
    * non-numeric leading key degrades to one bucket — still correct, not
    * parallel).
    */
  def exclusiveRunningTotal(df: DataFrame, orderCols: Seq[Column],
      valueCol: Column, outName: String, buckets: Int = 16): DataFrame = {
    // persisted: three consumers (quantile sketch, bucket counts, the
    // output plan itself) would otherwise each recompute the input. The
    // cache holds the caller's input plus two derived columns — callers
    // pass narrow projections — and spills to disk when it doesn't fit
    val tmp = graft.CacheScope.persisted(df
      .withColumn("__ps_ord", orderCols.head.try_cast("double"))
      .withColumn("__ps_val", valueCol.cast("bigint")))
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // sketch-based split points: driver receives <= buckets doubles.
    // ONLY for a natively numeric leading key: a digit-STRING key
    // casts to a double whose order disagrees with the window's
    // lexicographic sort ("9" < "10" numerically but "10" < "9" as
    // strings), so bucket boundaries would split against row order and
    // the offsets would be silently wrong. Non-numeric keys degrade to
    // one bucket — correct, just not bucket-parallel (and the quantile
    // job is skipped entirely).
    val bounds =
      if (!numericLead(df, orderCols.head)) Array.empty[Double]
      // NaNs excluded from the sketch: they would corrupt the split
      // points (approxQuantile has no NaN ordering); their bucket is
      // assigned explicitly below
      else tmp.where(!isnan(col("__ps_ord")) || col("__ps_ord").isNull)
        .stat.approxQuantile("__ps_ord", probs, 0.01).distinct.sorted
    // NaN sorts GREATER than every double in Spark's ordering, but
    // `NaN > bound` is false — the fold would put NaN rows in bucket 0
    // while the window sorts them last, corrupting both their own
    // prefix and every later bucket's offset. Pin NaN to the LAST
    // bucket, where sort order and bucket order agree. NULL ord stays
    // bucket 0 (isnan(null) is null → otherwise-branch), matching the
    // window's NULLS FIRST.
    val bucketExpr = when(isnan(col("__ps_ord")), lit(bounds.length))
      .otherwise(bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col("__ps_ord") > lit(b), 1).otherwise(0)
      })
    val bucketed = tmp.withColumn("__ps_bucket", bucketExpr)
    // per-bucket totals -> exclusive base offsets; bounded by `buckets`,
    // never by the data, and folded into a codegen'd when-chain (no
    // join or extra exchange in the plan)
    // null count rides the SAME bounded aggregate (no extra pass): a
    // NULL value violates the non-null contract, and without this
    // check the failure mode depended on bucketing — loud
    // (ROW_VALUE_IS_NULL at this collect) when a bucket held only
    // nulls, SILENT zero-width otherwise (sum skips nulls). Contract
    // violations must be deterministic.
    val sumRows = bucketed.groupBy(col("__ps_bucket"))
      .agg(sum(col("__ps_val")).as("__ps_sum"),
        count(lit(1)).as("__ps_n"), count(col("__ps_val")).as("__ps_nn"))
      .collect()
    val nulls = sumRows.map(r => r.getLong(2) - r.getLong(3)).sum
    require(nulls == 0L,
      s"exclusiveRunningTotal: $nulls NULL value(s) in the running-total " +
        "column — the contract requires non-null values (a NULL would " +
        "otherwise silently pack as zero-width)")
    val sums = sumRows.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sums.map(_._1).zip(
      sums.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (acc, (b, off)) =>
      when(col("__ps_bucket") === lit(b), lit(off)).otherwise(acc)
    }
    // ROWS frame, not the default RANGE: with a total order they agree,
    // but ROWS keeps the frame O(1) per row instead of tie-group-sized
    val win = Window.partitionBy(col("__ps_bucket")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn(outName,
        sum(col("__ps_val")).over(win) - col("__ps_val") + offsetExpr)
      .drop("__ps_ord", "__ps_val", "__ps_bucket")
  }

  /** Per-group exclusive running totals of SEVERAL measures in ONE pass:
    * for each `partCols` group, append one column per `(valueCol, name)`
    * holding the sum of that value over the group's rows STRICTLY BEFORE
    * the current row in `orderCols` order.
    *
    * This is the batched form of [[exclusiveRunningTotal]]: a caller
    * that loops groups (one bucketed pipeline per flag/source — one
    * cache, one quantile sketch, one collect EACH) pays k× the fixed
    * cost; here every group shares a single quantile bucketing of the
    * ordering column, windows run partitioned by (group, bucket) — so a
    * group never serializes into one task — and per-(group, bucket) base
    * offsets come from one bounded aggregate windowed over ≤ `buckets`
    * rows per group. Same bit-exact result, one pipeline.
    */
  /** With `includeGrandTotals = true`, each output additionally carries
    * `<name>_grand` = the INCLUSIVE total of that measure over the row's
    * whole group. It rides the same bounded offsets pipeline (one more
    * windowed sum over the ≤ `buckets`-row per-group aggregate and the
    * SAME join back) — callers that would otherwise run a second
    * group-by over the input (a second scan + shuffle + persist just for
    * per-group totals) get it for free.
    */
  /** `broadcastOffsets`: pass true when the GROUP COUNT is bounded by a
    * literal domain (return flags, sources, a single global group) — the
    * offsets table is then provably ≤ groups × buckets rows and the
    * explicit hint saves a full sort of the row-scale input under a
    * non-adaptive plan (measured: q194 +2 s without it). Leave false
    * when groups scale with the data (per-part-key prefixes): there the
    * offsets table grows with the input and must shuffle-join.
    */
  /** The by-value row STRADDLING rank k per group — nearest-rank
    * selection (VaR cuts, weighted medians, exact percentiles) without
    * windowing the whole value domain.
    *
    * Input `byVal` is a by-value table: one row per (group, order
    * value) with a POSITIVE integer weight (`weightCol` — a count or a
    * weight mass) and optional extra measures. For each group this
    * returns the single row where the exclusive running weight first
    * straddles k = `kSql` (a SQL expression over `total_cnt`, the
    * group's grand weight), together with the exclusive prefix of every
    * measure AT that row and each measure's group grand total — exactly
    * the fields the closed-form tail/percentile formulas consume.
    *
    * Scale shape — why not [[groupedExclusiveRunningTotals]]: a full
    * prefix pass windows EVERY by-value row to keep prefixes the caller
    * then filters down to one row per group. Here the window runs over
    * the CUT BUCKET only: quantile-bucket the order values (one sketch
    * job), aggregate per (group, bucket) — bounded by groups × buckets,
    * never data — locate each group's straddle bucket from the bounded
    * offsets, and window just that bucket's rows (≤ 1/buckets of the
    * domain per group, the same per-partition bound the prefix pass
    * already carries). At corpus scale the row-domain window and its
    * wide offsets join — the dominant cost of the rank queries —
    * disappear; measured on q194: the 7 task-CPU-s window job drops to
    * a bucket-sized one.
    *
    * Output: `partCols`, `cut` (the straddle row's order value),
    * `cut_cnt` (its weight), `k`, `total_cnt`, `below_cnt` (exclusive
    * weight prefix), and per measure `below_<name>` (exclusive BIGINT
    * prefix) and `<name>_grand` (DECIMAL(38,0) group total — the
    * whole-group mass, first to outgrow Long at scale).
    *
    * Contract: weights ≥ 1, non-null order values, `orderCol` a total
    * order within each group (by-value input guarantees it), and
    * 1 ≤ k ≤ total_cnt for every group (true for any ceil(q·n) rank
    * with n ≥ 1) — a k outside the range has no straddle row and the
    * group is absent from the output. The weight contract is
    * caller-checked, not validated here (validation would cost a full
    * data pass per call): a zero/negative weight breaks the exclusive
    * prefix arithmetic and SILENTLY drops or misplaces the group's
    * straddle row — callers deriving weights from counts are safe by
    * construction; anything else must pre-filter. `broadcastCuts =
    * true` (one row
    * per GROUP) is safe whenever the group domain is bounded; leave
    * false when groups scale with the data.
    */
  def groupedRankRow(byVal0: DataFrame, partCols: Seq[String],
      orderCol: Column, weightCol: Column,
      measures: Seq[(Column, String)], kSql: String,
      buckets: Int = 16, broadcastCuts: Boolean = false): DataFrame = {
    require(partCols.nonEmpty)
    // buckets = 1 degrades to the plain prefix pass (one whole-group
    // cut window) and stays correct; 0 or negative would build an
    // empty quantile grid and a malformed bucket expression — fail
    // loudly instead of returning wrong straddle rows.
    require(buckets >= 1, s"groupedRankRow: buckets must be >= 1, got $buckets")
    val ms = measures.zipWithIndex
    val byVal = graft.CacheScope.persisted(
      ms.foldLeft(byVal0
          .withColumn("__rr_cut", orderCol)
          .withColumn("__rr_ord", orderCol.try_cast("double"))
          .withColumn("__rr_w", weightCol.cast("bigint"))) {
        case (acc, ((m, _), i)) => acc.withColumn(s"__rr_m_$i", m.cast("bigint"))
      })
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // numeric order key only (see exclusiveRunningTotal); non-numeric
    // degrades to ONE bucket — correct, with the cut window then
    // covering the whole group like the plain prefix pass would
    val bounds =
      if (!numericLead(byVal0, orderCol)) Array.empty[Double]
      else byVal.where(!isnan(col("__rr_ord")) || col("__rr_ord").isNull)
        .stat.approxQuantile("__rr_ord", probs, 0.01).distinct.sorted
    // NaN → LAST bucket, NULL → bucket 0 (see exclusiveRunningTotal)
    val bucketExpr = when(isnan(col("__rr_ord")), lit(bounds.length))
      .otherwise(bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col("__rr_ord") > lit(b), 1).otherwise(0)
      })
    val bucketed = byVal.withColumn("__rr_bucket", bucketExpr)
    // per-(group, bucket) totals: bounded by groups × buckets
    val perBucket = bucketed
      .groupBy(partCols.map(col) :+ col("__rr_bucket"): _*)
      .agg(sum(col("__rr_w")).as("__rr_bw"),
        ms.map { case (_, i) => sum(col(s"__rr_m_$i")).as(s"__rr_bm_$i") }: _*)
    val offWin = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("__rr_bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val grandWin = Window.partitionBy(partCols.map(col): _*)
    val offs0 = perBucket
      .withColumn("__rr_off_w",
        coalesce(sum(col("__rr_bw")).over(offWin), lit(0L)))
      .withColumn("total_cnt", sum(col("__rr_bw")).over(grandWin))
    val offs = ms.foldLeft(offs0) { case (acc, ((_, name), i)) =>
      acc.withColumn(s"__rr_off_m_$i",
          coalesce(sum(col(s"__rr_bm_$i")).over(offWin), lit(0L)))
        .withColumn(s"${name}_grand",
          sum(col(s"__rr_bm_$i").cast("decimal(38,0)")).over(grandWin))
    }
    // each group's straddle bucket: exclusive weight offset below k,
    // inclusive at-or-past it — exactly one bucket per group
    val cuts0 = offs.withColumn("k", expr(kSql))
      .filter(col("__rr_off_w") < col("k") &&
        col("__rr_off_w") + col("__rr_bw") >= col("k"))
      .drop(col("__rr_bw"))
      .drop(ms.map { case (_, i) => s"__rr_bm_$i" }: _*)
    // null-safe keyed join back (a NULL group key is a real group to
    // the windows above — the operators.Joins discipline)
    val cutKeys = partCols :+ "__rr_bucket"
    val cutsKeyed = cutKeys.foldLeft(cuts0) { (d, c) =>
      d.withColumnRenamed(c, s"__rr_k_$c")
    }
    val cuts = if (broadcastCuts) broadcast(cutsKeyed) else cutsKeyed
    val joinCond = cutKeys.map(c => col(c) <=> col(s"__rr_k_$c")).reduce(_ && _)
    val localWin = Window
      .partitionBy((partCols :+ "__rr_bucket").map(col): _*)
      .orderBy(col("__rr_cut"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local0 = bucketed.join(cuts, joinCond)
      .withColumn("below_cnt",
        col("__rr_off_w") + coalesce(sum(col("__rr_w")).over(localWin), lit(0L)))
    val local = ms.foldLeft(local0) { case (acc, ((_, name), i)) =>
      acc.withColumn(s"below_$name",
        col(s"__rr_off_m_$i") +
          coalesce(sum(col(s"__rr_m_$i")).over(localWin), lit(0L)))
    }
    local
      .filter(col("below_cnt") < col("k") &&
        col("below_cnt") + col("__rr_w") >= col("k"))
      .select(partCols.map(col) ++
        Seq(col("__rr_cut").as("cut"), col("__rr_w").as("cut_cnt"),
          col("k"), col("total_cnt"), col("below_cnt")) ++
        ms.flatMap { case ((_, name), _) =>
          Seq(col(s"below_$name"), col(s"${name}_grand")) }: _*)
  }

  def groupedExclusiveRunningTotals(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[Column], valueCols: Seq[(Column, String)],
      buckets: Int = 16, includeGrandTotals: Boolean = false,
      broadcastOffsets: Boolean = false): DataFrame = {
    // partCols are NAMES, not expressions: they double as the join keys
    // for the offsets table, and a derived expression (col("a") % 2)
    // stringifies to a non-existent column name — taking Seq[String]
    // makes that unrepresentable instead of silently wrong
    require(valueCols.nonEmpty)
    val vals = valueCols.zipWithIndex
    // Per-ROW carriers stay BIGINT — decimal arithmetic in the row-scale
    // window/aggregate path measured 2-3x slower (q194 2.3→5.7 s when
    // r10 briefly ran the whole pipeline in DECIMAL(38,0)). The
    // running-total OUTPUT is long-ranged by contract (a caller whose
    // totals exceed Long could not read the output column either), and
    // ANSI mode fails loudly on a partial-sum overflow rather than
    // wrapping. The GRAND totals — the one column read as a whole-group
    // mass — accumulate in DECIMAL(38,0) below, over the BOUNDED
    // per-bucket aggregate where decimal cost is nil.
    val tmp = graft.CacheScope.persisted(vals.foldLeft(
      df.withColumn("__ps_ord", orderCols.head.try_cast("double"))) {
      case (acc, ((v, _), i)) => acc.withColumn(s"__ps_val_$i", v.cast("bigint"))
    })
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // numeric leading key only — a digit-string key's double order
    // disagrees with the window's lexicographic sort (see
    // exclusiveRunningTotal); non-numeric degrades to one bucket per
    // group, correct but serial within the group
    val bounds =
      if (!numericLead(df, orderCols.head)) Array.empty[Double]
      // NaNs excluded from the sketch (see exclusiveRunningTotal)
      else tmp.where(!isnan(col("__ps_ord")) || col("__ps_ord").isNull)
        .stat.approxQuantile("__ps_ord", probs, 0.01).distinct.sorted
    // NaN → LAST bucket, NULL → bucket 0 (see exclusiveRunningTotal)
    val bucketExpr = when(isnan(col("__ps_ord")), lit(bounds.length))
      .otherwise(bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col("__ps_ord") > lit(b), 1).otherwise(0)
      })
    // the row-scale work below — the per-(group, bucket) partial sums
    // and the running-total window — runs exactly as wide as this
    // table, which otherwise inherits the (often narrow) width of the
    // caller's upstream aggregate. Spread to the iteration width
    // ([[graft.Par.iterationWidth]]; full core count measured ~2× the
    // summed CPU from SMT co-scheduling of the sort-heavy window
    // tasks), clustered on the window keys so neither the offsets join
    // nor the window adds an exchange. Width is the bound on how much
    // wall one ambient-slowed query can cost (q194 measured 57.7
    // task-CPU-s at 8-wide = 11.6 s under a 5× CPU-inflation episode).
    // persisted: consumed TWICE — the offsets aggregate materializes it,
    // the final windowed join re-reads it. Unpersisted, both consumers
    // re-ran the repartition over the full row-scale table (measured on
    // q194: two ~4.8 task-CPU-s jobs doing the same exchange), because
    // exchange reuse does not cross QueryExecutions when offsets
    // broadcast as their own plan.
    val bucketed = graft.CacheScope.persisted(
      tmp.withColumn("__ps_bucket", bucketExpr)
        .repartition(graft.Par.iterationWidth(df.sparkSession),
          partCols.map(col) :+ col("__ps_bucket"): _*))
    // per-(group, bucket) totals → exclusive base offsets via a window
    // over the BOUNDED aggregate (≤ buckets rows per group) — driver
    // never sees data, and the offsets broadcast-join back by key
    val perBucket = bucketed
      .groupBy(partCols.map(col) :+ col("__ps_bucket"): _*)
      .agg(sum(col("__ps_val_0")).as("__ps_sum_0"),
        vals.tail.map { case (_, i) =>
          sum(col(s"__ps_val_$i")).as(s"__ps_sum_$i")
        }: _*)
    val offWin = Window.partitionBy(partCols.map(col): _*).orderBy(col("__ps_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // grand totals window the SAME bounded aggregate, unframed — still
    // ≤ buckets rows per group, still no data-sized window partition
    val grandWin = Window.partitionBy(partCols.map(col): _*)
    val withOffs = vals.foldLeft(perBucket) { case (acc, (_, i)) =>
      acc.withColumn(s"__ps_off_$i",
        coalesce(sum(col(s"__ps_sum_$i")).over(offWin), lit(0L)))
    }
    val withGrand = if (!includeGrandTotals) withOffs
      else vals.foldLeft(withOffs) { case (acc, ((_, name), i)) =>
        // DECIMAL(38,0) over the ≤ buckets-row aggregate: the grand
        // total is the cents-mass number callers report, and it is the
        // first to outgrow Long at corpus scale — exact to 38 digits
        // here at zero row-scale cost (the window input is bounded)
        acc.withColumn(s"${name}_grand",
          sum(col(s"__ps_sum_$i").cast("decimal(38,0)")).over(grandWin))
      }
    // no UNCONDITIONAL broadcast: for callers whose group count scales
    // with the data the offsets table grows without bound; callers with
    // literal-bounded groups opt in via `broadcastOffsets` (see above)
    val offsets0 = withGrand.drop(vals.map { case (_, i) => s"__ps_sum_$i" }: _*)
    // the join back is NULL-SAFE on every key: a NULL group key is a
    // real group to the windows and aggregates above (NULLS FIRST
    // partition), and a plain USING join would silently DROP all its
    // rows from the output — the one failure mode a withColumn-shaped
    // operator must not have. Keys are renamed so the <=> condition is
    // unambiguous, then dropped.
    val offKeys = partCols :+ "__ps_bucket"
    val offsetsKeyed = offKeys.foldLeft(offsets0) { (d, k) =>
      d.withColumnRenamed(k, s"__ps_k_$k")
    }
    val offsets = if (broadcastOffsets) broadcast(offsetsKeyed) else offsetsKeyed
    val win = Window.partitionBy(partCols.map(col) :+ col("__ps_bucket"): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NO forced broadcast: offsets has n_groups × buckets rows, and for
    // callers whose group count scales with the data (q217 partitions by
    // part key) a forced broadcast grows without bound. AQE broadcasts
    // it when it is actually small; a shuffle join on (group, bucket) is
    // safe at any scale.
    val joinCond = offKeys.map(k => col(k) <=> col(s"__ps_k_$k")).reduce(_ && _)
    val joined = bucketed.join(offsets, joinCond)
      .drop(offKeys.map(k => s"__ps_k_$k"): _*)
    vals.foldLeft(joined) { case (acc, ((_, name), i)) =>
      acc.withColumn(name,
        sum(col(s"__ps_val_$i")).over(win) - col(s"__ps_val_$i")
          + col(s"__ps_off_$i"))
    }.drop("__ps_ord", "__ps_bucket")
      .drop(vals.flatMap { case (_, i) =>
        Seq(s"__ps_val_$i", s"__ps_off_$i") }: _*)
  }
}
