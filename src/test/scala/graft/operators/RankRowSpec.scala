package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[PrefixSum.groupedRankRow]] against a driver-side reference:
  * per group, the by-value row straddling rank k over ascending order
  * values with positive integer weights, plus exact prefixes and grand
  * totals — across random inputs, bucket-boundary straddles, extreme
  * ranks, and the non-numeric single-bucket degrade path.
  */
class RankRowSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: (cut, cutW, belowW, belowM, grandM, n) per group. */
  private def ref(rows: Seq[(String, Long, Long, Long)],
      kOf: Long => Long): Map[String, (Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      val n = rs.map(_._3).sum
      val k = kOf(n)
      var below = 0L; var belowM = 0L
      val grandM = rs.map(_._4).sum
      val cut = sorted.find { case (_, _, w, m) =>
        val hit = below < k && below + w >= k
        if (!hit) { below += w; belowM += m }
        hit
      }.get
      g -> (cut._2, cut._3, below, belowM, grandM, n)
    }

  private def run(rows: Seq[(String, Long, Long, Long)], kSql: String,
      buckets: Int): Map[String, (Long, Long, Long, Long, Long, Long)] =
    PrefixSum.groupedRankRow(
        rows.toDF("g", "v", "w", "m").repartition(5),
        Seq("g"), col("v"), col("w"), Seq((col("m"), "m")), kSql,
        buckets = buckets)
      .select(col("g"), col("cut"), col("cut_cnt"), col("below_cnt"),
        col("below_m"), col("m_grand").cast("long"), col("total_cnt"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

  test("property: matches the reference on random weighted by-value tables") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = for {
        g <- Seq("a", "b", "c")
        v <- rnd.shuffle((1L to 40L).toList).take(12 + rnd.nextInt(20))
      } yield (g, v * 10, 1L + rnd.nextInt(5), v * 100 + rnd.nextInt(50))
      // nearest-rank p95 and the weighted-median rank, both closed forms
      for ((kSql, kOf) <- Seq[(String, Long => Long)](
          ("CAST((95 * total_cnt + 99) div 100 AS BIGINT)",
            n => (95 * n + 99) / 100),
          ("CAST((total_cnt + 1) div 2 AS BIGINT)", n => (n + 1) / 2))) {
        // buckets = 3 forces values to straddle bucket boundaries
        assert(run(rows, kSql, buckets = 3) == ref(rows, kOf),
          s"seed=$seed kSql=$kSql")
      }
    }
  }

  test("extreme ranks: k = 1 and k = n") {
    val rows = Seq(("g", 5L, 3L, 7L), ("g", 1L, 2L, 9L), ("g", 9L, 4L, 1L))
    val first = run(rows, "CAST(1 AS BIGINT)", buckets = 2)
    assert(first("g") == (1L, 2L, 0L, 0L, 17L, 9L))
    val last = run(rows, "total_cnt", buckets = 2)
    assert(last("g") == (9L, 4L, 5L, 16L, 17L, 9L))
  }

  test("single-value group and weight-1 everywhere") {
    val rows = Seq(("g", 4L, 6L, 2L),
      ("h", 1L, 1L, 1L), ("h", 2L, 1L, 1L), ("h", 3L, 1L, 1L))
    val out = run(rows, "CAST((total_cnt + 1) div 2 AS BIGINT)", buckets = 4)
    assert(out("g") == (4L, 6L, 0L, 0L, 2L, 6L))
    assert(out("h") == (2L, 1L, 1L, 1L, 3L, 3L)) // median of {1,2,3}
  }

  test("non-numeric order key degrades to one bucket, same values") {
    val rows = Seq(("g", 10L, 2L, 5L), ("g", 20L, 2L, 6L), ("g", 30L, 2L, 7L))
    val viaStrings = PrefixSum.groupedRankRow(
        rows.toDF("g", "v", "w", "m")
          // 2-digit values: lexicographic == numeric order, so the
          // string path must return the identical row
          .withColumn("vs", format_string("%02d", col("v"))),
        Seq("g"), col("vs"), col("w"), Seq((col("m"), "m")),
        "CAST((total_cnt + 1) div 2 AS BIGINT)")
      .select(col("cut"), col("below_cnt")).collect()
    assert(viaStrings.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("20", 2L)))
  }
}
