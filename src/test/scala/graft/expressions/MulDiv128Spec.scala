package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MulDiv128Spec extends SparkSpec {
  import spark.implicits._

  private def ref(a: Long, b: Long, m: Long): Long =
    (BigInt(a) * BigInt(b) / BigInt(m)).toLong

  test("mulDiv matches BigInteger on single-word and double-word products") {
    val cases = Seq(
      (0L, 0L, 1L), (1L, 1L, 1L), (7L, 3L, 2L), (Long.MaxValue, 1L, 1L),
      (Long.MaxValue, 2L, 3L), // 128-bit product, quotient fits
      (3037000499L, 3037000499L, 7L), // sqrt(Long.Max)² territory
      (9999999999999L, 8888888888888L, 1234567891L),
      (2400000000000L, 30000000000L, 36000000000000000L), // contrib shapes
      (Long.MaxValue, Long.MaxValue, Long.MaxValue), // q = Long.MaxValue
      (1L << 62, 1L << 1, (1L << 62) + 1L),
      (123456789012345L, 987654321098765L, 999999999999999L))
    cases.foreach { case (a, b, m) =>
      assert(MulDiv128.mulDiv(a, b, m) == ref(a, b, m), s"($a,$b,$m)")
    }
  }

  test("mulDiv property sweep vs BigInteger (deterministic grid)") {
    val vals = Seq(0L, 1L, 2L, 3L, 13L, 255L, 65537L, 1000003L,
      2147483647L, 68719476735L, 3037000499L, 1L << 40, Long.MaxValue / 3,
      Long.MaxValue - 1, Long.MaxValue)
    for (a <- vals; b <- vals; m <- vals if m > 0L) {
      val expect = BigInt(a) * BigInt(b) / BigInt(m)
      val got = MulDiv128.mulDiv(a, b, m)
      if (expect > BigInt(Long.MaxValue)) assert(got == -1L, s"($a,$b,$m) overflow")
      else assert(got == expect.toLong, s"($a,$b,$m)")
    }
  }

  test("contract violations return the error sentinel / NULL") {
    assert(MulDiv128.mulDiv(-1L, 2L, 3L) == -1L)
    assert(MulDiv128.mulDiv(2L, -1L, 3L) == -1L)
    assert(MulDiv128.mulDiv(2L, 2L, 0L) == -1L)
    assert(MulDiv128.mulDiv(2L, 2L, -5L) == -1L)
    // expression surface: violations and quotient overflow are NULL
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    val df = Seq((Long.MaxValue, Long.MaxValue, 1L), (6L, 7L, 2L))
      .toDF("a", "b", "m")
      .select(toColumn(MulDiv128(toExpression(col("a")),
        toExpression(col("b")), toExpression(col("m")))).as("q"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSeq == Seq(None, Some(21L)))
  }

  test("codegen and interpreted paths agree") {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    val rows = Seq((123456789L, 987654321L, 97L),
      (Long.MaxValue, 3L, 5L), (0L, 5L, 7L))
    val df = rows.toDF("a", "b", "m")
    val c = toColumn(MulDiv128(toExpression(col("a")), toExpression(col("b")),
      toExpression(col("m")))).as("q")
    val gen = df.select(c).collect().map(_.getLong(0)).toSeq
    assert(gen == rows.map { case (a, b, m) => ref(a, b, m) })
  }

  test("BM25 contribPpm equals the DECIMAL(38,0) spelling row-for-row") {
    val decimalSql =
      """CAST(CAST(2 * nd - 2 * df + 1 AS DECIMAL(38,0))
        |  * 22 * tf * tt * 1000000
        |  div (CAST(2 * df + 1 AS DECIMAL(38,0))
        |       * (CAST(10 AS DECIMAL(38,0)) * tf * tt
        |          + CAST(3 AS DECIMAL(38,0)) * tt
        |          + CAST(9 AS DECIMAL(38,0)) * dl * nd))
        |  AS BIGINT)""".stripMargin
    val rows = for {
      tf <- Seq(1L, 3L, 47L, 500L)
      df <- Seq(1L, 10L, 4286L)
      dl <- Seq(5L, 800L, 12000L)
    } yield (tf, df, dl, 4286L, 2137456L)
    val base = rows.toDF("tf", "df", "dl", "nd", "tt")
    val both = base
      .withColumn("dec", expr(decimalSql))
      .withColumn("fast", graft.functions.Bm25.contribPpm)
    assert(both.filter(col("dec") =!= col("fast")).count() == 0)
    assert(both.filter(col("fast").isNull).count() == 0)
  }
}
