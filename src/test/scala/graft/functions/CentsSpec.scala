package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Pins the engine-wide exact-cents contract (Cents.cents =
  * `round(x·100) AS BIGINT`) to the DuckDB oracles' spelling
  * (`CAST(x AS DECIMAL(18,2)) * 100`) on the documented input domain:
  * 2-decimal money amounts. The property evaluates BOTH spellings in
  * Spark (the decimal cast is the same ANSI half-up semantics DuckDB
  * applies) over ScalaCheck-generated exact-cent doubles, including the
  * magnitudes where double spacing exceeds 0.01 resolution headroom.
  *
  * Deliberately NOT claimed: arbitrary-precision doubles. A value like
  * x = 12.344999999999999 can sit on opposite sides of a .xx5 boundary
  * for fl(x·100) vs the full decimal expansion — call sites must
  * guarantee (and document) the 2-dp domain, as q143_twap does.
  */
class CentsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen(Gen.Parameters.default, Seed(seed)).getOrElse(fail(s"gen failed @ $seed"))

  test("property: cents == decimal-cast oracle form on 2-dp doubles") {
    // exact-cent domain: ±(0 .. 10^14) cents — beyond DECIMAL(18,2)'s
    // 16 integer digits nothing is a valid money fixture
    val centsGen = Gen.listOfN(200, Gen.oneOf(
      Gen.choose(-100000L, 100000L),              // everyday amounts
      Gen.choose(-10000000000L, 10000000000L),    // large totals
      Gen.oneOf(0L, 5L, -5L, 50L, 99999999999999L, -99999999999999L)))
    val rows = sample(centsGen, 7L).map(c => c / 100.0)
    val out = rows.toDF("x")
      .select(Cents.cents(col("x")).as("fast"),
        (expr("CAST(x AS DECIMAL(18,2))") * 100).cast("long").as("oracle"))
      .collect()
    out.zip(rows).foreach { case (r, x) =>
      assert(r.getLong(0) == r.getLong(1), s"divergence at x=$x")
    }
  }

  test("call-site input classes are 2-dp: lineitem price/discount (q38)") {
    // q38_pivot_revenue (r15) runs Cents.cents over l_extendedprice and
    // l_discount — the contract holds only for 2-dp inputs, so pin the
    // fixture columns to the domain (x ≡ round(x, 2) bit-for-bit). A
    // fixture regeneration that widens either column must fail HERE,
    // not as a silent q38 oracle divergence.
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val bad = li.filter(
      col("l_extendedprice") =!= round(col("l_extendedprice"), 2) ||
        col("l_discount") =!= round(col("l_discount"), 2))
      .count()
    assert(bad == 0L, s"$bad lineitem rows outside the 2-dp cents domain")
  }

  test("call-site input classes are 2-dp: l_tax, o_totalprice, events.value") {
    // Every OTHER Cents.cents call-site input class in the registry:
    // l_tax (q80 margin waterfall), o_totalprice (q12/q53/q122/q172/…
    // rollups and histogram domains), events.value (q143 TWAP, whose
    // scaladoc documents this exact contract). Same rationale as the
    // lineitem test above: a fixture regeneration that emits 3-dp
    // amounts must fail HERE, not as a silent oracle divergence on
    // whichever query the driver happens to diff first.
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    assert(li.filter(col("l_tax") =!= round(col("l_tax"), 2)).count() == 0L,
      "l_tax rows outside the 2-dp cents domain")
    val ord = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    assert(ord.filter(
      col("o_totalprice") =!= round(col("o_totalprice"), 2)).count() == 0L,
      "o_totalprice rows outside the 2-dp cents domain")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    assert(ev.filter(col("value") =!= round(col("value"), 2)).count() == 0L,
      "events.value rows outside the 2-dp cents domain")
  }

  test("property: cents-product / 10⁴ is bit-equal to the decimal-cast charge") {
    // the q64 rewrite's claim in executable form: for 2-dp price p and
    // 2-dp discount d, (cents(p)·(100−cents(d))) / 10000.0 equals
    // CAST(p AS DEC(18,2))·(1−CAST(d AS DEC(4,2))) cast to DOUBLE,
    // bit-for-bit. Holds while the 4-dp integer product stays under
    // 2⁵³ (exact as a double, so the single IEEE divide rounds the
    // same rational the DECIMAL→DOUBLE cast rounds); price cents up to
    // 10¹¹ · discount 100 = 10¹³ stays inside with 2⁹ to spare.
    val priceGen = Gen.oneOf(
      Gen.choose(1L, 20000000L),            // everyday line amounts
      Gen.choose(1L, 100000000000L),        // large totals
      Gen.oneOf(1L, 99L, 100L, 101L, 99999999999L))
    val discGen = Gen.choose(0L, 100L)      // 0.00 .. 1.00 in cents
    val rows = (1 to 300).map { i =>
      (sample(priceGen, i.toLong) / 100.0, sample(discGen, 1000L + i) / 100.0)
    }
    val out = rows.toDF("p", "d")
      .select(
        ((Cents.cents(col("p")) * (lit(100L) - Cents.cents(col("d"))))
          .cast("double") / 10000.0).as("fast"),
        (expr("CAST(p AS DECIMAL(18,2))") *
          (lit(1) - expr("CAST(d AS DECIMAL(4,2))"))).cast("double")
          .as("oracle"))
      .collect()
    out.zip(rows).foreach { case (r, (p, d)) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"charge divergence at p=$p d=$d")
    }
  }

  test("known 2-dp vectors, incl. values binary floats cannot represent") {
    // 0.29, 1234.56 etc. have no exact double form — both spellings
    // must agree because they round the SAME stored double; 3-dp
    // inputs (8.845, 2.675) are deliberately absent: outside the 2-dp
    // contract the forms MAY diverge, which is the class doc's point
    val xs = Seq(0.0, 0.01, -0.01, 0.29, -0.29, 0.07, 1234.56, -1234.56,
      999999999999.99, -999999999999.99)
    val out = xs.toDF("x")
      .select(Cents.cents(col("x")).as("fast"),
        (expr("CAST(x AS DECIMAL(18,2))") * 100).cast("long").as("oracle"))
      .collect()
    out.zip(xs).foreach { case (r, x) =>
      assert(r.getLong(0) == r.getLong(1), s"divergence at x=$x")
    }
  }
}
