package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SilverSpec extends SparkSpec {
  import spark.implicits._

  test("applyDqRules accumulates reasons in rule order, NULL array when clean") {
    val df = Seq(
      // (orderkey, linenumber, partkey, suppkey, price, qty, discount, flag, ship)
      (Some(1L), Some(1), Some(1L), Some(1L), 10.0, 1.0, 0.05, "N", "1995-01-01"),
      (None, Some(1), Some(1L), Some(1L), -5.0, 1.0, 1.5, "X", "1995-01-01"),
    ).toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_quantity", "l_discount", "l_returnflag", "ship")
      .withColumn("l_shipdate", $"ship".cast("timestamp"))
    val out = Silver.applyDqRules(df).select("dq_status", "dq_reasons_csv", "dq_failure_reasons")
      .collect()
    assert(out(0).getString(0) == "PASS")
    assert(out(0).isNullAt(2), "clean row must have NULL reasons array (reference B1 semantics)")
    assert(out(1).getString(0) == "FAIL")
    assert(out(1).getString(1) ==
      "MISSING_REQUIRED_FIELDS;INVALID_RETURN_FLAG;NON_POSITIVE_AMOUNT;INVALID_DISCOUNT")
  }

  test("quarantineSplit partitions input: PASS ∪ FAIL = input, disjoint") {
    val tagged = Silver.applyDqRules(Silver.cleanseLineitem(
      graft.Tables.lineitem(spark, sf)))
    val (pass, fail) = Silver.quarantineSplit(tagged)
    assert(pass.count() + fail.count() == tagged.count())
    assert(pass.filter($"dq_status" === "FAIL").count() == 0)
  }

  test("dedupLatest keeps one row per key, latest wins with tie-break") {
    val df = Seq(
      (1L, 1, Date.valueOf("2020-01-01"), "old"),
      (1L, 1, Date.valueOf("2020-02-01"), "new"),
      (2L, 1, Date.valueOf("2020-01-01"), "only"),
      (3L, 1, Date.valueOf("2020-03-01"), "tie-a"),
      (3L, 1, Date.valueOf("2020-03-01"), "tie-b"),
    ).toDF("k", "ln", "d", "v")
    val out = Silver.dedupLatest(df, Seq("k", "ln"), Seq($"d".desc, $"v".asc))
      .orderBy("k").select("v").as[String].collect()
    assert(out.toSeq == Seq("new", "only", "tie-a"))
  }

  test("dedup output keys are unique and a subset of input") {
    val li = graft.Tables.lineitem(spark, sf)
    val out = Silver.dedupLatest(li, Seq("l_orderkey"), Seq($"l_shipdate".desc, $"l_linenumber".asc))
    assert(out.groupBy("l_orderkey").count().filter($"count" > 1).count() == 0)
    assert(out.count() == li.select("l_orderkey").distinct().count())
  }

  test("incrementalAfter: full load when no watermark, filtered after") {
    val orders = graft.Tables.orders(spark, sf)
    val emptyWm = Seq.empty[(String, java.sql.Timestamp)]
      .toDF("table_name", "last_processed_timestamp")
    assert(Silver.incrementalAfter(orders, emptyWm, "orders", "o_orderdate").count()
      == orders.count())
    val wm = Silver.watermarkCommit(orders.filter(year($"o_orderdate") < 1996),
      "orders", "o_orderdate")
    val inc = Silver.incrementalAfter(orders, wm, "orders", "o_orderdate")
    val expected = orders.crossJoin(
      orders.filter(year($"o_orderdate") < 1996).agg(max("o_orderdate").as("m")))
      .filter($"o_orderdate" > $"m").count()
    assert(inc.count() == expected && inc.count() > 0 && inc.count() < orders.count())
  }

  test("cleanse is idempotent") {
    val once = Silver.cleanseLineitem(graft.Tables.lineitem(spark, sf))
    val twice = Silver.cleanseLineitem(once.drop("ship_date", "price_dec"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
