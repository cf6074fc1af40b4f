package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class GoldMergeSpec extends SparkSpec {
  import spark.implicits._

  lazy val dd = Gold.dimDate(spark)

  test("dimDate: 4018 rows, correct keys/attrs (reference B2 fix)") {
    assert(dd.count() == 4018)
    val r = dd.filter($"date_value" === to_date(lit("2020-02-29"))).collect()(0)
    assert(r.getAs[Int]("date_key") == 20200229)
    assert(r.getAs[Int]("quarter") == 1)
    assert(r.getAs[Boolean]("is_weekend")) // 2020-02-29 is a Saturday
    assert(r.getAs[String]("month_name") == "February")
    assert(r.getAs[Int]("day_of_week") == 7) // Spark: 1=Sunday..7=Saturday
  }

  test("surrogate keys are deterministic and dense") {
    val dm = Gold.dimMember(Tables.customer(spark, sf))
    val keys = dm.orderBy("member_id").select("member_sk").as[Long].collect()
    assert(keys.toSeq == (1L to keys.length.toLong))
    // re-running yields identical assignment (unlike monotonically_increasing_id)
    val again = Gold.dimMember(Tables.customer(spark, sf))
    assert(dm.exceptAll(again).isEmpty)
  }

  test("factLines resolves all surrogate keys (referential integrity)") {
    val fact = Gold.factLines(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Gold.dimMember(Tables.customer(spark, sf)),
      Gold.dimProvider(Tables.supplier(spark, sf)), dd)
    assert(fact.filter($"member_sk".isNull || $"provider_sk".isNull).count() == 0)
    assert(fact.count() == Tables.lineitem(spark, sf).count())
  }

  test("monthlyRollup aggregates conserve the total") {
    val fact = Gold.factLines(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Gold.dimMember(Tables.customer(spark, sf)),
      Gold.dimProvider(Tables.supplier(spark, sf)), dd)
    val roll = Gold.monthlyRollup(fact)
    // total_charge is double in the OUTPUT (portable repr); the decimal sum
    // is exact internally, so the re-aggregated totals agree to double ulps
    val total = fact.agg(sum($"charge").cast("double")).collect()(0).getDouble(0)
    val rolled = roll.agg(sum($"total_charge")).collect()(0).getDouble(0)
    assert(math.abs(total - rolled) <= math.abs(total) * 1e-9)
    assert(roll.agg(sum($"n_lines")).collect()(0).getLong(0) == fact.count())
  }

  test("mergeRollup of split partials is byte-identical to the full recompute") {
    val fact = Gold.factLines(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Gold.dimMember(Tables.customer(spark, sf)),
      Gold.dimProvider(Tables.supplier(spark, sf)),
      Gold.dimDate(spark, "1992-01-01", "2002-12-31")).cache()
    val full = Gold.monthlyRollup(fact)
      .orderBy("year_month").collect().toSeq
    // three-way split on arbitrary boundaries, merged pairwise then all
    val parts = Seq(
      fact.filter($"service_date_key" < 19960000),
      fact.filter($"service_date_key" >= 19960000 && $"service_date_key" < 19990000),
      fact.filter($"service_date_key" >= 19990000))
      .map(Gold.monthlyRollupPartial)
    val merged = Gold.presentRollup(Gold.mergeRollup(parts: _*))
      .orderBy("year_month").collect().toSeq
    assert(merged == full,
      "decimal partials must merge into exactly the full-recompute table")
    fact.unpersist()
    ()
  }

  test("Merge.upsert: updateAll + insertAll semantics, idempotent") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "x")
    val source = Seq((2L, "B", 99.0), (3L, "c", 30.0)).toDF("k", "v", "x")
    val merged = Merge.upsert(target, source, Seq("k"))
    val got = merged.orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0)))
    // idempotent: merging the same source again changes nothing
    val again = Merge.upsert(merged, source, Seq("k"))
    assert(again.exceptAll(merged).isEmpty && merged.exceptAll(again).isEmpty)
  }

  test("Merge.upsert: NULL key is one key — updated in place, idempotent") {
    // a plain USING anti-join never matches NULL = NULL, so the
    // target's NULL-key row survived as "untouched" NEXT TO the
    // source's copy — one duplicate per re-merge
    val target = Seq[(Option[Long], String)]((Some(1L), "a"), (None, "x"))
      .toDF("k", "v")
    val source = Seq[(Option[Long], String)]((None, "X")).toDF("k", "v")
    val merged = Merge.upsert(target, source, Seq("k"))
    assert(merged.count() == 2, "NULL-key row updated, not duplicated")
    assert(merged.filter($"k".isNull).select("v").as[String].collect().toSeq
      == Seq("X"))
    val again = Merge.upsert(merged, source, Seq("k"))
    assert(again.count() == 2)
    assert(again.exceptAll(merged).isEmpty && merged.exceptAll(again).isEmpty)
  }

  test("Merge.upsertEvolved: NULL-key matched row keeps target-only columns") {
    val target = Seq[(Option[Long], String, Double)](
        (Some(1L), "a", 10.0), (None, "x", 20.0))
      .toDF("k", "name", "bal")
    val source = Seq((Option.empty[Long], 99.0)).toDF("k", "bal")
    val merged = Merge.upsertEvolved(target, source, Seq("k"))
    assert(merged.count() == 2)
    val nullRow = merged.filter($"k".isNull).collect()(0)
    assert(nullRow.getAs[String]("name") == "x", "target-only column kept")
    assert(nullRow.getAs[Double]("bal") == 99.0, "source value applied")
  }

  test("Merge.upsertEvolved: evolution adds columns, keeps target-only values") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "bal")
    // source updates bal, drops name (kept from target), adds cnt (new)
    val source = Seq((2L, 99.0, 5L), (3L, 30.0, 7L)).toDF("k", "bal", "cnt")
    val merged = Merge.upsertEvolved(target, source, Seq("k"))
    assert(merged.columns.toSeq == Seq("k", "name", "bal", "cnt"),
      "schema = target columns then new source columns")
    val got = merged.orderBy("k")
      .select($"k", $"name", $"bal", $"cnt").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got == Seq(
      (1L, "a", 10.0, -1L),   // untouched: new column NULL
      (2L, "b", 99.0, 5L),    // matched: bal updated, name KEPT, cnt gained
      (3L, null, 30.0, 7L)))  // inserted: target-only name NULL
    // retyping a shared column is NOT evolution — fail fast
    val retyped = Seq((2L, "99", 5L)).toDF("k", "bal", "cnt")
    intercept[IllegalArgumentException] {
      Merge.upsertEvolved(target, retyped, Seq("k"))
    }
    ()
  }

  test("flagship returns rows on sf0.001 (smoke)") {
    val df = graft.SparkEntry.entry(spark)
    assert(df.count() > 0)
  }
}
