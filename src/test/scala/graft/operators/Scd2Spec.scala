package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  def snap(rows: (Long, String, String)*) =
    rows.toDF("id", "name", "segment")

  def dim(rows: (Long, String, String, String, Option[String], Boolean)*) =
    rows.map { case (id, n, s, from, to, cur) =>
      (id, n, s, Date.valueOf(from), to.map(Date.valueOf).orNull, cur)
    }.toDF("id", "name", "segment", "effective_from", "effective_to", "is_current")

  test("scdType2: change closes old version, opens new; inserts and unchanged handled") {
    val current = dim(
      (1L, "A", "S1", "2024-01-01", None, true),
      (2L, "B", "S1", "2024-01-01", None, true),
      // key 3 already has history: old closed version + current
      (3L, "C", "S0", "2023-01-01", Some("2024-01-01"), false),
      (3L, "C", "S1", "2024-01-01", None, true))
    val incoming = snap(
      (1L, "A", "S1"), // unchanged
      (2L, "B", "S9"), // changed
      (3L, "C", "S1"), // unchanged (current version)
      (4L, "D", "S1")) // brand new
    val out = Gold.scdType2(current, incoming, Seq("id"),
      Seq("name", "segment"), lit("2024-06-01"))
      .orderBy("id", "effective_from")
      .select("id", "segment", "effective_from", "effective_to", "is_current")
      .as[(Long, String, Date, Option[Date], Boolean)].collect().toSeq

    assert(out == Seq(
      (1L, "S1", Date.valueOf("2024-01-01"), None, true),
      (2L, "S1", Date.valueOf("2024-01-01"), Some(Date.valueOf("2024-06-01")), false),
      (2L, "S9", Date.valueOf("2024-06-01"), None, true),
      (3L, "S0", Date.valueOf("2023-01-01"), Some(Date.valueOf("2024-01-01")), false),
      (3L, "S1", Date.valueOf("2024-01-01"), None, true),
      (4L, "S1", Date.valueOf("2024-06-01"), None, true)))
  }

  test("scdType2: a key living only as closed history gets its incoming row inserted") {
    // key 5 was closed out with NO current version (e.g. soft-deleted);
    // when it reappears in a snapshot, MERGE semantics insert a new
    // current version — anti-joining inserts against full history
    // instead of the is_current slice silently dropped the row
    val current = dim(
      (5L, "E", "S1", "2023-01-01", Some("2024-01-01"), false))
    val incoming = snap((5L, "E", "S2"))
    val out = Gold.scdType2(current, incoming, Seq("id"),
      Seq("name", "segment"), lit("2024-06-01"))
      .orderBy("effective_from")
      .select("id", "segment", "effective_from", "effective_to", "is_current")
      .as[(Long, String, Date, Option[Date], Boolean)].collect().toSeq
    assert(out == Seq(
      (5L, "S1", Date.valueOf("2023-01-01"), Some(Date.valueOf("2024-01-01")), false),
      (5L, "S2", Date.valueOf("2024-06-01"), None, true)))
  }

  test("scdType2: NULL business key is one key — idempotent, closeable, never re-inserted") {
    // the plain USING joins never matched NULL = NULL, so a NULL-key
    // incoming row landed in `inserts` on EVERY run — one duplicate
    // current version per refresh. With null-safe key joins the NULL
    // key behaves like any other key value.
    def snapN(rows: (Option[Long], String, String)*) =
      rows.toSeq.toDF("id", "name", "segment")
    val current = dim((1L, "A", "S1", "2024-01-01", None, true))
      .unionByName(snapN((None, "X", "S1"))
        .withColumn("effective_from", lit(Date.valueOf("2024-01-01")))
        .withColumn("effective_to", lit(null).cast("date"))
        .withColumn("is_current", lit(true)))
    val incomingSame = snapN((Some(1L), "A", "S1"), (None, "X", "S1"))
    val once = Gold.scdType2(current, incomingSame, Seq("id"),
      Seq("name", "segment"), lit("2024-06-01"))
    // unchanged snapshot → unchanged dimension (idempotency incl. NULL key)
    assert(once.count() == current.count())
    val twice = Gold.scdType2(once, incomingSame, Seq("id"),
      Seq("name", "segment"), lit("2024-07-01"))
    assert(twice.count() == current.count())
    assert(twice.filter($"id".isNull && $"is_current").count() == 1)
    // a CHANGED null-key row closes the old version and opens a new one
    val changed = Gold.scdType2(current,
      snapN((Some(1L), "A", "S1"), (None, "X", "S9")), Seq("id"),
      Seq("name", "segment"), lit("2024-06-01"))
    val nullRows = changed.filter($"id".isNull)
      .orderBy("effective_from")
      .select("segment", "is_current").as[(String, Boolean)].collect().toSeq
    assert(nullRows == Seq(("S1", false), ("S9", true)))
  }

  test("scdType2: a NULL is_current row (external writer) reads as history, not dropped") {
    val current = dim((1L, "A", "S1", "2024-01-01", None, true))
      .unionByName(
        Seq[(Long, String, String, Date, Date, Option[Boolean])](
          (2L, "B", "S0", Date.valueOf("2023-01-01"),
            Date.valueOf("2024-01-01"), None))
        .toDF("id", "name", "segment", "effective_from", "effective_to",
          "is_current"))
    val out = Gold.scdType2(current, snap((1L, "A", "S1")), Seq("id"),
      Seq("name", "segment"), lit("2024-06-01"))
    // the NULL-flag row survives as history instead of vanishing from
    // both the is_current and !is_current filters
    assert(out.filter($"id" === 2L).count() == 1)
    assert(out.count() == 2)
  }

  test("scdType2 invariants: exactly one current row per key; no overlap") {
    val out = graft.CoreQueries.scd2Members(spark, sf)
    val perKey = out.groupBy("member_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"))
    assert(perKey.filter(col("n_current") =!= 1).count() == 0)
    // closed versions must end exactly where the next version starts
    val overlap = out.as("a").join(out.as("b"),
      col("a.member_id") === col("b.member_id") &&
        col("a.effective_to") === col("b.effective_from") && col("a.is_current"))
    assert(overlap.count() == 0)
  }
}
