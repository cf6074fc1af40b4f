package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("rangeJoin equals the naive non-equi join, including exact-boundary pairs") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:59")),
      (3L, 10L, ts("2024-01-01 00:01:00")), // exactly 60s from #1 — in range
      (4L, 10L, ts("2024-01-01 00:02:00.000001")), // 60.000001s from #3 — out
      (5L, 11L, ts("2024-01-01 00:00:30")), // other key
    ).toDF("event_id", "user_id", "ts")
    val bucketed = Temporal.rangeJoin(ev, ev, "user_id", "ts", "ts", 60)
      .filter($"l_event_id" < $"r_event_id")
      .select($"l_event_id", $"r_event_id").as[(Long, Long)].collect().toSet
    val naive = ev.as("a").join(ev.as("b"),
      $"a.user_id" === $"b.user_id" && $"a.event_id" < $"b.event_id" &&
        abs(unix_micros($"a.ts") - unix_micros($"b.ts")) <= 60000000L)
      .select($"a.event_id", $"b.event_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("asofJoin: latest right ts at-or-before each left row; null when none") {
    val purchases = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 11L, ts("2024-01-01 09:00:00")), // user 11 has no views before
    ).toDF("event_id", "user_id", "ts")
    val views = Seq(
      (10L, ts("2024-01-01 09:30:00")),
      (10L, ts("2024-01-01 10:00:00")), // same instant as purchase 1 — counts
      (10L, ts("2024-01-01 11:59:59")),
      (11L, ts("2024-01-01 09:30:00")), // after user 11's purchase
    ).toDF("user_id", "ts")
    val out = Temporal.asofJoin(purchases, views, "user_id", "ts", "ts")
      .orderBy("event_id")
      .select($"event_id", $"asof_ts").as[(Long, Option[Timestamp])].collect().toSeq
    assert(out == Seq(
      (1L, Some(ts("2024-01-01 10:00:00"))),
      (2L, Some(ts("2024-01-01 11:59:59"))),
      (3L, None)))
  }

  test("rangeJoin plan shuffles on equality keys, not nested-loop") {
    val ev = graft.Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val df = Temporal.rangeJoin(ev, ev, "user_id", "ts", "ts", 60)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketed range join must be an equality join:\n$plan")
  }
}
