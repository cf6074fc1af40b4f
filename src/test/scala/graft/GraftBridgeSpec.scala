package graft

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.eraseScanPartitioning

/** Pins `graftbridge.eraseScanPartitioning` — the workaround for the
  * Spark canonicalization gap where a localCheckpoint's recorded
  * output partitioning (with per-instance exprIds under self-union
  * attribute dedup) defeats ReuseExchange and re-plans shared
  * subtrees once per consumer (found on the CC round: 6 duplicate
  * 16-task map stages; see the bridge scaladoc).
  */
class GraftBridgeSpec extends SparkSpec {
  import spark.implicits._

  test("erases recorded partitioning, keeps rows, frees via CacheScope") {
    // AQE OFF while the checkpoint is CREATED: under adaptive execution
    // the physical partitioning is decided per query stage and the
    // checkpoint records Unknown — the disease this bridge fixes only
    // manifests on the bench/driver path, which runs AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ck =
      try Seq((3L, 1L), (4L, 2L), (4L, 1L)).toDF("u", "v")
        .distinct() // shuffled root => checkpoint records hash(u,v)
        .localCheckpoint(true)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val recorded = ck.queryExecution.analyzed match {
      case l: LogicalRDD => l.outputPartitioning
      case other => fail(s"expected LogicalRDD root, got ${other.nodeName}")
    }
    assert(recorded != UnknownPartitioning(0),
      "precondition: Spark no longer records checkpoint partitioning — " +
        "the bridge (and this spec) can be retired")
    val erased = eraseScanPartitioning(ck)
    erased.queryExecution.analyzed match {
      case l: LogicalRDD =>
        assert(l.outputPartitioning == UnknownPartitioning(0))
        assert(l.outputOrdering.isEmpty)
      case other => fail(s"expected LogicalRDD root, got ${other.nodeName}")
    }
    assert(erased.as[(Long, Long)].collect().toSet ==
      Set((3L, 1L), (4L, 2L), (4L, 1L)))
    // the erased frame must still satisfy freeLocalCheckpoint's
    // STRUCTURAL contract (root is the checkpoint's LogicalRDD) — the
    // iterative operators free rounds through the erased Dataset
    CacheScope.freeLocalCheckpoint(erased) // must not throw; frees blocks
  }

  test("no-op on a non-checkpoint DataFrame") {
    val df = Seq((1L, 2L)).toDF("u", "v").select(col("u") + 1 as "w")
    assert(eraseScanPartitioning(df) eq df)
  }

  test("restores ReuseExchange under checkpoint self-union (AQE off)") {
    // the FULL two-star round (the CC shape): `large` and `sMins` each
    // appear twice, so the plan holds two pairs of structurally
    // identical exchanges — the reuse candidates the recorded
    // partitioning's per-instance exprIds break
    def roundPlan(edges: org.apache.spark.sql.DataFrame) = {
      val nbrs = edges.select($"u", $"v")
        .union(edges.select($"v".as("u"), $"u".as("v")))
      val mins = nbrs.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      val large = nbrs.join(mins.hint("shuffle_hash"), "u")
        .filter($"v" > $"u")
        .select(greatest($"v", $"m").as("u"), least($"v", $"m").as("v"))
        .filter($"u" =!= $"v")
      val sMins = large.groupBy($"u").agg(min($"v").as("m"))
      large.join(sMins.hint("shuffle_hash"), "u")
        .select($"v".as("u"), $"m".as("v"))
        .union(sMins.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .distinct()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // checkpoint created with AQE off, like the bench/driver path —
      // this is what makes Spark record the distinct's partitioning
      val raw = Seq((5L, 1L), (4L, 2L), (4L, 3L), (3L, 2L)).toDF("u", "v")
        .distinct().localCheckpoint(true)
      def reuses(df: org.apache.spark.sql.DataFrame): Int =
        "ReusedExchange".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      // the RECORDED partitioning blocks reuse...
      assert(reuses(roundPlan(raw)) == 0,
        "Spark now reuses exchanges over partitioning-recorded " +
          "checkpoints — the bridge can be retired")
      // ...and erasing it restores reuse of the shared nbrs exchange
      assert(reuses(roundPlan(eraseScanPartitioning(raw))) >= 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
