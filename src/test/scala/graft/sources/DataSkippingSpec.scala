package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** Three appends with disjoint key ranges — each commit's files carry
    * a narrow [min,max], so a range probe should touch one commit.
    */
  private def clusteredTable(): String = {
    val path = Files.createTempDirectory("vt_skip").resolve("t").toString
    VersionedTable.write((0L until 100L).map(i => (i, s"r$i"))
      .toDF("k", "v").coalesce(1), path, SaveMode.Overwrite)
    VersionedTable.write((100L until 200L).map(i => (i, s"r$i"))
      .toDF("k", "v").coalesce(1), path, SaveMode.Append)
    VersionedTable.write((200L until 300L).map(i => (i, s"r$i"))
      .toDF("k", "v").coalesce(1), path, SaveMode.Append)
    path
  }

  test("readWhere equals read+filter and skips non-intersecting files") {
    val path = clusteredTable()
    val (df, read, total) = VersionedTable.readWhere(spark, path, "k", 120L, 150L)
    val expect = VersionedTable.read(spark, path)
      .filter($"k" >= 120 && $"k" <= 150)
      .as[(Long, String)].collect().sorted.toSeq
    assert(df.as[(Long, String)].collect().sorted.toSeq == expect)
    assert(expect.size == 31)
    assert(total == 3, s"expected 3 files, got $total")
    assert(read == 1, s"range covers one commit's file, read $read")
    // second call prunes from the sidecar alone and agrees
    val (df2, read2, _) = VersionedTable.readWhere(spark, path, "k", 120L, 150L)
    assert(read2 == 1)
    assert(df2.as[(Long, String)].collect().sorted.toSeq == expect)
  }

  test("empty intersection reads zero files and returns empty with schema") {
    val path = clusteredTable()
    val (df, read, total) = VersionedTable.readWhere(spark, path, "k", 900L, 999L)
    assert(read == 0 && total == 3)
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("k", "v"))
  }

  test("skipping stays sound under deletion vectors and new appends") {
    val path = clusteredTable()
    VersionedTable.readWhere(spark, path, "k", 0L, 0L) // build sidecar
    // DV-delete part of the probed range: stats are now over-approximate
    // (sound); the read must subtract the DV
    VersionedTable.deleteWhere(spark, path, $"k" >= 120 && $"k" <= 130)
    val (df, _, _) = VersionedTable.readWhere(spark, path, "k", 100L, 150L)
    val expect = VersionedTable.read(spark, path)
      .filter($"k" >= 100 && $"k" <= 150)
      .as[(Long, String)].collect().sorted.toSeq
    assert(df.as[(Long, String)].collect().sorted.toSeq == expect)
    assert(expect.size == 51 - 11)
    // a fresh append is indexed lazily on the next readWhere
    VersionedTable.write((300L until 400L).map(i => (i, s"r$i"))
      .toDF("k", "v").coalesce(1), path, SaveMode.Append)
    val (df2, read2, total2) = VersionedTable.readWhere(spark, path, "k", 320L, 330L)
    assert(total2 == 4 && read2 == 1)
    assert(df2.count() == 11)
  }

  test("writeClustered: readWhere prunes on EITHER z dimension; DV-sound") {
    import graft.Tables
    val orders = Tables.load(spark, sf, "orders")
      .select($"o_orderkey".as("okey"),
        $"o_custkey".as("ck"),
        datediff($"o_orderdate".cast("date"), lit("1970-01-01").cast("date"))
          .cast("bigint").as("day"))
    val n = 16
    // z-clustered versioned table vs the usual time-sorted layout
    val zPath = Files.createTempDirectory("vt_z").resolve("t").toString
    VersionedTable.writeClustered(orders, zPath, "day", "ck", n)
    val linPath = Files.createTempDirectory("vt_lin").resolve("t").toString
    VersionedTable.write(
      orders.repartitionByRange(n, $"day").sortWithinPartitions("day"),
      linPath, SaveMode.Overwrite)

    val (ckLo, ckHi) = orders.agg(min("ck"), max("ck")).as[(Long, Long)].head()
    val mid = (ckLo + ckHi) / 2
    val hi = mid + ((ckHi - ckLo) / 16 max 1L)
    // predicate on the SECOND dimension goes through the ORDINARY
    // readWhere machinery — the sidecar sees the tight z boxes
    val (zDf, zRead, zTotal) = VersionedTable.readWhere(spark, zPath, "ck", mid, hi)
    val (linDf, linRead, linTotal) =
      VersionedTable.readWhere(spark, linPath, "ck", mid, hi)
    assert(zTotal == n.toLong && linTotal == n.toLong)
    assert(linRead == linTotal,
      s"day-sorted layout cannot skip on ck: $linRead of $linTotal")
    assert(zRead < zTotal / 2,
      s"z-clustered table must skip most files on ck: $zRead of $zTotal")
    assert(zDf.count() == linDf.count(), "pruning must not change results")
    // the FIRST dimension also skips
    val (dLo, dHi) = orders.agg(min("day"), max("day")).as[(Long, Long)].head()
    val dMid = (dLo + dHi) / 2
    val (_, dRead, _) = VersionedTable.readWhere(spark, zPath, "day",
      dMid, dMid + ((dHi - dLo) / 16 max 1L))
    assert(dRead < zTotal, s"z-clustered table must skip on day too: $dRead")
    // DV-soundness: delete part of the probed ck range, re-probe — the
    // pruned read must agree with the full read + filter
    VersionedTable.deleteWhere(spark, zPath, $"ck" >= mid && $"ck" <= mid + 2)
    val (zDf2, _, _) = VersionedTable.readWhere(spark, zPath, "ck", mid, hi)
    val expect = VersionedTable.read(spark, zPath)
      .filter($"ck" >= mid && $"ck" <= hi)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(zDf2.as[(Long, Long, Long)].collect().sorted.toSeq == expect)
  }

  test("optimizeZOrder: contents identical, layout prunes, history intact") {
    import graft.Tables
    val orders = Tables.load(spark, sf, "orders")
      .select($"o_orderkey".as("okey"), $"o_custkey".as("ck"),
        datediff($"o_orderdate".cast("date"), lit("1970-01-01").cast("date"))
          .cast("bigint").as("day"))
    val path = Files.createTempDirectory("vt_opt").resolve("t").toString
    // start from a time-sorted layout with a DV delete on top
    VersionedTable.write(
      orders.repartitionByRange(8, $"day").sortWithinPartitions("day"),
      path, SaveMode.Overwrite)
    VersionedTable.deleteWhere(spark, path, $"okey" % 97 === 0)
    val before = VersionedTable.read(spark, path)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val v = VersionedTable.optimizeZOrder(spark, path, "day", "ck", 16)
    // contents bit-identical (the DV'd rows stay dead — they were
    // applied before the rewrite)
    val after = VersionedTable.read(spark, path)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(after == before, "OPTIMIZE must not change table contents")
    // the new layout prunes on the SECOND dimension
    val (lo, hi) = orders.agg(min("ck"), max("ck")).as[(Long, Long)].head()
    val mid = (lo + hi) / 2
    val (_, read, total) = VersionedTable.readWhere(spark, path, "ck",
      mid, mid + ((hi - lo) / 16 max 1L))
    assert(total == 16 && read < total / 2,
      s"z-optimized table must skip on ck: $read of $total")
    // history: the op is tagged, and pre-optimize versions time travel
    assert(VersionedTable.opOf(path, v) == "optimize-zorder(day,ck)")
    assert(VersionedTable.readVersion(spark, path, v - 1)
      .as[(Long, Long, Long)].collect().sorted.toSeq == before)
  }

  test("vacuumStats drops rows for unreferenced files; pruning still exact") {
    val path = clusteredTable()
    VersionedTable.readWhere(spark, path, "k", 0L, 299L) // index all 3 files
    // overwrite shrinks the live set to one new file; old stats rows are
    // now dead weight
    VersionedTable.write((0L until 50L).map(i => (i, s"x$i"))
      .toDF("k", "v").coalesce(1), path, org.apache.spark.sql.SaveMode.Overwrite)
    VersionedTable.readWhere(spark, path, "k", 0L, 10L) // index the new file
    // while older manifests are retained their files stay referenced
    // (time travel) — vacuumStats must keep those stats rows
    assert(VersionedTable.vacuumStats(spark, path) == 0)
    VersionedTable.vacuum(path, retainLast = 1, minAgeMs = 0)
    val dropped = VersionedTable.vacuumStats(spark, path)
    assert(dropped == 3, s"3 pre-overwrite stats rows must drop, got $dropped")
    // second vacuum is a no-op; pruned reads still agree with full reads
    assert(VersionedTable.vacuumStats(spark, path) == 0)
    val (df, read, total) = VersionedTable.readWhere(spark, path, "k", 20L, 30L)
    assert(total == 1 && read == 1)
    assert(df.count() ==
      VersionedTable.read(spark, path).filter($"k" >= 20 && $"k" <= 30).count())
  }

  test("schema evolution on append: merged read, time travel keeps old shape") {
    val path = Files.createTempDirectory("vt_evo").resolve("t").toString
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1),
      path, SaveMode.Overwrite)
    // widened batch appends (the mergeSchema shape): new column arrives
    VersionedTable.write(
      Seq((3L, "c", 30.0)).toDF("k", "v", "score").coalesce(1),
      path, SaveMode.Append)
    val latest = VersionedTable.read(spark, path)
    assert(latest.columns.toSeq == Seq("k", "v", "score"),
      "merged read must surface the union schema")
    assert(latest.filter($"score".isNull).count() == 2,
      "pre-evolution rows read as NULL in the new column")
    assert(latest.filter($"k" === 3 && $"score" === 30.0).count() == 1)
    // time travel to v0 sees only the original shape
    assert(VersionedTable.readVersion(spark, path, 0).columns.toSeq ==
      Seq("k", "v"))
    // data skipping stays correct across the mixed-schema file set
    val (df, read, total) = VersionedTable.readWhere(spark, path, "k", 3L, 3L)
    assert(total == 2 && read == 1 && df.count() == 1)
  }

  test("old-schema file appended after indexing an evolved column is skipped, not an error") {
    val path = Files.createTempDirectory("vt_evo2").resolve("t").toString
    VersionedTable.write(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "v", "score").coalesce(1), path, SaveMode.Overwrite)
    // index the evolved column
    val (d0, r0, t0) = VersionedTable.readWhere(spark, path, "score", 0.0, 100.0)
    assert(r0 == 1 && t0 == 1 && d0.count() == 2)
    // an old-schema writer appends a file WITHOUT the column: the lazy
    // stats pass sees ONLY this file, where col("score") cannot resolve
    VersionedTable.write(Seq((3L, "c")).toDF("k", "v").coalesce(1),
      path, SaveMode.Append)
    val (df, read, total) = VersionedTable.readWhere(spark, path, "score", 0.0, 100.0)
    assert(total == 2 && read == 1,
      s"pre-evolution file must be skipped via null stats (read=$read)")
    assert(df.count() == 2)
    assert(VersionedTable.read(spark, path)
      .filter($"score" >= 0.0 && $"score" <= 100.0).count() == 2)
    // a column that exists in NO file is a caller error, reported as such
    intercept[IllegalArgumentException] {
      VersionedTable.readWhere(spark, path, "no_such_col", 0L, 1L)
    }
  }

  test("skipping survives compaction (new files re-indexed lazily)") {
    val path = clusteredTable()
    VersionedTable.readWhere(spark, path, "k", 0L, 10L)
    VersionedTable.compact(spark, path)
    val (df, read, total) = VersionedTable.readWhere(spark, path, "k", 120L, 150L)
    val expect = VersionedTable.read(spark, path)
      .filter($"k" >= 120 && $"k" <= 150).count()
    assert(df.count() == expect)
    assert(read <= total)
  }
}
