package graft

import org.apache.spark.sql.functions._

/** Null-edge-case battery for the engine's own primitives — the
  * semantics a user silently depends on when real data (unlike the
  * clean fixtures) carries nulls: null join keys never match, aggregates
  * skip nulls but `count(*)` doesn't, percentile/top-k/sketch
  * aggregators ignore null inputs instead of crashing or polluting
  * buffers, and dedup fingerprints treat null text deterministically.
  */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("null join keys: equi-join drops them, null-safe join matches them") {
    val l = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("k", "lv")
    val r = Seq((Some(1L), "x"), (None, "y")).toDF("k", "rv")
    assert(l.join(r, l("k") === r("k")).count() == 1,
      "SQL equality must not match null keys")
    assert(l.join(r, l("k") <=> r("k")).count() == 2,
      "null-safe equality must match the null pair")
    // anti-join keeps the null-keyed left row (no match possible)
    assert(l.join(r.filter($"k".isNotNull), Seq("k"), "left_anti")
      .count() == 2)
  }

  test("aggregates skip nulls; count(*) does not; count-distinct excludes null") {
    val df = Seq(Some(10L), None, Some(30L), None).toDF("v")
    val row = df.agg(sum("v"), avg("v"), count("v"), count(lit(1)),
      countDistinct("v"), min("v"), max("v")).head()
    assert(row.getLong(0) == 40L && row.getDouble(1) == 20.0)
    assert(row.getLong(2) == 2L, "count(col) skips nulls")
    assert(row.getLong(3) == 4L, "count(*) keeps them")
    assert(row.getLong(4) == 2L, "distinct excludes null")
    assert(row.getLong(5) == 10L && row.getLong(6) == 30L)
  }

  test("ExactPercentiles and TopK ignore null inputs") {
    val df = Seq(Some(1.0), None, Some(3.0), Some(2.0), None).toDF("v")
    val p = df.agg(functions.ExactPercentiles
        .percentiles($"v", Seq(0.5)).as("p"))
      .select($"p" (0)).as[Double].head()
    assert(p == 2.0, s"median over {1,2,3} with nulls dropped, got $p")
    // all-null group: NULL array, the built-in percentile contract
    val allNull = Seq[Option[Double]](None, None).toDF("v")
      .agg(functions.ExactPercentiles.percentiles($"v", Seq(0.5)).as("p"))
      .select($"p".isNull).as[Boolean].head()
    assert(allNull, "all-null input must yield NULL, not NaN")
    val tk = Seq((Some(5.0), 1L), (None, 2L), (Some(7.0), 3L))
      .toDF("sim", "id")
      .agg(functions.TopK.top_k($"sim", $"id", 5).as("tk"))
      .select(size($"tk")).as[Int].head()
    assert(tk == 2, "null-scored candidates must not enter the buffer")
    // NULL id dropped too: the primitive Long channel would decode it
    // as 0 — a legitimate-looking phantom neighbor_id in the ranking
    val tkIds = Seq[(Option[Double], Option[Long])](
        (Some(5.0), Some(1L)), (Some(9.0), None), (Some(7.0), Some(3L)))
      .toDF("sim", "id")
      .agg(functions.TopK.top_k($"sim", $"id", 5).as("tk"))
      .select($"tk".getField("id")).as[Seq[Long]].head()
    assert(tkIds == Seq(3L, 1L), s"null-id candidate must not rank, got $tkIds")
    val tkExact = Seq[(Option[Long], Option[Long])](
        (Some(5L), Some(1L)), (Some(9L), None))
      .toDF("score", "id")
      .agg(functions.TopK.top_k_exact($"score", $"id", 5).as("tk"))
      .select($"tk".getField("id")).as[Seq[Long]].head()
    assert(tkExact == Seq(1L), s"null-id exact candidate must not rank, got $tkExact")
  }

  test("heavy-hitter sketch ignores null tokens; CMS build drops null rows") {
    val toks = Seq(Some("a"), None, Some("a"), Some("b")).toDF("tok")
    val mg = toks.agg(functions.HeavyHitters.heavy_hitters($"tok", 4).as("m"))
      .select(map_keys($"m")).as[Seq[String]].head()
    assert(mg.toSet == Set("a", "b"), s"got $mg")
    val sk = functions.CountMin.sketch(toks, "tok", 2, 16)
    // null tok hashes to null bucket -> posexplode of null array drops it:
    // total counter mass per depth equals the 3 non-null tokens
    val mass = sk.groupBy("depth").agg(sum("cnt").as("m"))
      .select("m").as[Long].collect()
    assert(mass.forall(_ == 3L), s"per-depth mass ${mass.toList}")
  }

  test("exact dedup: null text forms its own deterministic fingerprint group") {
    val df = Seq((1L, Some("x")), (2L, None), (3L, None), (4L, Some("x")))
      .toDF("doc_id", "text")
    val out = functions.DedupOps.exactDedup(df, "text", "doc_id")
    // md5(null) is null: the two null docs collapse into one null-fp group
    val g = out.collect().map(r => (r.getAs[Any]("fp"), r.getAs[Long]("keep_id"),
      r.getAs[Long]("n_copies"))).toList
    assert(g.length == 2, s"one real group + one null group, got $g")
    assert(g.exists { case (fp, keep, n) => fp == null && keep == 2L && n == 2L },
      s"null texts group together under the lowest id, got $g")
  }
}
