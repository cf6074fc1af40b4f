package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  lazy val toks = Tables.documents(spark, sf)
    .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tok"))

  private val D = 4
  private val W = 64 // narrow on purpose: the tiny fixture vocab must collide

  test("CMS never under-counts; exact when a token owns some row's bucket") {
    val sk = CountMin.sketch(toks, "tok", D, W)
    assert(sk.count() <= D * W, "sketch is bounded by depth*width")
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
    val under = CountMin.estimate(sk, exact.select("tok"), "tok", D, W)
      .join(exact, "tok").filter($"cms_est" < $"exact")
    assert(under.count() == 0, "CMS estimates are one-sided")
  }

  test("CMS merges by counter addition: split-build == whole-build") {
    val (a, b) = (toks.filter($"doc_id" % 2 === 0), toks.filter($"doc_id" % 2 === 1))
    val merged = CountMin.sketch(a, "tok", D, W)
      .unionByName(CountMin.sketch(b, "tok", D, W))
      .groupBy("depth", "bucket").agg(sum("cnt").as("cnt"))
    val whole = CountMin.sketch(toks, "tok", D, W)
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0,
      "per-shard sketches must sum to the whole-corpus sketch")
  }

  test("sketch is layout-independent") {
    val a = CountMin.sketch(toks, "tok", D, W).collect().map(_.toString).sorted
    val b = CountMin.sketch(toks.repartition(13), "tok", D, W)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
