package graft.expressions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.TextAnalysis

class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("native shingles equal the HOF composition on the corpus") {
    val docs = Tables.documents(spark, sf)
    val diff = docs.select(
      TextAnalysis.textShingles(col("text"), 5).as("native"),
      TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 5).as("hof"))
      .filter(!(col("native") <=> col("hof")))
    assert(diff.count() == 0)
  }

  test("native shingles match split semantics on edge-case strings") {
    val edge = Seq(
      "", " ", "a", "a b c d e", "  leading", "trailing  ",
      "A\tB\nCD\fE\rF G", "one two", "x  y   z w v u t",
      "MiXeD CaSe TeXt With FIVE tokens here").toDF("text")
    val diff = edge.select(
      TextAnalysis.textShingles(col("text"), 3).as("native"),
      TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("hof"))
      .filter(!(col("native") <=> col("hof")))
    assert(diff.count() == 0,
      diff.sparkSession.emptyDataFrame.toString() + "native/HOF divergence on edge strings")
  }

  test("min shingle hash equals min(md5) over HOF shingles, incl. edge strings") {
    val edge = Seq(
      "", " ", "a", "a b c d e", "  leading ws five tokens x",
      "A\tB\nCD\fE\rF G", "four tokens only here",
      "repeat repeat repeat repeat repeat repeat").toDF("text")
    val docs = Tables.documents(spark, sf).select(col("text")).unionByName(edge)
    val diff = docs.select(
      TextAnalysis.minShingleHash(col("text"), 5).as("native"),
      TextAnalysis.minShingleFingerprint(
        TextAnalysis.tokens(col("text")), 5).as("hof"))
      .filter(!(col("native") <=> col("hof")))
    assert(diff.count() == 0)
    // short text → NULL, like array_min over an empty shingle set
    assert(edge.filter(col("text") === "a")
      .select(TextAnalysis.minShingleHash(col("text"), 5))
      .collect()(0).isNullAt(0))
  }

  test("codegen and interpreted paths are bit-equal (shingles + min-hash)") {
    // both expressions implement real doGenCode (static-helper call);
    // this pins generated == interpreted on the corpus plus the edge
    // strings, so a codegen regression can never ship values silently
    val edge = Seq(
      "", " ", "a", "a b c d e", "  leading", "trailing  ",
      "A\tB\nCD\fE\rF G", "repeat repeat repeat repeat repeat repeat")
      .toDF("text")
    val docs = Tables.documents(spark, sf).select(col("text")).unionByName(edge)
    def render(): Seq[String] = docs.select(
        TextAnalysis.textShingles(col("text"), 3).as("sh"),
        TextAnalysis.minShingleHash(col("text"), 5).as("mh"))
      .collect().map(_.toString).sorted.toSeq
    val gen = render()
    val interp = {
      val conf = spark.conf
      val ws = conf.get("spark.sql.codegen.wholeStage", "true")
      val fm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try render()
      finally {
        conf.set("spark.sql.codegen.wholeStage", ws)
        conf.set("spark.sql.codegen.factoryMode", fm)
      }
    }
    assert(gen == interp)
  }

  test("shingle n=1 yields distinct tokens; n larger than doc yields empty") {
    val df = Seq("a b a c").toDF("text")
    assert(df.select(TextAnalysis.textShingles(col("text"), 1))
      .as[Seq[String]].collect()(0) == Seq("a", "b", "c"))
    assert(df.select(TextAnalysis.textShingles(col("text"), 9))
      .as[Seq[String]].collect()(0).isEmpty)
  }
}
