package graft.expressions

import org.apache.spark.sql.functions._
import graft.{GraftFunctions, SparkSpec}
import graft.expressions.UnicodeNormalize.unicode_normalize

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "café á straße"
  private val precomposed = "café á straße"

  test("NFC recomposes combining sequences; NFD decomposes them back") {
    val df = Seq(decomposed).toDF("s")
    val Array(nfc, nfd) = df.select(
      unicode_normalize($"s", "NFC"),
      unicode_normalize(unicode_normalize($"s", "NFC"), "NFD"))
      .as[(String, String)].collect().map(t => Array(t._1, t._2)).head
    assert(nfc == precomposed)
    assert(nfd == decomposed)
    // length drop = one char per recomposed pair
    assert(nfc.length == decomposed.length - 2)
  }

  test("NFKC applies compatibility mappings NFC leaves alone") {
    // U+FB01 LATIN SMALL LIGATURE FI and U+2460 CIRCLED DIGIT ONE
    val df = Seq("\ufb01le \u2460").toDF("s")
    val (nfc, nfkc) = df.select(
      unicode_normalize($"s", "NFC"), unicode_normalize($"s", "NFKC"))
      .as[(String, String)].collect().head
    assert(nfc == "\ufb01le \u2460", "NFC preserves compatibility chars")
    assert(nfkc == "file 1", "NFKC folds ligature and circled digit")
  }

  test("ASCII fast path is the identity and nulls pass through") {
    val df = Seq(Some("plain ascii text"), None).toDF("s")
    val got = df.select(unicode_normalize($"s", "NFC")).as[Option[String]]
      .collect().toSet
    assert(got == Set(Some("plain ascii text"), None))
  }

  test("normalization is idempotent over the mangled corpus") {
    val mangled = graft.Tables.documents(spark, sf)
      .select(regexp_replace($"text", "a", "a\u0301").as("s"))
    val once = unicode_normalize($"s", "NFC")
    val diff = mangled.select(once.as("n1"),
        unicode_normalize(unicode_normalize($"s", "NFC"), "NFC").as("n2"))
      .filter(!($"n1" <=> $"n2"))
    assert(diff.count() == 0)
  }

  test("expression participates in whole-stage codegen and SQL registry") {
    // a file-backed scan \u2014 a local Seq collapses to LocalTableScan and
    // constant-folds the projection away
    val plan = graft.Tables.documents(spark, sf)
      .select(unicode_normalize($"text", "NFC"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [unicode_normalize"),
      s"expected codegen'd projection in:\n$plan")
    GraftFunctions.register(spark)
    Seq(decomposed).toDF("s").createOrReplaceTempView("un_spec")
    val viaSql = spark.sql(
      "SELECT unicode_normalize(s, 'NFC') FROM un_spec").as[String].head()
    assert(viaSql == precomposed)
  }

  test("rejects non-string input and unknown forms") {
    intercept[Exception] {
      Seq(1).toDF("i").select(unicode_normalize($"i", "NFC")).collect()
    }
    intercept[IllegalArgumentException] {
      unicode_normalize(lit("x"), "NFX")
    }
  }
}
