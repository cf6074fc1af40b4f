package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

class Fnv64Spec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: FNV-1a 64 over UTF-8 bytes via BigInt
    * mod-2⁶⁴ arithmetic — the same shape the SQL oracle form uses
    * (HUGEINT fold), so this pins BOTH implementations to the spec.
    */
  private def ref(s: String): Long = {
    val mod = BigInt(1) << 64
    var h = BigInt("14695981039346656037")
    s.getBytes("UTF-8").foreach { b =>
      h = ((h ^ BigInt(b & 0xff)) * BigInt(1099511628211L)) % mod
    }
    (h % (BigInt(1) << 63)).toLong
  }

  test("hash matches the FNV-1a spec reference on known vectors") {
    // independently computed: fnv1a64("hello world") =
    // 8618312879776256743 (< 2^63, so the sign-clear is a no-op here)
    assert(Fnv64.hash(UTF8String.fromString("hello world")) == 8618312879776256743L)
    val cases = Seq("", "a", "ab", "abc", "the quick brown fox",
      "kmv-v1|12345", "0|one two three four five", "x" * 300)
    cases.foreach { s =>
      assert(Fnv64.hash(UTF8String.fromString(s)) == ref(s), s"input '$s'")
    }
  }

  test("values are non-negative and empty string hits the offset basis") {
    assert(Fnv64.hash(UTF8String.fromString("")) ==
      (0xcbf29ce484222325L & Long.MaxValue))
    val grid = (0 until 500).map(i => s"tok$i|${i * 31}")
    grid.foreach(s => assert(Fnv64.hash(UTF8String.fromString(s)) >= 0L))
  }

  test("codegen and interpreted paths agree; NULL in, NULL out") {
    val df = Seq(Some("alpha beta"), Some(""), None, Some("γδ"))
      .toDF("s")
      .select(Fnv64.fnv64(col("s")).as("h"))
    val codegen = df.collect()
    val interpreted = Seq(Some("alpha beta"), Some(""), None, Some("γδ")).map {
      case Some(s) => Some(Fnv64.hash(UTF8String.fromString(s)))
      case None => None
    }
    assert(codegen.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSeq == interpreted)
    // non-ASCII still hashes deterministically on the Spark side (byte
    // form); parity with the codepoint-based oracle form is only
    // promised for ASCII — every call site's input domain
    assert(Fnv64.hash(UTF8String.fromString("γδ")) == ref("γδ"))
  }

  test("SQL registration reaches the same kernel") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql("SELECT fnv64('hello world') AS h").collect()(0).getLong(0)
    assert(got == 8618312879776256743L)
  }
}
