package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.DedupOps

class SimhashSignatureSpec extends SparkSpec {
  import spark.implicits._

  test("native signature equals the explode+aggregate spelling on the corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val native = DedupOps.simhashSignatures(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val composed = DedupOps.simhashSignaturesComposed(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("equality holds at non-default bits and on synthetic edge docs") {
    // one-shingle doc (every vote ±1, no ties), tie-heavy two-shingle
    // docs, repeated-token docs; shingleN=2 keeps them shingle-bearing
    val docs = Seq(
      (1L, "a b"), (2L, "a b c d"), (3L, "x x x x x"),
      (4L, "q w e r t y u i o p"), (5L, "one two"), (6L, "two one"))
      .toDF("doc_id", "text")
    for (bits <- Seq(8, 17, 32)) {
      val native = DedupOps.simhashSignatures(docs, "text", "doc_id",
          shingleN = 2, bits = bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val composed = DedupOps.simhashSignaturesComposed(docs, "text", "doc_id",
          shingleN = 2, bits = bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(native == composed, s"bits=$bits")
      assert(native.size == 6)
    }
  }

  test("shingle-less documents drop, matching the explode convention") {
    val docs = Seq((1L, "only four tokens here"), (2L, "too short"))
      .toDF("doc_id", "text")
    val out = DedupOps.simhashSignatures(docs, "text", "doc_id", shingleN = 5)
    assert(out.count() == 0) // both docs have < 5 tokens
    val out2 = DedupOps.simhashSignatures(docs, "text", "doc_id", shingleN = 4)
    assert(out2.select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("null elements are skipped like the composed form's null md5 votes") {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    def sig(arr: org.apache.spark.sql.Column) =
      toColumn(SimhashSignature(toExpression(arr), 32))
    val df = Seq(1).toDF("x").select(
      sig(array(lit("a b"), lit(null).cast("string"))).as("with_null"),
      sig(array(lit("a b"))).as("without"),
      sig(array(lit(null).cast("string"))).as("all_null"),
      sig(array().cast("array<string>")).as("empty"))
    val r = df.head()
    assert(r.getLong(0) == r.getLong(1),
      "a null shingle must not change the signature")
    // all-null: every vote is null in the composed form → all bits clear
    assert(r.getLong(2) == 0L)
    assert(r.isNullAt(3), "empty array must be NULL (explode drops the doc)")
  }

  test("tied vote clears the bit (strictly-positive convention)") {
    // construct a doc with exactly 2 distinct shingles: every bit where
    // the two shingle hashes DISAGREE has vote sum 0 → must be cleared;
    // where they agree-on-1 the sum is +2 → set
    val docs = Seq((1L, "p q r")).toDF("doc_id", "text") // 2 shingles at n=2
    val sig = DedupOps.simhashSignatures(docs, "text", "doc_id", shingleN = 2)
      .select("simhash").as[Long].head()
    val vs = Seq("p q", "q r").map { g =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val expected = (0 until 32).map { i =>
      val sh = 4 * (7 - i / 4) + i % 4
      val votes = vs.map(v => ((v >>> sh) & 1L) * 2 - 1).sum
      if (votes > 0) 1L << i else 0L
    }.sum
    assert(sig == expected)
  }
}
