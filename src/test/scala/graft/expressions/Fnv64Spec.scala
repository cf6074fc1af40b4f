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

  /** Model of the DuckDB spelling in [[Fnv64.sql]]: a fold over
    * CODEPOINTS (DuckDB `string_split(e,'') → unicode(c)` with empty
    * parts filtered) through mod-2⁶⁴ arithmetic. Structurally mirrors
    * the SQL lambda so the two can only drift visibly; the SQL text
    * itself was cross-checked against a live DuckDB on 300 random
    * printable-ASCII strings plus the empty string (r14), and every
    * oracle-backed query using Fnv64.sql re-proves it per round.
    */
  private def sqlModel(s: String): Long = {
    val mod = BigInt(1) << 64
    var h = BigInt("14695981039346656037")
    s.codePoints().toArray.foreach { cp =>
      h = ((h ^ BigInt(cp)) * BigInt(1099511628211L)) % mod
    }
    (h % (BigInt(1) << 63)).toLong
  }

  test("property: byte kernel == spec reference on arbitrary unicode; " +
      "== codepoint (oracle) form exactly on ASCII") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](gen: Gen[A], seed: Long): A =
      gen(Gen.Parameters.default, Seed(seed)).getOrElse(fail(s"gen failed @ $seed"))
    val ascii = Gen.listOf(Gen.choose(0x20.toChar, 0x7e.toChar)).map(_.mkString)
    // arbitrary unicode incl. astral-plane codepoints (surrogate PAIRS —
    // lone surrogates are not valid UTF-8 and no engine round-trips them)
    val uni = Gen.listOf(Gen.frequency(
      9 -> Gen.choose(0x20.toChar, 0x7e.toChar).map(_.toString),
      2 -> Gen.choose(0xa0, 0x2fff).map(cp => new String(Character.toChars(cp))),
      1 -> Gen.choose(0x10000, 0x10fff).map(cp => new String(Character.toChars(cp)))
    )).map(_.mkString)
    (1 to 200).foreach { i =>
      val a = sample(ascii, i.toLong)
      val haBytes = Fnv64.hash(UTF8String.fromString(a))
      assert(haBytes == ref(a), s"byte kernel vs spec ref on ASCII '$a'")
      assert(haBytes == sqlModel(a),
        s"oracle-portability contract broke on ASCII input '$a'")
      val u = sample(uni, 100000L + i)
      assert(Fnv64.hash(UTF8String.fromString(u)) == ref(u),
        s"byte kernel vs spec ref on unicode '$u'")
      // non-ASCII: the forms INTENTIONALLY differ (bytes vs codepoints);
      // agreement is only promised — and only relied on — for ASCII
    }
    // the one historical divergence: empty input (DuckDB unicode('') is
    // −1; Fnv64.sql filters the empty split part so both forms land on
    // the sign-cleared offset basis)
    assert(sqlModel("") == Fnv64.hash(UTF8String.fromString("")))
  }

  test("hashed-array intersect counts equal string-array intersect counts") {
    // the q252 losslessness argument in executable form: hashing each
    // element of two DISTINCT string arrays preserves the intersection
    // size absent a 64-bit collision (none on any generated input).
    // Generated word sets with forced overlap, plus the edge shapes
    // (both empty, one empty, identical, disjoint).
    val r = new scala.util.Random(7)
    def words(n: Int, offset: Int): Seq[String] =
      (0 until n).map(i => s"w${offset + r.nextInt(40)}-$i")
    val cases: Seq[(Seq[String], Seq[String])] =
      Seq((Nil, Nil), (Nil, Seq("a")), (Seq("a", "b"), Seq("a", "b")),
        (Seq("a"), Seq("b"))) ++
        (1 to 40).map(i => (words(i % 17 + 1, 0).distinct,
          words(i % 23 + 1, i % 3).distinct))
    val df = cases.toDF("a", "b")
      .select(
        size(array_intersect($"a", $"b")).as("raw"),
        size(array_intersect(
          transform($"a", g => Fnv64.fnv64(g)),
          transform($"b", g => Fnv64.fnv64(g)))).as("hashed"))
    assert(df.filter($"raw" =!= $"hashed").count() == 0L,
      "Fnv64 element hashing changed an intersection count")
  }
}
