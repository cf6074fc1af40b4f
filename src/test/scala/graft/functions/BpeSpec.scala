package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end BPE trainer semantics on constructed token runs (the
  * q153/q161 greedy-merge convention: ties by (l, r), greedy
  * left-to-right application, self-pairs never learned).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns merges in frequency order and encode(train(k)) applies them") {
    // corpus of two "ababa" tokens: round 1 counts (a,b)=4 and (b,a)=4,
    // tie broken lexicographically -> (a,b); greedy merge gives
    // [ab, ab, a]. Round 2: (ab,ab) is a self-pair (excluded), so
    // (ab,a)=2 wins and the leftmost-match rule merges position 2-3 ->
    // [ab, aba].
    val corpus = Seq("ababa ababa").toDF("text")
    val table = Bpe.train(corpus, "text", merges = 2)
      .as[(Int, String, String)].collect().sortBy(_._1).toSeq
    assert(table == Seq((1, "a", "b"), (2, "ab", "a")))
    val enc = Bpe.encode(corpus, "text", Bpe.train(corpus, "text", 2))
      .as[(Seq[String], Long)].collect().toSeq
    assert(enc == Seq((Seq("ab", "aba"), 2L)))
    graft.CacheScope.drain(spark)
  }

  test("applyMerges handles SELF-pair merges greedily (external tables contain them)") {
    // "aaa" under merge (a, a): greedy left-to-right gives [aa, a] —
    // the stateless per-position rewrite emitted [aa, aa] (4 a's from
    // 3, content invented) because the middle symbol matched both
    // "pair start" and "consumed". The trainer never learns self-pairs
    // but encode()/applyMerges() accept externally learned tables,
    // where they are routine.
    val vocab = Seq((Seq("a", "a", "a"), 1L), (Seq("a", "a", "a", "a"), 1L),
      (Seq("b", "a", "a"), 1L)).toDF("sym", "cnt")
    val table = Seq((1, "a", "a")).toDF("rank", "l", "r")
    val out = Bpe.applyMerges(vocab, table)
      .as[(Seq[String], Long)].collect().toSet
    assert(out == Set(
      (Seq("aa", "a"), 1L), (Seq("aa", "aa"), 1L), (Seq("b", "aa"), 1L)))
    graft.CacheScope.drain(spark)
  }

  test("train stops early when the vocabulary is fully merged") {
    val corpus = Seq("xy xy xy").toDF("text")
    val table = Bpe.train(corpus, "text", merges = 5)
      .as[(Int, String, String)].collect().toSeq
    assert(table == Seq((1, "x", "y")),
      "one merge exhausts all pairs; the loop must not spin")
    graft.CacheScope.drain(spark)
  }

  test("vocabulary counts weight pair statistics exactly like the raw stream") {
    // 3x "abc" and 1x "bcd": stream pair counts are (a,b)=3, (b,c)=4,
    // (c,d)=1 -> first merge must be (b,c) on count, not tie-break
    val corpus = Seq("abc abc abc bcd").toDF("text")
    val table = Bpe.train(corpus, "text", merges = 1)
      .as[(Int, String, String)].collect().toSeq
    assert(table == Seq((1, "b", "c")))
    graft.CacheScope.drain(spark)
  }

  test("applyMerges carries extra columns and shortens, never lengthens") {
    import org.apache.spark.sql.functions._
    val corpus = Seq("abab abab cd", "abab xy").toDF("text")
    val table = Bpe.train(corpus, "text", merges = 2)
    // a per-slice vocabulary with a carrier column the merges must keep
    val v0 = Seq(("s1", Seq("a", "b", "a", "b"), 3L),
        ("s2", Seq("c", "d"), 1L))
      .toDF("source", "sym", "cnt")
    val out = Bpe.applyMerges(v0, table)
      .select("source", "sym", "cnt")
      .as[(String, Seq[String], Long)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq("s1", "s2"), "carrier column lost")
    assert(out.map(_._3) == Seq(3L, 1L), "counts must pass through")
    // "abab" merges strictly (ab learned first on count); total chars
    // conserved, symbol count never grows
    val s1 = out.head._2
    assert(s1.mkString.length == 4 && s1.length < 4, s"got $s1")
    graft.CacheScope.drain(spark)
  }
}
