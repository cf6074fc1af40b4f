package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests (SURVEY.md §5.3): algebraic invariants of the Silver and
  * merge operators over ScalaCheck-generated inputs (fixed seeds for
  * reproducibility; the scalatest-scalacheck bridge is not in the offline
  * dependency cache, so generators are sampled directly).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator failed for seed $i")))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val rowGen = for {
    key <- Gen.choose(1L, 20L)
    line <- Gen.choose(1, 3)
    day <- Gen.choose(1, 28)
    amount <- Gen.choose(-50.0, 500.0)
  } yield (key, line, Date.valueOf(f"2024-01-$day%02d"), amount)

  private val tableGen = Gen.listOfN(60, rowGen)

  test("dedup: unique keys, subset of input, idempotent") {
    forAll(tableGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "line", "d", "amount")
        val out = Silver.dedupLatest(df, Seq("k"),
          Seq($"d".desc, $"line".desc, $"amount".desc))
        assert(out.groupBy("k").count().filter($"count" > 1).count() == 0)
        assert(out.exceptAll(df).isEmpty)
        val again = Silver.dedupLatest(out, Seq("k"),
          Seq($"d".desc, $"line".desc, $"amount".desc))
        assert(again.exceptAll(out).isEmpty && out.exceptAll(again).isEmpty)
      }
    }
  }

  test("quarantine: PASS and FAIL partition the input exactly") {
    forAll(tableGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("l_orderkey", "l_linenumber", "d", "l_extendedprice")
          .withColumn("l_shipdate", $"d".cast("timestamp"))
          .withColumn("l_partkey", lit(1L)).withColumn("l_suppkey", lit(1L))
          .withColumn("l_quantity", lit(1.0)).withColumn("l_discount", lit(0.1))
          .withColumn("l_returnflag", lit("N"))
        val tagged = Silver.applyDqRules(df)
        val (pass, fail) = Silver.quarantineSplit(tagged)
        assert(pass.count() + fail.count() == df.count())
        assert(pass.intersect(fail).isEmpty)
        // every FAIL row carries at least one reason; no PASS row does
        assert(fail.filter(size($"dq_failure_reasons") === 0).count() == 0)
        assert(pass.filter($"dq_failure_reasons".isNotNull).count() == 0)
      }
    }
  }

  test("merge upsert: source wins, target-only preserved, idempotent, key-complete") {
    val pairGen = for {
      t <- Gen.listOfN(25, Gen.zip(Gen.choose(1L, 30L), Gen.alphaStr.map(_.take(4))))
      s <- Gen.listOfN(10, Gen.zip(Gen.choose(1L, 40L), Gen.alphaStr.map(_.take(4))))
    } yield (t.distinctBy(_._1), s.distinctBy(_._1))
    forAll(pairGen) { case (t, s) =>
      whenever(t.nonEmpty && s.nonEmpty) {
        val target = t.toDF("k", "v")
        val source = s.toDF("k", "v")
        val merged = Merge.upsert(target, source, Seq("k"))
        // key set is the union; source rows win on conflicts
        assert(merged.select("k").distinct().count() ==
          (t.map(_._1) ++ s.map(_._1)).distinct.size)
        assert(merged.join(source, Seq("k", "v"), "left_semi").count() == s.size)
        val again = Merge.upsert(merged, source, Seq("k"))
        assert(again.exceptAll(merged).isEmpty && merged.exceptAll(again).isEmpty)
      }
    }
  }

  test("prefix sum: equals the global window for random sizes, skew, negatives") {
    val tblGen = for {
      n <- Gen.choose(0, 300)
      rows <- Gen.listOfN(n, for {
        ord <- Gen.choose(-100L, 100L) // heavy ties + negatives
        v <- Gen.choose(-1000L, 1000L) // negative running values too
      } yield (ord, v))
    } yield rows
    forAll(tblGen, n = 8) { rows =>
      val df = rows.zipWithIndex
        .map { case ((ord, v), i) => (ord, i.toLong, v) }
        .toDF("ord", "uid", "v").repartition(7)
      val got = PrefixSum.exclusiveRunningTotal(
          df, Seq($"ord", $"uid"), $"v", "run", buckets = 5)
        .select($"uid", $"run").as[(Long, Long)].collect().toMap
      val want = df.withColumn("run",
          sum($"v").over(org.apache.spark.sql.expressions.Window
            .orderBy($"ord", $"uid")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)) - $"v")
        .select($"uid", $"run").as[(Long, Long)].collect().toMap
      assert(got == want)
    }
  }

  test("pagerank: mass conserved, all nodes ranked, positive ranks — random graphs") {
    val edgeGen = for {
      n <- Gen.choose(1, 60)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(1L, 25L)
        b <- Gen.choose(1L, 25L)
      } yield (a, b))
    } yield edges
    forAll(edgeGen, n = 5) { edges =>
      val df = edges.toDF("src", "dst").repartition(5)
      val r = PageRank.ranks(df, "src", "dst").cache()
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(r.count() == nodes.size, "one rank row per distinct node")
      val total = r.agg(sum($"rank")).head().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9, s"mass drifted: $total")
      assert(r.filter($"rank" <= 0).count() == 0, "ranks strictly positive")
      r.unpersist()
      graft.CacheScope.drain(spark)
    }
  }

  test("segment dedup rewrite: identity on unique docs, empties exact duplicates") {
    // corpus of structurally unique docs (distinct leading token per doc)
    val docs = (1L to 12L).map(i =>
      (i, (0 until 25).map(t => s"w${i}_$t").mkString(" ").toLowerCase))
      .toDF("doc_id", "text")
    val out = graft.functions.DedupOps
      .segmentDedupRewrite(docs, "text", "doc_id").cache()
    // nothing shared → every segment kept and the rewrite IS the
    // normalized original (tokens joined by single spaces)
    assert(out.filter($"kept_segments" =!= $"n_segments").count() == 0)
    val want = docs.select($"doc_id",
      md5(array_join(graft.functions.TextAnalysis.tokens($"text"), " ")).as("m"))
      .as[(Long, String)].collect().toMap
    val got = out.select($"doc_id", $"new_md5").as[(Long, String)].collect().toMap
    assert(got == want)
    out.unpersist()
    // exact duplicate pair → both fully emptied, unique docs untouched
    val dup = docs.unionByName(
      docs.filter($"doc_id" === 1).withColumn("doc_id", lit(100L)))
    val out2 = graft.functions.DedupOps
      .segmentDedupRewrite(dup, "text", "doc_id")
    val emptied = out2.filter($"kept_segments" === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(emptied == Set(1L, 100L), s"got $emptied")
    graft.CacheScope.drain(spark)
  }

  test("prefix sum: non-numeric leading key degrades to one bucket, still exact") {
    // the documented fallback: try_cast(string) = NULL for every row →
    // all rows land in bucket 0 → correct single-window result
    val df = Seq(("pear", 1L, 10L), ("apple", 2L, 20L), ("fig", 3L, 30L),
        ("apple", 4L, 40L), ("kiwi", 5L, 50L))
      .toDF("name", "uid", "v").repartition(3)
    val got = PrefixSum.exclusiveRunningTotal(
        df, Seq($"name", $"uid"), $"v", "run", buckets = 4)
      .select($"uid", $"run").as[(Long, Long)].collect().toMap
    // expected order: apple(2), apple(4), fig, kiwi, pear
    assert(got == Map(2L -> 0L, 4L -> 20L, 3L -> 60L, 5L -> 90L, 1L -> 140L))
  }

  test("watermark: incremental read after commit is empty (monotone frontier)") {
    forAll(tableGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "line", "d", "amount")
          .withColumn("ts", $"d".cast("timestamp"))
        val wm = Silver.watermarkCommit(df, "t", "ts")
        assert(Silver.incrementalAfter(df, wm, "t", "ts").count() == 0)
      }
    }
  }

  test("z-order: zValue is a bijection on 16-bit pairs (inverse recovers both)") {
    val pairGen = for {
      a <- Gen.choose(0L, 0xFFFFL)
      b <- Gen.choose(0L, 0xFFFFL)
    } yield (a, b)
    // reference inverse: collect even/odd bits back into the two values
    def unspread(z: Long, offset: Int): Long =
      (0 until 16).map(i => ((z >> (2 * i + offset)) & 1L) << i).sum
    forAll(Gen.listOfN(64, pairGen)) { pairs =>
      val zs = pairs.toDF("a", "b")
        .select($"a", $"b", graft.sources.ZOrder.zValue($"a", $"b").as("z"))
        .as[(Long, Long, Long)].collect()
      zs.foreach { case (a, b, z) =>
        assert(unspread(z, 0) == a && unspread(z, 1) == b,
          s"z=$z must decode back to ($a, $b)")
      }
    }
  }

  test("z-order: zValue3 is a bijection on 10-bit triples") {
    val tripleGen = for {
      a <- Gen.choose(0L, 0x3FFL)
      b <- Gen.choose(0L, 0x3FFL)
      c <- Gen.choose(0L, 0x3FFL)
    } yield (a, b, c)
    def unspread3(z: Long, offset: Int): Long =
      (0 until 10).map(i => ((z >> (3 * i + offset)) & 1L) << i).sum
    forAll(Gen.listOfN(64, tripleGen)) { ts =>
      val zs = ts.toDF("a", "b", "c")
        .select($"a", $"b", $"c",
          graft.sources.ZOrder.zValue3($"a", $"b", $"c").as("z"))
        .as[(Long, Long, Long, Long)].collect()
      zs.foreach { case (a, b, c, z) =>
        assert(unspread3(z, 0) == a && unspread3(z, 1) == b &&
          unspread3(z, 2) == c, s"z=$z must decode back to ($a, $b, $c)")
      }
    }
  }

  test("viterbi segmentation: bounds, empty-inventory exactness, monotone in inventory") {
    import org.apache.spark.sql.functions.{map => sqlMap}
    val tokGen = for {
      len <- Gen.choose(1, 12)
      cs <- Gen.listOfN(len, Gen.choose('a', 'd'))
    } yield cs.mkString
    forAll(Gen.listOfN(12, tokGen), n = 5) { toks =>
      val df = toks.distinct.toDF("tok")
      // inventory never matching lowercase tokens = effectively empty
      val none = df.withColumn("m", sqlMap(lit(" "), lit(101L)))
        .withColumn("c", graft.functions.TextAnalysis
          .minCostSegmentation("tok", "m"))
        .select("tok", "c").as[(String, Long)].collect().toMap
      none.foreach { case (tok, c) =>
        assert(c == tok.length.toLong * 102401L,
          s"empty inventory must segment '$tok' to singles, got $c")
      }
      // a small inventory: cost/pieces bounded, never worse than singles
      val some = df.withColumn("m",
          sqlMap(lit("ab"), lit(103L), lit("bcd"), lit(102L)))
        .withColumn("c", graft.functions.TextAnalysis
          .minCostSegmentation("tok", "m"))
        .select("tok", "c").as[(String, Long)].collect().toMap
      some.foreach { case (tok, c) =>
        val (cost, pieces) = (c / 1024, c % 1024)
        assert(pieces >= 1 && pieces <= tok.length, s"'$tok' pieces $pieces")
        assert(cost <= 100L * tok.length,
          s"'$tok' cost $cost must never beat... exceed all-singles")
        assert(c <= none(tok), s"'$tok': adding pieces must not cost more")
      }
    }
  }

  test("isqrt: exact floor square root across magnitudes and boundaries") {
    val vGen = Gen.oneOf(
      Gen.choose(0L, 100L),
      Gen.choose(0L, 1L << 50),
      // exact squares and their neighbors — the correction's edge cases
      Gen.choose(0L, 1L << 25).map(r => r * r),
      Gen.choose(1L, 1L << 25).map(r => r * r - 1),
      Gen.choose(0L, 1L << 25).map(r => r * r + 1))
    forAll(Gen.listOfN(40, vGen), n = 5) { vs =>
      val got = vs.toDF("v")
        .select($"v", graft.functions.Sampling.isqrt($"v").as("s"))
        .as[(Long, Long)].collect()
      got.foreach { case (v, s) =>
        assert(s >= 0 && s * s <= v && (s + 1) * (s + 1) > v,
          s"isqrt($v) = $s is not the floor square root")
      }
    }
  }

  test("ms-bfs reach counts: monotone in hop, bounded, equal to pair-level BFS") {
    val edgeGen = for {
      a <- Gen.choose(1L, 8L)
      b <- Gen.choose(1L, 8L)
    } yield (a, b)
    forAll(Gen.listOfN(10, edgeGen), n = 5) { raw =>
      val es = raw.filter(e => e._1 != e._2)
      whenever(es.nonEmpty) {
        val sym = (es ++ es.map(_.swap)).distinct.toDF("src", "dst")
        val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
        val roots = nodes.take(2)
        val bits = roots.zipWithIndex
          .map { case (id, i) => (id, 1L << i) }.toDF("id", "mask")
        val got = NeighborhoodFunction.multiSourceReachCounts(sym, bits, 3)
          .as[(Int, Long)].collect().toMap
        // monotone, bounded by |roots| · |V|, at least the roots themselves
        assert(got(1) <= got(2) && got(2) <= got(3), s"not monotone: $got")
        assert(got(3) <= roots.size.toLong * nodes.size, s"overcount: $got")
        assert(got(1) >= roots.size.toLong, s"roots must reach selves: $got")
        // equals the pair-level frontier BFS, cumulated
        val pairs = NeighborhoodFunction
          .exactFromRoots(sym, roots.toDF("root"), 3)
        (1 to 3).foreach { r =>
          val expect = pairs.filter(col("hop") <= r).count()
          assert(got(r) == expect, s"hop $r: bitmask ${got(r)} != BFS $expect")
        }
      }
    }
  }
}
