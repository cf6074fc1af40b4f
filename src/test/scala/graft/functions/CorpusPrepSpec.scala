package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  test("stratified sample: deterministic, layout-independent, rate-bounded") {
    val rates = Map("en" -> 35, "de" -> 80, "fr" -> 80, "es" -> 80, "zh" -> 80)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, $"lang", $"doc_id", rates, salt = "mix-v1|")
        .select("doc_id").as[Long].collect().toSet
    val a = run(docs)
    val b = run(docs.repartition(13)) // different layout, same sample
    assert(a == b, "hash sampling must not depend on partitioning")
    assert(a.nonEmpty && a.size < docs.count())
    // buckets are uniform-ish: the en rate cut should keep roughly 35%
    val en = docs.filter($"lang" === "en")
    val enKept = Sampling.stratifiedSample(en, $"lang", $"doc_id", rates,
      salt = "mix-v1|").count().toDouble / en.count()
    assert(enKept > 0.2 && enKept < 0.5, s"en keep-rate $enKept far from 35%")
  }

  test("epoch upsample: copies match weights, deterministic, epochs numbered") {
    val w = Map("en" -> 130, "de" -> 250, "zh" -> 400)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.epochUpsample(df, $"lang", $"doc_id", w, salt = "epoch-v1|")
    val out = run(docs).cache()
    // every source doc appears (all weights >= 1.0) with epochs 1..n
    assert(out.select("doc_id").distinct().count() == docs.count())
    val badSeq = out.groupBy($"doc_id").agg(
        count(lit(1)).as("n"), max($"epoch").as("mx"), min($"epoch").as("mn"),
        first($"n_epochs").as("ne"))
      .filter($"n" =!= $"ne" || $"mx" =!= $"ne" || $"mn" =!= 1)
    assert(badSeq.count() == 0, "epoch numbering must be 1..n_epochs")
    // realized per-lang copy rate tracks the weight (hash buckets uniform)
    val rates = out.groupBy($"lang").agg(
        (count(lit(1)).cast("double") /
          countDistinct($"doc_id")).as("copies"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(rates("de") - 2.5) <= 0.5, s"de copies ${rates("de")}")
    assert(math.abs(rates.getOrElse("fr", 1.0) - 1.0) < 1e-9, "default is 1x")
    // layout-independence: same multiset of (doc_id, epoch)
    val a = out.select("doc_id", "epoch").collect().map(_.toString).sorted
    val b = run(docs.repartition(13)).select("doc_id", "epoch")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    out.unpersist()
  }

  test("stratified sample: rate 100 keeps all, rate 0 / unlisted keeps none") {
    val all = Sampling.stratifiedSample(docs, $"lang", $"doc_id",
      Map("en" -> 100), defaultPct = 0)
    assert(all.count() == docs.filter($"lang" === "en").count())
    assert(all.filter($"lang" =!= "en").count() == 0)
  }

  test("different salts draw near-independent samples") {
    val rates = Map("en" -> 50)
    def run(salt: String) =
      Sampling.stratifiedSample(docs, $"lang", $"doc_id", rates, salt = salt)
        .select("doc_id").as[Long].collect().toSet
    val a = run("s1|")
    val b = run("s2|")
    assert(a != b, "independent salts must not select the identical subset")
  }

  test("token-budget fill admits exactly a quality-ordered prefix") {
    val out = graft.LlmQueries.tokenBudgetFill(spark, sf, budget = 5000L)
      .select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty && out.size < docs.count(), "budget must bind")
    // the admitted set must be a PREFIX of the (quality desc, doc_id)
    // global order whose token sum stays under budget
    val ordered = graft.LlmQueries.tokenBudgetFill(spark, sf, budget = Long.MaxValue)
      .orderBy($"tokens_before")
      .select("doc_id", "n_tokens").as[(Long, Long)].collect()
    var cum = 0L
    val prefix = ordered.takeWhile { case (_, n) => val ok = cum < 5000L; cum += n; ok }
      .map(_._1).toSet
    assert(out == prefix)
  }

  test("source cap plans as WindowGroupLimit (top-k pushed before shuffle)") {
    val plan = graft.LlmQueries.sourceCap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k filter should push a group limit below the window:\n$plan")
  }

  test("shuffle order is a deterministic, layout-independent permutation") {
    def run(d: org.apache.spark.sql.DataFrame) = graft.LlmQueries.shuffleOrder(spark, sf)
      .select("doc_id", "shuffle_rank").as[(Long, Long)].collect().toMap
    val a = run(docs)
    val b = run(docs.repartition(9))
    assert(a == b, "the permutation must not depend on partitioning")
    val n = docs.count()
    assert(a.values.toSeq.sorted == (1L to n), "ranks form a dense permutation")
    // and it actually shuffles: rank order differs from id order
    val byId = a.toSeq.sortBy(_._1).map(_._2)
    assert(byId != byId.sorted, "hash order must not equal id order")
  }

  test("packSequences matches the naive global-window packing") {
    val cap = 512
    val got = Packing.packSequences(docs.repartition(11), $"doc_id",
        size(TextAnalysis.tokens($"text")), cap)
      .select($"doc_id", $"n_tokens", $"start_offset", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val naive = docs
      .select($"doc_id", size(TextAnalysis.tokens($"text")).cast("bigint").as("n"))
      .withColumn("start", sum($"n").over(Window.orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"n")
      .select($"doc_id", $"n", $"start",
        expr(s"CAST(start div $cap AS BIGINT)"), $"start" % cap)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == naive.toSeq)
    // invariants: stream starts at zero, offsets are consistent
    assert(got.head._3 == 0L)
    got.foreach { case (_, _, start, packId, off) =>
      assert(packId == start / cap && off == start % cap)
    }
  }

  test("packSequences rejects NULL token counts LOUDLY (documented contract)") {
    // before PrefixSum's in-aggregate null count, this failure mode
    // depended on quantile bucketing: an opaque ROW_VALUE_IS_NULL when
    // the null row landed alone in a bucket, a SILENT zero-width pack
    // otherwise. The contract violation must be deterministic.
    val in = Seq((1L, Some(10L)), (2L, None: Option[Long]), (3L, Some(20L)))
      .toDF("doc_id", "cnt")
    val e = intercept[IllegalArgumentException] {
      Packing.packSequences(in, $"doc_id", $"cnt", capacity = 16)
        .collect()
    }
    assert(e.getMessage.contains("NULL value"), e.getMessage)
  }

  test("applyMerges silently drops NULL sym elements (documented contract)") {
    val table = Seq((1, "a", "b")).toDF("rank", "l", "r")
    val in = Seq((Seq(Some("a"), None, Some("a"), Some("b")), 1L))
      .toDF("sym", "cnt")
    val out = Bpe.applyMerges(in, table)
      .as[(Seq[String], Long)].collect().head._1
    // the NULL vanishes; the (a, b) at positions 3-4 still merges
    assert(out == Seq("a", "ab"), s"got $out")
  }

  test("dupClusters: every near-dup pair lands inside one cluster") {
    val pairs = DedupOps.simhashPairs(
        DedupOps.simhashSignatures(docs, "text", "doc_id"))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture should contain planted near-duplicates")
    val comp = graft.LlmQueries.dupClusters(spark, sf)
      .select($"doc_id", $"component_id").as[(Long, Long)].collect().toMap
    pairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a,$b) split across clusters")
    }
    // canonical representative: the component id is a member of the cluster
    comp.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.contains(cid))
      assert(cid == members.keySet.min, "component id must be the cluster min")
    }
  }

  test("clusterSplit: near-duplicates never straddle the train/holdout boundary") {
    val split = graft.LlmQueries.clusterSplit(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(split.size == docs.count(), "every document gets a side")
    assert(split.values.toSet == Set("train", "holdout"),
      "both sides must be non-empty at this scale")
    val pairs = DedupOps.simhashPairs(
        DedupOps.simhashSignatures(docs, "text", "doc_id"))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"near-dup pair ($a,$b) leaks across the split")
    }
  }

  test("systematic sample: exactly n draws, weight-proportional, layout-independent") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"n_chars")
    val n = 40L
    val s1 = Sampling.systematicSample(docs, Seq($"doc_id"), $"n_chars", n)
      .select($"doc_id", $"n_picks").as[(Long, Long)].collect().toSeq.sorted
    // the draw is a pure function of (data, order) — partitioning is invisible
    val s2 = Sampling.systematicSample(docs.repartition(9), Seq($"doc_id"),
      $"n_chars", n).select($"doc_id", $"n_picks")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(s1 == s2)
    assert(s1.map(_._2).sum == n, "total multiplicity is exactly nSamples")
    // a row heavier than the whole step must be drawn more than once
    val tw = docs.agg(sum($"n_chars")).as[Long].collect()(0)
    val heavy = docs.withColumn("n_chars",
      when($"doc_id" === 7, lit(tw / 4)).otherwise($"n_chars"))
    val h = Sampling.systematicSample(heavy, Seq($"doc_id"), $"n_chars", n)
      .filter($"doc_id" === 7).select($"n_picks").as[Long].collect()
    assert(h.nonEmpty && h(0) > 1,
      s"a quarter-mass row must carry multiple epochs, got ${h.toSeq}")
  }

  test("DSIR importance weights separate a topic-defined target and ignore layout") {
    val toks = TextAnalysis.tokens($"text")
    val isTarget = array_contains(toks, "dup")
    val w = Sampling.importanceWeights(docs, isTarget)
    assert(w.count() == docs.count(), "a weight per document")
    // target docs carry the elevated 'dup' likelihood ratio: every target
    // doc must outweigh every non-target doc on this fixture
    val joined = docs.select($"doc_id", isTarget.as("t")).join(w, "doc_id")
    val minTarget = joined.filter($"t").agg(min($"weight")).as[Long].head()
    val maxOther = joined.filter(!$"t").agg(max($"weight")).as[Long].head()
    assert(minTarget > maxOther,
      s"target floor $minTarget must exceed non-target ceiling $maxOther")
    // deterministic under repartition
    val again = Sampling.importanceWeights(docs.repartition(13), isTarget)
      .collect().map(_.toString).sorted
    assert(w.collect().map(_.toString).sorted.sameElements(again))
  }
}
