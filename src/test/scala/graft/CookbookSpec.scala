package graft

import org.apache.spark.sql.functions._

import graft.functions.{DedupOps, Packing, Sampling, TextAnalysis}
import graft.operators.ConnectedComponents

/** Runs the README "Cookbook" pipeline verbatim (curate → dedup →
  * decontaminate → select → pack) on the fixture corpus, so the
  * documentation stays compile- and semantics-checked: if an API in the
  * snippet drifts, this spec breaks before a user does.
  */
class CookbookSpec extends SparkSpec {
  import spark.implicits._

  test("the README cookbook pipeline runs end-to-end with sane invariants") {
    val docs = Tables.documents(spark, sf)
    val evalDocs = docs.filter($"doc_id" % 7 === 0)

    // 1. near-dup clusters → one representative per cluster
    val pairs = DedupOps.minhashLshPairs(docs, "text", "doc_id")
    val comp = ConnectedComponents.components(pairs, "doc_a", "doc_b")
    val deduped = docs.join(comp, docs("doc_id") === comp("id"), "left")
      .where(comp("id").isNull || comp("id") === comp("component"))
    val nDeduped = deduped.count()
    assert(nDeduped <= docs.count())
    assert(nDeduped > 0)

    // 2. decontaminate against the eval split
    val clean = deduped.join(
      DedupOps.crossCorpusOverlap(deduped, evalDocs, "text", "doc_id")
        .select(col("train_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    assert(clean.count() <= nDeduped)

    // 3. target-distribution weighting
    val weighted = clean.join(
      Sampling.importanceWeights(clean, array_contains(
        TextAnalysis.tokens(col("text")), "dup")), "doc_id")
    assert(weighted.columns.contains("weight"))
    assert(weighted.count() > 0)

    // 4. pack into fixed-capacity sequences
    val packed = Packing.packSequences(weighted, col("doc_id"),
      size(TextAnalysis.tokens(col("text"))), capacity = 4096)
    assert(packed.columns.contains("pack_id"))
    // every surviving doc lands in exactly one pack
    assert(packed.count() == weighted.count())
    graft.CacheScope.drain(spark)
  }
}
