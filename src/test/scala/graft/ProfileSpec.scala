package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ad-hoc stage timing at sf0.1 (not a correctness spec). */
class ProfileSpec extends SparkSpec {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  // ignored in the default run (timing aid, not a correctness gate):
  // sbt "testOnly graft.ProfileSpec" and flip to test(...) to use
  ignore("minhash stage breakdown at sf0.1") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val sh = docs.select(col("doc_id"),
      functions.TextAnalysis.shingles(functions.TextAnalysis.tokens(col("text")), 5).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("sh persist fill")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val sigs = ex.groupBy(col("doc_id")).agg(
      min(md5(concat(lit("0|"), col("g")))).as("sig_0"),
      (1 until 16).map(i => min(md5(concat(lit(s"$i|"), col("g")))).as(s"sig_$i")): _*)
    val bands = sigs.select(Seq(col("doc_id")) ++ functions.DedupOps.lshBands(16, 4): _*)
    val exploded = bands.select(col("doc_id"), posexplode(
      array((0 until 4).map(b => col(s"band_$b")): _*)))
      .toDF("doc_id", "band_idx", "band_hash")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("exploded bands fill")(exploded.count())
    val cand = exploded.as("a").join(exploded.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cand self-join")(cand.count())
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    val withA = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .join(broadcast(cand), "doc_a")
    val verified = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      .join(broadcast(withA), "doc_b")
      .withColumn("jaccard", inter.cast("double") / union)
      .filter(col("jaccard") >= 0.6)
    time("verify")(verified.count())
    time("full q27 fresh persists")(LlmQueries.minhashLsh(spark, "/root/testdata/sf0.1").count())
    sh.unpersist(); exploded.unpersist()
  }
}
