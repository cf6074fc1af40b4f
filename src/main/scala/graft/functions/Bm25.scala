package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the operational form of q250's
  * in-query retrieval ([[graft.LlmQueries.bm25Retrieval]]), mirroring
  * the [[SimilarityOps.buildIvfIndex]] discipline: pay the corpus
  * tokenization ONCE at build time, then serve every later query batch
  * from partition-pruned posting lists.
  *
  * Layout under `indexDir`:
  *   - `postings/` — (term, doc_id, tf, df) partitioned by
  *     `bucket = pmod(xxhash64(term), buckets)`: a query batch touches
  *     only its terms' hash buckets (static partition pruning), never
  *     the full posting set. df is DENORMALIZED onto each posting row
  *     so scoring needs no second term-keyed read.
  *   - `doclens/` — (doc_id, dl): one row per document.
  *   - `stats/` — one row (nd = document count, tt = total tokens).
  *
  * Scoring is q250's log-free integer-rational Okapi form (k1 = 6/5,
  * b = 3/4), floored at ppm scale through a DECIMAL(38,0) carrier —
  * bit-stable at any parallelism, identical between the in-query and
  * persisted paths (the spec proves equality).
  */
object Bm25 {

  /** Per-(term, doc) BM25 contribution in ppm, as a SQL expression over
    * columns `tf`, `df`, `dl`, `nd`, `tt` — see q250's scaladoc for the
    * rational-arithmetic derivation. Shared by the in-query scorer and
    * the persisted-index scorer so the two paths cannot drift.
    */
  val contribPpmSql: String =
    """CAST(CAST(2 * nd - 2 * df + 1 AS DECIMAL(38,0))
      |  * 22 * tf * tt * 1000000
      |  div (CAST(2 * df + 1 AS DECIMAL(38,0))
      |       * (CAST(10 AS DECIMAL(38,0)) * tf * tt
      |          + CAST(3 AS DECIMAL(38,0)) * tt
      |          + CAST(9 AS DECIMAL(38,0)) * dl * nd))
      |  AS BIGINT)""".stripMargin

  /** Tokenize `docs` and write the three index tables. One corpus scan
    * feeds postings, document lengths and corpus stats; the posting
    * write shuffles by bucket only (≤ `buckets` output groups).
    */
  def buildBm25Index(docs: DataFrame, textCol: String, idCol: String,
      indexDir: String, buckets: Int = 64): Unit = {
    val tf = graft.CacheScope.persisted(docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    try {
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      dl.write.mode("overwrite").parquet(s"$indexDir/doclens")
      // stats re-read from the WRITTEN doclens: one row, and the write
      // above already materialized the aggregate's input
      dl.agg(count(lit(1)).as("nd"), sum("dl").as("tt"))
        .write.mode("overwrite").parquet(s"$indexDir/stats")
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(dfreq, "term")
        .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets)))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$indexDir/postings")
    } finally {
      // build is a standalone lifecycle: free the tokenization cache
      // without waiting for a harness drain
      tf.unpersist()
    }
  }

  /** Score `queryTerms` (query_id, term) against a persisted index and
    * return the top-`k` (query_id, rank, neighbor_id, score_ppm) per
    * query. The probed bucket set is collected to the driver — bounded
    * by the bucket count, never by data — and applied as a literal
    * filter so the postings scan statically prunes to the touched
    * partition directories. `excludeSelf` drops doc_id == query_id
    * matches (the q250 convention where queries are corpus documents).
    */
  def queryBm25Index(spark: SparkSession, indexDir: String,
      queryTerms: DataFrame, k: Int = 5, buckets: Int = 64,
      excludeSelf: Boolean = false): DataFrame = {
    val postings = spark.read.parquet(s"$indexDir/postings")
    val doclens = spark.read.parquet(s"$indexDir/doclens")
    val stats = spark.read.parquet(s"$indexDir/stats")
    val qt = queryTerms.select(col("query_id"), col("term"))
    val probed = qt
      .select(pmod(xxhash64(col("term")), lit(buckets)).as("bucket"))
      .distinct().collect().map(_.getLong(0))
    val cand0 = qt
      .join(postings.filter(col("bucket").isin(probed: _*)), "term")
    val cand = if (excludeSelf) cand0.filter(col("doc_id") =!= col("query_id"))
      else cand0
    cand
      .join(doclens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(contribPpmSql))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score_ppm"))
      .groupBy(col("query_id"))
      .agg(TopK.top_k(col("score_ppm").cast("double"), col("doc_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col").getField("id").as("neighbor_id"),
        col("col").getField("sim").cast("bigint").as("score_ppm"))
  }
}
