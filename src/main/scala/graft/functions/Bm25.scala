package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the operational form of q250's
  * in-query retrieval ([[graft.LlmQueries.bm25Retrieval]]), mirroring
  * the [[SimilarityOps.buildIvfIndex]] discipline: pay the corpus
  * tokenization ONCE at build time, then serve every later query batch
  * from partition-pruned posting lists.
  *
  * Layout under `indexDir`:
  *   - `postings/` — (term, doc_id, tf) partitioned by
  *     `bucket = pmod(xxhash64(term), buckets)`: a query batch touches
  *     only its terms' hash buckets (static partition pruning), never
  *     the full posting set.
  *   - `terms/` — (term, df), same bucket partitioning. df lives HERE,
  *     not on the posting rows: a posting row never changes once
  *     written, so [[appendToBm25Index]] can add a document batch by
  *     APPENDING postings/doclens and rewriting only the term-level df
  *     table — denormalizing df onto postings would invalidate every
  *     existing posting of every term the new batch mentions.
  *   - `doclens/` — (doc_id, dl): one row per document.
  *   - `stats/` — one row (nd = document count, tt = total tokens,
  *     buckets = the build-time bucket count). `buckets` is part of the
  *     INDEX, not a query-time choice: readers and appenders recover it
  *     from here, because hashing terms into any other bucket count
  *     silently prunes valid postings and returns wrong rankings.
  *
  * Writes are NOT transactional (plain parquet overwrite/append): a
  * reader racing an append can see new postings with the old df table.
  * The engine's versioned formats are the fix when that matters — route
  * the four tables through `VersionedTable` commits and readers pin a
  * snapshot; this module keeps the layout/pruning mechanics separable.
  *
  * Scoring is q250's log-free integer-rational Okapi form (k1 = 6/5,
  * b = 3/4), floored at ppm scale through an exact 128-bit integer
  * muldiv ([[contribPpm]]) — bit-stable at any parallelism, identical
  * between the in-query and persisted paths (the spec proves equality,
  * and that build+append equals a from-scratch build of the union
  * corpus bit-for-bit).
  */
object Bm25 {

  /** Per-(term, doc) BM25 contribution in ppm, as a Column over columns
    * `tf`, `df`, `dl`, `nd`, `tt` — see q250's scaladoc for the
    * rational-arithmetic derivation. Shared by the in-query scorer and
    * the persisted-index scorer so the two paths cannot drift.
    *
    * Value: floor((2nd−2df+1) · 22 · tf · tt · 10⁶ ÷
    * ((2df+1) · (10·tf·tt + 3·tt + 9·dl·nd))) — exactly the DECIMAL(38,0)
    * spelling's result, but computed through [[graft.expressions.MulDiv128]]
    * so the per-candidate-row hot path stays in flat longs (the decimal
    * form allocated a BigDecimal per operation: 22.4 of 23.6 CPU-seconds
    * of the q252 scoring stage was GC). The divisor whose product can
    * outgrow a long at corpus scale is applied in two floor steps —
    * `floor(floor(x/D)/B) == floor(x/(D·B))` for positive integers — and
    * the first quotient is structurally bounded by `22/10 · a + 1`
    * because b = 22·tf·tt against D ≥ 10·tf·tt.
    *
    * Domain guard: the fast path's own FACTORS must fit a long BEFORE
    * MulDiv128's 128-bit product protects them — `22·tf·tt` and
    * `10·tf·tt + …` are out of long domain once tf·tt nears 2⁶³/22
    * (they would wrap silently with ANSI off, or throw with ANSI on —
    * either way wrong/failed; contrast PrefixSum, whose grand-total
    * safety argument leans on ANSI failing loudly). The guard is safe
    * ONLY because CaseWhen evaluates branches lazily: out-of-domain
    * rows never evaluate the fast branch's factor columns. A refactor
    * that hoists those factors out of the conditional (e.g. into a
    * preceding select) re-exposes every row to them and would wrap or
    * throw — keep them inside the `when`.
    * Rows beyond `tf·tt ≤ 10¹⁷` (a per-term-occurrence × corpus-tokens
    * product no real corpus-and-document pair approaches without both
    * being extreme) take the exact DECIMAL(38,0) branch instead — same
    * value, bounded cost, because the branch predicate keeps the decimal
    * arithmetic off the overwhelmingly common path. Both branches are
    * codegen'd; neither can return NULL in-domain, so the downstream
    * `sum("contrib")` never silently drops a term.
    */
  def contribPpm: Column = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    def e(c: Column) = toExpression(c.cast("bigint"))
    val a = (lit(2L) * col("nd") - lit(2L) * col("df") + lit(1L)) * lit(1000000L)
    val b = lit(22L) * col("tf") * col("tt")
    val d = lit(10L) * col("tf") * col("tt") + lit(3L) * col("tt") +
      lit(9L) * col("dl") * col("nd")
    val q = toColumn(graft.expressions.MulDiv128(e(a), e(b), e(d)))
    val fast = toColumn(graft.expressions.MulDiv128(toExpression(q), e(lit(1L)),
      e(lit(2L) * col("df") + lit(1L))))
    val exactWide = expr(
      """CAST(CAST(2 * nd - 2 * df + 1 AS DECIMAL(38,0))
        |  * 22 * tf * tt * 1000000
        |  div (CAST(2 * df + 1 AS DECIMAL(38,0))
        |       * (CAST(10 AS DECIMAL(38,0)) * tf * tt
        |          + CAST(3 AS DECIMAL(38,0)) * tt
        |          + CAST(9 AS DECIMAL(38,0)) * dl * nd))
        |  AS BIGINT)""".stripMargin)
    // overflow-free guard: a divided bound (tt ≤ 10¹⁷ div tf) never
    // forms the product it is guarding, stays in long arithmetic, and
    // errs only toward the exact branch on boundary rows. tf, dl ≥ 1 by
    // construction (term/document counts).
    when(expr("""tt <= 100000000000000000 div tf
                |  AND nd <= 100000000000000000 div dl
                |  AND nd <= 1000000000000""".stripMargin),
      fast).otherwise(exactWide)
  }

  private def bucketOf(term: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(term), lit(buckets))

  /** The build-time bucket count from an already-resolved `stats/`
    * DataFrame — one bounded driver scalar per open, like a format
    * version read. Takes the DataFrame (not a path) so callers resolve
    * stats/ ONCE for this and the nd/tt read; a second resolution costs
    * a directory listing + footer read + driver job per query. Fails
    * loudly on a pre-buckets-column index rather than guessing a count
    * that could silently mis-prune.
    */
  private def bucketsOf(st: DataFrame, indexDir: String): Int = {
    require(st.columns.contains("buckets"),
      s"$indexDir/stats has no 'buckets' column — rebuild the index " +
        "(bucket count is part of the on-disk layout)")
    st.select(col("buckets").cast("int")).head().getInt(0)
  }

  /** (doc_id, term, tf) for a document batch — the shared tokenize step. */
  private def termFreqs(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Tokenize `docs` and write the four index tables. One corpus scan
    * feeds postings, terms, document lengths and corpus stats; the
    * posting write shuffles by bucket only (≤ `buckets` output groups).
    */
  def buildBm25Index(docs: DataFrame, textCol: String, idCol: String,
      indexDir: String, buckets: Int = 64): Unit = {
    val tf = graft.CacheScope.persisted(termFreqs(docs, textCol, idCol))
    try {
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      dl.write.mode("overwrite").parquet(s"$indexDir/doclens")
      dl.agg(count(lit(1)).as("nd"), sum("dl").as("tt"))
        .withColumn("buckets", lit(buckets))
        .write.mode("overwrite").parquet(s"$indexDir/stats")
      tf.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("bucket", bucketOf(col("term"), buckets))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$indexDir/terms")
      tf.withColumn("bucket", bucketOf(col("term"), buckets))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$indexDir/postings")
    } finally tf.unpersist()
  }

  /** Add a document batch to an existing index: postings and doclens
    * APPEND (immutable rows — the incremental-ingest shape), while the
    * term-df and stats tables are re-aggregated and overwritten — both
    * are vocabulary-/constant-sized, a fraction of the posting volume
    * at any corpus scale. Query results after append are bit-identical
    * to a from-scratch build over the union corpus.
    *
    * The batch's doc_ids must be NEW: re-appending an id already in the
    * index double-counts it everywhere (duplicate doclens rows fan out
    * the candidate join; nd counts it twice) with no error — "union
    * corpus" above is a disjoint union. Upsert-style re-ingest belongs
    * to a VersionedTable MERGE in front of the index build, not here.
    */
  def appendToBm25Index(docs: DataFrame, textCol: String, idCol: String,
      indexDir: String): Unit = {
    val spark = docs.sparkSession
    // the bucket count is the INDEX's, never a caller choice: a batch
    // hashed into a different count would land postings in partitions
    // the pruned reader never probes (silent recall loss, no error).
    // One stats resolution serves this AND the nd/tt rollup below.
    val st = spark.read.parquet(s"$indexDir/stats")
    val buckets = bucketsOf(st, indexDir)
    val tf = graft.CacheScope.persisted(termFreqs(docs, textCol, idCol))
    try {
      val dl = graft.CacheScope.persisted(
        tf.groupBy("doc_id").agg(sum("tf").as("dl")))
      dl.write.mode("append").parquet(s"$indexDir/doclens")
      tf.withColumn("bucket", bucketOf(col("term"), buckets))
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$indexDir/postings")
      // term-level rewrite: old df + batch df. Read the OLD table fully
      // into the new aggregate before the overwrite truncates it —
      // parquet overwrite is not snapshot-isolated, so materialize first
      val merged = spark.read.parquet(s"$indexDir/terms")
        .select(col("term"), col("df"))
        .unionByName(tf.groupBy("term").agg(count(lit(1)).as("df")))
        .groupBy("term").agg(sum("df").as("df"))
        .withColumn("bucket", bucketOf(col("term"), buckets))
        .localCheckpoint(true)
      merged.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$indexDir/terms")
      val newStats = st.select("nd", "tt")
        .unionByName(dl.agg(count(lit(1)).as("nd"), sum("dl").as("tt")))
        .agg(sum("nd").as("nd"), sum("tt").as("tt"))
        .withColumn("buckets", lit(buckets))
        .localCheckpoint(true)
      newStats.write.mode("overwrite").parquet(s"$indexDir/stats")
    } finally tf.unpersist()
  }

  /** Score `queryTerms` (query_id, term) against a persisted index and
    * return the top-`k` (query_id, rank, neighbor_id, score_ppm) per
    * query. The probed bucket set is collected to the driver — bounded
    * by the bucket count, never by data — and applied as a literal
    * filter so BOTH the postings and terms scans statically prune to
    * the touched partition directories. `excludeSelf` drops
    * doc_id == query_id matches (the q250 convention where queries are
    * corpus documents).
    */
  def queryBm25Index(spark: SparkSession, indexDir: String,
      queryTerms: DataFrame, k: Int = 5,
      excludeSelf: Boolean = false): DataFrame = {
    val doclens = spark.read.parquet(s"$indexDir/doclens")
    // ONE stats resolution serves both reads: the bucket count (see
    // readBuckets — a caller-supplied count that disagreed with the
    // build pruned valid postings and returned wrong rankings with no
    // error) and the nd/tt scalars; resolving the same one-row table
    // twice paid a second listing + footer read + driver job per query
    val st = spark.read.parquet(s"$indexDir/stats")
    val buckets = bucketsOf(st, indexDir)
    val stats = st.select("nd", "tt")
    val qt = queryTerms.select(col("query_id"), col("term"))
    val probed = qt
      .select(bucketOf(col("term"), buckets).as("bucket"))
      .distinct().collect().map(_.getLong(0))
    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("bucket").isin(probed: _*))
    val terms = spark.read.parquet(s"$indexDir/terms")
      .filter(col("bucket").isin(probed: _*))
      .select("term", "df")
    val cand0 = qt.join(postings, "term").join(terms, "term")
    val cand = if (excludeSelf) cand0.filter(col("doc_id") =!= col("query_id"))
      else cand0
    cand
      .join(doclens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", contribPpm)
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score_ppm"))
      .groupBy(col("query_id"))
      // EXACT-Long ranking: the double-carrier top_k collapses scores
      // past 2^53 (at nd ~ 10⁹ docs a few rare-term ppm contributions
      // cross it), breaking the bit-stable ordering contribPpm's
      // 128-bit muldiv exists to guarantee
      .agg(TopK.top_k_exact(col("score_ppm"), col("doc_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col").getField("id").as("neighbor_id"),
        col("col").getField("score").cast("bigint").as("score_ppm"))
  }
}
