package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al. 2016) as distributed vocabulary passes.
  *
  * Everything operates on the VOCABULARY — the distinct
  * (symbol-sequence, count) table — never the raw token stream: BPE is
  * token-local, so (token, count) is sufficient statistics for every
  * pair count and merge, and a zipfian corpus collapses orders of
  * magnitude before the per-round transform (the 100 TB shape: one
  * corpus-sized aggregation up front, then rounds that touch only the
  * vocabulary). Mirrors the reference's tokenizer-adjacent text prep
  * (silver/silver_rx_claims_load.py:147-150 normalizes free-text the
  * same scan-local way).
  *
  * The trainer is a bounded driver loop: each round is one
  * count→argmax→merge job over the vocabulary, and the only driver
  * traffic is the single winning pair (a 1-row collect per round — the
  * watermark-read pattern, NOT data-sized). Determinism: pair counts
  * break ties by (l, r) lexicographically; merges apply greedy
  * left-to-right within a token (overlap eaten by the leftmost match),
  * so the learned table and the encoding are bit-stable across engines
  * and partitionings.
  */
object Bpe {

  /** (sym: array<string>, cnt) vocabulary of `textCol`'s
    * whitespace-lowercase tokens of length >= 2, symbols = characters.
    */
  def vocab(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(expr("regexp_extract_all(tok, '.', 0)").as("sym"), col("cnt"))

  /** Count-weighted adjacent-pair frequencies over a vocabulary;
    * self-pairs (l = r) excluded — a self-pair merge interacts with its
    * own overlap and the greedy semantics differ across tokenizers, so
    * the trainer never learns one.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(explode(zip_with(
        slice(col("sym"), lit(1), size(col("sym")) - 1),
        slice(col("sym"), lit(2), size(col("sym")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("cnt"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("cnt"))
      .filter(col("l") =!= col("r"))
      .groupBy("l", "r").agg(sum(col("cnt")).as("n"))

  /** Greedy left-to-right application of ONE merge (l, r) to every
    * vocabulary row. The pair rides a 1-row broadcast (columns `l`,`r`)
    * rather than string literals spliced into SQL — no escaping
    * hazards for arbitrary corpus characters. Every column except `sym`
    * passes through untouched, so carrier columns (a source tag, a
    * split flag) survive the rounds.
    */
  private def applyMerge(vocab: DataFrame, pair: DataFrame): DataFrame =
    vocab.crossJoin(broadcast(pair))
      // a GENUINELY sequential greedy fold, not a per-position CASE:
      // the stateless form corrupted SELF-pair merges (l = r) — in
      // "a a a" the middle symbol matched both "start of a pair" and
      // "consumed as the right half", duplicating it ("aaa" → two "aa"
      // tokens, content invented). The fold carries one pending symbol:
      // merge it with the current one when they form (l, r), else emit
      // it — greedy left-to-right for ANY pair, self or not (a merged
      // token never re-participates in the same pass, matching standard
      // BPE). The trainer never LEARNS self-pairs, but encode()/
      // applyMerges() accept external merge tables, which contain them.
      // Scan-local over word-length arrays — same shape as before.
      .withColumn("sym", expr(
        """aggregate(
          |  sym,
          |  named_struct('out', cast(array() as array<string>),
          |               'pend', cast(null as string)),
          |  (acc, x) -> CASE
          |    WHEN acc.pend IS NULL THEN named_struct('out', acc.out, 'pend', x)
          |    WHEN acc.pend = l AND x = r
          |      THEN named_struct('out', array_append(acc.out, concat(l, r)),
          |                        'pend', cast(null as string))
          |    ELSE named_struct('out', array_append(acc.out, acc.pend),
          |                      'pend', x) END,
          |  acc -> CASE WHEN acc.pend IS NULL THEN acc.out
          |    ELSE array_append(acc.out, acc.pend) END)""".stripMargin))
      .drop("l", "r")

  /** Apply a learned merge table to ANY (sym, …) vocabulary-shaped
    * DataFrame in rank order, preserving extra columns — the serving-
    * time path [[encode]] wraps, exposed for per-slice evaluation
    * (e.g. fertility by source). The table is collected driver-side
    * (vocabulary-budget-sized, never data-sized).
    *
    * Contract: `sym` elements are non-null and `rank` values unique.
    * A NULL element is SILENTLY dropped by the merge fold (the
    * null-pending state reads as "nothing buffered", so the element is
    * never emitted); duplicate ranks apply in nondeterministic order.
    * [[vocab]]-produced input satisfies both by construction — external
    * tables must too.
    */
  def applyMerges(vocab: DataFrame, mergeTable: DataFrame): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val ordered = mergeTable.select("rank", "l", "r")
      .collect().sortBy(_.getInt(0))
      .map(row => (row.getString(1), row.getString(2)))
    // a LAZY persist chain: caches populate bottom-up when the caller's
    // one action runs, so no per-rank job is paid — the trade is that
    // every rank's (word-vocabulary-sized, not corpus-sized) snapshot
    // is live until the harness drain; train() frees per round instead
    // because its per-round argmax action makes that possible for free
    ordered.foldLeft(graft.CacheScope.persisted(vocab)) { (v, lr) =>
      graft.CacheScope.persisted(applyMerge(v, Seq(lr).toDF("l", "r")))
    }
  }

  /** Train `merges` rounds to a merge table (rank, l, r), rank 1-based
    * in learned order. Each round persists the merged vocabulary (the
    * higher-order transform re-evaluates per reference if left lazy —
    * the q161 lesson) and unpersists the previous round's.
    */
  def train(corpus: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var v = graft.CacheScope.persisted(vocab(corpus, textCol))
    // the round-(k-1) vocabulary: freed as soon as round k's cache is
    // populated (the pairCounts action below computes THROUGH it), so
    // storage holds two vocabulary snapshots at any time — not one per
    // merge (CacheScope only registers for the END-of-query drain;
    // within a 1000-merge training run that accumulation is the leak)
    var prev: DataFrame = null
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var k = 0
    var dry = false
    while (k < merges && !dry) {
      // ONE bounded driver row per round: the argmax pair. This action
      // materializes v's cache — v's predecessor is dead after it.
      val top = pairCounts(v)
        .orderBy(col("n").desc, col("l"), col("r")).limit(1)
        .select("l", "r").collect()
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (top.isEmpty) dry = true // vocabulary fully merged — stop early
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        k += 1
        learned += ((k, l, r))
        prev = v
        v = graft.CacheScope.persisted(
          applyMerge(v, Seq((l, r)).toDF("l", "r")))
      }
    }
    learned.toSeq.toDF("rank", "l", "r")
  }

  /** Apply a learned merge table ((rank, l, r) rows, collected — the
    * table is vocabulary-budget-sized, never data-sized) to a corpus in
    * rank order; returns the encoded vocabulary (sym, cnt).
    */
  def encode(corpus: DataFrame, textCol: String,
      mergeTable: DataFrame): DataFrame =
    applyMerges(vocab(corpus, textCol), mergeTable)
}
