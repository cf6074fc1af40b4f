package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.Fnv64
import graft.functions.{CountMin, DedupOps, Multimodal, SimilarityOps, TextAnalysis}

/** LLM-data-pipeline query registry (q21–q32): deduplication (exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity
  * search (brute-force + IVF ANN), text analysis (token stats, quality,
  * language ID, fingerprints) and multimodal plumbing — each wired to a
  * DuckDB oracle computing the identical md5-based formulas.
  *
  * The fixtures contain planted near-duplicate documents (Jaccard ≈ 0.99
  * pairs), so near-dup queries return real detections; exact-dup and
  * embedding-dup queries synthesize duplicates deterministically in-query
  * (union of derived copies), since the corpus has none.
  */
object LlmQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)

  // shared oracle CTEs: whitespace tokens and distinct 5-gram shingles
  private[graft] val tokShSql =
    """tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 5
      |         THEN list_distinct(list_transform(range(1, len(t) - 3),
      |                            i -> array_to_string(t[i:i+4], ' ')))
      |         ELSE [] END AS sh
      |  FROM tok
      |)""".stripMargin

  // ------------------------------------------------------------ dedup

  /** q21 — exact dedup by normalized-content hash; duplicate feed
    * simulated in-query (every 10th doc re-ingested under a new id).
    */
  def dedupExact(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    val copies = base.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
    DedupOps.exactDedup(base.unionByName(copies), "text", "doc_id")
      .orderBy("fp")
  }

  val dedupExactOracle: String =
    """WITH feed AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      |)
      |SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |  min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin

  /** q26 — exact n-gram Jaccard near-dup pairs via the inverted shingle
    * index (finds the corpus's planted near-duplicates).
    */
  def ngramJaccard(s: SparkSession, d: String): DataFrame =
    DedupOps.ngramJaccardPairs(docs(s, d), "text", "doc_id")
      .orderBy("doc_a", "doc_b")

  private val jaccardVerifySql =
    """j AS (
      |  SELECT doc_a, doc_b,
      |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      |      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
      |  FROM cand JOIN sh sa ON doc_a = sa.doc_id JOIN sh sb ON doc_b = sb.doc_id
      |)
      |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM j
      |WHERE jaccard >= 0.6 ORDER BY doc_a, doc_b""".stripMargin

  val ngramJaccardOracle: String =
    s"""WITH $tokShSql, ex AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |), $jaccardVerifySql""".stripMargin

  /** q104 — the q26 result re-derived through PPJoin prefix filtering
    * ([[DedupOps.ppjoinPairs]]): candidates from each document's
    * globally-rarest shingles only, plus the length filter. The scheme
    * is LOSSLESS, so the oracle is q26's VERBATIM — a hash match proves
    * two independent candidate generators (full inverted index, prefix
    * index) converge on the identical verified pair set.
    */
  def ppjoinNearDup(s: SparkSession, d: String): DataFrame =
    DedupOps.ppjoinPairs(docs(s, d), "text", "doc_id")
      .orderBy("doc_a", "doc_b")

  /** q27 — MinHash+LSH near-dup pairs: 16 string-min signatures over
    * 5-gram shingles, 4 bands × 4 rows, bucket join, exact-Jaccard
    * verification.
    */
  def minhashLsh(s: SparkSession, d: String): DataFrame =
    DedupOps.minhashLshPairs(docs(s, d), "text", "doc_id")
      .orderBy("doc_a", "doc_b")

  /** CTE chain `exg … band(doc_id, band_idx, band_hash)` — the MinHash
    * signature + LSH band pipeline over `sh`, shared by the q27 self-join
    * oracle and the q73 cross-corpus oracle. Mirrors
    * [[DedupOps.lshBandTable]] formula for formula.
    */
  private val minhashBandSql: String = {
    val p = graft.functions.DedupOps.KmPrime
    val sigCols = (0 until 16).map(i =>
      s"min((h1 + $i * h2) % $p) AS sig_$i").mkString(",\n    ")
    val bandRows = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => s"sig_${b * 4 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band_idx, md5(concat_ws('|', $cols)) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""exg AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), hh AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % $p AS h1,
       |    CAST('0x' || substr(md5(g), 17, 15) AS BIGINT) % $p AS h2
       |  FROM exg
       |), sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hh GROUP BY doc_id
       |), band AS (
       |  $bandRows
       |)""".stripMargin
  }

  val minhashLshOracle: String =
    s"""WITH $tokShSql, $minhashBandSql, cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM band a JOIN band b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id
       |), $jaccardVerifySql""".stripMargin

  /** q28 — SimHash near-dup pairs: 32-bit signatures from shingle md5
    * nibbles, 8-bit chunk blocking, hamming ≤ 3.
    */
  def simhash(s: SparkSession, d: String): DataFrame =
    DedupOps.simhashPairs(
      DedupOps.simhashSignatures(docs(s, d), "text", "doc_id"))
      .orderBy("doc_a", "doc_b")

  /** CTE list ending in `cand(doc_a, doc_b, sig_a, sig_b)` — the SimHash
    * candidate pipeline, shared by the q28 oracle and the q55 cluster
    * oracle built on its pairs.
    */
  private val simhashCandSql: String = {
    // mirror of DedupOps.simhashSignatures: ONE hex→int conversion of
    // the digest's first 8 chars, then bit i at shift 4*(7-i/4)+i%4
    val votes = (0 until 32).map { i =>
      val bit = s"((v // ${1L << (4 * (7 - i / 4) + i % 4)}) % 2)"
      s"sum($bit * 2 - 1) AS s_$i"
    }.mkString(",\n    ")
    val sig = (0 until 32).map(i =>
      s"CASE WHEN s_$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END").mkString(" + ")
    val chunks = (0 until 4).map(j =>
      s"SELECT doc_id, simhash, $j AS chunk_idx, (simhash // CAST(${1L << (8 * j)} AS BIGINT)) % 256 AS chunk_val FROM sigs"
    ).mkString("\n  UNION ALL\n  ")
    s"""$tokShSql, exg AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), ex AS (
       |  SELECT doc_id, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS v FROM exg
       |), votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM ex GROUP BY doc_id
       |), sigs AS (
       |  SELECT doc_id, $sig AS simhash FROM votes
       |), chunks AS (
       |  $chunks
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.simhash AS sig_a, b.simhash AS sig_b
       |  FROM chunks a JOIN chunks b
       |    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       |   AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  val simhashOracle: String =
    s"""WITH $simhashCandSql
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q55 — near-duplicate CLUSTERS: SimHash pairs lifted to connected
    * components ([[graft.operators.ConnectedComponents]], alternating
    * large-star/small-star), the step that lets curation keep exactly
    * one canonical document per duplicate group instead of reasoning
    * about pairs. `component_id` is the minimum doc_id in the cluster;
    * the oracle recomputes it with a recursive min-label CTE.
    */
  def dupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = DedupOps.simhashPairs(
      DedupOps.simhashSignatures(docs(s, d), "text", "doc_id"))
    val cc = graft.operators.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
    val sizes = cc.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "component")
      .select(col("id").as("doc_id"), col("component").as("component_id"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** q91 — canonical document selection, the step AFTER clustering
    * (q55): per near-dup cluster keep the member with the most tokens
    * (the standard keep-longest curation heuristic; richest version of
    * the duplicated content), doc id as the deterministic tie-break —
    * an integer argmax, so no float crosses the engine boundary. One
    * ranked window per component (WindowGroupLimit-shaped) on top of
    * the connected-components output.
    */
  def canonicalDocs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = DedupOps.simhashPairs(
      DedupOps.simhashSignatures(docs(s, d), "text", "doc_id"))
    val cc = graft.operators.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component").as("component_id"))
    val toks = docs(s, d).select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens"))
    val w = Window.partitionBy(col("component_id"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    cc.join(toks, "doc_id")
      .withColumn("rk", row_number().over(w))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component_id"))))
      .filter(col("rk") === 1)
      .select(col("component_id"), col("doc_id").as("keep_doc_id"),
        col("n_tokens").as("keep_n_tokens"), col("cluster_size"),
        (col("cluster_size") - 1).as("n_removed"))
      .orderBy("component_id")
  }

  /** Shared CTE chain ending in `cc(doc_id, component_id)`: SimHash
    * candidate pairs → hamming gate → undirected closure → components.
    * Callers must open with `WITH RECURSIVE`.
    */
  private[graft] val simhashCcSql: String =
    s"""$simhashCandSql, pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |), e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), reach(id, comp) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id
       |), cc AS (
       |  SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id
       |)""".stripMargin

  val canonicalDocsOracle: String =
    s"""WITH RECURSIVE $simhashCandSql, pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |), e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), reach(id, comp) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id
       |), cc AS (
       |  SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id
       |), tk AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents
       |), ranked AS (
       |  SELECT cc.component_id, cc.doc_id, tk.n_tokens,
       |    row_number() OVER (PARTITION BY cc.component_id
       |      ORDER BY tk.n_tokens DESC, cc.doc_id) AS rk,
       |    count(*) OVER (PARTITION BY cc.component_id) AS cluster_size
       |  FROM cc JOIN tk USING (doc_id)
       |)
       |SELECT component_id, doc_id AS keep_doc_id,
       |  n_tokens AS keep_n_tokens, cluster_size, cluster_size - 1 AS n_removed
       |FROM ranked WHERE rk = 1 ORDER BY component_id""".stripMargin

  val dupClustersOracle: String =
    s"""WITH RECURSIVE $simhashCandSql, pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |), e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), reach(id, comp) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id
       |), cc AS (
       |  SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id
       |), sz AS (
       |  SELECT component_id, count(*) AS cluster_size FROM cc GROUP BY 1
       |)
       |SELECT cc.doc_id, cc.component_id,
       |  CAST(sz.cluster_size AS BIGINT) AS cluster_size
       |FROM cc JOIN sz USING (component_id) ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ text analysis

  /** q22 — document fingerprints: exact md5 of normalized text + min
    * shingle hash (rolling-fingerprint family). The min-shingle hash is
    * the native single-pass [[graft.expressions.MinShingleHash]] — no
    * shingle array, no explode, no aggregation shuffle; the query is a
    * pure scan. The interpreted-HOF form
    * (`TextAnalysis.minShingleFingerprint`) computes the same value an
    * order of magnitude slower and is kept as the spec's reference
    * implementation. NULL for short documents (< n tokens), as the
    * oracle's left join yields.
    */
  def fingerprints(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"),
        TextAnalysis.minShingleHash(col("text"), 5).as("min_shingle_fp"))
      .orderBy("doc_id")

  val fingerprintsOracle: String =
    s"""WITH $tokShSql
       |SELECT d.doc_id,
       |  md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS fingerprint,
       |  list_min(list_transform(sh.sh, s -> md5(s))) AS min_shingle_fp
       |FROM documents d JOIN sh ON d.doc_id = sh.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** q23 — token counting: whitespace tokens, BPE-ish subword proxy
    * tokens, mean token length.
    */
  def tokenStats(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs(s, d).select(
      col("doc_id"),
      size(toks).as("n_ws_tokens"),
      size(TextAnalysis.bpeTokens(col("text"))).as("n_bpe_tokens"),
      (aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
        .cast("double") / size(toks)).as("avg_token_len"))
      .orderBy("doc_id")
  }

  val tokenStatsOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t,
      |         regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS bpe
      |  FROM documents
      |)
      |SELECT doc_id, CAST(len(t) AS INTEGER) AS n_ws_tokens,
      |  CAST(len(bpe) AS INTEGER) AS n_bpe_tokens,
      |  CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) / len(t) AS avg_token_len
      |FROM tok ORDER BY doc_id""".stripMargin

  /** q24 — document quality scoring: length, punctuation ratio, stopword
    * ratio, and a linear composite score (no transcendentals — portable
    * bit-exact arithmetic).
    */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val nToks = size(toks)
    val punct = size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0)))
    val stopHits = TextAnalysis.stopwordHits(toks, TextAnalysis.stopwords("en"))
    docs(s, d).select(
      col("doc_id"), col("n_chars"),
      nToks.as("n_tokens"),
      (punct.cast("double") / col("n_chars")).as("punct_ratio"),
      (stopHits.cast("double") / nToks).as("stopword_ratio"))
      .withColumn("quality_score",
        round(least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.4 +
          col("stopword_ratio") * 0.4 + (lit(1.0) - col("punct_ratio")) * 0.2, 6))
      .orderBy("doc_id")
  }

  val textQualityOracle: String =
    """WITH m AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(string_split_regex(lower(text), '\s+')) AS INTEGER) AS n_tokens,
      |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / n_chars AS punct_ratio,
      |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
      |         t -> t IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE)
      |      / len(string_split_regex(lower(text), '\s+')) AS stopword_ratio
      |  FROM documents
      |)
      |SELECT doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio,
      |  round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
      |        + stopword_ratio * 0.4 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
      |FROM m ORDER BY doc_id""".stripMargin

  /** q25 — n-gram-heuristic language ID: stopword-hit votes per language,
    * first-wins tie-break in a fixed language order.
    */
  def langId(s: SparkSession, d: String): DataFrame =
    langPredictions(s, d).orderBy("doc_id")

  /** The q25 stopword-vote classifier per doc (shared with the q162/q163
    * evaluation queries): hits per language, labeled + predicted class.
    */
  private def langPredictions(s: SparkSession, d: String): DataFrame = {
    // explode + conditional-sum instead of 4 higher-order filter() calls:
    // HOFs evaluate interpreted (outside codegen), so counting votes in a
    // single codegen'd aggregation over exploded tokens is ~10x faster
    // and shuffles once on doc_id
    val ex = docs(s, d).select(col("doc_id"), col("lang").as("labeled_lang"),
      explode(TextAnalysis.tokens(col("text"))).as("t"))
    val hits = Seq("en", "de", "es", "fr").map(l =>
      sum(when(col("t").isin(TextAnalysis.stopwords(l): _*), 1).otherwise(0))
        .cast("int").as(s"hits_$l"))
    val base = ex.groupBy(col("doc_id"))
      .agg(first(col("labeled_lang")).as("labeled_lang"), hits: _*)
    val predicted = when(
      col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_es") &&
        col("hits_en") >= col("hits_fr") && col("hits_en") > 0, lit("en"))
      .when(col("hits_de") >= col("hits_es") && col("hits_de") >= col("hits_fr") &&
        col("hits_de") > 0, lit("de"))
      .when(col("hits_es") >= col("hits_fr") && col("hits_es") > 0, lit("es"))
      .when(col("hits_fr") > 0, lit("fr"))
      .otherwise(lit("unknown"))
    base.withColumn("predicted_lang", predicted)
  }

  val langIdOracle: String = {
    def hits(l: String) = {
      val set = TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN ($set))) AS INTEGER)"
    }
    s"""WITH m AS (
       |  SELECT doc_id, lang AS labeled_lang,
       |    ${hits("en")} AS hits_en, ${hits("de")} AS hits_de,
       |    ${hits("es")} AS hits_es, ${hits("fr")} AS hits_fr
       |  FROM documents
       |)
       |SELECT doc_id, labeled_lang, hits_en, hits_de, hits_es, hits_fr,
       |  CASE WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
       |       WHEN hits_de >= hits_es AND hits_de >= hits_fr AND hits_de > 0 THEN 'de'
       |       WHEN hits_es >= hits_fr AND hits_es > 0 THEN 'es'
       |       WHEN hits_fr > 0 THEN 'fr'
       |       ELSE 'unknown' END AS predicted_lang
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------- similarity search

  /** q29 — brute-force cosine top-k: 10 query vectors against the whole
    * corpus, top-5 each.
    */
  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    SimilarityOps.bruteForceTopK(q, e, 5).orderBy("query_id", "rank")
  }

  val cosineTopKOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id < 10
      |), s AS (
      |  SELECT query_id, vec_id,
      |    round(list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])), 4) AS sim
      |  FROM q, embeddings WHERE vec_id <> query_id
      |), r AS (
      |  SELECT query_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM s
      |)
      |SELECT query_id, rank, vec_id AS neighbor_id, sim FROM r
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** q93 — curation funnel observability: per source, how many documents
    * survive each pipeline stage — raw → length gate (≥50 tokens) →
    * exact dedup (first doc per fingerprint wins) → decontamination
    * (train docs overlapping the q44 eval split drop). The counts are
    * the report every curation run publishes; each stage reuses the
    * exact formula its standalone query verifies (q23/q21/q44), so a
    * hash match proves the COMPOSITION, not just the parts. All stages
    * are scan-shaped or key-equality joins; the funnel adds one
    * aggregation at the end.
    */
  def curationFunnel(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    // drop deduped TRAIN docs contaminated against the q44 eval split
    val contaminatedTrain = DedupOps.crossCorpusOverlap(
        all.filter(col("doc_id") % 7 =!= 0), all.filter(col("doc_id") % 7 === 0),
        "text", "doc_id", shingleN = 5, threshold = 0.6)
      .select(col("train_id").as("doc_id")).distinct()
    // EVERY funnel stage as a flag on ONE pass over the corpus (the
    // per-stage groupBy-union form re-scanned and re-aggregated the
    // corpus once per stage for a four-rows-per-source answer).
    // "first gated occurrence per fingerprint" without a separate
    // filtered frame: the running count of GATED rows in (fp, doc_id)
    // order is 1 exactly on the row the old rank-1-of-gated kept.
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val flags = all
      .withColumn("gated", size(TextAnalysis.tokens(col("text"))) >= 50)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("dedup_keep", col("gated") &&
        sum(when(col("gated"), 1L).otherwise(0L)).over(win) === 1)
      .join(contaminatedTrain.withColumn("contam", lit(true)),
        Seq("doc_id"), "left")
      .withColumn("clean", col("dedup_keep") && col("doc_id") % 7 =!= 0 &&
        coalesce(col("contam"), lit(false)) === false)
    flags.groupBy(col("source")).agg(
        count(lit(1)).as("n1"),
        sum(when(col("gated"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("dedup_keep"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("clean"), 1L).otherwise(0L)).as("n4"))
      .selectExpr("source", """stack(4,
        '1_raw', n1, '2_gated', n2,
        '3_deduped', n3, '4_clean_train', n4) AS (stage, n_docs)""")
      // the old per-stage groupBy emitted NO row for a (source, stage)
      // with zero survivors; the flagged form must drop those too
      .filter(col("n_docs") > 0)
      .select(col("source"), col("stage"), col("n_docs"))
      .orderBy("source", "stage")
  }

  val curationFunnelOracle: String =
    s"""WITH $tokShSql, gated AS (
       |  SELECT d.* FROM documents d JOIN tok USING (doc_id)
       |  WHERE len(tok.t) >= 50
       |), deduped AS (
       |  SELECT * FROM (
       |    SELECT g.*, row_number() OVER (
       |      PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
       |      ORDER BY doc_id) AS rk
       |    FROM gated g)
       |  WHERE rk = 1
       |), ex AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), hot AS (
       |  -- mirror crossCorpusOverlap's MaxShingleDocFreq candidate cap
       |  SELECT g FROM ex GROUP BY g
       |  HAVING count(*) > ${graft.functions.DedupOps.MaxShingleDocFreq}
       |), contaminated AS (
       |  SELECT DISTINCT t.doc_id
       |  FROM ex t JOIN ex e ON t.g = e.g
       |  JOIN sh st ON t.doc_id = st.doc_id
       |  JOIN sh se ON e.doc_id = se.doc_id
       |  WHERE t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
       |    AND t.g NOT IN (SELECT g FROM hot)
       |    AND CAST(len(list_intersect(st.sh, se.sh)) AS DOUBLE)
       |      / (len(st.sh) + len(se.sh) - len(list_intersect(st.sh, se.sh)))
       |      >= 0.6
       |), clean AS (
       |  SELECT * FROM deduped
       |  WHERE doc_id % 7 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
       |)
       |SELECT source, '1_raw' AS stage, count(*) AS n_docs
       |FROM documents GROUP BY source
       |UNION ALL SELECT source, '2_gated', count(*) FROM gated GROUP BY source
       |UNION ALL SELECT source, '3_deduped', count(*) FROM deduped GROUP BY source
       |UNION ALL SELECT source, '4_clean_train', count(*) FROM clean GROUP BY source
       |ORDER BY source, stage""".stripMargin

  /** q90 — REAL image decode under the oracle: deterministic 4×4 PPM
    * images (pixel bytes re-derivable from md5, so DuckDB can replay
    * them) are encoded to the netpbm wire format and parsed back by
    * [[Multimodal.MediaCodec.decodePpm]] before quadrant-mean pooling —
    * a hash match certifies an actual codec round trip, retiring the
    * multimodal path's "decode is a stub" caveat for formats the JVM
    * can parse unaided.
    */
  def imageFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.imageFeatures(s, docs(s, d))
      .orderBy("asset_id", "quadrant", "channel")

  val imageFeaturesOracle: String =
    """WITH j AS (
      |  SELECT doc_id, u.j AS j FROM documents, UNNEST(range(48)) AS u(j)
      |), b AS (
      |  SELECT doc_id, j,
      |    CAST('0x' || substr(md5('img-v1|' || CAST(doc_id AS VARCHAR)
      |      || '|' || CAST(j // 16 AS VARCHAR)), (j % 16) * 2 + 1, 2)
      |      AS BIGINT) AS v
      |  FROM j
      |), px AS (
      |  SELECT doc_id, j // 3 AS p, j % 3 AS c, v FROM b
      |), q AS (
      |  SELECT doc_id,
      |    ((p // 4) // 2) * 2 + ((p % 4) // 2) AS quadrant,
      |    c AS channel, avg(v) AS mean_value
      |  FROM px GROUP BY 1, 2, 3
      |)
      |SELECT doc_id AS asset_id, CAST(quadrant AS BIGINT) AS quadrant,
      |  CAST(channel AS BIGINT) AS channel, mean_value,
      |  CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height
      |FROM q ORDER BY asset_id, quadrant, channel""".stripMargin

  /** q98 — the q90 raster routed through a REAL `javax.imageio` PNG
    * round trip ([[Multimodal.pngCodecFeatures]]): an actual PNG payload
    * is encoded and decoded by the JVM's codec on the hot path. PNG is
    * lossless, so the q90 oracle math applies verbatim — a hash match
    * certifies that TWO independent codecs (netpbm parser, ImageIO PNG)
    * agree with the SQL-replayed pixel bytes.
    */
  def pngCodecFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.pngCodecFeatures(s, docs(s, d))
      .orderBy("asset_id", "quadrant", "channel")

  val pngCodecFeaturesOracle: String = imageFeaturesOracle

  /** q99 — REAL JPEG round trip ([[Multimodal.jpegCodecRoundtrip]]):
    * lossy codec, so the oracle pins the decoded geometry exactly and
    * the reconstruction error to a bound (uniform-color source block →
    * pure DC energy → quality-0.95 quantization error ≤ 12 on every
    * pixel). Proves the encoder+decoder actually ran — a stub or a
    * wrong-colorspace decode lands far outside the bound.
    */
  def jpegCodecRoundtrip(s: SparkSession, d: String): DataFrame =
    Multimodal.jpegCodecRoundtrip(s, docs(s, d)).orderBy("asset_id")

  val jpegCodecRoundtripOracle: String =
    """SELECT doc_id AS asset_id, CAST(8 AS BIGINT) AS width,
      |  CAST(8 AS BIGINT) AS height, true AS within_tol
      |FROM documents ORDER BY asset_id""".stripMargin

  /** q106 — REAL audio decode under the oracle
    * ([[Multimodal.audioFeatures]]): deterministic 16-bit PCM clips are
    * encoded to actual RIFF/WAVE payloads and parsed back by the codec's
    * chunk walk on the hot path; the verified features (energy, zero
    * crossings, min/max, dyadic mean) are exact integer math, replayed
    * sample-for-sample by DuckDB from the md5 derivation. Retires the
    * "audio is a stub" caveat the same way q90/q98 did for images.
    */
  def audioFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.audioFeatures(s, docs(s, d)).orderBy("asset_id")

  /** q134 — REAL video decode ([[Multimodal.videoFeatures]]): per-doc
    * MJPEG frames ride an actual RIFF/AVI container, parsed back by
    * [[graft.functions.Multimodal.MediaCodec.decodeAvi]]'s chunk walk
    * (the WAV walk's RIFF-family sibling) with every frame rasterized
    * by the real `javax.imageio` JPEG codec — container parser AND
    * frame codec on the hot path. The oracle pins frame count, the
    * avih-declared geometry, and the q99-style bounded reconstruction
    * error pooled across frames. Retires the last stub codec: video
    * decode is now as real as image and audio.
    */
  def videoFeatures(s: SparkSession, d: String): DataFrame =
    // persisted: the global sort's range-partitioning SAMPLING pass
    // otherwise executes the whole codec pipeline a second time just to
    // pick split points (measured: the decode ran twice, 2.2 s + 2.8 s)
    graft.CacheScope.persisted(Multimodal.videoFeatures(s, docs(s, d)))
      .orderBy("asset_id")

  val videoFeaturesOracle: String =
    """SELECT doc_id AS asset_id, CAST(3 AS BIGINT) AS n_frames,
      |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
      |  true AS within_tol
      |FROM documents ORDER BY asset_id""".stripMargin

  val audioFeaturesOracle: String =
    """WITH i AS (
      |  SELECT doc_id, CAST(u.i AS BIGINT) AS i FROM documents,
      |    UNNEST(range(256)) AS u(i)
      |), raw AS (
      |  SELECT doc_id, i,
      |    CAST('0x' || substr(md5('wav-v1|' || CAST(doc_id AS VARCHAR)
      |      || '|' || CAST(i // 8 AS VARCHAR)), (i % 8) * 4 + 3, 2)
      |      AS BIGINT) * 256
      |    + CAST('0x' || substr(md5('wav-v1|' || CAST(doc_id AS VARCHAR)
      |      || '|' || CAST(i // 8 AS VARCHAR)), (i % 8) * 4 + 1, 2)
      |      AS BIGINT) AS u16
      |  FROM i
      |), s AS (
      |  SELECT doc_id, i,
      |    CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END AS v
      |  FROM raw
      |), x AS (
      |  SELECT doc_id, i, v,
      |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      |  FROM s
      |)
      |SELECT doc_id AS asset_id, CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
      |  CAST(sum(CASE WHEN pv IS NOT NULL AND (pv < 0) <> (v < 0)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
      |  CAST(min(v) AS BIGINT) AS min_s, CAST(max(v) AS BIGINT) AS max_s,
      |  CAST(sum(v) AS DOUBLE) / 256 AS mean_s
      |FROM x GROUP BY doc_id ORDER BY asset_id""".stripMargin

  /** q85 — hard-negative mining via filtered vector search: for each
    * query, the top-5 most similar vectors whose LABEL DIFFERS from the
    * query's — the "close but wrong class" examples contrastive
    * training pairs with its positives ([[SimilarityOps.filteredTopK]];
    * the predicate applies before ranking, so k is filled from the
    * eligible subset).
    */
  def hardNegatives(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))
    SimilarityOps.filteredTopK(q, e, 5, col("label") =!= col("query_label"))
      .orderBy("query_id", "rank")
  }

  val hardNegativesOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
      |    label AS qlabel
      |  FROM embeddings WHERE vec_id < 10
      |), s AS (
      |  SELECT query_id, vec_id,
      |    round(list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])), 4) AS sim
      |  FROM q, embeddings
      |  WHERE vec_id <> query_id AND label <> qlabel
      |), r AS (
      |  SELECT query_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM s
      |)
      |SELECT query_id, rank, vec_id AS neighbor_id, sim FROM r
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** q30 — IVF ANN: 8 deterministic seed centroids (vec_id < 8), every
    * vector assigned to its nearest seed, queries probe top-2 buckets,
    * top-3 within probed buckets.
    */
  def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    val q = e.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    SimilarityOps.ivfTopK(e, seeds, q, k = 3, probes = 2)
      .orderBy("query_id", "rank")
  }

  val ivfTopKOracle: String =
    """WITH seeds AS (
      |  SELECT vec_id AS seed_id, CAST(embedding AS DOUBLE[]) AS sv
      |  FROM embeddings WHERE vec_id < 8
      |), assigned AS (
      |  SELECT vec_id, embedding, bucket FROM (
      |    SELECT e.vec_id, e.embedding, s.seed_id AS bucket,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.sv), 6) DESC,
      |                 s.seed_id) AS rn
      |    FROM embeddings e, seeds s)
      |  WHERE rn = 1
      |), probed AS (
      |  SELECT query_id, qv, bucket FROM (
      |    SELECT e.vec_id AS query_id, CAST(e.embedding AS DOUBLE[]) AS qv,
      |      s.seed_id AS bucket,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.sv), 6) DESC,
      |                 s.seed_id) AS rn
      |    FROM embeddings e, seeds s WHERE e.vec_id % 200 = 0)
      |  WHERE rn <= 2
      |), scored AS (
      |  SELECT p.query_id, a.vec_id,
      |    round(list_cosine_similarity(p.qv, CAST(a.embedding AS DOUBLE[])), 4) AS sim
      |  FROM probed p JOIN assigned a ON p.bucket = a.bucket
      |  WHERE p.query_id <> a.vec_id
      |), r AS (
      |  SELECT query_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored
      |)
      |SELECT query_id, rank, vec_id AS neighbor_id, sim FROM r
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** q31 — embedding near-dup detection via sign-LSH bucketing; scaled
    * duplicate vectors injected in-query (cosine is scale-invariant, so
    * each copy must be found with sim = 1.0).
    */
  def embeddingNearDup(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d).select("vec_id", "embedding")
    val copies = e.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    SimilarityOps.nearDupPairs(e.unionByName(copies)).orderBy("vec_a", "vec_b")
  }

  val embeddingNearDupOracle: String = {
    // 16 sign bits, mirroring SimilarityOps.signBucket's default
    val bucket = (1 to 16).map(d =>
      s"CASE WHEN embedding[$d] > 0 THEN ${1L << (d - 1)} ELSE 0 END").mkString(" + ")
    s"""WITH feed AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |    list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
       |  FROM embeddings WHERE vec_id % 100 = 0
       |), b AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM feed
       |), pairs AS (
       |  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                                 CAST(b2.embedding AS DOUBLE[])), 4) AS sim
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |)
       |SELECT vec_a, vec_b, sim FROM pairs WHERE sim >= 0.999
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** q42 — PII scrubbing: emails/URLs/phone runs masked with typed
    * placeholders; synthetic PII is injected deterministically in-query
    * (the corpus itself is clean) so the masking is actually exercised.
    */
  def piiScrub(s: SparkSession, d: String): DataFrame =
    docs(s, d).withColumn("dirty",
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" see https://example.org/page/"), col("doc_id")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(" call +1 (555) 123-4567"))
            .otherwise(lit(""))))
      .select(col("doc_id"),
        TextAnalysis.scrubPii(col("dirty")).as("clean_text"),
        (length(col("dirty")) - length(TextAnalysis.scrubPii(col("dirty"))))
          .as("chars_removed"))
      .orderBy("doc_id")

  val piiScrubOracle: String = {
    val scrub = TextAnalysis.piiRules.foldLeft("dirty") { case (c, (pat, repl)) =>
      // DuckDB string literals do NOT process backslash escapes — the
      // Java pattern string passes through verbatim
      s"regexp_replace($c, '$pat', '$repl', 'g')"
    }
    s"""WITH dirty_docs AS (
       |  SELECT doc_id, concat(text,
       |    CASE WHEN doc_id % 5 = 0 THEN concat(' contact user', doc_id, '@example.com') ELSE '' END,
       |    CASE WHEN doc_id % 7 = 0 THEN concat(' see https://example.org/page/', doc_id) ELSE '' END,
       |    CASE WHEN doc_id % 11 = 0 THEN ' call +1 (555) 123-4567' ELSE '' END) AS dirty
       |  FROM documents
       |)
       |SELECT doc_id, $scrub AS clean_text,
       |  length(dirty) - length($scrub) AS chars_removed
       |FROM dirty_docs ORDER BY doc_id""".stripMargin
  }

  /** q43 — repetition scoring (Gopher-style quality rule): the share of
    * the document occupied by its most frequent 5-gram; near-1 values
    * flag degenerate/repetitive text.
    */
  def repetitionScore(s: SparkSession, d: String): DataFrame = {
    // non-distinct shingles: repetition is exactly what distinct would
    // erase; native expression, single char-scan pass
    val ex = docs(s, d).select(col("doc_id"),
      explode(graft.expressions.WordShingles.shinglesAll(col("text"), 5)).as("g"))
    ex.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("top_ngram_count"), sum(col("n")).as("n_ngrams"))
      .withColumn("repetition_share",
        col("top_ngram_count").cast("double") / col("n_ngrams"))
      .orderBy("doc_id")
  }

  val repetitionScoreOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
      |), exg AS (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 5
      |    THEN list_transform(range(1, len(t) - 3), i -> array_to_string(t[i:i+4], ' '))
      |    ELSE [] END) AS g
      |  FROM tok
      |), freq AS (
      |  SELECT doc_id, g, count(*) AS n FROM exg GROUP BY 1, 2
      |)
      |SELECT doc_id, max(n) AS top_ngram_count,
      |  CAST(sum(n) AS BIGINT) AS n_ngrams,
      |  CAST(max(n) AS DOUBLE) / sum(n) AS repetition_share
      |FROM freq GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q44 — train/eval decontamination: with every 7th document held out
    * as the eval split, find eval docs whose 5-gram Jaccard overlap with
    * any training doc exceeds the contamination threshold — the overlap
    * check run before training on any corpus.
    */
  def decontamination(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    val eval = all.filter(col("doc_id") % 7 === 0)
    val train = all.filter(col("doc_id") % 7 =!= 0)
    DedupOps.crossCorpusOverlap(train, eval, "text", "doc_id",
        shingleN = 5, threshold = 0.6)
      .orderBy("eval_id", "train_id")
  }

  val decontaminationOracle: String =
    s"""WITH $tokShSql, ex AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), hot AS (
       |  -- shingles above the Spark side's MaxShingleDocFreq cap
       |  -- (combined df over BOTH splits) never generate candidates
       |  SELECT g FROM ex GROUP BY g
       |  HAVING count(*) > ${graft.functions.DedupOps.MaxShingleDocFreq}
       |), cand AS (
       |  SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
       |  FROM ex t JOIN ex e ON t.g = e.g
       |  WHERE t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
       |    AND t.g NOT IN (SELECT g FROM hot)
       |), j AS (
       |  SELECT train_id, eval_id,
       |    CAST(len(list_intersect(st.sh, se.sh)) AS DOUBLE)
       |      / (len(st.sh) + len(se.sh) - len(list_intersect(st.sh, se.sh))) AS overlap
       |  FROM cand
       |  JOIN sh st ON train_id = st.doc_id
       |  JOIN sh se ON eval_id = se.doc_id
       |)
       |SELECT eval_id, train_id, round(overlap, 6) AS overlap
       |FROM j WHERE overlap >= 0.6 ORDER BY eval_id, train_id""".stripMargin

  /** q47 — decontamination, 100 TB shape: identical semantics and OUTPUT
    * to q44, but the train-side shingle stream is prefiltered through a
    * distributed Bloom filter built over the eval corpus's shingles
    * (native BloomFilterAggregate / BloomFilterMightContain — Spark's own
    * runtime-filter machinery). Bloom false positives die in the exact
    * verification; false negatives don't exist — so the oracle is q44's,
    * verbatim, and a hash match here *proves* the prefilter is lossless.
    */
  def bloomDecontamination(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    val eval = all.filter(col("doc_id") % 7 === 0)
    val train = all.filter(col("doc_id") % 7 =!= 0)
    // capacity sized FROM THE EVAL SLICE'S OWN STATS (doc count × a
    // per-doc shingle bound), not the 2^22 API default: every map-side
    // partial aggregation buffer allocates the FULL bitset (Spark's
    // BloomFilterAggregate), so a 40x-oversized capacity cost
    // 5 MB × 32 partials of pure allocation+merge churn — 1.3 s of GC
    // in a 2.1 s query — while a CONSTANT tuned to one fixture would
    // saturate at a larger scale factor and silently stop filtering.
    // The count is one narrow-scan job over the eval slice (bounded by
    // construction: an eval set is a benchmark corpus, not the train
    // corpus); 512 shingles/doc comfortably bounds these documents,
    // and under-sizing only raises fpp — extra candidates that exact
    // verification then drops — never correctness.
    val cap = math.max(1L << 19, eval.count() * 512)
    DedupOps.bloomDecontamination(train, eval, "text", "doc_id",
        shingleN = 5, threshold = 0.6,
        expectedEvalShingles = cap)
      .orderBy("eval_id", "train_id")
  }

  val bloomDecontaminationOracle: String = decontaminationOracle

  /** q73 — fuzzy decontamination at LSH scale: the q44 split, but
    * candidates come from MinHash band-bucket collisions across the two
    * corpora instead of the exact inverted shingle index. Candidate
    * volume per document is a CONSTANT (k/bandRows band rows) instead of
    * scaling with document length and shingle frequency — the shape that
    * survives when the train corpus is 100 TB — traded for probabilistic
    * recall near the threshold (pairs at j→1, where contamination lives,
    * are caught almost surely). Survivors are exactly verified, so every
    * reported pair is a true ≥0.6 overlap and the oracle replays the
    * identical band formulas.
    */
  def fuzzyDecontamination(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    val eval = all.filter(col("doc_id") % 7 === 0)
    val train = all.filter(col("doc_id") % 7 =!= 0)
    DedupOps.lshDecontamination(train, eval, "text", "doc_id",
        shingleN = 5, k = 16, bandRows = 4, threshold = 0.6)
      .orderBy("eval_id", "train_id")
  }

  val fuzzyDecontaminationOracle: String =
    s"""WITH $tokShSql, $minhashBandSql, cand AS (
       |  SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
       |  FROM band t JOIN band e
       |    ON t.band_idx = e.band_idx AND t.band_hash = e.band_hash
       |  WHERE t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
       |), j AS (
       |  SELECT eval_id, train_id,
       |    CAST(len(list_intersect(st.sh, se.sh)) AS DOUBLE)
       |      / (len(st.sh) + len(se.sh) - len(list_intersect(st.sh, se.sh))) AS overlap
       |  FROM cand
       |  JOIN sh st ON train_id = st.doc_id
       |  JOIN sh se ON eval_id = se.doc_id
       |)
       |SELECT eval_id, train_id, round(overlap, 6) AS overlap
       |FROM j WHERE overlap >= 0.6 ORDER BY eval_id, train_id""".stripMargin

  /** q48 — deterministic stratified sampling for corpus mixing: rebalance
    * the over-represented language by hash-bucket membership (md5 of the
    * salted doc id), not a random draw — the same subcorpus is selected
    * at any parallelism, on any engine, on every rerun.
    */
  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    functions.Sampling.stratifiedSample(docs(s, d), col("lang"), col("doc_id"),
        ratesPct = Map("en" -> 35, "de" -> 80, "fr" -> 80, "es" -> 80, "zh" -> 80),
        defaultPct = 0, salt = "mix-v1|")
      .select(col("doc_id"), col("lang"), col("sample_bucket"))
      .orderBy("doc_id")

  val stratifiedSampleOracle: String =
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    CAST(CAST('0x' || substr(md5('mix-v1|' || CAST(doc_id AS VARCHAR)), 1, 8)
      |         AS BIGINT) % 100 AS INTEGER) AS sample_bucket
      |  FROM documents
      |)
      |SELECT doc_id, lang, sample_bucket FROM b
      |WHERE sample_bucket < CASE lang WHEN 'en' THEN 35
      |  WHEN 'de' THEN 80 WHEN 'fr' THEN 80 WHEN 'es' THEN 80
      |  WHEN 'zh' THEN 80 ELSE 0 END
      |ORDER BY doc_id""".stripMargin

  /** q49 — sequence packing (concat-and-chunk): documents concatenated in
    * doc_id order into one token stream, cut into capacity-2048 windows;
    * each doc gets the window holding its first token and its offset
    * within it. The running token count is the bucketed distributed
    * prefix sum — no single-partition window at any corpus size.
    */
  def packSequences(s: SparkSession, d: String): DataFrame =
    functions.Packing.packSequences(docs(s, d), col("doc_id"),
        size(TextAnalysis.tokens(col("text"))), capacity = 2048)
      .orderBy("doc_id")

  val packSequencesOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, n_tokens,
      |    sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS start_offset
      |  FROM t
      |)
      |SELECT doc_id, n_tokens,
      |  CAST(start_offset AS BIGINT) AS start_offset,
      |  CAST(start_offset // 2048 AS BIGINT) AS pack_id,
      |  CAST(start_offset % 2048 AS BIGINT) AS pack_offset
      |FROM c ORDER BY doc_id""".stripMargin

  /** q50 — corpus curation gate: the DQ-rule-engine pattern (rules →
    * reasons → keep/reject) applied to training-data quality signals, in
    * ONE codegen'd scan: length, punctuation density, English-stopword
    * signal, and a garbage-token (overlong run) detector.
    */
  def corpusQualityGate(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val nToks = size(toks)
    val punctRatio =
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0)))
        .cast("double") / col("n_chars")
    val stopRatio =
      TextAnalysis.stopwordHits(toks, TextAnalysis.stopwords("en"))
        .cast("double") / nToks
    val maxTokLen = array_max(transform(toks, t => length(t)))
    docs(s, d).select(
        col("doc_id"), col("lang"),
        nToks.as("n_tokens"),
        maxTokLen.as("max_token_len"),
        // concat_ws skips the NULLs unfired rules leave behind — reasons
        // keep declaration order with no array juggling
        concat_ws("|",
          when(nToks < 20, "too_short"),
          when(punctRatio > 0.25, "too_punctuated"),
          when(col("lang") === "en" && stopRatio < 0.01, "no_stopwords"),
          when(maxTokLen > 40, "garbage_token")).as("reject_reasons"))
      .withColumn("keep", col("reject_reasons") === "")
      .orderBy("doc_id")
  }

  val corpusQualityGateOracle: String =
    """WITH m AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split_regex(lower(text), '\s+')) AS INTEGER) AS n_tokens,
      |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
      |      / n_chars AS punct_ratio,
      |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
      |         t -> t IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE)
      |      / len(string_split_regex(lower(text), '\s+')) AS stopword_ratio,
      |    CAST(list_max(list_transform(string_split_regex(lower(text), '\s+'),
      |         x -> len(x))) AS INTEGER) AS max_token_len
      |  FROM documents
      |)
      |SELECT doc_id, lang, n_tokens, max_token_len,
      |  concat_ws('|',
      |    CASE WHEN n_tokens < 20 THEN 'too_short' END,
      |    CASE WHEN punct_ratio > 0.25 THEN 'too_punctuated' END,
      |    CASE WHEN lang = 'en' AND stopword_ratio < 0.01 THEN 'no_stopwords' END,
      |    CASE WHEN max_token_len > 40 THEN 'garbage_token' END) AS reject_reasons,
      |  concat_ws('|',
      |    CASE WHEN n_tokens < 20 THEN 'too_short' END,
      |    CASE WHEN punct_ratio > 0.25 THEN 'too_punctuated' END,
      |    CASE WHEN lang = 'en' AND stopword_ratio < 0.01 THEN 'no_stopwords' END,
      |    CASE WHEN max_token_len > 40 THEN 'garbage_token' END) = '' AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  /** Shared q24/q51/q52 quality composite (rounded to 6 — the rounding
    * makes the double portable AND gives ties a deterministic doc_id
    * tie-break downstream).
    */
  private def qualityScore: Column = {
    val toks = TextAnalysis.tokens(col("text"))
    val nToks = size(toks)
    val punct =
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0)))
    val stopHits = TextAnalysis.stopwordHits(toks, TextAnalysis.stopwords("en"))
    round(least(nToks.cast("double") / 100.0, lit(1.0)) * 0.4 +
      (stopHits.cast("double") / nToks) * 0.4 +
      (lit(1.0) - punct.cast("double") / col("n_chars")) * 0.2, 6)
  }

  private val qualityScoreSql: String =
    """round(least(CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE) / 100.0, 1.0) * 0.4
      |      + (CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
      |           t -> t IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE)
      |         / len(string_split_regex(lower(text), '\s+'))) * 0.4
      |      + (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
      |         / n_chars) * 0.2, 6)""".stripMargin

  /** q51 — per-source document cap (the per-domain cap of web-crawl
    * curation): keep the top-3 documents of each source by quality. The
    * rank-filter plans as WindowGroupLimit — each task keeps only its
    * top-3 per source BEFORE the shuffle, so a source with millions of
    * pages never materializes more than (tasks × 3) rows.
    */
  def sourceCap(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    docs(s, d)
      .select(col("doc_id"), col("source"), qualityScore.as("quality_score"))
      .withColumn("source_rank", row_number().over(w))
      .filter(col("source_rank") <= 3)
      .orderBy("source", "source_rank")
  }

  val sourceCapOracle: String =
    s"""WITH m AS (
       |  SELECT doc_id, source, $qualityScoreSql AS quality_score
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, source, quality_score,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY quality_score DESC, doc_id) AS INTEGER) AS source_rank
       |  FROM m
       |)
       |SELECT doc_id, source, quality_score, source_rank FROM r
       |WHERE source_rank <= 3 ORDER BY source, source_rank""".stripMargin

  /** q52 — token-budget fill: admit documents best-quality-first until a
    * global token budget is exhausted (the "train on the best N tokens"
    * selection). The cumulative token count over the quality ordering is
    * the distributed [[graft.operators.PrefixSum]] (descending quality =
    * ascending negated quality for monotone bucketing) — a document is
    * admitted iff the budget isn't spent before it starts.
    */
  def tokenBudgetFill(s: SparkSession, d: String, budget: Long = 15000L): DataFrame = {
    val base = docs(s, d).select(
      col("doc_id"),
      qualityScore.as("quality_score"),
      size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens"))
    graft.operators.PrefixSum.exclusiveRunningTotal(
        base.withColumn("__negq", -col("quality_score")),
        Seq(col("__negq"), col("doc_id")), col("n_tokens"), "tokens_before")
      .filter(col("tokens_before") < budget)
      .select("doc_id", "quality_score", "n_tokens", "tokens_before")
      .orderBy("doc_id")
  }

  val tokenBudgetFillOracle: String =
    s"""WITH m AS (
       |  SELECT doc_id, $qualityScoreSql AS quality_score,
       |    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, quality_score, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS tokens_before
       |  FROM m
       |)
       |SELECT doc_id, quality_score, n_tokens,
       |  CAST(tokens_before AS BIGINT) AS tokens_before
       |FROM c WHERE tokens_before < 15000 ORDER BY doc_id""".stripMargin

  /** q54 — deterministic corpus shuffle: the pseudo-random training order
    * between curation and packing. The shuffle key is a salted md5-prefix
    * hash (doc_id tie-break), so the permutation is reproducible on any
    * engine at any parallelism — rerunning a 100 TB shard job yields the
    * identical order. Ranks are assigned with the bucketed distributed
    * [[graft.operators.PrefixSum]] (counting 1s = dense rank), never a
    * single-partition row_number window.
    */
  def shuffleOrder(s: SparkSession, d: String): DataFrame = {
    val key = conv(substring(md5(concat(lit("shuffle-v1|"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("bigint")
    val base = docs(s, d).select(col("doc_id"), key.as("shuffle_key"))
    graft.operators.PrefixSum.exclusiveRunningTotal(base,
        Seq(col("shuffle_key"), col("doc_id")), lit(1L), "shuffle_rank")
      .withColumn("shuffle_rank", col("shuffle_rank") + 1L)
      .select("doc_id", "shuffle_key", "shuffle_rank")
      .orderBy("doc_id")
  }

  val shuffleOrderOracle: String =
    """WITH k AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5('shuffle-v1|' || CAST(doc_id AS VARCHAR)), 1, 15)
      |         AS BIGINT) AS shuffle_key
      |  FROM documents
      |)
      |SELECT doc_id, shuffle_key,
      |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT)
      |    AS shuffle_rank
      |FROM k ORDER BY doc_id""".stripMargin

  /** q56 — per-language quality-quantile gate: keep documents at or
    * above their language's median quality. The thresholds are a
    * per-language exact-percentile AGGREGATION (a handful of rows)
    * broadcast back onto the scan — never a percent_rank window over
    * the full corpus, which would shuffle and sort every document per
    * language at 100 TB. [[graft.functions.ExactPercentiles]] uses the
    * same linear interpolation as ANSI percentile_cont / DuckDB
    * quantile_cont, bit-identically.
    */
  def qualityQuantileGate(s: SparkSession, d: String,
      p: Double = 0.5): DataFrame = {
    // persist the scored scan: it feeds both the threshold aggregation
    // and the gate itself, and the quality regexes are the expensive
    // part — without this the corpus is re-scored per consumer
    val scored = CacheScope.persisted(
      docs(s, d).select(col("doc_id"), col("lang"),
        qualityScore.as("quality_score")))
    val thr = scored.groupBy(col("lang"))
      .agg(graft.functions.ExactPercentiles
        .percentiles(col("quality_score"), Seq(p)).as("ps"))
      .select(col("lang"), col("ps")(0).as("lang_threshold"))
    scored.join(broadcast(thr), "lang")
      .filter(col("quality_score") >= col("lang_threshold"))
      .select("doc_id", "lang", "quality_score", "lang_threshold")
      .orderBy("doc_id")
  }

  val qualityQuantileGateOracle: String =
    s"""WITH m AS (
       |  SELECT doc_id, lang, $qualityScoreSql AS quality_score
       |  FROM documents
       |), t AS (
       |  SELECT lang, quantile_cont(quality_score, 0.5) AS lang_threshold
       |  FROM m GROUP BY lang
       |)
       |SELECT m.doc_id, m.lang, m.quality_score, t.lang_threshold
       |FROM m JOIN t USING (lang)
       |WHERE m.quality_score >= t.lang_threshold
       |ORDER BY m.doc_id""".stripMargin

  /** q57 — temperature-weighted mixture sampling: per-source keep rate
    * ∝ share^(α−1) = 1/sqrt(share) at α = 0.5, normalized so the
    * smallest source keeps everything — sampling at these rates
    * reshapes the corpus toward the tempered mixture p_s^α that
    * flattens source imbalance. Membership is a deterministic
    * salted-hash uniform per document. The per-source rate table is a
    * tiny aggregation broadcast onto the scan, so the sample is ONE
    * pass over the corpus with no shuffle of document rows — and
    * re-running a 100 TB job reproduces the exact sample.
    *
    * The fixture's sources are uniform (every rate would be 1.0), so
    * the query simulates the real-world skew in-feed: half the corpus
    * is relabeled as one giant crawl source, which the sampler then
    * visibly downsamples.
    */
  def mixtureSample(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"),
      when(col("doc_id") % 2 === 0, lit("megacrawl"))
        .otherwise(col("source")).as("source"))
    val counts = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
    // scalar totals via tiny crossJoins — a partitionless window would
    // log the single-partition WindowExec warning for no reason
    val tot = counts.agg(sum(col("n_src")).as("n_tot"))
    val weights = counts.crossJoin(broadcast(tot))
      .withColumn("wgt",
        sqrt(col("n_tot").cast("double") / col("n_src").cast("double")))
    val wmax = weights.agg(max(col("wgt")).as("wgt_max"))
    val rates = weights.crossJoin(broadcast(wmax))
      .select(col("source"), (col("wgt") / col("wgt_max")).as("sample_rate"))
    val uni = conv(substring(md5(concat(lit("mix-v1|"),
      col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("bigint").cast("double") / lit(1152921504606846976.0) // 2^60
    base.withColumn("uni", uni)
      .join(broadcast(rates), "source")
      .filter(col("uni") < col("sample_rate"))
      .select("doc_id", "source", "sample_rate")
      .orderBy("doc_id")
  }

  val mixtureSampleOracle: String =
    """WITH feed AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'megacrawl' ELSE source END AS source
      |  FROM documents
      |), c AS (
      |  SELECT source, count(*) AS n_src FROM feed GROUP BY source
      |), t AS (
      |  SELECT sum(n_src) AS n_tot FROM c
      |), w AS (
      |  SELECT source,
      |    sqrt(CAST((SELECT n_tot FROM t) AS DOUBLE) / CAST(n_src AS DOUBLE))
      |      AS wgt
      |  FROM c
      |), r AS (
      |  SELECT source, wgt / (SELECT max(wgt) FROM w) AS sample_rate FROM w
      |), u AS (
      |  SELECT doc_id, source,
      |    CAST(CAST('0x' || substr(md5('mix-v1|' || CAST(doc_id AS VARCHAR)), 1, 15)
      |         AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS uni
      |  FROM feed
      |)
      |SELECT u.doc_id, u.source, r.sample_rate
      |FROM u JOIN r USING (source)
      |WHERE u.uni < r.sample_rate
      |ORDER BY u.doc_id""".stripMargin

  /** q58 — cluster-aware train/holdout split: assign the split by
    * hashing the DUPLICATE-CLUSTER id (q55's connected components), not
    * the document id, so near-duplicates can never straddle the
    * boundary and leak training text into the holdout. Documents in no
    * cluster are their own singleton component.
    */
  def clusterSplit(s: SparkSession, d: String,
      holdoutFrac: Double = 0.1): DataFrame = {
    val pairs = DedupOps.simhashPairs(
      DedupOps.simhashSignatures(docs(s, d), "text", "doc_id"))
    val cc = graft.operators.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component").as("component_id"))
    val all = docs(s, d).select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .withColumn("component_id", coalesce(col("component_id"), col("doc_id")))
    val uni = conv(substring(md5(concat(lit("split-v1|"),
      col("component_id").cast("string"))), 1, 15), 16, 10)
      .cast("bigint").cast("double") / lit(1152921504606846976.0)
    all.withColumn("split",
        when(uni < lit(1.0 - holdoutFrac), lit("train")).otherwise(lit("holdout")))
      .select("doc_id", "component_id", "split")
      .orderBy("doc_id")
  }

  val clusterSplitOracle: String =
    s"""WITH RECURSIVE $simhashCandSql, pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |), e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), reach(id, comp) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id
       |), cc AS (
       |  SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id
       |), allc AS (
       |  SELECT d.doc_id, coalesce(cc.component_id, d.doc_id) AS component_id
       |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
       |)
       |SELECT doc_id, component_id,
       |  CASE WHEN CAST(CAST('0x' || substr(md5('split-v1|'
       |         || CAST(component_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
       |       / 1152921504606846976.0 < 0.9
       |       THEN 'train' ELSE 'holdout' END AS split
       |FROM allc ORDER BY doc_id""".stripMargin

  /** q59 — exact corpus heavy hitters in two bounded passes: a
    * Misra–Gries sketch pass ([[graft.functions.HeavyHitters]], k
    * counters per task, no shuffle of the token stream) nominates a
    * candidate superset — guaranteed to contain every token with
    * frequency > n/(k+1) — and a confirmation pass exact-counts ONLY
    * the broadcast candidates. At 100 TB that is two scans and a
    * k-sized shuffle instead of a full groupBy-count over every
    * distinct token; the exact filter then makes the output identical
    * to the brute-force answer, which is what the oracle computes.
    */
  def heavyHitterTokens(s: SparkSession, d: String,
      k: Int = 50): DataFrame = {
    import s.implicits._
    val toks = docs(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    // ONE sketch pass carries both the MG counters and the grand total
    // (a separate count would re-scan the token stream — 3 scans where
    // 2 suffice); the single agg row moves ≤k tokens + one long to the
    // driver, bounded by the sketch size, never by data
    val row = toks
      .agg(graft.functions.HeavyHitters.heavy_hitters(col("token"), k).as("mg"),
        count(lit(1)).as("n"))
      .select(map_keys(col("mg")).as("cands"), col("n"))
      .head()
    val total = row.getLong(1)
    val cand = row.getSeq[String](0).toDF("token")
    toks.join(broadcast(cand), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit((k + 1).toLong) > total)
      .orderBy(col("cnt").desc, col("token"))
  }

  val heavyHitterTokensOracle: String =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
      |  FROM documents
      |), t AS (
      |  SELECT count(*) AS n FROM tok
      |), c AS (
      |  SELECT token, count(*) AS cnt FROM tok GROUP BY token
      |)
      |SELECT token, cnt FROM c
      |WHERE cnt * 51 > (SELECT n FROM t)
      |ORDER BY cnt DESC, token""".stripMargin

  /** q62 — edit-distance verification of near-dup candidates: the
    * fourth similarity family (Levenshtein, character-level) alongside
    * Jaccard (q26/q27), Hamming (q28), and cosine (q29–q31). The O(m·n)
    * dynamic program only ever runs on the SimHash candidate pairs over
    * a normalized 120-char prefix — never all pairs, never full texts —
    * which is the only shape that survives a 100 TB corpus.
    */
  def editDistancePairs(s: SparkSession, d: String,
      maxDist: Int = 20): DataFrame = {
    val cand = DedupOps.simhashPairs(
      DedupOps.simhashSignatures(docs(s, d), "text", "doc_id"))
    val txt = docs(s, d).select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "\\s+", " "), 1, 120).as("t"))
    cand
      .join(txt.select(col("doc_id").as("doc_a"), col("t").as("ta")), "doc_a")
      .join(txt.select(col("doc_id").as("doc_b"), col("t").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).as("edit_distance"))
      .filter(col("edit_distance") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  val editDistancePairsOracle: String =
    s"""WITH $simhashCandSql, pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |), norm AS (
       |  SELECT doc_id,
       |    substr(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, 120) AS t
       |  FROM documents
       |)
       |SELECT p.doc_a, p.doc_b,
       |  levenshtein(na.t, nb.t) AS edit_distance
       |FROM pairs p
       |JOIN norm na ON p.doc_a = na.doc_id
       |JOIN norm nb ON p.doc_b = nb.doc_id
       |WHERE levenshtein(na.t, nb.t) <= 20
       |ORDER BY p.doc_a, p.doc_b""".stripMargin

  // ----------------------------------------------------------- multimodal

  /** q32 — multimodal asset pipeline: opaque binary payloads + typed
    * metadata through the partition-mapped feature extractor. The
    * oracle covers the FULL output: metadata, the aspect-preserving
    * resize geometry, and the content-fingerprint vector itself
    * (md5-derived on a 1/1024 dyadic grid — see
    * MediaCodec.fingerprintEmbedding), recomputed
    * independently by DuckDB. The vector is verified through a SCALAR
    * digest — md5 over the '|'-joined integer grid numerators
    * (x·1024, exact for dyadic slots) — because the driver's pandas
    * compare sorts result frames and cannot sort a raw list column
    * (r05: `TypeError: unhashable type: 'numpy.ndarray'`). Same
    * information content: any slot deviation flips the digest.
    */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    val feats = Multimodal.extractFeatures(
      Multimodal.assetsFromDocuments(s, docs(s, d)))
    feats.toDF().select(col("asset_id"), col("media_type"), col("byte_len"),
        col("frames_sampled"), col("out_width"), col("out_height"),
        expr("md5(array_join(transform(feature, " +
          "x -> cast(cast(round(x * 1024D) as int) as string)), '|'))")
          .as("feature_digest"))
      .orderBy("asset_id")
  }

  val multimodalFeaturesOracle: String = {
    // slot s of the golden vector: 60-bit md5 prefix of payload ++ ('a'+s),
    // kept as the INTEGER grid numerator (the Spark side re-derives it
    // from the float as round(x*1024) — exact, the slots are dyadic)
    def slot(s: Int): String =
      s"CAST((CAST('0x' || substr(md5(text || chr(${97 + s})), 1, 15) AS BIGINT) % 1024) AS VARCHAR)"
    val digest = (0 until 8).map(slot).mkString("md5(", " || '|' || ", ")")
    s"""WITH a AS (
       |  SELECT doc_id, text, n_chars,
       |    CAST(n_chars % 640 AS INTEGER) AS w,
       |    CAST(n_chars % 480 AS INTEGER) AS h
       |  FROM documents
       |)
       |SELECT doc_id AS asset_id,
       |  (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
       |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
       |  CAST(greatest(1, (n_chars * 10) // 1000) AS INTEGER) AS frames_sampled,
       |  CAST(CASE WHEN w <= 0 OR h <= 0 THEN 224
       |            WHEN w >= h THEN 224
       |            ELSE greatest(1, CAST(floor(w * 224.0 / h + 0.5) AS INTEGER))
       |       END AS INTEGER) AS out_width,
       |  CAST(CASE WHEN w <= 0 OR h <= 0 THEN 224
       |            WHEN w >= h THEN greatest(1, CAST(floor(h * 224.0 / w + 0.5) AS INTEGER))
       |            ELSE 224
       |       END AS INTEGER) AS out_height,
       |  $digest AS feature_digest
       |FROM a ORDER BY asset_id""".stripMargin
  }

  /** q135 — two-sample Kolmogorov–Smirnov drift statistic between the
    * English and non-English document-length distributions: the
    * distribution-drift monitor a curation pipeline runs between corpus
    * snapshots or slices. Everything is exact integer arithmetic — the
    * KS distance max|F₁−F₂| is carried as the cross-multiplied
    * numerator max|cumA·nB − cumB·nA| (BIGINT) and reported in ppm via
    * a DECIMAL(38,0) divide, so the oracle is bit-stable. The CDFs ride
    * the bucketed [[graft.operators.PrefixSum]] over per-value counts —
    * never a single-partition global window — and the per-value table
    * is one map-combinable groupBy of the scan.
    */
  def ksDrift(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val isA = col("lang") === "en"
    val counts = dd.groupBy(col("n_chars").as("v")).agg(
      sum(when(isA, 1L).otherwise(0L)).as("ca"),
      sum(when(!isA, 1L).otherwise(0L)).as("cb"))
    val c1 = graft.operators.PrefixSum.exclusiveRunningTotal(
      counts, Seq(col("v")), col("ca"), "pa")
    val c2 = graft.operators.PrefixSum.exclusiveRunningTotal(
      c1, Seq(col("v")), col("cb"), "pb")
    val tot = dd.agg(
      sum(when(isA, 1L).otherwise(0L)).as("na"),
      sum(when(!isA, 1L).otherwise(0L)).as("nb"))
    c2.select((col("pa") + col("ca")).as("cuma"),
        (col("pb") + col("cb")).as("cumb"))
      .crossJoin(broadcast(tot))
      .groupBy("na", "nb")
      .agg(max(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
        .as("d_num"))
      .select(col("na"), col("nb"), col("d_num"),
        expr("(CAST(d_num AS DECIMAL(38,0)) * 1000000)" +
          " div (CAST(na AS DECIMAL(38,0)) * nb)").as("d_ppm"))
  }

  val ksDriftOracle: String =
    """WITH c AS (
      |  SELECT n_chars AS v,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM documents GROUP BY 1
      |), cum AS (
      |  SELECT SUM(ca) OVER (ORDER BY v) AS cuma,
      |         SUM(cb) OVER (ORDER BY v) AS cumb
      |  FROM c
      |), t AS (
      |  SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |         CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM documents
      |)
      |SELECT na, nb,
      |  CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT) AS d_num,
      |  CAST((MAX(ABS(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
      |        * 1000000) // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS d_ppm
      |FROM cum, t GROUP BY na, nb""".stripMargin

  /** q136 — per-language token-frequency concentration (Herfindahl–
    * Hirschman index in exact ppm): Σ(cᵢ/N)² over the token histogram —
    * the vocabulary-concentration screen that flags a language slice
    * degenerating toward few repeated tokens (boilerplate, spam) without
    * entropy's transcendental log. The squared counts and the N² divisor
    * ride DECIMAL(38,0) carriers (the q110/q115 device), so the figure
    * is exact at any corpus size; the whole query is two map-combinable
    * aggregations over the token stream.
    */
  def tokenHhi(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d).select(col("lang"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    toks.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      .groupBy("lang").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sum_sq"))
      .select(col("lang"), col("n_tokens"), col("n_distinct"),
        expr("(sum_sq * 1000000) div" +
          " (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)").as("hhi_ppm"))
      .orderBy("lang")
  }

  val tokenHhiOracle: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents
      |), c AS (
      |  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
      |)
      |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |  CAST((SUM(CAST(c AS HUGEINT) * c) * 1000000)
      |       // (CAST(SUM(c) AS HUGEINT) * SUM(c)) AS BIGINT) AS hhi_ppm
      |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  /** q137 — BPE merge-candidate statistics: the global adjacent-pair
    * frequency table over the BPE-ish token stream — the counting step
    * a tokenizer-training loop runs every merge round, at corpus scale.
    * Adjacent pairs are built INSIDE the scan with a codegen'd
    * `transform(sequence(...))` over each token array (no posexplode +
    * window, no per-doc shuffle); the only exchange is the final pair
    * groupBy. Top 20 by (count desc, pair asc) — a deterministic total
    * order.
    */
  def bpePairs(s: SparkSession, d: String): DataFrame = {
    docs(s, d)
      .select(TextAnalysis.bpeTokens(col("text")).as("bpe"))
      .filter(size(col("bpe")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(bpe) - 1)," +
          " i -> struct(element_at(bpe, i) AS l, element_at(bpe, i + 1) AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("left_tok"), col("p.r").as("right_tok"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("left_tok"), col("right_tok"))
      .limit(20)
  }

  val bpePairsOracle: String =
    """WITH l AS (
      |  SELECT regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS bpe
      |  FROM documents
      |), p AS (
      |  SELECT bpe[CAST(u.i AS BIGINT)] AS left_tok,
      |         bpe[CAST(u.i AS BIGINT) + 1] AS right_tok
      |  FROM l, UNNEST(range(1, len(bpe))) AS u(i)
      |  WHERE len(bpe) >= 2
      |)
      |SELECT left_tok, right_tok, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM p GROUP BY 1, 2
      |ORDER BY n_pairs DESC, left_tok, right_tok LIMIT 20""".stripMargin

  /** q142 — IDF-weighted Jaccard similarity: near-dup scoring where
    * shingle overlap counts by RARITY — two documents sharing a rare
    * shingle are far more alike than two sharing "of the and of the"
    * (the retrieval-grade refinement of q26's uniform Jaccard). The
    * weight is the integer `n_docs div df` (log-free IDF, the q110
    * device), intersections come from the SAME df-capped inverted-index
    * equality join as q26 — never all-pairs — and the score is an exact
    * ppm ratio on a DECIMAL(38,0) carrier, so the oracle is bit-stable
    * at any corpus size.
    */
  def weightedJaccard(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val sh = graft.CacheScope.persisted(dd.select(col("doc_id"),
      explode(TextAnalysis.textShingles(col("text"), 5)).as("g")))
    val dfTab = sh.groupBy("g").agg(count(lit(1)).as("df"))
    val nDocs = dd.agg(count(lit(1)).as("n_docs"))
    val wtab = graft.CacheScope.persisted(
      sh.join(dfTab.filter(col("df") <= 1000), "g")
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("g"), expr("n_docs div df").as("wt")))
    val docW = wtab.groupBy("doc_id").agg(sum("wt").as("dw"))
    val inter = wtab.as("a").join(wtab.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.wt")).as("wi"))
    inter
      .join(docW.select(col("doc_id").as("doc_a"), col("dw").as("dwa")), "doc_a")
      .join(docW.select(col("doc_id").as("doc_b"), col("dw").as("dwb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("(CAST(wi AS DECIMAL(38,0)) * 1000000) div (dwa + dwb - wi)")
          .as("wj_ppm"))
      .filter(col("wj_ppm") >= 600000)
      .orderBy("doc_a", "doc_b")
  }

  val weightedJaccardOracle: String =
    s"""WITH $tokShSql, ex AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), dfb AS (
       |  SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY g
       |), nd AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
       |), w AS (
       |  SELECT doc_id, e.g, n_docs // df AS wt
       |  FROM ex e JOIN dfb USING (g), nd WHERE df <= 1000
       |), dw AS (
       |  SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS dw FROM w GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(SUM(a.wt) AS BIGINT) AS wi
       |  FROM w a JOIN w b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b,
       |  CAST((CAST(wi AS HUGEINT) * 1000000)
       |       // (da.dw + db.dw - wi) AS BIGINT) AS wj_ppm
       |FROM inter JOIN dw da ON doc_a = da.doc_id
       |           JOIN dw db ON doc_b = db.doc_id
       |WHERE (CAST(wi AS HUGEINT) * 1000000) // (da.dw + db.dw - wi) >= 600000
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q143 — time-weighted average price (TWAP): the duration-weighted
    * mean of an irregular event series per user, where each value holds
    * until the next event — the time-series aggregate sampling-rate
    * changes would bias a plain mean on. Everything is exact integers:
    * value cents (DECIMAL→BIGINT), interval micros from the event-time
    * lead, the Σ cents·Δt numerator on a DECIMAL(38,0) carrier, and an
    * integral divide back to cents. The lead window partitions by user
    * (bounded per-user history, the q80 shape).
    */
  def twap(s: SparkSession, d: String): DataFrame = {
    // INPUT CONTRACT: events.value is a 2-dp money amount (fixture
    // generator emits exact cents; probed: 0 rows where
    // value <> round(value, 2) at sf0.1). Cents.cents matches the
    // oracle's CAST(value AS DECIMAL(18,2))·100 only on that domain —
    // an arbitrary-precision double can straddle a .xx5 boundary where
    // fl(x·100) and the full decimal expansion round apart (CentsSpec
    // pins the 2-dp equivalence; keep the decimal-cast form for any
    // future column NOT guaranteed 2-dp).
    val ev = graft.Tables.events(s, d).select(col("user_id"),
      col("event_id"), col("ts"),
      graft.functions.Cents.cents(col("value")).as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("dt_us", col("next_us") - unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * dt_us")).as("num"),
        sum("dt_us").as("den"))
      .select(col("user_id"), col("n_intervals"),
        expr("num div den").as("twap_cents"))
      .orderBy("user_id")
  }

  val twapOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events
      |), i AS (
      |  SELECT user_id, cents,
      |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      - epoch_us(ts) AS dt_us
      |  FROM e
      |)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
      |  CAST(SUM(CAST(cents AS HUGEINT) * dt_us)
      |       // SUM(CAST(dt_us AS HUGEINT)) AS BIGINT) AS twap_cents
      |FROM i WHERE dt_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q144 — per-dimension embedding statistics: the distribution
    * monitor a vector pipeline runs to catch drift, dead dimensions,
    * and broken normalization before they poison ANN recall. Exactness
    * device: each float32 is scaled by 2²⁶ and FLOORED to a BIGINT —
    * floor (not cast) because Spark's double→long cast truncates while
    * DuckDB's rounds, and floor agrees everywhere — then all moments
    * accumulate on DECIMAL(38,0) carriers, so mean/min/max/variance
    * are bit-stable integers at any corpus size. One posexplode +
    * one map-combinable groupBy on the (bounded) dimension index.
    */
  def embeddingDimStats(s: SparkSession, d: String): DataFrame = {
    emb(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim"),
        expr("CAST(FLOOR(CAST(v AS DOUBLE) * 67108864) AS BIGINT)").as("sv"))
      .groupBy("dim").agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(sv AS DECIMAL(38,0))")).as("ssum"),
        sum(expr("CAST(sv AS DECIMAL(38,0)) * sv")).as("ssq"),
        min("sv").as("min_s"), max("sv").as("max_s"))
      .select(col("dim"), col("n"),
        expr("ssum div n").as("mean_s"),
        // population variance in scaled units: (n·Σv² − (Σv)²) div n²
        expr("(n * ssq - ssum * ssum) div (CAST(n AS DECIMAL(38,0)) * n)")
          .as("var_s"),
        col("min_s"), col("max_s"))
      .orderBy("dim")
  }

  val embeddingDimStatsOracle: String =
    """WITH x AS (
      |  SELECT CAST(u.i AS INTEGER) - 1 AS dim,
      |    CAST(FLOOR(CAST(embedding[CAST(u.i AS BIGINT)] AS DOUBLE)
      |         * 67108864) AS BIGINT) AS sv
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
      |), m AS (
      |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(sv AS HUGEINT)) AS ssum,
      |    SUM(CAST(sv AS HUGEINT) * sv) AS ssq,
      |    CAST(MIN(sv) AS BIGINT) AS min_s, CAST(MAX(sv) AS BIGINT) AS max_s
      |  FROM x GROUP BY dim
      |)
      |SELECT dim, n, CAST(ssum // n AS BIGINT) AS mean_s,
      |  CAST((n * ssq - ssum * ssum) // (CAST(n AS HUGEINT) * n) AS BIGINT)
      |    AS var_s,
      |  min_s, max_s
      |FROM m ORDER BY dim""".stripMargin

  /** q145 — sketch-based KS drift ([[graft.functions.HistogramSketch
    * .ksStat]]): the q135 drift test re-run from two 64-bin mergeable
    * histograms instead of full CDFs — the production monitoring shape,
    * where snapshots persist their ≤bins-row sketches and drift checks
    * compare sketches without rescanning any corpus. The oracle
    * replays the integer bin assignment and the cross-multiplied
    * distance bit-for-bit; error vs the exact q135 statistic is
    * bounded by one bin's probability mass.
    */
  def sketchKsDrift(s: SparkSession, d: String): DataFrame = {
    import graft.functions.HistogramSketch
    val dd = graft.CacheScope.persisted(
      docs(s, d).select(col("lang"), col("n_chars")))
    val r = dd.agg(min("n_chars").cast("long"), max("n_chars").cast("long")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val en = HistogramSketch.sketch(dd.filter(col("lang") === "en"),
      "n_chars", 64, lo, hi)
    val rest = HistogramSketch.sketch(dd.filter(col("lang") =!= "en"),
      "n_chars", 64, lo, hi)
    HistogramSketch.ksStat(en, rest)
  }

  val sketchKsDriftOracle: String =
    """WITH r AS (
      |  SELECT CAST(MIN(n_chars) AS BIGINT) AS lo,
      |    CAST(MAX(n_chars) AS BIGINT) AS hi FROM documents
      |), b AS (
      |  SELECT ((n_chars - lo) * 64) // (hi - lo + 1) AS bin,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM documents, r GROUP BY 1
      |), cum AS (
      |  SELECT SUM(ca) OVER (ORDER BY bin) AS cuma,
      |         SUM(cb) OVER (ORDER BY bin) AS cumb
      |  FROM b
      |), t AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      |  FROM b
      |)
      |SELECT na, nb,
      |  CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT) AS d_num,
      |  CAST((MAX(ABS(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
      |        * 1000000) // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS d_ppm
      |FROM cum, t GROUP BY na, nb""".stripMargin

  /** q67 — IVF recall@k: the ANN quality/latency trade made measurable.
    * The same query set (vec_id % 200 == 0) runs through brute-force
    * top-3 (exhaustive truth — every corpus vector scored) and the q30
    * IVF path (8 seed buckets, 2 probed); recall@3 = |IVF ∩ truth| / 3
    * per query. At 100 TB the truth side is the one you can't afford —
    * this query is the offline audit you run on a sample to pick
    * (buckets, probes) before trusting IVF for the full corpus.
    */
  def ivfRecall(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    val q = e.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = SimilarityOps.bruteForceTopK(q, e, 3)
      .select(col("query_id"), col("neighbor_id"))
    val approx = SimilarityOps.ivfTopK(e, seeds, q, k = 3, probes = 2)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits").cast("bigint").as("hits"),
        round(col("hits") / 3.0, 4).as("recall_at_3"))
      .orderBy("query_id")
  }

  val ivfRecallOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id % 200 = 0
      |), truth AS (
      |  SELECT query_id, vec_id AS neighbor_id FROM (
      |    SELECT q.query_id, e.vec_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY round(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 4) DESC,
      |                 e.vec_id) AS rank
      |    FROM q, embeddings e WHERE e.vec_id <> q.query_id)
      |  WHERE rank <= 3
      |), seeds AS (
      |  SELECT vec_id AS seed_id, CAST(embedding AS DOUBLE[]) AS sv
      |  FROM embeddings WHERE vec_id < 8
      |), assigned AS (
      |  SELECT vec_id, embedding, bucket FROM (
      |    SELECT e.vec_id, e.embedding, s.seed_id AS bucket,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.sv), 6) DESC,
      |                 s.seed_id) AS rn
      |    FROM embeddings e, seeds s)
      |  WHERE rn = 1
      |), probed AS (
      |  SELECT query_id, qv, bucket FROM (
      |    SELECT q.query_id, q.qv, s.seed_id AS bucket,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY round(list_cosine_similarity(q.qv, s.sv), 6) DESC,
      |                 s.seed_id) AS rn
      |    FROM q, seeds s)
      |  WHERE rn <= 2
      |), approx AS (
      |  SELECT query_id, vec_id AS neighbor_id FROM (
      |    SELECT p.query_id, a.vec_id,
      |      row_number() OVER (PARTITION BY p.query_id
      |        ORDER BY round(list_cosine_similarity(p.qv, CAST(a.embedding AS DOUBLE[])), 4) DESC,
      |                 a.vec_id) AS rank
      |    FROM probed p JOIN assigned a ON p.bucket = a.bucket
      |    WHERE p.query_id <> a.vec_id)
      |  WHERE rank <= 3
      |)
      |SELECT t.query_id,
      |  CAST(count(a.neighbor_id) AS BIGINT) AS hits,
      |  round(count(a.neighbor_id) / 3.0, 4) AS recall_at_3
      |FROM truth t LEFT JOIN approx a
      |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
      |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin

  /** q68 — bigram-LM quality scoring, the CCNet-style "perplexity
    * filter" shape: train a bigram model ON the corpus (conditional
    * probability p(w2|w1) = c(w1,w2)/c(w1·), bigrams below a min-count
    * cut dropped), then score every document by its mean bigram
    * probability. Low scores flag boilerplate/gibberish whose word
    * transitions the corpus never supports — the standard LM gate before
    * training-data selection (CCNet trains the LM on Wikipedia; same
    * plumbing, different model source).
    *
    * Scale shape: the model is two map-combinable aggregations over the
    * bigram stream, bounded by the min-count cap (at 100 TB you'd also
    * top-K it and broadcast); scoring is one equality join of the pair
    * stream against the model — AQE handles hot bigrams. The per-doc
    * mean is a position-sorted sequential fold, NOT an unordered double
    * sum, so the result is bit-reproducible on any partitioning and in
    * any engine (the per-doc array is doc-length-bounded — the same row
    * the document itself already occupies).
    *
    * Uses mean probability rather than log-space perplexity so every
    * arithmetic step (count ratio, ordered add) is IEEE-exact across
    * engines — `log` ulp differences between libm implementations would
    * make the oracle flaky.
    */
  def bigramLmScore(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    // persisted: consumed three times (unigram counts, bigram counts,
    // and the scoring join) — without it the tokenize+zip_with+posexplode
    // scan re-runs once per consumer (r05: 3 full scans inside a 10 s query)
    val pairs = graft.CacheScope.persisted(
      toks.select(col("doc_id"),
          posexplode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))))
        .select(col("doc_id"), col("pos"),
          col("col.w1").as("w1"), col("col.w2").as("w2")))
    val uni = pairs.groupBy("w1").agg(count(lit(1)).as("c_u"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_b"))
      .filter(col("c_b") >= 3)
    val model = big.join(uni, "w1")
      .select(col("w1"), col("w2"),
        (col("c_b").cast("double") / col("c_u")).as("p"))
    pairs.join(model, Seq("w1", "w2"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("p"), lit(0.0)).as("p"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("pos"), col("p"))).as("ps"))
      .select(col("doc_id"),
        size(col("ps")).cast("bigint").as("n_bigrams"),
        size(filter(col("ps"), x => x.getField("p") > 0))
          .cast("bigint").as("hits"),
        round(
          aggregate(transform(array_sort(col("ps")), x => x.getField("p")),
            lit(0.0), (acc, x) => acc + x) / size(col("ps")),
          4).as("lm_score"))
      .orderBy("doc_id")
  }

  val bigramLmScoreOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      |  FROM documents
      |), pairs AS (
      |  SELECT doc_id, i AS pos, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
      |  WHERE len(toks) >= 2
      |), uni AS (
      |  SELECT w1, count(*) AS c_u FROM pairs GROUP BY w1
      |), big AS (
      |  SELECT w1, w2, count(*) AS c_b FROM pairs GROUP BY w1, w2
      |  HAVING count(*) >= 3
      |), model AS (
      |  SELECT b.w1, b.w2, CAST(b.c_b AS DOUBLE) / u.c_u AS p
      |  FROM big b JOIN uni u USING (w1)
      |), scored AS (
      |  SELECT pr.doc_id, pr.pos, coalesce(m.p, 0.0) AS p
      |  FROM pairs pr LEFT JOIN model m ON pr.w1 = m.w1 AND pr.w2 = m.w2
      |)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
      |  round(list_reduce(list(p ORDER BY pos), (acc, x) -> acc + x)
      |        / count(*), 4) AS lm_score
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q69 — document chunking for training/RAG: overlapping token
    * windows of width 64 with stride 48 (16-token overlap), the unit a
    * downstream embedder or packer consumes. Chunk boundaries depend
    * only on the document's own token array — generated with
    * `sequence` + `explode` per row, so chunking is embarrassingly
    * parallel (no shuffle at all until a consumer asks for one) and the
    * chunk count per doc is ceil((n-64)/48)+1, tail included. Emits the
    * chunk fingerprint rather than the text to keep the verified result
    * narrow; a real pipeline would carry `chunk_text` forward.
    */
  def chunkDocuments(s: SparkSession, d: String): DataFrame = {
    val W = 64
    val S = 48
    val toks = docs(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 1)
    toks
      .withColumn("n_chunks",
        when(col("n") <= W, lit(1))
          .otherwise(ceil((col("n") - W).cast("double") / S).cast("int") + 1))
      .select(col("doc_id"), col("n"), col("toks"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("bigint").as("chunk_id"),
        least(lit(W), col("n") - col("chunk_id") * S).cast("bigint")
          .as("n_tokens"),
        md5(array_join(slice(col("toks"), col("chunk_id") * S + 1, lit(W)), " "))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  val chunkDocumentsOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
      |    len(string_split_regex(lower(text), '\s+')) AS n
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, n, toks,
      |    CASE WHEN n <= 64 THEN 1
      |         ELSE CAST(ceil((n - 64) / 48.0) AS INTEGER) + 1 END AS n_chunks
      |  FROM t WHERE n >= 1
      |)
      |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
      |  CAST(least(64, n - i * 48) AS BIGINT) AS n_tokens,
      |  md5(array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ')) AS chunk_md5
      |FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** q70 — duplicated-span coverage: the exact-substring-dedup analysis
    * (Lee et al. 2022) — per document, how many 8-token spans recur
    * anywhere in the corpus and how many tokens their union covers (the
    * amount substring dedup would cut). The planted near-duplicates make
    * the coverage non-trivial.
    */
  def spanDedup(s: SparkSession, d: String): DataFrame =
    DedupOps.duplicatedSpanStats(docs(s, d), "text", "doc_id")
      .orderBy("doc_id")

  // span hash = Fnv64 on BOTH sides (engine: DedupOps.duplicatedSpanStats;
  // oracle: the same fold spelled in DuckDB SQL by Fnv64.sql) — see the
  // operator's doc comment for the md5→Fnv64 rationale
  val spanDedupOracle: String =
    s"""WITH tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents
      |), g AS (
      |  SELECT doc_id, u.i - 1 AS pos,
      |    ${graft.expressions.Fnv64.sql("array_to_string(t[u.i : u.i + 7], ' ')")} AS h
      |  FROM tok, UNNEST(range(1, len(t) - 6)) AS u(i)
      |  WHERE len(t) >= 8
      |), d AS (
      |  SELECT h FROM g GROUP BY h HAVING count(*) > 1
      |), p AS (
      |  SELECT g.doc_id, g.pos FROM g JOIN d USING (h)
      |), c AS (
      |  SELECT doc_id, pos,
      |    greatest(0, pos + 8 - greatest(coalesce(
      |      max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos), pos)) AS new_tokens
      |  FROM p
      |), perdoc AS (
      |  SELECT doc_id, count(*) AS n_dup_positions,
      |    CAST(sum(new_tokens) AS BIGINT) AS dup_tokens_covered
      |  FROM c GROUP BY 1
      |), tot AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
      |    CAST(greatest(len(t) - 7, 0) AS BIGINT) AS n_positions
      |  FROM tok
      |)
      |SELECT tot.doc_id, n_tokens, n_positions,
      |  coalesce(n_dup_positions, 0) AS n_dup_positions,
      |  coalesce(dup_tokens_covered, 0) AS dup_tokens_covered,
      |  round(coalesce(dup_tokens_covered, 0) * 1.0 / n_tokens, 6) AS dup_ratio
      |FROM tot LEFT JOIN perdoc USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q74 — segment-level boilerplate removal with rewrite (the
    * CCNet-style corpus pass q70 only ANALYZES): drop every 10-token
    * segment shared by more than one document, rebuild each document
    * from its surviving segments in original order, and fingerprint the
    * rewritten text. Planted near-duplicate pairs share most aligned
    * segments, so both members come back substantially (often fully)
    * emptied — the dedup actually rewrites, it doesn't just count.
    */
  def segmentDedup(s: SparkSession, d: String): DataFrame =
    DedupOps.segmentDedupRewrite(docs(s, d), "text", "doc_id",
        segTokens = 10, maxDocFreq = 1)
      .orderBy("doc_id")

  val segmentDedupOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
      |), seg AS (
      |  SELECT doc_id, u.i AS seg_idx,
      |    array_to_string(t[u.i * 10 + 1 : u.i * 10 + 10], ' ') AS seg
      |  FROM tok, UNNEST(generate_series(0,
      |    CAST(ceil(len(t) / 10.0) AS INTEGER) - 1)) AS u(i)
      |  WHERE len(t) >= 1
      |), h AS (
      |  SELECT doc_id, seg_idx, seg, md5(seg) AS h FROM seg
      |), hot AS (
      |  SELECT h FROM h GROUP BY h HAVING count(DISTINCT doc_id) > 1
      |), kept AS (
      |  SELECT doc_id, seg_idx, seg FROM h
      |  WHERE h NOT IN (SELECT h FROM hot)
      |), reb AS (
      |  SELECT doc_id, count(*) AS kept_segments,
      |    md5(string_agg(seg, ' ' ORDER BY seg_idx)) AS new_md5
      |  FROM kept GROUP BY doc_id
      |), tot AS (
      |  SELECT doc_id, count(*) AS n_segments FROM seg GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  coalesce(n_segments, CAST(0 AS BIGINT)) AS n_segments,
      |  coalesce(kept_segments, CAST(0 AS BIGINT)) AS kept_segments,
      |  coalesce(new_md5, md5('')) AS new_md5
      |FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN reb USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q75 — Unicode canonicalization ([[graft.expressions.UnicodeNormalize]],
    * a codegen'd native expression — Spark ships no normalizer and a UDF
    * would fence whole-stage codegen): the corpus is deterministically
    * "mangled" into decomposed form (every `a` becomes `a` + U+0301
    * combining acute — how text actually arrives from some OCR/legacy
    * sources), then NFC-normalized, which recomposes each pair into the
    * single code point U+00E1. Char counts prove the recomposition
    * happened (the decomposed surplus vanishes); the md5 proves
    * byte-exact agreement with DuckDB's nfc_normalize.
    */
  def unicodeNormalize(s: SparkSession, d: String): DataFrame = {
    import graft.expressions.UnicodeNormalize.unicode_normalize
    // the replacement is "a" + U+0301 COMBINING ACUTE, written as an
    // escape so no editor/formatter can silently precompose it to U+00E1
    val decomposed = regexp_replace(col("text"), "a", "a\u0301")
    docs(s, d)
      .withColumn("decomposed", decomposed)
      .withColumn("nfc", unicode_normalize(col("decomposed"), "NFC"))
      .select(col("doc_id"),
        length(col("text")).cast("bigint").as("raw_chars"),
        length(col("decomposed")).cast("bigint").as("decomposed_chars"),
        length(col("nfc")).cast("bigint").as("nfc_chars"),
        md5(col("nfc")).as("nfc_md5"))
      .orderBy("doc_id")
  }

  val unicodeNormalizeOracle: String =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    replace(text, 'a', 'a' || chr(769)) AS decomposed
      |  FROM documents
      |), n AS (
      |  SELECT doc_id, text, decomposed,
      |    nfc_normalize(decomposed) AS nfc
      |  FROM m
      |)
      |SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS raw_chars,
      |  CAST(length(decomposed) AS BIGINT) AS decomposed_chars,
      |  CAST(length(nfc) AS BIGINT) AS nfc_chars,
      |  md5(nfc) AS nfc_md5
      |FROM n ORDER BY doc_id""".stripMargin

  /** q79 — deterministic fractional epoch upsampling
    * ([[functions.Sampling.epochUpsample]]): the oversampling half of
    * corpus mixing (q48/q57 downsample; a 2.5×-weighted source must also
    * be REPEATABLE). Weight 1.3 ⇒ every doc once, the hash-selected 30%
    * twice — per-row deterministic, shuffle-free, and numbered by epoch
    * so downstream packing treats copies as distinct samples.
    */
  def epochUpsample(s: SparkSession, d: String): DataFrame =
    functions.Sampling.epochUpsample(docs(s, d), col("lang"), col("doc_id"),
        weightsPctX100 = Map("en" -> 130, "de" -> 250, "zh" -> 400),
        defaultPctX100 = 100, salt = "epoch-v1|")
      .select(col("doc_id"), col("lang"), col("n_epochs"), col("epoch"))
      .orderBy("doc_id", "epoch")

  val epochUpsampleOracle: String =
    """WITH w AS (
      |  SELECT doc_id, lang,
      |    CASE lang WHEN 'en' THEN 130 WHEN 'de' THEN 250
      |              WHEN 'zh' THEN 400 ELSE 100 END AS w,
      |    CAST(CAST('0x' || substr(md5('epoch-v1|' || CAST(doc_id AS VARCHAR)), 1, 8)
      |         AS BIGINT) % 100 AS INTEGER) AS b
      |  FROM documents
      |), n AS (
      |  SELECT doc_id, lang,
      |    (w // 100) + CASE WHEN b < (w % 100) THEN 1 ELSE 0 END AS n_epochs
      |  FROM w
      |)
      |SELECT doc_id, lang, CAST(n_epochs AS BIGINT) AS n_epochs,
      |  CAST(u.e AS BIGINT) AS epoch
      |FROM n, UNNEST(generate_series(1, n_epochs)) AS u(e)
      |WHERE n_epochs >= 1
      |ORDER BY doc_id, epoch""".stripMargin

  /** q78 — tokenizer vocabulary sizing: for each target coverage level,
    * the smallest frequency-ranked vocabulary covering that share of all
    * token OCCURRENCES (the curve a tokenizer team reads before fixing a
    * vocab size). The global frequency-descending running total rides
    * the bucketed [[graft.operators.PrefixSum]] — never a
    * single-partition window — and the coverage test is exact integer
    * arithmetic (`excl·100 < pct·total`), so no float crosses the
    * engine boundary. A token is in the minimal vocabulary iff the mass
    * strictly before it is below the target.
    */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = docs(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val ranked = graft.operators.PrefixSum.exclusiveRunningTotal(
      counts.withColumn("neg_cnt", -col("cnt")),
      Seq(col("neg_cnt"), col("token")), col("cnt"), "excl")
    val total = counts.agg(sum(col("cnt"))).scalar()
    val thresholds = Seq(50L, 90L, 95L, 99L).toDF("pct")
    ranked.crossJoin(broadcast(thresholds))
      .filter(col("excl") * lit(100L) < col("pct") * total)
      .groupBy(col("pct"))
      .agg(count(lit(1)).as("vocab_size"),
        sum(col("cnt")).as("covered_tokens"))
      .orderBy("pct")
  }

  val vocabCoverageOracle: String =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
      |  FROM documents
      |), c AS (
      |  SELECT token, count(*) AS cnt FROM tok GROUP BY token
      |), w AS (
      |  SELECT token, cnt, coalesce(sum(cnt) OVER (
      |    ORDER BY cnt DESC, token
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
      |  FROM c
      |), t AS (
      |  SELECT sum(cnt) AS total FROM c
      |), th AS (
      |  SELECT CAST(unnest([50, 90, 95, 99]) AS BIGINT) AS pct
      |)
      |SELECT pct, count(*) AS vocab_size,
      |  CAST(sum(cnt) AS BIGINT) AS covered_tokens
      |FROM w, th, t
      |WHERE excl * 100 < pct * total
      |GROUP BY pct ORDER BY pct""".stripMargin

  /** q71 — TF-IDF keyword extraction: top-5 terms per document by
    * tf · (N/df) (multiplicative inverse document frequency — the
    * rational form is IEEE-exact cross-engine, where `ln` rounding is
    * implementation-defined; the rank order per term count is the same).
    * Term-keyed shuffle for df, doc-partitioned top-k (WindowGroupLimit
    * pushes the limit below the sort) — no driver traffic, no global
    * window.
    */
  def tfidfTerms(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val toks = dd.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = dd.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      // tf·N is exact in long and exact in double; the division is
      // correctly rounded — identical doubles in any IEEE engine
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank").cast("bigint").as("rank"), col("term"),
        col("tf"), col("df"), round(col("score"), 6).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  val tfidfTermsOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
      |), df AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT count(*) AS n_docs FROM documents
      |), s AS (
      |  SELECT doc_id, term, tf, df, CAST(tf * n_docs AS DOUBLE) / df AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, term) AS rank FROM s
      |)
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df,
      |  round(score, 6) AS tfidf
      |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  /** q72 — int8 scalar-quantized ANN: top-3 neighbors per query ranked
    * by EXACT integer dot products over fixed-scale quantized codes
    * ([[SimilarityOps.quantize8]]) — the 4×-memory-reduction scale path
    * for ANN, with no floating-point anywhere in the ranking.
    */
  def quantizedAnn(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    SimilarityOps.quantizedTopK(q, e, k = 3).orderBy("query_id", "rank")
  }

  val quantizedAnnOracle: String =
    """WITH qz AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(floor(x * 127) AS BIGINT)) AS v
      |  FROM embeddings
      |), q AS (
      |  SELECT vec_id AS query_id, v AS qv FROM qz WHERE vec_id % 200 = 0
      |), s AS (
      |  SELECT query_id, vec_id,
      |    CAST(list_sum(list_transform(range(1, len(qv) + 1),
      |      i -> qv[i] * v[i])) AS BIGINT) AS qdot
      |  FROM q, qz WHERE vec_id <> query_id
      |), r AS (
      |  SELECT query_id, vec_id, qdot,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY qdot DESC, vec_id) AS rank
      |  FROM s
      |)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, qdot
      |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** q102 — product-quantization ANN with ADC ranking: 64-dim doubles →
    * 8 byte codes (m=8 subspaces × 16 centroids), queries ranked against
    * CODES via per-query centroid-distance lookup tables — corpus
    * vectors are never decoded ([[SimilarityOps.pqTopK]]). The codebook
    * is seeded (centroid j = seed j's subvector), so encode AND ranking
    * replay exactly in DuckDB: a hash match certifies the whole
    * compression pipeline, not a tolerance band. 32× memory vs float32
    * — the rung above q72's int8 SQ (4×) on the ANN compression ladder.
    */
  def pqAnn(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val cb = SimilarityOps.pqCodebook(e, m = 8, subDim = 8, kCodes = 16)
    val q = e.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    SimilarityOps.pqTopK(e, cb, q, k = 3, m = 8, subDim = 8)
      .orderBy("query_id", "rank")
  }

  /** CTE chain ending in `r(query_id, vec_id, pq_dist, rank)` — the full
    * PQ encode + ADC pipeline, shared by the q102 oracle and the q105
    * recall oracle.
    */
  private def pqPipelineSql: String = pqPipelineSqlOn("TRUE")

  /** [[pqPipelineSql]] with a corpus predicate on the SEARCHED side
    * (`enc.vec_id`): q102 searches everything; q105's recall audit runs
    * over a deterministic corpus subsample, so its oracle ranks over the
    * same restricted universe.
    */
  private def pqPipelineSqlOn(corpusPred: String): String = {
    // exact fold-ordered squared L2 over 8 dims (mirrors the Spark fold:
    // 0 + t1 + ... with every term >= 0, so the seed add is exact)
    def d2(a: String, b: String): String =
      s"list_reduce(list_transform(generate_series(1, 8), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (p, q) -> p + q)"
    val dsum = (0 until 8).map(i => s"sum(CASE WHEN l.s = $i THEN dq END)")
      .mkString(" + ")
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), sub AS (
       |  SELECT vec_id, CAST(u.s AS INTEGER) AS s,
       |    v[u.s * 8 + 1 : u.s * 8 + 8] AS sv
       |  FROM e, UNNEST(range(8)) AS u(s)
       |), cb AS (
       |  SELECT s, vec_id AS j, sv AS cent FROM sub WHERE vec_id < 16
       |), enc AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT sub.vec_id, sub.s, cb.j,
       |      row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${d2("sub.sv", "cb.cent")}, cb.j) AS rn
       |    FROM sub JOIN cb USING (s))
       |  WHERE rn = 1
       |), lut AS (
       |  SELECT sub.vec_id AS query_id, cb.s, cb.j,
       |    ${d2("sub.sv", "cb.cent")} AS dq
       |  FROM sub JOIN cb USING (s) WHERE sub.vec_id % 200 = 0
       |), scored AS (
       |  SELECT l.query_id, enc.vec_id, $dsum AS pq_dist
       |  FROM enc JOIN lut l ON enc.s = l.s AND enc.code = l.j
       |  WHERE enc.vec_id <> l.query_id AND ($corpusPred)
       |  GROUP BY 1, 2
       |), r AS (
       |  SELECT query_id, vec_id, pq_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY pq_dist, vec_id) AS rank
       |  FROM scored
       |)""".stripMargin
  }

  val pqAnnOracle: String =
    s"""WITH $pqPipelineSql
       |SELECT query_id, CAST(rank AS BIGINT) AS rank,
       |  vec_id AS neighbor_id, pq_dist
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** q105 — PQ recall@3 vs the exact cosine truth: the audit that
    * chooses (m, k) before trusting 32×-compressed codes for the full
    * corpus — same offline-quality-gate shape as q67's IVF audit. The
    * audit universe is a DETERMINISTIC 25% corpus subsample (vec_id ≡ 1
    * mod 4) on BOTH the exhaustive-truth side and the PQ side, so
    * recall stays apples-to-apples while the brute-force truth never
    * scans the full corpus — the 100 TB shape (the codebook still
    * trains on everything, exactly what production serves).
    */
  def pqRecall(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val cb = SimilarityOps.pqCodebook(e, m = 8, subDim = 8, kCodes = 16)
    val q = e.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    // query ids are ≡ 0 (mod 4), so the sampled universe never contains
    // a query itself — self-exclusion holds by construction
    val u = graft.CacheScope.persisted(e.filter(col("vec_id") % 4 === 1))
    val truth = SimilarityOps.bruteForceTopK(q, u, 3)
      .select(col("query_id"), col("neighbor_id"))
    val approx = SimilarityOps.pqTopK(u, cb, q, k = 3, m = 8, subDim = 8)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits").cast("bigint").as("hits"),
        round(col("hits") / 3.0, 4).as("recall_at_3"))
      .orderBy("query_id")
  }

  val pqRecallOracle: String =
    s"""WITH ${pqPipelineSqlOn("enc.vec_id % 4 = 1")}, approx AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM r WHERE rank <= 3
       |), tq AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 200 = 0
       |), truth AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT tq.query_id, e2.vec_id,
       |      row_number() OVER (PARTITION BY tq.query_id
       |        ORDER BY round(list_cosine_similarity(tq.qv, CAST(e2.embedding AS DOUBLE[])), 4) DESC,
       |                 e2.vec_id) AS rank
       |    FROM tq, embeddings e2
       |    WHERE e2.vec_id <> tq.query_id AND e2.vec_id % 4 = 1)
       |  WHERE rank <= 3
       |)
       |SELECT t.query_id,
       |  CAST(count(a.neighbor_id) AS BIGINT) AS hits,
       |  round(count(a.neighbor_id) / 3.0, 4) AS recall_at_3
       |FROM truth t LEFT JOIN approx a
       |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
       |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin

  /** q110 — PMI collocations: the corpus's strongest two-word
    * associations (pointwise mutual information over adjacent token
    * pairs), the standard phrase-mining signal (Mikolov et al. 2013 use
    * exactly this score to merge "new_york"-style phrases before
    * training). Counts ride the same bigram stream as q68 — two
    * map-combinable aggregations plus one broadcast-sized total.
    *
    * PMI is log(N·c(xy) / (c(x)·c(y))), but `log` is not cross-engine
    * bit-exact and monotone transforms don't change a ranking — so the
    * score is emitted as the EXACT integer ppm ratio
    * `c(xy)·N·1e6 div (c(x)·c(y))` (bounded: c≤N≤2^31 at any realistic
    * shard, product < 2^63). Rare-pair noise is cut with the usual
    * min-count gate (c(xy) ≥ 5); top 200 under a total order so the
    * LIMIT is deterministic.
    */
  def pmiCollocations(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d)
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    val pairs = graft.CacheScope.persisted(
      toks.select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2")))
    val uni = graft.CacheScope.persisted(
      pairs.select(col("w1").as("w"))
        .unionAll(pairs.select(col("w2").as("w")))
        .groupBy("w").agg(count(lit(1)).as("c")))
    // one bounded scalar: total token-slot count N (each pair contributes
    // two slots; constant factors cancel in a ranking but N keeps the
    // score on the familiar ppm-of-corpus scale)
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 5)
    big
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .join(uni.groupBy().agg(sum(col("c")).as("n_slots")))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        // DECIMAL(38,0) carrier: c_xy*N*10^6 exceeds 2^63 already at a
        // ~100M-token corpus with a frequent bigram — BIGINT would wrap
        // silently (ANSI off); the oracle mirrors with HUGEINT
        expr("CAST(c_xy AS DECIMAL(38,0)) * n_slots * 1000000 div (c_x * c_y)")
          .as("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("w1"), col("w2"))
      .limit(200)
  }

  val pmiCollocationsOracle: String =
    """WITH t AS (
      |  SELECT string_split_regex(lower(text), '\s+') AS toks FROM documents
      |), pairs AS (
      |  SELECT toks[i] AS w1, toks[i + 1] AS w2
      |  FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
      |  WHERE len(toks) >= 2
      |), uni AS (
      |  SELECT w, count(*) AS c FROM (
      |    SELECT w1 AS w FROM pairs UNION ALL SELECT w2 FROM pairs)
      |  GROUP BY w
      |), nn AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n_slots FROM uni
      |), big AS (
      |  SELECT w1, w2, count(*) AS c_xy FROM pairs GROUP BY w1, w2
      |  HAVING count(*) >= 5
      |)
      |SELECT b.w1, b.w2, b.c_xy, ux.c AS c_x, uy.c AS c_y,
      |  CAST((CAST(b.c_xy AS HUGEINT) * nn.n_slots * 1000000) // (ux.c * uy.c) AS BIGINT) AS pmi_ppm
      |FROM big b
      |JOIN uni ux ON ux.w = b.w1
      |JOIN uni uy ON uy.w = b.w2
      |CROSS JOIN nn
      |ORDER BY pmi_ppm DESC, b.w1, b.w2 LIMIT 200""".stripMargin

  /** q113 — SemDeDup semantic dedup: 8 seed clusters block the corpus;
    * scaled duplicate vectors (cosine-invariant ×0.5 copies of every
    * 50th vector — float halving is exact, so the copy's cosines are
    * bit-identical to the original's) are planted in-query and must be
    * flagged within their cluster. Every vector reports its cluster and
    * verdict, so the oracle checks the assignment AND the prune.
    */
  def semanticDedupQ(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d).select("vec_id", "embedding")
    val copies = e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    SimilarityOps.semanticDedup(e.unionByName(copies), seeds)
      .orderBy("vec_id")
  }

  val semanticDedupOracle: String =
    """WITH feed AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    list_transform(embedding, x -> x * CAST(0.5 AS FLOAT))
      |  FROM embeddings WHERE vec_id % 50 = 0
      |), seeds AS (
      |  SELECT vec_id AS seed_id, CAST(embedding AS DOUBLE[]) AS sv
      |  FROM embeddings WHERE vec_id < 8
      |), assigned AS (
      |  SELECT vec_id, embedding, bucket FROM (
      |    SELECT f.vec_id, f.embedding, s.seed_id AS bucket,
      |      row_number() OVER (PARTITION BY f.vec_id
      |        ORDER BY round(list_cosine_similarity(CAST(f.embedding AS DOUBLE[]), s.sv), 6) DESC,
      |                 s.seed_id) AS rn
      |    FROM feed f, seeds s)
      |  WHERE rn = 1
      |), dropped AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM assigned a JOIN assigned b
      |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                                     CAST(b.embedding AS DOUBLE[])), 4) >= 0.99
      |)
      |SELECT a.vec_id, a.bucket,
      |  CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
      |FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
      |ORDER BY a.vec_id""".stripMargin

  /** q114 — Count-Min frequency estimates audited against exact counts:
    * build a 4×512 CMS over the corpus token stream, point-estimate the
    * top-100 tokens, and report the (always ≥ 0) over-count per token.
    * Everything is integer-exact, so the sketch itself — not a summary —
    * is under the oracle.
    */
  def cmsFrequency(s: SparkSession, d: String,
      depths: Int = 4, width: Int = 512): DataFrame = {
    // token stream feeds the sketch build and the exact counts
    val toks = CacheScope.persisted(
      docs(s, d).select(explode(TextAnalysis.tokens(col("text"))).as("tok")))
    val sk = CountMin.sketch(toks, "tok", depths, width)
    // top-k by exact count: TakeOrderedAndProject, bounded at k rows
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(100)
    CountMin.estimate(sk, top.select("tok"), "tok", depths, width)
      .join(broadcast(top), "tok")
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("over_err"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  val cmsFrequencyOracle: String =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents
      |), hashes AS (
      |  SELECT tok, dd.d AS depth,
      |    CAST('0x' || substr(md5('cms' || CAST(dd.d AS VARCHAR) || '|' || tok), 1, 15)
      |         AS BIGINT) % 512 AS bucket
      |  FROM tok CROSS JOIN (SELECT unnest(range(0, 4)) AS d) dd
      |), sk AS (
      |  SELECT depth, bucket, count(*) AS cnt FROM hashes GROUP BY 1, 2
      |), top AS (
      |  SELECT tok, count(*) AS exact_cnt FROM tok GROUP BY 1
      |  ORDER BY exact_cnt DESC, tok LIMIT 100
      |), est AS (
      |  -- LEFT join: a term whose bucket holds no counter estimates 0
      |  -- (the empty counter IS a count of zero), mirroring
      |  -- CountMin.estimate's left join + coalesce
      |  SELECT t.tok, min(coalesce(s.cnt, 0)) AS cms_est
      |  FROM top t
      |  CROSS JOIN (SELECT unnest(range(0, 4)) AS d) dd
      |  LEFT JOIN sk s ON s.depth = dd.d
      |   AND s.bucket = CAST('0x' || substr(md5('cms' || CAST(dd.d AS VARCHAR) || '|' || t.tok), 1, 15)
      |                       AS BIGINT) % 512
      |  GROUP BY 1
      |)
      |SELECT t.tok, t.exact_cnt, e.cms_est, e.cms_est - t.exact_cnt AS over_err
      |FROM top t JOIN est e ON t.tok = e.tok
      |ORDER BY exact_cnt DESC, t.tok""".stripMargin

  /** q115 — DSIR-style data selection: importance-weight every document
    * against a topic-defined target set (the documents mentioning the
    * rare term "dup") via hashed-unigram bucket ratios, and keep the
    * top 200 (see [[graft.functions.Sampling.importanceWeights]] for the
    * exact-integer formulation and the deviation from the paper's
    * log-sum). A content-defined target is the honest demo on this
    * fixture: its token distribution genuinely differs from the raw
    * corpus (the target's "dup" frequency is ~25× the corpus rate),
    * whereas the lang/source strata share one uniform vocabulary and
    * carry zero unigram signal. `n_dup` rides along as the audit
    * column — the selection should surface the dup-dense documents.
    */
  def dsirSelection(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    // n_dup rides the operator's own final per-doc aggregation pass
    // (tokenAudits) — the corpus is tokenized ONCE and the separate
    // doc-keyed audit join disappears
    graft.functions.Sampling.importanceWeights(
        docs(s, d), array_contains(toks, "dup"),
        tokenAudits = Seq(sum(when(col("tok") === "dup", 1L).otherwise(0L))
          .cast("bigint").as("n_dup")))
      .orderBy(col("weight").desc, col("doc_id")).limit(200)
      .select("doc_id", "n_dup", "weight")
  }

  val dsirSelectionOracle: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    list_contains(string_split_regex(lower(text), '\s+'), 'dup') AS is_target,
      |    unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, is_target,
      |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 4096 AS bucket
      |  FROM tok
      |), stats AS (
      |  SELECT bucket,
      |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tgt,
      |    count(*) AS raw
      |  FROM b GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(tgt) AS BIGINT) AS nt, CAST(sum(raw) AS BIGINT) AS nr
      |  FROM stats
      |), scored AS (
      |  SELECT bucket, ((tgt + 1) * nr * 1000) // ((raw + 1) * nt) AS score
      |  FROM stats CROSS JOIN tot
      |), w AS (
      |  SELECT doc_id,
      |    (CAST(sum(score) AS BIGINT) * 1000) // count(*) AS weight
      |  FROM b JOIN scored USING (bucket)
      |  GROUP BY 1
      |)
      |SELECT d.doc_id,
      |  CAST(len(list_filter(string_split_regex(lower(d.text), '\s+'),
      |                       t -> t = 'dup')) AS BIGINT) AS n_dup,
      |  w.weight
      |FROM documents d JOIN w ON d.doc_id = w.doc_id
      |ORDER BY weight DESC, d.doc_id LIMIT 200""".stripMargin

  /** q123 — curation Pareto frontier: the documents not dominated on the
    * (shorter, higher-quality) tradeoff — no other doc is both at most
    * as long AND strictly better (or shorter and at least as good). The
    * skyline every budget-constrained curation run walks when trading
    * tokens for quality. Scale shape: dominance is NOT an all-pairs
    * join — per-length max quality is one map-combinable groupBy, the
    * running max runs over the DISTINCT-LENGTH table (bounded by the
    * value domain, never by corpus size — the q122 cumsum argument), and
    * the frontier test is a broadcast join of that table back onto the
    * scan. The oracle states the same semantics as a NOT EXISTS
    * dominance query — quadratic, fine at fixture scale — so the
    * bucketed formulation is verified against the definition itself.
    */
  def paretoFrontier(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: the tokenize+quality scan — the query's whole per-row
    // cost — otherwise runs THREE times: the per-length max branch, and
    // the presentation sort's range-sample pass plus its real pass each
    // re-execute the scan child (measured 3×~8 task-CPU-s at sf0.1).
    // The cache is three numeric columns per doc.
    val scored = graft.CacheScope.persisted(docs(s, d).select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens"),
      qualityScore.as("quality_score")))
    val w = Window.orderBy("n_tokens")
    val cum = scored.groupBy("n_tokens")
      .agg(max("quality_score").as("len_max"))
      .withColumn("prev_max",
        max("len_max").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("cum_max",
        max("len_max").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    scored.join(broadcast(cum), "n_tokens")
      .filter((col("prev_max").isNull ||
          col("prev_max") < col("quality_score")) &&
        col("cum_max") <= col("quality_score"))
      .select("doc_id", "n_tokens", "quality_score")
      .orderBy("doc_id")
  }

  val paretoFrontierOracle: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
       |      AS n_tokens,
       |    $qualityScoreSql AS quality_score
       |  FROM documents
       |)
       |SELECT a.doc_id, a.n_tokens, a.quality_score
       |FROM s a
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM s b
       |  WHERE (b.n_tokens < a.n_tokens AND b.quality_score >= a.quality_score)
       |     OR (b.n_tokens <= a.n_tokens AND b.quality_score > a.quality_score))
       |ORDER BY a.doc_id""".stripMargin

  /** q124 — closed-form OLS per language: chars-per-token trend
    * (n_chars ~ n_tokens), the distributed-ML primitive behind every
    * "fit a line to a 100 TB feature" job. One map-combinable pass
    * accumulates the five sufficient moments (n, Σx, Σy, Σxy, Σx²) in
    * exact BIGINT — both variables are integers, so the moments carry no
    * float summation order — and slope/intercept/r² assemble from them
    * in fixed double expressions (BIGINT→DOUBLE correctly rounded, one
    * operation order), bit-identical on any IEEE engine. The q117
    * moment discipline applied to model fitting.
    */
  def olsTrend(s: SparkSession, d: String): DataFrame = {
    docs(s, d)
      .select(col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("x"),
        col("n_chars").as("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"))
      .select(col("lang"), col("n"),
        expr("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)")
          .as("slope"),
        expr("""(CAST(sy AS DOUBLE)
               - (CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE)""").as("intercept"),
        (expr("CAST(n * sxy - sx * sy AS DOUBLE)") *
          expr("CAST(n * sxy - sx * sy AS DOUBLE)") /
          (expr("CAST(n * sxx - sx * sx AS DOUBLE)") *
            expr("CAST(n * syy - sy * sy AS DOUBLE)"))).as("r2"))
      .orderBy("lang")
  }

  val olsTrendOracle: String =
    """WITH s AS (
      |  SELECT lang,
      |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS x,
      |    n_chars AS y
      |  FROM documents
      |), m AS (
      |  SELECT lang, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM s GROUP BY 1
      |)
      |SELECT lang, n,
      |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
      |    AS slope,
      |  (CAST(sy AS DOUBLE)
      |   - (CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
      |  / CAST(n AS DOUBLE) AS intercept,
      |  CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
      |    / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
      |    AS r2
      |FROM m ORDER BY lang""".stripMargin

  /** q129 — corpus novelty scoring: for every candidate document, the
    * share of its distinct 5-gram shingles absent from the reference
    * corpus (docs with id % 3 == 0 stand in for "data we already
    * have") — the measure that decides whether a new crawl slice is
    * worth ingesting. Same scale shape as decontamination (shingle
    * equality anti-join, one shuffle; per-doc counts map-combinable) but
    * inverted: instead of flagging overlap pairs, it scores what is NEW.
    * Ratios are exact integer ppm.
    */
  def noveltyScore(s: SparkSession, d: String): DataFrame = {
    // widen BEFORE the shingle explode ([[graft.Par.toCores]]): the
    // 5-gram tokenize+explode is per-row CPU inside the scan (measured
    // 10.4 task-CPU-s at ~1-way on the one-row-group fixture);
    // clustering BY doc_id pre-shapes the cache for the two per-doc
    // aggregates below.
    val all = CacheScope.persisted(
      graft.Par.toCores(docs(s, d), col("doc_id"))
        .select(col("doc_id"),
          explode(TextAnalysis.textShingles(col("text"), 5)).as("g")))
    val ref = all.filter(col("doc_id") % 3 === 0).select("g").distinct()
    val cand = all.filter(col("doc_id") % 3 =!= 0)
    val novel = cand.join(ref, Seq("g"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    cand.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ppm", expr("(n_novel * 1000000) div n_shingles"))
      .orderBy("doc_id")
  }

  val noveltyScoreOracle: String =
    s"""WITH $tokShSql, ex AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), ref AS (
       |  SELECT DISTINCT g FROM ex WHERE doc_id % 3 = 0
       |), cand AS (
       |  SELECT doc_id, g FROM ex WHERE doc_id % 3 <> 0
       |), n AS (
       |  SELECT cand.doc_id, count(*) AS n_shingles,
       |    CAST(sum(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_novel
       |  FROM cand LEFT JOIN ref ON cand.g = ref.g
       |  GROUP BY 1
       |)
       |SELECT doc_id, n_shingles, n_novel,
       |  (n_novel * 1000000) // n_shingles AS novelty_ppm
       |FROM n ORDER BY doc_id""".stripMargin

  /** q130 — categorical independence screen over the (lang, source)
    * contingency table: per-cell deviation from the independence
    * expectation, `(N·O − r·c)·10⁶ div (r·c)` — i.e. (O/E − 1) in exact
    * integer ppm. The per-cell residual carries the same signal as a
    * chi-square scan (which cells are over/under-represented — the
    * "does this crawl source skew German" question) WITHOUT the global
    * float sum a chi-square statistic needs, so every value is
    * engine-exact. Three map-combinable aggregations (cells, row
    * totals, column totals) and two broadcast joins of the tiny margin
    * tables.
    */
  def independenceResiduals(s: SparkSession, d: String): DataFrame = {
    val base = CacheScope.persisted(
      docs(s, d).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o")))
    val rows = base.groupBy("lang").agg(sum("o").as("r"))
    val cols = base.groupBy("source").agg(sum("o").as("c"))
    val n = base.agg(sum("o").as("n"))
    base.join(broadcast(rows), "lang").join(broadcast(cols), "source")
      .crossJoin(broadcast(n))
      .select(col("lang"), col("source"), col("o"), col("r"), col("c"),
        expr("(CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c) * 1000000 div (r * c)")
          .as("resid_ppm"))
      .orderBy("lang", "source")
  }

  val independenceResidualsOracle: String =
    """WITH base AS (
      |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
      |), r AS (
      |  SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM base GROUP BY 1
      |), c AS (
      |  SELECT source, CAST(sum(o) AS BIGINT) AS c FROM base GROUP BY 1
      |), n AS (
      |  SELECT CAST(sum(o) AS BIGINT) AS n FROM base
      |)
      |SELECT b.lang, b.source, b.o, r.r, c.c,
      |  CAST(((CAST(n.n AS HUGEINT) * b.o - CAST(r.r AS HUGEINT) * c.c) * 1000000) // (r.r * c.c) AS BIGINT) AS resid_ppm
      |FROM base b JOIN r ON b.lang = r.lang JOIN c ON b.source = c.source
      |CROSS JOIN n
      |ORDER BY b.lang, b.source""".stripMargin

  /** q131 — reciprocal-rank fusion (Cormack et al. 2009) of two
    * retrieval rankings: exact-cosine top-10 and int8-quantized top-10
    * fuse per candidate as Σ 10⁹ div (60 + rank) — the floor-scaled
    * integer form of RRF's 1/(k+rank), rank-faithful and engine-exact
    * (the fused score never touches a float). This is how hybrid search
    * stacks combine rankers without score calibration; here it also
    * audits the quantized ranker against the exact one inside the same
    * query. Scale shape: both rankers are the bounded TopK aggregations
    * (map-side truncation before the shuffle), fusion is one
    * map-combinable sum over ≤ 20 rows per query, and the final top-5 is
    * the same bounded TopK.
    */
  def rrfFusion(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TopK
    val e = emb(s, d)
    val q = e.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val lists =
      SimilarityOps.bruteForceTopK(q, e, 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .unionByName(SimilarityOps.quantizedTopK(q, e, 10)
          .select(col("query_id"), col("neighbor_id"), col("rank")))
    val fused = lists
      .select(col("query_id"), col("neighbor_id"),
        expr("1000000000 div (60 + rank)").as("c"))
      .groupBy("query_id", "neighbor_id").agg(sum("c").as("rrf"))
    fused.groupBy("query_id")
      // rrf ≤ 2·10⁹/61 ≪ 2⁵³: the double carrier through TopK is exact
      .agg(TopK.top_k(col("rrf").cast("double"), col("neighbor_id"), 5).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col").getField("id").as("neighbor_id"),
        col("col").getField("sim").cast("bigint").as("rrf"))
      .orderBy("query_id", "rank")
  }

  val rrfFusionOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id % 200 = 0
      |), exs AS (
      |  SELECT query_id, vec_id,
      |    round(list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])), 4) AS sim
      |  FROM q, embeddings WHERE vec_id <> query_id
      |), exr AS (
      |  SELECT query_id, vec_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM exs
      |), qz AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(floor(x * 127) AS BIGINT)) AS v
      |  FROM embeddings
      |), qq AS (
      |  SELECT vec_id AS query_id, v AS qv FROM qz WHERE vec_id % 200 = 0
      |), qs AS (
      |  SELECT query_id, vec_id,
      |    CAST(list_sum(list_transform(range(1, len(qv) + 1),
      |      i -> qv[i] * v[i])) AS BIGINT) AS qdot
      |  FROM qq, qz WHERE vec_id <> query_id
      |), qr AS (
      |  SELECT query_id, vec_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY qdot DESC, vec_id) AS rank
      |  FROM qs
      |), contrib AS (
      |  SELECT query_id, vec_id, 1000000000 // (60 + rank) AS c
      |  FROM exr WHERE rank <= 10
      |  UNION ALL
      |  SELECT query_id, vec_id, 1000000000 // (60 + rank)
      |  FROM qr WHERE rank <= 10
      |), fused AS (
      |  SELECT query_id, vec_id, CAST(sum(c) AS BIGINT) AS rrf
      |  FROM contrib GROUP BY 1, 2
      |), ranked AS (
      |  SELECT query_id, vec_id, rrf,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf DESC, vec_id) AS rank
      |  FROM fused
      |)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
      |  rrf
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** q146 — exact distributed Lloyd's k-means over the embedding corpus
    * ([[SimilarityOps.kmeansExactStats]]): 8 clusters, 2 full
    * assign+update rounds on integer-quantized vectors, floor-divided
    * integer centroid means, deterministic ties. This puts the Lloyd
    * ITERATIONS themselves under the exact oracle — assignment argmin,
    * centroid update, empty-cluster fallback — not just a downstream
    * consumer of rounded centroids (q30/q67 audit IVF behavior; here the
    * training loop is hash-checked step for step). Per cluster: member
    * count, inertia (Σ squared-L2 to the assigned centroid), and the
    * post-update centroid's L1 mass.
    */
  def kmeansClusters(s: SparkSession, d: String): DataFrame =
    SimilarityOps.kmeansExactStats(emb(s, d), k = 8, dims = 64, iters = 2)

  /** CTE chain ending in a2(vec_id, cl, dist) / c2 / l1 — the full
    * 2-round integer Lloyd pipeline, shared by the q146 stats oracle and
    * the q150 exemplar oracle.
    */
  private val kmeansPipelineSql: String = {
    // integer floor-division (DuckDB // truncates; sums can be negative)
    def fdiv(s: String, n: String) = s"(($s - ((($s % $n) + $n) % $n)) // $n)"
    s"""e AS (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000) AS BIGINT)) AS qv
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id, CAST(u.i AS INTEGER) AS pos, qv[u.i] AS x
       |  FROM e, UNNEST(generate_series(1, 64)) AS u(i)
       |), seeds AS (
       |  SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl
       |  FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 8)
       |), c0 AS (
       |  SELECT s.cl, q.pos, q.x AS c FROM seeds s JOIN q USING (vec_id)
       |), d1 AS (
       |  SELECT q.vec_id, p.cl, sum((q.x - p.c) * (q.x - p.c)) AS dist
       |  FROM q JOIN c0 p USING (pos) GROUP BY 1, 2
       |), a1 AS (
       |  SELECT vec_id, cl FROM (
       |    SELECT vec_id, cl,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
       |    FROM d1) WHERE rn = 1
       |), u1 AS (
       |  SELECT a.cl, q.pos, sum(q.x) AS s, count(*) AS n
       |  FROM a1 a JOIN q USING (vec_id) GROUP BY 1, 2
       |), c1 AS (
       |  SELECT p.cl, p.pos,
       |    coalesce(${fdiv("u.s", "u.n")}, p.c) AS c
       |  FROM c0 p LEFT JOIN u1 u ON u.cl = p.cl AND u.pos = p.pos
       |), d2 AS (
       |  SELECT q.vec_id, p.cl, sum((q.x - p.c) * (q.x - p.c)) AS dist
       |  FROM q JOIN c1 p USING (pos) GROUP BY 1, 2
       |), a2 AS (
       |  SELECT vec_id, cl, dist FROM (
       |    SELECT vec_id, cl, dist,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
       |    FROM d2) WHERE rn = 1
       |), u2 AS (
       |  SELECT a.cl, q.pos, sum(q.x) AS s, count(*) AS n
       |  FROM a2 a JOIN q USING (vec_id) GROUP BY 1, 2
       |), c2 AS (
       |  SELECT p.cl, p.pos,
       |    coalesce(${fdiv("u.s", "u.n")}, p.c) AS c
       |  FROM c1 p LEFT JOIN u2 u ON u.cl = p.cl AND u.pos = p.pos
       |), l1 AS (
       |  SELECT cl, sum(abs(c)) AS centroid_l1 FROM c2 GROUP BY cl
       |)""".stripMargin
  }

  val kmeansClustersOracle: String =
    s"""WITH $kmeansPipelineSql
       |SELECT a.cl AS cluster, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(sum(a.dist) AS BIGINT) AS inertia,
       |  CAST(l1.centroid_l1 AS BIGINT) AS centroid_l1
       |FROM a2 a JOIN l1 USING (cl)
       |GROUP BY a.cl, l1.centroid_l1 ORDER BY cluster""".stripMargin

  /** q150 — cluster exemplars: the 8 vectors CLOSEST to their k-means
    * centroid per cluster ([[SimilarityOps.kmeansAssignments]] + ranked
    * window) — prototypical-example selection, the diversity-sampling
    * primitive cluster-balanced curation builds on (pick representatives
    * per region of embedding space instead of frequency-weighted
    * duplicates). The per-cluster rank-≤-m window plans as
    * WindowGroupLimit: map-side top-m per cluster before the exchange,
    * so the corpus never materializes a full per-cluster sort at scale.
    */
  def clusterExemplars(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = SimilarityOps.kmeansAssignments(emb(s, d), k = 8, dims = 64,
      iters = 2)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("dist"), col("vec_id"))
    a.withColumn("rank", row_number().over(w)).filter(col("rank") <= 8)
      .select(col("cluster"), col("rank").cast("bigint").as("rank"),
        col("vec_id"), col("dist"))
      .orderBy("cluster", "rank")
  }

  val clusterExemplarsOracle: String =
    s"""WITH $kmeansPipelineSql
       |SELECT cl AS cluster, CAST(rn AS BIGINT) AS rank, vec_id,
       |  CAST(dist AS BIGINT) AS dist
       |FROM (
       |  SELECT vec_id, cl, dist,
       |    row_number() OVER (PARTITION BY cl ORDER BY dist, vec_id) AS rn
       |  FROM a2)
       |WHERE rn <= 8 ORDER BY cluster, rank""".stripMargin

  /** q147 — IVF-PQ composite ANN ([[SimilarityOps.ivfPqTopK]]): a
    * 4-bucket inverted-file coarse quantizer prunes the corpus, PQ codes
    * (m=8 × 16 centroids) built on coarse RESIDUALS rank the survivors
    * via ADC — the IVFADC serving layout (Jégou et al. 2011). Probing 2
    * of 4 buckets halves the ranked corpus before any distance math;
    * both quantizers are seeded, so bucket assignment, residual encode,
    * probe selection, and ADC ranking all replay exactly in DuckDB — one
    * hash certifies the full composite index.
    */
  def ivfPqAnn(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    SimilarityOps.ivfPqTopK(e, q, k = 3, kCoarse = 4, probes = 2,
      m = 8, subDim = 8, kCodes = 16)
      .orderBy("query_id", "rank")
  }

  /** Exact SQL squared-L2 between two DOUBLE[] columns, fold-ordered to
    * mirror the Spark aggregate (shared by the IVF-PQ oracles).
    */
  private def sqlD2(n: Int, a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, $n), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (p, q) -> p + q)"

  /** CTE chain ending in `r(query_id, vec_id, dist, rank)` — the full
    * IVF-PQ pipeline (coarse assign, residual encode, probe, ADC),
    * shared by the q147 oracle and the q149 recall oracle.
    */
  private val ivfPqPipelineSql: String = {
    def d2(n: Int, a: String, b: String): String = sqlD2(n, a, b)
    val dsum = (0 until 8).map(i => s"sum(CASE WHEN l.s = $i THEN dq END)")
      .mkString(" + ")
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), coarse AS (
       |  SELECT vec_id AS cj, v AS cvec FROM e WHERE vec_id < 4
       |), cassign AS (
       |  SELECT vec_id, cj AS bucket FROM (
       |    SELECT e.vec_id, c.cj,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${d2(64, "e.v", "c.cvec")}, c.cj) AS rn
       |    FROM e, coarse c)
       |  WHERE rn = 1
       |), resid AS (
       |  SELECT e.vec_id, a.bucket,
       |    list_transform(generate_series(1, 64), i -> e.v[i] - c.cvec[i]) AS rv
       |  FROM e JOIN cassign a USING (vec_id) JOIN coarse c ON c.cj = a.bucket
       |), sub AS (
       |  SELECT vec_id, bucket, CAST(u.s AS INTEGER) AS s,
       |    rv[u.s * 8 + 1 : u.s * 8 + 8] AS sv
       |  FROM resid, UNNEST(range(8)) AS u(s)
       |), cb AS (
       |  SELECT s, vec_id - 4 AS j, sv AS cent FROM sub
       |  WHERE vec_id >= 4 AND vec_id < 20
       |), enc AS (
       |  SELECT vec_id, bucket, s, j AS code FROM (
       |    SELECT sub.vec_id, sub.bucket, sub.s, cb.j,
       |      row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${d2(8, "sub.sv", "cb.cent")}, cb.j) AS rn
       |    FROM sub JOIN cb USING (s))
       |  WHERE rn = 1
       |), qprobe AS (
       |  SELECT query_id, bucket, qrv FROM (
       |    SELECT q.vec_id AS query_id, c.cj AS bucket,
       |      list_transform(generate_series(1, 64), i -> q.v[i] - c.cvec[i]) AS qrv,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${d2(64, "q.v", "c.cvec")}, c.cj) AS rn
       |    FROM e q, coarse c WHERE q.vec_id % 200 = 0)
       |  WHERE rn <= 2
       |), qsub AS (
       |  SELECT query_id, bucket, CAST(u.s AS INTEGER) AS s,
       |    qrv[u.s * 8 + 1 : u.s * 8 + 8] AS qsv
       |  FROM qprobe, UNNEST(range(8)) AS u(s)
       |), lut AS (
       |  SELECT q.query_id, q.bucket, cb.s, cb.j,
       |    ${d2(8, "q.qsv", "cb.cent")} AS dq
       |  FROM qsub q JOIN cb ON q.s = cb.s
       |), scored AS (
       |  SELECT l.query_id, enc.vec_id, $dsum AS dist
       |  FROM enc JOIN lut l
       |    ON enc.bucket = l.bucket AND enc.s = l.s AND enc.code = l.j
       |  WHERE enc.vec_id <> l.query_id
       |  GROUP BY 1, 2
       |), r AS (
       |  SELECT query_id, vec_id, dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist, vec_id) AS rank
       |  FROM scored
       |)""".stripMargin
  }

  val ivfPqAnnOracle: String =
    s"""WITH $ivfPqPipelineSql
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  dist AS ivfpq_dist
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** q149 — IVF-PQ recall@3 against the EXACT L2 truth: the audit that
    * prices the composite index's two approximations at once (bucket
    * pruning can drop a true neighbor entirely; PQ codes can misrank a
    * survivor) before pointing production at it — the same
    * quality-gate shape as q67 (IVF) and q105 (PQ), completing the
    * audit ladder for the q147 layout. Truth is brute-force squared-L2
    * ([[SimilarityOps.bruteForceTopKL2]]), the metric IVF-PQ actually
    * ranks by — cosine truth would mis-measure recall on unnormalized
    * vectors.
    */
  def ivfPqRecall(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = SimilarityOps.bruteForceTopKL2(q, e, 3)
      .select(col("query_id"), col("neighbor_id"))
    val approx = SimilarityOps.ivfPqTopK(e, q, k = 3, kCoarse = 4,
        probes = 2, m = 8, subDim = 8, kCodes = 16)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits").cast("bigint").as("hits"),
        round(col("hits") / 3.0, 4).as("recall_at_3"))
      .orderBy("query_id")
  }

  val ivfPqRecallOracle: String =
    s"""WITH $ivfPqPipelineSql, approx AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM r WHERE rank <= 3
       |), truth AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e2.vec_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqlD2(64, "q.v", "e2.v")}, e2.vec_id) AS rank
       |    FROM e q, e e2
       |    WHERE q.vec_id % 200 = 0 AND e2.vec_id <> q.vec_id)
       |  WHERE rank <= 3
       |)
       |SELECT t.query_id,
       |  CAST(count(a.neighbor_id) AS BIGINT) AS hits,
       |  round(count(a.neighbor_id) / 3.0, 4) AS recall_at_3
       |FROM truth t LEFT JOIN approx a
       |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
       |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin

  /** q148 — weighted systematic sampling ([[Sampling.systematicSample]]):
    * draw 100 documents with probability exactly proportional to length
    * (n_chars), PPS-systematic — an exclusive prefix sum lays the corpus
    * on a weight line, every step-th point draws the row it lands in.
    * Deterministic (no RNG: the draw is an integer function of data +
    * doc_id order) and multiplicity-aware: a document longer than the
    * step is drawn `n_picks` > 1 times, the epoch semantics length-
    * balanced token budgets need. The oracle recomputes the prefix sum
    * with a plain window — proving the bucketed distributed PrefixSum
    * equals the single-window semantics.
    */
  def systematicSampleQ(s: SparkSession, d: String): DataFrame =
    graft.functions.Sampling.systematicSample(
      docs(s, d).select(col("doc_id"), col("n_chars")),
      Seq(col("doc_id")), col("n_chars"), nSamples = 100L)
      .select(col("doc_id"), col("weight"), col("cum_before"),
        col("n_picks").cast("bigint").as("n_picks"))
      .orderBy("doc_id")

  val systematicSampleOracle: String =
    """WITH w AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight FROM documents
      |), c AS (
      |  SELECT doc_id, weight,
      |    CAST(coalesce(sum(weight) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cum_before
      |  FROM w
      |), t AS (
      |  SELECT CAST(sum(weight) AS BIGINT) AS tw FROM w
      |), p AS (
      |  SELECT c.doc_id, c.weight, c.cum_before,
      |    (t.tw // 100) AS step, ((t.tw // 100) // 2) AS off
      |  FROM c, t
      |)
      |SELECT doc_id, weight, cum_before,
      |  CAST(least((cum_before + weight + step - off - 1) // step, 100)
      |     - least((cum_before + step - off - 1) // step, 100) AS BIGINT)
      |    AS n_picks
      |FROM p
      |WHERE least((cum_before + weight + step - off - 1) // step, 100)
      |    - least((cum_before + step - off - 1) // step, 100) >= 1
      |ORDER BY doc_id""".stripMargin

  /** q151 — near-containment detection ([[DedupOps.containmentPairs]]):
    * excerpts planted in-query (every 20th document re-ingested as its
    * first-half token prefix under a new id) must be flagged against
    * their source with containment ≈ 1, even though their JACCARD is
    * only ≈ 0.5 — below every near-dup threshold, which is why a
    * Jaccard-only dedup pass ships excerpt duplicates and a containment
    * pass exists at all. Exact integer ppm scores; same inverted-index
    * candidate shape as q26.
    */
  def containmentDetection(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    val toks = TextAnalysis.tokens(col("text"))
    val excerpts = base.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1),
          floor(size(toks) / 2).cast("int"))).as("text"))
    DedupOps.containmentPairs(base.unionByName(excerpts), "text", "doc_id")
      .orderBy("doc_a", "doc_b")
  }

  val containmentDetectionOracle: String =
    """WITH feed AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |    array_to_string(
      |      (string_split_regex(lower(text), '\s+'))[1 :
      |        len(string_split_regex(lower(text), '\s+')) // 2], ' ')
      |  FROM documents WHERE doc_id % 20 = 0
      |), tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM feed
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 5
      |         THEN list_distinct(list_transform(range(1, len(t) - 3),
      |                            i -> array_to_string(t[i:i+4], ' ')))
      |         ELSE [] END AS sh
      |  FROM tok
      |), ex AS (
      |  SELECT doc_id, unnest(sh) AS g FROM sh
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |), v AS (
      |  SELECT doc_a, doc_b,
      |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
      |    (CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * 1000000)
      |      // least(len(sa.sh), len(sb.sh)) AS containment_ppm
      |  FROM cand JOIN sh sa ON doc_a = sa.doc_id
      |            JOIN sh sb ON doc_b = sb.doc_id
      |)
      |SELECT doc_a, doc_b, inter, CAST(containment_ppm AS BIGINT) AS containment_ppm
      |FROM v WHERE containment_ppm >= 900000 ORDER BY doc_a, doc_b""".stripMargin

  /** q152 — Johnson-Lindenstrauss sign projection
    * ([[SimilarityOps.jlProject]]): 64-dim quantized embeddings → 16
    * exact-integer coordinates under an md5-derived ±1 matrix, the
    * dimension-reduction front end for cheaper LSH/coarse quantization.
    * Deterministic end to end: the oracle rebuilds the same matrix from
    * DuckDB's md5 and must reproduce every projected value exactly.
    */
  def jlProjection(s: SparkSession, d: String): DataFrame =
    SimilarityOps.jlProject(emb(s, d), dims = 64, outDims = 16)
      .orderBy("vec_id", "dim")

  val jlProjectionOracle: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(floor(x * 1000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), dims AS (
      |  SELECT CAST(u.j AS BIGINT) AS dim FROM UNNEST(range(16)) AS u(j)
      |)
      |SELECT e.vec_id, d.dim,
      |  CAST(list_sum(list_transform(range(1, 65),
      |    i -> qv[i] * (CASE WHEN substr(md5(d.dim || '_' || i), 1, 1)
      |                       IN ('0','1','2','3','4','5','6','7')
      |                  THEN 1 ELSE -1 END))) AS BIGINT) AS y
      |FROM e, dims d
      |ORDER BY vec_id, dim""".stripMargin

  /** q153 — one full BPE training round under the exact oracle: count
    * adjacent character pairs inside whitespace tokens, pick the most
    * frequent NON-SELF pair (count desc, pair asc — self-pairs like
    * 'aa'+'a' need run-parity greedy semantics, excluded so the merge is
    * positionally independent and engine-portable), merge every
    * occurrence left-to-right, and recount — the Sennrich et al. 2016
    * subword-vocabulary induction step. The merge is array surgery in
    * one codegen'd projection (mark left halves, null consumed right
    * halves, filter) — no UDF, no driver loop; the argmax pair is a
    * 1-row broadcast. A hash match certifies count → argmax → merge →
    * recount as a unit, which is the inductive step of the whole BPE
    * training loop.
    */
  def bpeMergeRound(s: SparkSession, d: String): DataFrame =
    bpeMergeRoundOn(docs(s, d))

  /** The q153 body over any (…, text) corpus — exposed so specs can pin
    * the greedy-merge semantics on constructed token runs.
    */
  def bpeMergeRoundOn(corpus: DataFrame): DataFrame = {
    // vocabulary form (see [[graft.functions.Bpe]]): (token, count) is
    // sufficient statistics for every pair count — the merge transform
    // runs over distinct tokens, never the token stream
    val syms = graft.CacheScope.persisted(
      graft.functions.Bpe.vocab(corpus, "text"))
    def adjPairs(c: Column): Column = explode(zip_with(
      slice(c, lit(1), size(c) - 1), slice(c, lit(2), size(c) - 1),
      (a, b) => struct(a.as("l"), b.as("r"))))
    val top = graft.functions.Bpe.pairCounts(syms)
      .orderBy(col("n").desc, col("l"), col("r")).limit(1)
      .select(col("l"), col("r"))
    val merged = syms.crossJoin(broadcast(top))
      .select(expr(
        """filter(
          |  transform(sequence(1, size(sym)), i -> CASE
          |    WHEN element_at(sym, i) = l AND i < size(sym)
          |         AND element_at(sym, i + 1) = r THEN concat(l, r)
          |    WHEN i > 1 AND element_at(sym, i - 1) = l
          |         AND element_at(sym, i) = r THEN NULL
          |    ELSE element_at(sym, i) END),
          |  x -> x IS NOT NULL)""".stripMargin).as("sym2"), col("cnt"))
    merged.select(adjPairs(col("sym2")).as("p"), col("cnt"))
      .groupBy(col("p.l").as("left_tok"), col("p.r").as("right_tok"))
      .agg(sum(col("cnt")).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("left_tok"), col("right_tok"))
      .limit(20)
  }

  val bpeMergeRoundOracle: String =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents
      |), syms AS (
      |  SELECT regexp_extract_all(tok, '.') AS sym FROM toks
      |  WHERE len(tok) >= 2
      |), pc AS (
      |  SELECT sym[i] AS l, sym[i + 1] AS r, count(*) AS n
      |  FROM syms, UNNEST(range(1, len(sym))) AS u(i)
      |  WHERE sym[i] <> sym[i + 1]
      |  GROUP BY 1, 2
      |), top AS (
      |  SELECT l, r FROM pc ORDER BY n DESC, l, r LIMIT 1
      |), m AS (
      |  SELECT list_filter(list_transform(range(1, len(sym) + 1), i -> CASE
      |      WHEN sym[i] = t.l AND i < len(sym) AND sym[i + 1] = t.r
      |        THEN t.l || t.r
      |      WHEN i > 1 AND sym[i - 1] = t.l AND sym[i] = t.r THEN NULL
      |      ELSE sym[i] END), x -> x IS NOT NULL) AS sym2
      |  FROM syms, top t
      |)
      |SELECT sym2[i] AS left_tok, sym2[i + 1] AS right_tok,
      |  CAST(count(*) AS BIGINT) AS n_pairs
      |FROM m, UNNEST(range(1, len(sym2))) AS u(i)
      |GROUP BY 1, 2
      |ORDER BY n_pairs DESC, left_tok, right_tok LIMIT 20""".stripMargin

  /** q159 — community-quality scoring: Newman modularity of the q109
    * label-propagation partition over the part co-purchase graph — the
    * standard "are these communities real" diagnostic a clustering
    * pipeline must report before anyone consumes its communities. Exact
    * integers end to end: per community the coverage term l_c/m and the
    * expected term (d_c/2m)² are emitted as ppb via DECIMAL(38,0)
    * integral divides (both nonnegative — no engine-dependent negative
    * division semantics anywhere), so Q_c = cover − expected is exact.
    *
    * Scale shape: the partition comes from the same synchronous LPA
    * rounds as q109 (join+agg per round); modularity itself is two hash
    * joins of the DISTINCT edge list against the label table plus
    * map-combinable sums — one extra pass over edges, no windows, the
    * edge total m a 1-row broadcast.
    */
  def modularityScore(s: SparkSession, d: String): DataFrame = {
    val li = Tables.load(s, d, "lineitem").select("l_orderkey", "l_partkey")
      .filter(col("l_partkey") % 4 === 0)
    val e1 = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").cast("bigint").as("pa"),
        col("b.l_partkey").cast("bigint").as("pb"))
    val e1d = graft.CacheScope.persisted(e1.distinct())
    // LPA dedupes/symmetrizes internally, so feeding the persisted
    // distinct set is equivalent — and the orderkey self-join runs once
    val labels = graft.operators.LabelPropagation.labels(e1d, "pa", "pb", iters = 3)
    val m = e1d.agg(count(lit(1)).as("m"))
    val sym = e1d.unionAll(e1d.select(col("pb").as("pa"), col("pa").as("pb")))
    val deg = sym.groupBy(col("pa").as("id")).agg(count(lit(1)).as("deg"))
    val lc = e1d
      .join(labels.select(col("id").as("pa"), col("label").as("la")), Seq("pa"))
      .join(labels.select(col("id").as("pb"), col("label").as("lb")), Seq("pb"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("community")).agg(count(lit(1)).as("l_c"))
    val dc = deg.join(labels, Seq("id"))
      .groupBy(col("label").as("community"))
      .agg(sum(col("deg")).as("d_c"), count(lit(1)).as("n_nodes"))
    dc.join(lc, Seq("community"), "left")
      .na.fill(0L, Seq("l_c"))
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        col("l_c").cast("bigint").as("internal_edges"),
        col("d_c").cast("bigint").as("degree_sum"),
        expr("CAST(CAST(1000000000 AS DECIMAL(38,0)) * l_c div m AS BIGINT)")
          .as("cover_ppb"),
        expr("CAST(CAST(1000000000 AS DECIMAL(38,0)) * d_c * d_c" +
          " div (CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)")
          .as("expected_ppb"))
      .orderBy("community")
  }

  val modularityScoreOracle: String = {
    def round(k: Int): String =
      s"""v$k AS (
         |  SELECT e.dst AS id, l.label, count(*) AS cnt
         |  FROM e JOIN l${k - 1} l ON e.src = l.id GROUP BY 1, 2
         |), l$k AS (
         |  SELECT id, label FROM (
         |    SELECT id, label,
         |      row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label) AS rn
         |    FROM v$k) WHERE rn = 1
         |)""".stripMargin
    s"""WITH li AS (
       |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0
       |), e1 AS (
       |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS u,
       |    CAST(b.l_partkey AS BIGINT) AS v
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |), e AS (
       |  SELECT u AS src, v AS dst FROM e1 UNION SELECT v, u FROM e1
       |), l0 AS (
       |  SELECT DISTINCT src AS id, src AS label FROM e
       |), ${round(1)}, ${round(2)}, ${round(3)},
       |mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e1),
       |deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY 1),
       |lc AS (
       |  SELECT la.label AS community, count(*) AS l_c
       |  FROM e1 JOIN l3 la ON e1.u = la.id JOIN l3 lb ON e1.v = lb.id
       |  WHERE la.label = lb.label GROUP BY 1
       |), dc AS (
       |  SELECT l3.label AS community, sum(deg.deg) AS d_c,
       |    count(*) AS n_nodes
       |  FROM deg JOIN l3 ON deg.id = l3.id GROUP BY 1
       |)
       |SELECT dc.community, CAST(dc.n_nodes AS BIGINT) AS n_nodes,
       |  CAST(coalesce(lc.l_c, 0) AS BIGINT) AS internal_edges,
       |  CAST(dc.d_c AS BIGINT) AS degree_sum,
       |  CAST(CAST(1000000000 AS HUGEINT) * coalesce(lc.l_c, 0)
       |    // (SELECT m FROM mm) AS BIGINT) AS cover_ppb,
       |  CAST(CAST(1000000000 AS HUGEINT) * dc.d_c * dc.d_c
       |    // (CAST(4 AS HUGEINT) * (SELECT m FROM mm) * (SELECT m FROM mm))
       |    AS BIGINT) AS expected_ppb
       |FROM dc LEFT JOIN lc ON dc.community = lc.community
       |ORDER BY dc.community""".stripMargin
  }

  /** q160 — corpus drift as total-variation distance: the token
    * unigram distributions of the even- vs odd-numbered document
    * sources, compared by TVD = ½·Σ|p_i − q_i| — the distribution-shift
    * gate a training-mix owner runs when a new crawl slice lands
    * (complements q135/q145 KS on numeric columns and q154's rank test:
    * TVD is THE metric for categorical/token space). Exact: with group
    * totals N0/N1 as common denominators, Σ|c0·N1 − c1·N0| is an exact
    * DECIMAL(38,0) integer and TVD_ppm one integral divide by 2·N0·N1.
    *
    * Scale shape: one token-count aggregate per group (map-combinable),
    * the two distributions align by token in the same groupBy (no
    * join), the 1-row totals broadcast, one exact fold. At 100 TB the
    * by-token table is vocabulary-sized, orders below the corpus.
    */
  def tvdDrift(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d)
      .select((substring(col("source"), 4, 10).cast("int") % 2).as("grp"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val byTok = toks.groupBy("tok").agg(
      sum(when(col("grp") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("c1"))
    val totals = byTok.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
    byTok.crossJoin(broadcast(totals))
      .agg(first(col("n0")).cast("bigint").as("n0"),
        first(col("n1")).cast("bigint").as("n1"),
        count(lit(1)).as("n_distinct"),
        sum(abs(col("c0").cast("decimal(38,0)") * col("n1")
          - col("c1").cast("decimal(38,0)") * col("n0"))).as("s"))
      .select(col("n0"), col("n1"), col("n_distinct"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * s" +
          " div (CAST(2 AS DECIMAL(38,0)) * n0 * n1) AS BIGINT)")
          .as("tvd_ppm"))
  }

  val tvdDriftOracle: String =
    """WITH toks AS (
      |  SELECT CAST(substr(source, 4) AS INT) % 2 AS grp,
      |    unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents
      |), bt AS (
      |  SELECT tok,
      |    sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
      |    sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1
      |  FROM toks GROUP BY 1
      |), tt AS (
      |  SELECT CAST(sum(c0) AS HUGEINT) AS n0, CAST(sum(c1) AS HUGEINT) AS n1
      |  FROM bt
      |), a AS (
      |  SELECT (SELECT n0 FROM tt) AS n0, (SELECT n1 FROM tt) AS n1,
      |    count(*) AS n_distinct,
      |    sum(abs(CAST(c0 AS HUGEINT) * (SELECT n1 FROM tt)
      |      - CAST(c1 AS HUGEINT) * (SELECT n0 FROM tt))) AS s
      |  FROM bt
      |)
      |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
      |  CAST(n_distinct AS BIGINT) AS n_distinct,
      |  CAST(CAST(1000000 AS HUGEINT) * s
      |    // (CAST(2 AS HUGEINT) * n0 * n1) AS BIGINT) AS tvd_ppm
      |FROM a""".stripMargin

  /** q161 — BPE ENCODE: apply a learned merge table to the corpus — the
    * other half of the q153 training step (train picks merges; encode
    * replays them over new text, which is what the tokenizer actually
    * does at serving time). The table is the top-4 non-self adjacent
    * character pairs ranked on the INITIAL symbol stream (count desc,
    * pair asc — the static rank order a trained tokenizer ships), each
    * applied with q153's positionally-independent greedy semantics in
    * rank order. Output: the post-encode symbol vocabulary's top 20
    * (count desc, symbol asc) plus each symbol's length — multi-char
    * entries are the merges actually firing.
    *
    * Scale shape: rank table is a 4-row broadcast pivoted into scalars;
    * each merge round is one codegen'd transform/filter projection over
    * the symbol arrays (no shuffle); the only exchanges are the rank
    * groupBy and the final vocabulary groupBy.
    */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    // encode the VOCABULARY, not the token stream: BPE is token-local,
    // so the distinct (token, count) table is sufficient statistics —
    // every downstream count weights by `cnt` and lands bit-identical,
    // while a zipfian corpus collapses orders of magnitude before the
    // four materialized merge stages (also the 100 TB shape: the merge
    // transform touches the vocabulary, never the corpus)
    val syms = graft.CacheScope.persisted(
      docs(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) >= 2)
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .select(expr("regexp_extract_all(tok, '.', 0)").as("sym"),
          col("cnt")))
    def adjPairs(c: Column): Column = explode(zip_with(
      slice(c, lit(1), size(c) - 1), slice(c, lit(2), size(c) - 1),
      (a, b) => struct(a.as("l"), b.as("r"))))
    val ranked = syms.select(adjPairs(col("sym")).as("p"), col("cnt"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("cnt"))
      .filter(col("l") =!= col("r"))
      .groupBy("l", "r").agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("l"), col("r")).limit(4)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("l"), col("r"))).as("rk"),
        col("l"), col("r"))
    // 4 ranked rows -> one broadcast row of scalars (l1,r1..l4,r4)
    val merges = ranked.groupBy(lit(1).as("one")).pivot("rk", Seq(1, 2, 3, 4))
      .agg(first(col("l")).as("l"), first(col("r")).as("r"))
      .drop("one")
    def mergeExpr(in: String, l: String, r: String): String =
      s"""filter(
         |  transform(sequence(1, size($in)), i -> CASE
         |    WHEN element_at($in, i) = $l AND i < size($in)
         |         AND element_at($in, i + 1) = $r THEN concat($l, $r)
         |    WHEN i > 1 AND element_at($in, i - 1) = $l
         |         AND element_at($in, i) = $r THEN NULL
         |    ELSE element_at($in, i) END),
         |  x -> x IS NOT NULL)""".stripMargin
    // one MATERIALIZED stage per merge: higher-order transforms evaluate
    // interpreted, and a chained s1→s2→s3→s4 projection re-evaluates
    // each upstream transform at every element_at/size reference of the
    // next stage — exponential recompute (measured: minutes vs ~2 s).
    // Persisting each stage caps every merge at exactly one pass.
    val encoded = (1 to 4).foldLeft(syms) { (df, k) =>
      graft.CacheScope.persisted(df.crossJoin(broadcast(merges))
        .select(expr(mergeExpr("sym", s"`${k}_l`", s"`${k}_r`")).as("sym"),
          col("cnt")))
    }
    encoded.select(explode(col("sym")).as("symbol"), col("cnt"))
      .groupBy("symbol").agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("symbol"))
      .limit(20)
      .select(col("symbol"), length(col("symbol")).as("sym_len"), col("n"))
  }

  val bpeEncodeOracle: String = {
    def mergeSql(in: String, k: Int, out: String): String =
      s"""$out AS (
         |  SELECT list_filter(list_transform(range(1, len($in) + 1), i -> CASE
         |      WHEN $in[i] = mg.l$k AND i < len($in)
         |           AND $in[i + 1] = mg.r$k THEN concat(mg.l$k, mg.r$k)
         |      WHEN i > 1 AND $in[i - 1] = mg.l$k
         |           AND $in[i] = mg.r$k THEN NULL
         |      ELSE $in[i] END), x -> x IS NOT NULL) AS $out
         |  FROM $in, mg)""".stripMargin
    s"""WITH toks AS (
       |  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |  FROM documents
       |), syms AS (
       |  SELECT regexp_extract_all(tok, '.') AS sym FROM toks
       |  WHERE len(tok) >= 2
       |), pc AS (
       |  SELECT sym[i] AS l, sym[i + 1] AS r, count(*) AS n
       |  FROM syms, UNNEST(range(1, len(sym))) AS u(i)
       |  WHERE sym[i] <> sym[i + 1]
       |  GROUP BY 1, 2
       |), rk AS (
       |  SELECT row_number() OVER (ORDER BY n DESC, l, r) AS rk, l, r
       |  FROM pc ORDER BY n DESC, l, r LIMIT 4
       |), mg AS (
       |  SELECT
       |    max(CASE WHEN rk = 1 THEN l END) AS l1, max(CASE WHEN rk = 1 THEN r END) AS r1,
       |    max(CASE WHEN rk = 2 THEN l END) AS l2, max(CASE WHEN rk = 2 THEN r END) AS r2,
       |    max(CASE WHEN rk = 3 THEN l END) AS l3, max(CASE WHEN rk = 3 THEN r END) AS r3,
       |    max(CASE WHEN rk = 4 THEN l END) AS l4, max(CASE WHEN rk = 4 THEN r END) AS r4
       |  FROM rk
       |), s0 AS (SELECT sym AS s0 FROM syms),
       |${mergeSql("s0", 1, "s1")},
       |${mergeSql("s1", 2, "s2")},
       |${mergeSql("s2", 3, "s3")},
       |${mergeSql("s3", 4, "s4")}
       |SELECT s4[i] AS symbol, CAST(len(s4[i]) AS INTEGER) AS sym_len,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM s4, UNNEST(range(1, len(s4) + 1)) AS u(i)
       |GROUP BY 1, 2
       |ORDER BY n DESC, symbol LIMIT 20""".stripMargin
  }

  /** Shared oracle prefix for the classifier-evaluation queries: the
    * q25 stopword-vote predictions as `p(doc_id, labeled_lang,
    * predicted_lang)`.
    */
  private def langPredSql: String = {
    def hits(l: String) = {
      val set = TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN ($set))) AS INTEGER)"
    }
    s"""m AS (
       |  SELECT doc_id, lang AS labeled_lang,
       |    ${hits("en")} AS hits_en, ${hits("de")} AS hits_de,
       |    ${hits("es")} AS hits_es, ${hits("fr")} AS hits_fr
       |  FROM documents
       |), p AS (
       |  SELECT doc_id, labeled_lang,
       |    CASE WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
       |         WHEN hits_de >= hits_es AND hits_de >= hits_fr AND hits_de > 0 THEN 'de'
       |         WHEN hits_es >= hits_fr AND hits_es > 0 THEN 'es'
       |         WHEN hits_fr > 0 THEN 'fr'
       |         ELSE 'unknown' END AS predicted_lang
       |  FROM m
       |)""".stripMargin
  }

  /** q162 — classifier evaluation: per-class precision / recall / F1 of
    * the q25 language classifier against the labeled `lang` column —
    * the confusion-matrix summary every model gate reads before a
    * classifier's output is allowed to filter a corpus. Exact-integer
    * ppm metrics (tp/pred, tp/labeled, 2tp/(pred+labeled)); classes
    * with zero predictions (never emitted by the rule) report 0
    * precision rather than an engine-dependent null.
    *
    * Scale shape: predictions are one token-explode aggregate (q25's
    * plan); the confusion matrix is class²-bounded, so every join after
    * it is over tiny aggregates.
    */
  def classifierEval(s: SparkSession, d: String): DataFrame = {
    val p = graft.CacheScope.persisted(
      langPredictions(s, d).select(col("labeled_lang"), col("predicted_lang")))
    val classes = p.select(col("labeled_lang").as("clazz"))
      .union(p.select(col("predicted_lang").as("clazz"))).distinct()
    val lab = p.groupBy(col("labeled_lang").as("clazz"))
      .agg(count(lit(1)).as("n_labeled"))
    val prd = p.groupBy(col("predicted_lang").as("clazz"))
      .agg(count(lit(1)).as("n_predicted"))
    val tp = p.filter(col("labeled_lang") === col("predicted_lang"))
      .groupBy(col("labeled_lang").as("clazz")).agg(count(lit(1)).as("tp"))
    classes.join(lab, Seq("clazz"), "left").join(prd, Seq("clazz"), "left")
      .join(tp, Seq("clazz"), "left")
      .na.fill(0L, Seq("n_labeled", "n_predicted", "tp"))
      .select(col("clazz"), col("n_labeled"), col("n_predicted"), col("tp"),
        when(col("n_predicted") === 0, 0L).otherwise(
          expr("CAST(1000000 AS DECIMAL(38,0)) * tp div n_predicted")
            .cast("bigint")).as("precision_ppm"),
        when(col("n_labeled") === 0, 0L).otherwise(
          expr("CAST(1000000 AS DECIMAL(38,0)) * tp div n_labeled")
            .cast("bigint")).as("recall_ppm"),
        expr("CAST(CAST(2000000 AS DECIMAL(38,0)) * tp" +
          " div (n_predicted + n_labeled) AS BIGINT)").as("f1_ppm"))
      .orderBy("clazz")
  }

  val classifierEvalOracle: String =
    s"""WITH $langPredSql, cls AS (
       |  SELECT labeled_lang AS clazz FROM p
       |  UNION SELECT predicted_lang FROM p
       |), lab AS (
       |  SELECT labeled_lang AS clazz, count(*) AS n_labeled FROM p GROUP BY 1
       |), prd AS (
       |  SELECT predicted_lang AS clazz, count(*) AS n_predicted FROM p GROUP BY 1
       |), tp AS (
       |  SELECT labeled_lang AS clazz, count(*) AS tp FROM p
       |  WHERE labeled_lang = predicted_lang GROUP BY 1
       |)
       |SELECT cls.clazz,
       |  CAST(coalesce(lab.n_labeled, 0) AS BIGINT) AS n_labeled,
       |  CAST(coalesce(prd.n_predicted, 0) AS BIGINT) AS n_predicted,
       |  CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
       |  CAST(CASE WHEN coalesce(prd.n_predicted, 0) = 0 THEN 0
       |    ELSE CAST(1000000 AS HUGEINT) * coalesce(tp.tp, 0) // prd.n_predicted
       |    END AS BIGINT) AS precision_ppm,
       |  CAST(CASE WHEN coalesce(lab.n_labeled, 0) = 0 THEN 0
       |    ELSE CAST(1000000 AS HUGEINT) * coalesce(tp.tp, 0) // lab.n_labeled
       |    END AS BIGINT) AS recall_ppm,
       |  CAST(CAST(2000000 AS HUGEINT) * coalesce(tp.tp, 0)
       |    // (coalesce(prd.n_predicted, 0) + coalesce(lab.n_labeled, 0))
       |    AS BIGINT) AS f1_ppm
       |FROM cls LEFT JOIN lab ON cls.clazz = lab.clazz
       |LEFT JOIN prd ON cls.clazz = prd.clazz
       |LEFT JOIN tp ON cls.clazz = tp.clazz
       |ORDER BY cls.clazz""".stripMargin

  /** q163 — chance-corrected agreement: overall accuracy and Cohen's
    * kappa of the q25 classifier vs the labels. Kappa corrects raw
    * accuracy for the agreement two independent raters would reach by
    * chance (the standard guard against "90% accurate" on a 90%-one-
    * class corpus). po and pe are exact ppm integers; kappa itself is
    * (n·agree − S)/(n² − S) with S = Σ_c labeled_c·predicted_c —
    * evaluated as ONE fixed-shape double expression over exact integer
    * inputs, rounded to 6 dp (the q84/q156 convention).
    */
  def kappaAgreement(s: SparkSession, d: String): DataFrame = {
    val p = graft.CacheScope.persisted(
      langPredictions(s, d).select(col("labeled_lang"), col("predicted_lang")))
    val lab = p.groupBy(col("labeled_lang").as("clazz"))
      .agg(count(lit(1)).as("lc"))
    val prd = p.groupBy(col("predicted_lang").as("clazz"))
      .agg(count(lit(1)).as("pc"))
    val chance = lab.join(prd, Seq("clazz"))
      .agg(sum((col("lc") * col("pc")).cast("decimal(38,0)")).as("s"))
    val agree = p.agg(count(lit(1)).as("n"),
      sum(when(col("labeled_lang") === col("predicted_lang"), 1L).otherwise(0L))
        .as("agree"))
    agree.crossJoin(broadcast(chance))
      .select(col("n").cast("bigint").as("n"),
        col("agree").cast("bigint").as("agree"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * agree div n AS BIGINT)")
          .as("po_ppm"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * s" +
          " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("pe_ppm"),
        round(expr("CAST(CAST(n AS DECIMAL(38,0)) * agree - s AS DOUBLE) /" +
          " CAST(CAST(n AS DECIMAL(38,0)) * n - s AS DOUBLE)"), 6)
          .as("kappa"))
  }

  val kappaAgreementOracle: String =
    s"""WITH $langPredSql, lab AS (
       |  SELECT labeled_lang AS clazz, count(*) AS lc FROM p GROUP BY 1
       |), prd AS (
       |  SELECT predicted_lang AS clazz, count(*) AS pc FROM p GROUP BY 1
       |), ch AS (
       |  SELECT CAST(sum(CAST(lc AS HUGEINT) * pc) AS HUGEINT) AS s
       |  FROM lab JOIN prd ON lab.clazz = prd.clazz
       |), ag AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(CASE WHEN labeled_lang = predicted_lang THEN 1 ELSE 0 END)
       |      AS HUGEINT) AS agree
       |  FROM p
       |)
       |SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
       |  CAST(CAST(1000000 AS HUGEINT) * agree // n AS BIGINT) AS po_ppm,
       |  CAST(CAST(1000000 AS HUGEINT) * s // (n * n) AS BIGINT) AS pe_ppm,
       |  round(CAST(n * agree - s AS DOUBLE) / CAST(n * n - s AS DOUBLE), 6)
       |    AS kappa
       |FROM ag, ch""".stripMargin

  /** q168 — MRR retrieval evaluation: the rank of the first same-label
    * neighbor per query under exact brute-force cosine ranking, and its
    * reciprocal in ppm — the first-hit quality metric that complements
    * the recall audits (q67/q105/q149 measure overlap@k; MRR measures
    * how SOON the right answer appears). Aggregate-only rank
    * derivation — see [[SimilarityOps.mrrFirstRelevant]] for why no
    * rank window appears.
    */
  def mrrEval(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"),
        col("label").as("query_label"))
    SimilarityOps.mrrFirstRelevant(q, e).orderBy("query_id")
  }

  val mrrEvalOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
      |    label AS qlabel
      |  FROM embeddings WHERE vec_id < 10
      |), s AS (
      |  SELECT query_id, qlabel, vec_id, label,
      |    round(list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])), 4) AS sim
      |  FROM q, embeddings WHERE vec_id <> query_id
      |), b AS (
      |  SELECT query_id, sim AS bsim, vec_id AS bvec FROM (
      |    SELECT query_id, sim, vec_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY sim DESC, vec_id) AS rn
      |    FROM s WHERE label = qlabel) WHERE rn = 1
      |), r AS (
      |  SELECT s.query_id, any_value(s.qlabel) AS label,
      |    CASE WHEN max(b.bsim) IS NULL THEN 0
      |      ELSE 1 + sum(CASE WHEN s.sim > b.bsim
      |        OR (s.sim = b.bsim AND s.vec_id < b.bvec) THEN 1 ELSE 0 END)
      |      END AS first_rel_rank
      |  FROM s LEFT JOIN b ON s.query_id = b.query_id
      |  GROUP BY s.query_id
      |)
      |SELECT query_id, label, CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
      |  CAST(CASE WHEN first_rel_rank = 0 THEN 0
      |    ELSE 1000000 // first_rel_rank END AS BIGINT) AS rr_ppm
      |FROM r ORDER BY query_id""".stripMargin

  /** q174 — content-defined chunking dedup (the FastCDC/rsync family,
    * per-token): chunk boundaries are placed where the TOKEN's own hash
    * hits `h % 16 == 0`, so an insertion early in a document shifts only
    * the chunk it lands in — unlike q69's fixed windows, where one
    * added token re-hashes every downstream chunk. Per document:
    * variable chunks, the chunks shared with ≥2 docs, and the token
    * mass those shared chunks cover (what a CDC-level dedup store would
    * save). Planted near-duplicate docs make sharing non-trivial.
    *
    * Scale shape: boundary detection is a scan-local codegen'd hash on
    * each token (no cross-row state — that is the POINT of CDC); the
    * running chunk id is a per-document window (bounded by document
    * length, the q70 convention); chunk membership aggregates by
    * (doc, chunk); sharing is one groupBy on the chunk digest — an
    * equality join on a bounded key, never all-pairs.
    */
  def cdcChunks(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs(s, d)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("bnd",
        when(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("bigint")
          % 16 === 0, 1L).otherwise(0L))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunks = toks.withColumn("chunk", sum(col("bnd")).over(w))
      .groupBy("doc_id", "chunk")
      .agg(count(lit(1)).as("n_tokens"),
        expr("""md5(array_join(transform(
               |  array_sort(collect_list(struct(pos, tok))),
               |  x -> x.tok), ' '))""".stripMargin).as("chunk_md5"))
    val sharing = chunks.groupBy("chunk_md5")
      .agg(countDistinct(col("doc_id")).as("nd"))
    chunks.join(sharing, Seq("chunk_md5"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"),
        sum(when(col("nd") > 1, col("n_tokens")).otherwise(0L))
          .as("shared_tokens"))
      .orderBy("doc_id")
  }

  val cdcChunksOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
      |  FROM documents
      |), p AS (
      |  SELECT doc_id, i AS pos, t[i] AS tok,
      |    CASE WHEN CAST('0x' || substr(md5(t[i]), 1, 8) AS BIGINT) % 16 = 0
      |      THEN 1 ELSE 0 END AS bnd
      |  FROM tok, UNNEST(range(1, len(t) + 1)) AS u(i)
      |), c AS (
      |  SELECT doc_id, pos, tok,
      |    sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk
      |  FROM p
      |), ch AS (
      |  SELECT doc_id, chunk, count(*) AS n_tokens,
      |    md5(array_to_string(list(tok ORDER BY pos), ' ')) AS chunk_md5
      |  FROM c GROUP BY doc_id, chunk
      |), sh AS (
      |  SELECT chunk_md5, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1
      |)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      |  CAST(sum(CASE WHEN nd > 1 THEN n_tokens ELSE 0 END) AS BIGINT)
      |    AS shared_tokens
      |FROM ch JOIN sh USING (chunk_md5)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q175 — curriculum interleave order: emit the first rows of a
    * training order that walks sources round-robin, each source
    * internally ranked by descending length (the "quality first, but
    * never two of the same source adjacent" ordering data-mixing
    * pipelines feed to sequential trainers). Global position
    * `(rank_in_source − 1)·k + source_index` is exact integer
    * arithmetic over per-source ranks.
    *
    * Scale shape: per-source ranks come from ONE grouped bucketed
    * prefix pass ([[graft.operators.PrefixSum
    * .groupedExclusiveRunningTotals]] partitioned by (source, bucket)) —
    * NOT a window partitioned by source, which would put each source's
    * entire corpus slice in one task at 100 TB, and NOT a per-source
    * loop of prefix pipelines (the first cut: k quantile sketches and
    * caches — 9.0 s at sf0.1 for 40 output rows; the grouped pass is
    * ~2 s). Source indexes are a bounded broadcast.
    */
  def curriculumInterleave(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("neg_len", -col("n_chars"))
    val sources = base.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    val k = sources.length
    val s2 = s
    import s2.implicits._
    val sidx = sources.zipWithIndex
      .map { case (src, i) => (src, i.toLong) }.toSeq
      .toDF("source", "sidx")
    graft.operators.PrefixSum.groupedExclusiveRunningTotals(
        base, Seq("source"), Seq(col("neg_len"), col("doc_id")),
        Seq((lit(1L), "before")), broadcastOffsets = true)
      .join(broadcast(sidx), "source")
      .select(col("doc_id"), col("source"), col("n_chars"),
        (col("before") * k + col("sidx")).cast("bigint").as("position"))
      .orderBy("position").limit(40)
  }

  val curriculumInterleaveOracle: String =
    """WITH src AS (
      |  SELECT source, row_number() OVER (ORDER BY source) - 1 AS sidx
      |  FROM (SELECT DISTINCT source FROM documents)
      |), k AS (SELECT count(*) AS k FROM src),
      |r AS (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) - 1 AS rk
      |  FROM documents
      |)
      |SELECT doc_id, source, n_chars,
      |  CAST(rk * k.k + src.sidx AS BIGINT) AS position
      |FROM r JOIN src USING (source), k
      |ORDER BY position LIMIT 40""".stripMargin

  /** q176 — deterministic negative sampling for contrastive training:
    * each document draws 3 negatives from a bounded per-bucket
    * candidate pool (64 buckets × 8 pool docs, selected by hash rank),
    * excluding same-source candidates — the in-batch-negatives
    * alternative a retrieval-training pipeline uses when batches can't
    * span the corpus. Selection and ranking are pure md5 arithmetic:
    * same result at any parallelism, and an epoch key in the seed
    * string would yield fresh negatives per epoch.
    *
    * Scale shape: the pool is a per-bucket top-k (WindowGroupLimit —
    * partial top-k map-side, never a full per-bucket sort) bounded at
    * 512 rows, broadcast onto the anchor scan; per-anchor ranking
    * windows run over ≤ 8 candidate rows. No self-join of the corpus
    * against itself.
    */
  def negativeSampling(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs(s, d).select(col("doc_id"), col("source"))
    val pool = base
      .withColumn("bucket", col("doc_id") % 64)
      .withColumn("pk", md5(concat(lit("pool-v1|"),
        col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy("bucket").orderBy(col("pk"), col("doc_id"))))
      .filter(col("rn") <= 8)
      .select(col("bucket"), col("doc_id").as("cand_id"),
        col("source").as("cand_source"))
    base
      .join(broadcast(pool), (col("doc_id") % 64) === col("bucket"))
      .filter(col("cand_id") =!= col("doc_id")
        && col("cand_source") =!= col("source"))
      .withColumn("nk", md5(concat(lit("neg-v1|"),
        col("doc_id").cast("string"), lit("|"),
        col("cand_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("nk"), col("cand_id"))))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("cand_id").as("neg_id"),
        col("rk").cast("bigint").as("rk"))
      .orderBy("doc_id", "rk")
  }

  val negativeSamplingOracle: String =
    """WITH pool AS (
      |  SELECT bucket, doc_id AS cand_id, source AS cand_source FROM (
      |    SELECT doc_id % 64 AS bucket, doc_id, source,
      |      row_number() OVER (PARTITION BY doc_id % 64
      |        ORDER BY md5('pool-v1|' || CAST(doc_id AS VARCHAR)), doc_id)
      |        AS rn
      |    FROM documents) WHERE rn <= 8
      |), cand AS (
      |  SELECT d.doc_id, p.cand_id,
      |    row_number() OVER (PARTITION BY d.doc_id
      |      ORDER BY md5('neg-v1|' || CAST(d.doc_id AS VARCHAR) || '|'
      |        || CAST(p.cand_id AS VARCHAR)), p.cand_id) AS rk
      |  FROM documents d JOIN pool p ON d.doc_id % 64 = p.bucket
      |  WHERE p.cand_id <> d.doc_id AND p.cand_source <> d.source
      |)
      |SELECT doc_id, cand_id AS neg_id, CAST(rk AS BIGINT) AS rk
      |FROM cand WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** q177 — KMV (k-minimum-values) distinct sketch: per event type, the
    * 64 smallest md5-derived 48-bit user hashes estimate distinct users
    * as `(k−1)·2⁴⁸ div h_k`; the '__all' row is built by MERGING the
    * five per-type sketches (k smallest of the union of k-sets — for
    * KMV the merge is exactly the sketch of the union, which the row's
    * agreement with the exact global count demonstrates). Groups with
    * fewer than k distinct hashes report their sketch size exactly, per
    * the estimator's definition. Exact-count columns audit the error in
    * ppm.
    *
    * Scale shape: the per-group sketch is a rank-≤k window over the
    * DISTINCT hash set (WindowGroupLimit — partial top-k before any
    * exchange), the merge touches ≤ groups·k rows, and the exact
    * audit is Spark's two-stage distinct aggregate. Driver traffic is
    * zero; at 100 TB the sketch column is what you'd persist per
    * partition and fold.
    */
  def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 64
    // 48-bit user hash (same domain the md5-prefix form used, so the
    // (k−1)·2⁴⁸ estimator is unchanged) via the cheap portable
    // [[graft.expressions.Fnv64]] — KMV needs dispersal, not a digest
    val ev = graft.CacheScope.persisted(Tables.events(s, d)
      .select(col("event_type"),
        col("user_id"),
        (Fnv64.fnv64(concat(lit("kmv-v1|"),
          col("user_id").cast("string"))) % 281474976710656L).as("h")))
    val tops = graft.CacheScope.persisted(ev.select("event_type", "h").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= K))
    val merged = tops.select("h").distinct().orderBy("h").limit(K)
      .select(lit("__all").as("event_type"), col("h"))
    val sk = tops.select("event_type", "h").unionAll(merged)
      .groupBy("event_type")
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("k_used"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .unionAll(ev.agg(countDistinct(col("user_id")).as("n_exact"))
        .select(lit("__all").as("event_type"), col("n_exact")))
    sk.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact").cast("bigint").as("n_exact"),
        col("k_used").cast("bigint").as("k_used"), col("h_k"),
        expr(s"""CASE WHEN k_used < $K THEN k_used
                |  ELSE CAST((CAST(k_used AS DECIMAL(38,0)) - 1)
                |    * 281474976710656 div h_k AS BIGINT) END"""
          .stripMargin).as("est"),
        expr(s"""CAST(CAST(1000000 AS DECIMAL(38,0))
                |  * abs((CASE WHEN k_used < $K THEN k_used
                |      ELSE CAST((CAST(k_used AS DECIMAL(38,0)) - 1)
                |        * 281474976710656 div h_k AS BIGINT) END) - n_exact)
                |  div n_exact AS BIGINT)""".stripMargin).as("err_ppm"))
      .orderBy("event_type")
  }

  val kmvDistinctOracle: String =
    s"""WITH ev AS (
      |  SELECT event_type, user_id,
      |    ${Fnv64.sql("'kmv-v1|' || CAST(user_id AS VARCHAR)")}
      |      % 281474976710656 AS h
      |  FROM events
      |), dh AS (SELECT DISTINCT event_type, h FROM ev),
      |tops AS (
      |  SELECT event_type, h FROM (
      |    SELECT event_type, h,
      |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |    FROM dh) WHERE rn <= 64
      |), merged AS (
      |  SELECT '__all' AS event_type, h
      |  FROM (SELECT DISTINCT h FROM tops ORDER BY h LIMIT 64)
      |), sk AS (
      |  SELECT event_type, max(h) AS h_k, count(*) AS k_used
      |  FROM (SELECT * FROM tops UNION ALL SELECT * FROM merged)
      |  GROUP BY event_type
      |), ex AS (
      |  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM ev
      |  GROUP BY event_type
      |  UNION ALL
      |  SELECT '__all', count(DISTINCT user_id) FROM ev
      |), j AS (
      |  SELECT event_type, n_exact, k_used, h_k,
      |    CASE WHEN k_used < 64 THEN k_used
      |      ELSE CAST((CAST(k_used AS HUGEINT) - 1)
      |        * 281474976710656 // h_k AS BIGINT) END AS est
      |  FROM sk JOIN ex USING (event_type)
      |)
      |SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
      |  CAST(k_used AS BIGINT) AS k_used, h_k, CAST(est AS BIGINT) AS est,
      |  CAST(CAST(1000000 AS HUGEINT) * abs(est - n_exact) // n_exact
      |    AS BIGINT) AS err_ppm
      |FROM j ORDER BY event_type""".stripMargin

  /** q186 — winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * scheme): per document, hash every 4-gram, then over each sliding
    * window of 8 consecutive hashes select the minimum (ties → the
    * RIGHTMOST, encoded as one integer min: `h·10⁵ + (10⁵ − pos)` so a
    * plain window-min realizes the tie rule) — the guarantee is that
    * any shared run of ≥ 11 tokens yields at least one shared
    * fingerprint, at a fraction of q70's every-position index. Emits
    * per-doc gram/fingerprint counts and how many fingerprints recur in
    * other documents (the planted near-dups light up).
    *
    * Scale shape: hashing is scan-local; the window min runs per
    * document over positions (doc-length bounded, q70 convention);
    * sharing is one groupBy on the selected hash — an equality join on
    * a bounded key. The fingerprint table is ~|tokens|/w rows, the
    * whole point of winnowing at 100 TB.
    */
  def winnowing(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val W = 8
    // widen BEFORE the gram explode ([[graft.Par.toCores]]): the cost
    // here is hash-per-4-gram CPU computed inside the scan projection.
    // Clustering BY doc_id keeps the rows in place for the per-doc
    // window below. The gram hash is [[graft.expressions.Fnv64]] folded
    // to 32 bits (same domain the md5 prefix gave) — a winnowing
    // fingerprint needs dispersal only, and the md5 form here was
    // 20.5 task-CPU-s at sf0.1 (the digest plus hex plus conv re-parse),
    // the largest single CPU item in the bench tail.
    val grams = graft.Par.toCores(docs(s, d), col("doc_id"))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - 3)).as("p"))
      .select(col("doc_id"), col("p"),
        ((Fnv64.fnv64(array_join(slice(col("t"), col("p"), lit(4)), " "))
          % 4294967296L) * 100000
          + (lit(100000) - col("p"))).as("hp"))
    val win = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(-(W - 1), Window.currentRow)
    // positions are generated DENSELY (sequence(1, n-3)), so the
    // cumulative row count ordered by p is identically p — filtering on
    // p >= W replaces a whole unbounded-frame window pass over every
    // gram of the corpus (one frame processor and one carried column
    // less; hash-identical output)
    val fps = grams
      .withColumn("sel", min(col("hp")).over(win))
      .filter(col("p") >= W)
      // decode BEFORE distinct: the fingerprint set is the distinct
      // HASHES — the same gram selected at two positions is one print
      .select(col("doc_id"), expr("sel div 100000").as("fp")).distinct()
    val shared = fps.groupBy("fp").agg(countDistinct(col("doc_id")).as("nd"))
    val perDoc = fps.join(shared, Seq("fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared_fp"))
    docs(s, d)
      .select(col("doc_id"),
        greatest(size(TextAnalysis.tokens(col("text"))) - 3, lit(0))
          .cast("bigint").as("n_grams"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("n_shared_fp"), lit(0L)).as("n_shared_fp"))
      .orderBy("doc_id")
  }

  val winnowingOracle: String =
    s"""WITH tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, i AS p,
      |    (${Fnv64.sql("array_to_string(t[i:i+3], ' ')")}
      |      % 4294967296) * 100000 + (100000 - i) AS hp
      |  FROM tok, UNNEST(range(1, len(t) - 2)) AS u(i)
      |  WHERE len(t) >= 4
      |), w AS (
      |  SELECT doc_id, p,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY p) AS m,
      |    min(hp) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sel
      |  FROM g
      |), fp AS (
      |  SELECT DISTINCT doc_id, sel // 100000 AS fp FROM w WHERE m >= 8
      |), sh AS (
      |  SELECT fp, count(DISTINCT doc_id) AS nd FROM fp GROUP BY fp
      |), pd AS (
      |  SELECT doc_id, count(*) AS n_fp,
      |    sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_shared_fp
      |  FROM fp JOIN sh USING (fp) GROUP BY doc_id
      |)
      |SELECT tok.doc_id,
      |  CAST(greatest(len(t) - 3, 0) AS BIGINT) AS n_grams,
      |  CAST(coalesce(pd.n_fp, 0) AS BIGINT) AS n_fp,
      |  CAST(coalesce(pd.n_shared_fp, 0) AS BIGINT) AS n_shared_fp
      |FROM tok LEFT JOIN pd ON tok.doc_id = pd.doc_id
      |ORDER BY tok.doc_id""".stripMargin

  /** q187 — word-order-insensitive duplicate detection: fingerprint
    * each document by its sorted token MULTISET, catching shuffled or
    * re-ordered copies that every positional scheme (exact hash,
    * shingles, winnowing) misses. The corpus has no such pairs, so the
    * query plants them deterministically — each doc_id % 7 == 0 gains a
    * token-sorted twin (the q21 convention for exact-dup synthesis) —
    * and reports the groups whose members' raw texts DIFFER while the
    * bag fingerprint agrees.
    *
    * Scale shape: the fingerprint is scan-local (sort a per-doc token
    * array); grouping is one equality aggregate on the digest. At
    * 100 TB the bag digest is what you'd store next to the exact hash
    * in the dedup index.
    */
  def bagDedup(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    val twins = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        array_join(array_sort(TextAnalysis.tokens(col("text"))), " ")
          .as("text"))
    base.unionAll(twins)
      .select(col("doc_id"), col("text"),
        md5(array_join(array_sort(TextAnalysis.tokens(col("text"))), " "))
          .as("bag_fp"))
      .groupBy("bag_fp")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_texts"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_docs") > 1 && col("n_texts") > 1)
      .select(col("bag_fp"), col("n_docs"), col("n_texts"),
        col("first_doc"), col("last_doc"))
      .orderBy("first_doc")
  }

  val bagDedupOracle: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    array_to_string(list_sort(string_split_regex(lower(text), '\s+')),
      |      ' ')
      |  FROM documents WHERE doc_id % 7 = 0
      |), f AS (
      |  SELECT doc_id, text,
      |    md5(array_to_string(list_sort(string_split_regex(lower(text),
      |      '\s+')), ' ')) AS bag_fp
      |  FROM base
      |)
      |SELECT bag_fp, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT text) AS BIGINT) AS n_texts,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM f GROUP BY bag_fp
      |HAVING count(*) > 1 AND count(DISTINCT text) > 1
      |ORDER BY first_doc""".stripMargin

  /** q188 — token burstiness (Fano factor): for the 20 most frequent
    * tokens, the variance-to-mean ratio of per-document counts — the
    * statistic that separates bursty CONTENT words (high Fano: absent
    * from most docs, piled up in a few) from evenly spread FUNCTION
    * words (Fano ≈ 1, Poisson-like), which is how stop-lists and
    * keyword weights get derived without any labeled data. Zero-count
    * documents enter through D·Σx² − S² over the corpus doc count, so
    * no per-(token, doc) zero rows ever materialize. Exact ppm.
    *
    * Scale shape: one (token, doc) count aggregate, one token-level
    * moment fold, one bounded top-k (WindowGroupLimit) — all
    * map-combinable; the doc count rides a 1-row broadcast.
    */
  def tokenBurstiness(s: SparkSession, d: String): DataFrame = {
    val perDoc = docs(s, d)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text")))
        .as("tok"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("x"))
    val moments = perDoc.groupBy("tok")
      .agg(sum(col("x")).as("s1"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("s2"),
        count(lit(1)).as("n_docs_with"))
    val dCount = docs(s, d).agg(count(lit(1)).as("d_total"))
    moments.crossJoin(broadcast(dCount))
      .orderBy(col("s1").desc, col("tok"))
      .limit(20)
      .select(col("tok"), col("s1").cast("bigint").as("n_total"),
        col("n_docs_with"), col("d_total"),
        expr("""CAST(CAST(1000000 AS DECIMAL(38,0))
               |  * (d_total * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)
               |  div (CAST(d_total AS DECIMAL(38,0)) * s1) AS BIGINT)"""
          .stripMargin).as("fano_ppm"))
      .orderBy(col("n_total").desc, col("tok"))
  }

  val tokenBurstinessOracle: String =
    """WITH pd AS (
      |  SELECT t.tok, doc_id, count(*) AS x
      |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+'))
      |          AS tok FROM documents) t
      |  GROUP BY t.tok, doc_id
      |), m AS (
      |  SELECT tok, sum(x) AS s1, sum(CAST(x AS HUGEINT) * x) AS s2,
      |    count(*) AS n_docs_with
      |  FROM pd GROUP BY tok
      |), d AS (SELECT count(*) AS d_total FROM documents),
      |top AS (
      |  SELECT * FROM m, d ORDER BY s1 DESC, tok LIMIT 20
      |)
      |SELECT tok, CAST(s1 AS BIGINT) AS n_total,
      |  CAST(n_docs_with AS BIGINT) AS n_docs_with,
      |  CAST(d_total AS BIGINT) AS d_total,
      |  CAST(CAST(1000000 AS HUGEINT)
      |    * (d_total * s2 - CAST(s1 AS HUGEINT) * s1)
      |    // (CAST(d_total AS HUGEINT) * s1) AS BIGINT) AS fano_ppm
      |FROM top ORDER BY n_total DESC, tok""".stripMargin

  /** q189 — blocklist phrase filtering: the curation gate that counts
    * and flags documents containing any of a bounded phrase list
    * (policy terms, boilerplate markers, license strings). Occurrences
    * are counted exactly via length arithmetic on a single replace —
    * no per-phrase regex compilation, and the phrase list rides a
    * broadcast so the corpus is scanned once.
    *
    * Scale shape: corpus × bounded-phrase-list broadcast cross join;
    * every term is scan-local string arithmetic; one small rollup.
    */
  def blocklistFilter(s: SparkSession, d: String): DataFrame = {
    val phrases = s.createDataFrame(Seq(
        Tuple1("slow fast"), Tuple1("table value"),
        Tuple1("spark data"), Tuple1("key agg")))
      .toDF("phrase")
    docs(s, d).select(col("doc_id"), lower(col("text")).as("t"))
      .crossJoin(broadcast(phrases))
      .select(col("phrase"),
        ((length(col("t")) - length(expr("replace(t, phrase, '')")))
          / length(col("phrase"))).cast("bigint").as("hits"))
      .groupBy("phrase")
      .agg(sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum(col("hits")).as("n_hits"))
      .orderBy("phrase")
  }

  val blocklistFilterOracle: String =
    """WITH p AS (
      |  SELECT * FROM (VALUES ('slow fast'), ('table value'),
      |    ('spark data'), ('key agg')) AS v(phrase)
      |), h AS (
      |  SELECT phrase,
      |    (length(lower(text)) - length(replace(lower(text), phrase, '')))
      |      // length(phrase) AS hits
      |  FROM documents, p
      |)
      |SELECT phrase,
      |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      |  CAST(sum(hits) AS BIGINT) AS n_hits
      |FROM h GROUP BY phrase ORDER BY phrase""".stripMargin

  /** q193 — IVF probe-count tuning curve: aggregate recall@3 against
    * exact truth at probes ∈ {1, 2, 4} in one result — the sweep an ANN
    * operator runs on a sample to pick its latency/recall point before
    * committing the full corpus (q67 audits ONE configuration; this is
    * the curve). Recall is an exact integer ppm over hit counts.
    *
    * Scale shape: truth is the broadcast-bounded brute-force baseline
    * computed once and persisted; each probe setting reuses the same
    * seeded bucket assignment inside [[SimilarityOps.ivfTopK]] (probing
    * more buckets only widens the candidate equality join). The union
    * is 3 bounded aggregates.
    */
  def ivfProbeSweep(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_vec"))
    val q = e.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = graft.CacheScope.persisted(
      SimilarityOps.bruteForceTopK(q, e, 3)
        .select(col("query_id"), col("neighbor_id")))
    // ONE assignment + ONE tagged ranking for all three probe counts
    // ([[SimilarityOps.ivfTopKSweep]]): the probed-bucket list for p is
    // the length-p prefix of one deterministic ranking, so the per-p
    // loop paid 3× the jobs for byte-identical results. The recall
    // rollup fans the truth set out per tag the same way.
    // ONE probes list drives both the sweep and the truth fan-out —
    // two hardcoded copies would let an edit to one silently report
    // recall for a tag with no approx rows (or drop a tag)
    val probes = Seq(1, 2, 4)
    val approx = SimilarityOps.ivfTopKSweep(e, seeds, q, k = 3,
        probesList = probes)
      .select(col("probes"), col("query_id"), col("neighbor_id"),
        lit(1L).as("hit"))
    truth.withColumn("probes",
        explode(array(probes.map(p => lit(p.toLong)): _*)))
      .join(approx, Seq("probes", "query_id", "neighbor_id"), "left")
      .groupBy(col("probes"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        sum(coalesce(col("hit"), lit(0L))).as("total_hits"))
      .select(col("probes"),
        col("n_queries").cast("bigint").as("n_queries"),
        col("total_hits").cast("bigint").as("total_hits"),
        expr("""CAST(CAST(1000000 AS DECIMAL(38,0)) * total_hits
               |  div (3 * n_queries) AS BIGINT)""".stripMargin)
          .as("recall_ppm"))
      .orderBy("probes")
  }

  val ivfProbeSweepOracle: String = {
    def block(p: Int): String =
      s"""probed$p AS (
         |  SELECT query_id, qv, bucket FROM (
         |    SELECT q.query_id, q.qv, s.seed_id AS bucket,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY round(list_cosine_similarity(q.qv, s.sv), 6) DESC,
         |                 s.seed_id) AS rn
         |    FROM q, seeds s)
         |  WHERE rn <= $p
         |), approx$p AS (
         |  SELECT query_id, vec_id AS neighbor_id FROM (
         |    SELECT pr.query_id, a.vec_id,
         |      row_number() OVER (PARTITION BY pr.query_id
         |        ORDER BY round(list_cosine_similarity(pr.qv, CAST(a.embedding AS DOUBLE[])), 4) DESC,
         |                 a.vec_id) AS rank
         |    FROM probed$p pr JOIN assigned a ON pr.bucket = a.bucket
         |    WHERE pr.query_id <> a.vec_id)
         |  WHERE rank <= 3
         |), r$p AS (
         |  SELECT CAST($p AS BIGINT) AS probes,
         |    CAST(count(DISTINCT t.query_id) AS BIGINT) AS n_queries,
         |    CAST(count(a.neighbor_id) AS BIGINT) AS total_hits
         |  FROM truth t LEFT JOIN approx$p a
         |    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
         |)""".stripMargin
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 200 = 0
       |), truth AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT q.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 4) DESC,
       |                 e.vec_id) AS rank
       |    FROM q, embeddings e WHERE e.vec_id <> q.query_id)
       |  WHERE rank <= 3
       |), seeds AS (
       |  SELECT vec_id AS seed_id, CAST(embedding AS DOUBLE[]) AS sv
       |  FROM embeddings WHERE vec_id < 8
       |), assigned AS (
       |  SELECT vec_id, embedding, bucket FROM (
       |    SELECT e.vec_id, e.embedding, s.seed_id AS bucket,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.sv), 6) DESC,
       |                 s.seed_id) AS rn
       |    FROM embeddings e, seeds s)
       |  WHERE rn = 1
       |), ${block(1)}, ${block(2)}, ${block(4)},
       |u AS (
       |  SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL
       |  SELECT * FROM r4
       |)
       |SELECT probes, n_queries, total_hits,
       |  CAST(CAST(1000000 AS HUGEINT) * total_hits // (3 * n_queries)
       |    AS BIGINT) AS recall_ppm
       |FROM u ORDER BY probes""".stripMargin
  }

  /** q199 — dedup-method evaluation: precision/recall of the SimHash
    * pipeline (Hamming ≤ 3 candidate pairs, q28) against the exact
    * n-gram-Jaccard ≥ 0.6 pair set (q26) as ground truth — the audit a
    * curation team runs before swapping a cheap detector in for an
    * expensive one, answering "what fraction of true near-dups does
    * SimHash find, and how much of what it flags is junk". Exact
    * integer ppm.
    *
    * Scale shape: both pair generators are the existing bounded
    * equality-join pipelines; the comparison is one full outer join on
    * the pair key folded to a single row.
    */
  def nearDupEval(s: SparkSession, d: String): DataFrame = {
    val truth = DedupOps.ngramJaccardPairs(docs(s, d), "text", "doc_id")
      .select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val pred = DedupOps.simhashPairs(
        DedupOps.simhashSignatures(docs(s, d), "text", "doc_id"))
      .select(col("doc_a"), col("doc_b"), lit(1L).as("q"))
    truth.join(pred, Seq("doc_a", "doc_b"), "full_outer")
      .agg(sum(coalesce(col("t"), lit(0L))).as("n_truth"),
        sum(coalesce(col("q"), lit(0L))).as("n_pred"),
        sum(coalesce(col("t"), lit(0L)) * coalesce(col("q"), lit(0L)))
          .as("tp"))
      .select(col("n_truth").cast("bigint").as("n_truth"),
        col("n_pred").cast("bigint").as("n_pred"),
        col("tp").cast("bigint").as("tp"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * tp div n_pred AS BIGINT)")
          .as("precision_ppm"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * tp div n_truth AS BIGINT)")
          .as("recall_ppm"))
  }

  val nearDupEvalOracle: String =
    s"""WITH $simhashCandSql, pred AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |), jcand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM exg a JOIN exg b ON a.g = b.g AND a.doc_id < b.doc_id
       |), truth AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b,
       |      CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |        / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |        AS jaccard
       |    FROM jcand JOIN sh sa ON doc_a = sa.doc_id
       |               JOIN sh sb ON doc_b = sb.doc_id)
       |  WHERE jaccard >= 0.6
       |), j AS (
       |  SELECT coalesce(t.doc_a, p.doc_a) AS doc_a,
       |    CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS t,
       |    CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS q
       |  FROM truth t FULL OUTER JOIN pred p
       |    ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
       |), a AS (
       |  SELECT sum(t) AS n_truth, sum(q) AS n_pred, sum(t * q) AS tp FROM j
       |)
       |SELECT CAST(n_truth AS BIGINT) AS n_truth,
       |  CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
       |  CAST(CAST(1000000 AS HUGEINT) * tp // n_pred AS BIGINT)
       |    AS precision_ppm,
       |  CAST(CAST(1000000 AS HUGEINT) * tp // n_truth AS BIGINT)
       |    AS recall_ppm
       |FROM a""".stripMargin

  /** q200 — corpus health scorecard: the one-call KPI table a curation
    * pipeline publishes per snapshot — size, language/source spread,
    * token volume, exact-duplicate and near-duplicate exposure, PII
    * incidence — each metric an existing verified operator folded to a
    * (metric, value) row. Zeros are honest zeros (this corpus plants
    * near-dups but no exact dups or PII).
    *
    * Scale shape: every row is a map-combinable aggregate or an
    * already-bounded pair pipeline; the union is a constant number of
    * 1-row plans.
    */
  def corpusHealth(s: SparkSession, d: String): DataFrame = {
    val dd = graft.CacheScope.persisted(docs(s, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens")))
    val dupDocs = dd.groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(when(col("n") > 1, col("n")).otherwise(0L))
        .cast("bigint").as("value"))
      .select(lit("exact_dup_docs").as("metric"), col("value"))
    val pairs = graft.CacheScope.persisted(
      DedupOps.ngramJaccardPairs(dd, "text", "doc_id")
        .select("doc_a", "doc_b"))
    val nearPairs = pairs.agg(count(lit(1)).cast("bigint").as("value"))
      .select(lit("neardup_pairs").as("metric"), col("value"))
    val nearDocs = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id"))).distinct()
      .agg(count(lit(1)).cast("bigint").as("value"))
      .select(lit("neardup_docs").as("metric"), col("value"))
    // ONE aggregate pass for all six corpus-scan scalars, unpivoted to
    // rows with stack() — the per-metric unionAll form re-scanned the
    // cached corpus once per metric (6 agg subtrees for 6 rows of
    // output; 22 stages for a health report). countDistinct×2 expands
    // 3× over the doc-scale input, still one pass.
    val scalars = dd.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_tokens")).as("total_tokens"),
        expr("sum(n_tokens) div count(1)").as("mean_tokens"),
        sum(when(length(TextAnalysis.scrubPii(col("text")))
            =!= length(col("text")), 1L).otherwise(0L)).as("pii_docs"))
      .selectExpr("""stack(6,
        'n_docs', CAST(n_docs AS BIGINT),
        'n_langs', CAST(n_langs AS BIGINT),
        'n_sources', CAST(n_sources AS BIGINT),
        'total_tokens', CAST(total_tokens AS BIGINT),
        'mean_tokens', CAST(mean_tokens AS BIGINT),
        'pii_docs', CAST(pii_docs AS BIGINT)) AS (metric, value)""")
    scalars
      .unionAll(dupDocs)
      .unionAll(nearPairs)
      .unionAll(nearDocs)
      .orderBy("metric")
  }

  val corpusHealthOracle: String = {
    val scrub = TextAnalysis.piiRules.foldLeft("text") { case (c, (pat, repl)) =>
      val p = pat.replace("'", "''")
      val r = repl.replace("'", "''")
      s"regexp_replace($c, '$p', '$r', 'g')"
    }
    s"""WITH $tokShSql, base AS (
       |  SELECT doc_id, text, lang, source,
       |    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents
       |), exg AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), jcand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM exg a JOIN exg b ON a.g = b.g AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b,
       |      CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |        / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |        AS jaccard
       |    FROM jcand JOIN sh sa ON doc_a = sa.doc_id
       |               JOIN sh sb ON doc_b = sb.doc_id)
       |  WHERE jaccard >= 0.6
       |), u AS (
       |  SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM base
       |  UNION ALL SELECT 'n_langs', count(DISTINCT lang) FROM base
       |  UNION ALL SELECT 'n_sources', count(DISTINCT source) FROM base
       |  UNION ALL SELECT 'total_tokens', sum(n_tokens) FROM base
       |  UNION ALL SELECT 'mean_tokens', sum(n_tokens) // count(*) FROM base
       |  UNION ALL SELECT 'exact_dup_docs',
       |    coalesce(sum(CASE WHEN n > 1 THEN n ELSE 0 END), 0) FROM
       |    (SELECT md5(text) AS fp, count(*) AS n FROM base GROUP BY 1)
       |  UNION ALL SELECT 'neardup_pairs', count(*) FROM pairs
       |  UNION ALL SELECT 'neardup_docs', count(*) FROM
       |    (SELECT DISTINCT doc_id FROM
       |      (SELECT doc_a AS doc_id FROM pairs
       |       UNION ALL SELECT doc_b FROM pairs))
       |  UNION ALL SELECT 'pii_docs',
       |    sum(CASE WHEN length($scrub) <> length(text) THEN 1 ELSE 0 END)
       |    FROM base
       |)
       |SELECT metric, CAST(value AS BIGINT) AS value FROM u
       |ORDER BY metric""".stripMargin
  }

  /** q250 — BM25 ranked retrieval (Robertson & Spärck Jones; the
    * Okapi formula with k1 = 1.2, b = 0.75): every 97th document poses
    * its 3 most frequent terms as a query, and the engine returns the
    * top-5 documents by summed per-term BM25 contributions. This is the
    * RETRIEVAL step q71's TF-IDF term extraction feeds — the scorer a
    * corpus-curation pipeline uses for nearest-query mining and
    * retrieval-based decontamination.
    *
    * Scale + determinism shape: the candidate join touches only the
    * query terms' posting lists (an inverted-index equality join — the
    * corpus tokenizes once, never cross-joins), and the whole score is
    * LOG-FREE INTEGER arithmetic: with k1 = 6/5 and b = 3/4, the
    * per-term contribution
    *   idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    * multiplies out to the exact rational
    *   [(2N−2df+1) · 22·tf·T · 10⁶] / [(2df+1) · (10·tf·T + 3·T + 9·dl·N)]
    * (T = total tokens, so avgdl = T/N arrives as dl·N/T without a
    * float), floored at ppm scale through a DECIMAL(38,0) carrier.
    * Summing integer ppm contributions is order-independent, so the
    * ranking is bit-stable on any engine at any parallelism — no log,
    * no double accumulation. Top-5 via the bounded-buffer [[TopK]]
    * aggregate (map-side truncation, no query-corpus-sized window
    * partitions); score_ppm ≤ ~10⁷·|qterms| is exact in the Double the
    * buffer carries.
    */
  def bm25Retrieval(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs(s, d).select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    // (doc, term, tf): three consumers (doc lengths, df, posting lists)
    val tf = graft.CacheScope.persisted(
      toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // N and T as a broadcast 1-row aggregate — every doc tokenizes to
    // ≥ 1 token (split("") = [""]), so counting dl rows counts docs
    val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("tt"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // query = each sampled doc's 3 most frequent terms (ties by term):
    // the window partitions by the sampled doc over its OWN vocabulary.
    // The batch carries df + corpus stats on each row and BROADCASTS
    // against the posting lists (the bruteForceTopK query convention) —
    // the candidate rows form map-side, with no corpus-sized exchange
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
    val qts = broadcast(tf.filter(col("doc_id") % 97 === 0)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("doc_id").as("query_id"), col("term"))
      .join(dfreq, "term")
      .crossJoin(broadcast(stats)))
    val cand = tf
      .join(qts, "term").filter(col("doc_id") =!= col("query_id"))
      .join(dl, "doc_id")
      .withColumn("contrib", functions.Bm25.contribPpm)
    cand.groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score_ppm"))
      .groupBy(col("query_id"))
      // exact-Long ranking (see Bm25.queryBm25Index): the double
      // carrier collapses score_ppm past 2^53 at corpus scale
      .agg(functions.TopK.top_k_exact(
        col("score_ppm"), col("doc_id"), 5).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col").getField("id").as("neighbor_id"),
        col("col").getField("score").cast("bigint").as("score_ppm"))
      .orderBy("query_id", "rank")
  }

  val bm25RetrievalOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
      |), stats AS (
      |  SELECT count(*) AS nd, sum(dl) AS tt FROM dl
      |), df AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |), qt AS (
      |  SELECT doc_id AS query_id, term FROM (
      |    SELECT doc_id, term,
      |      row_number() OVER (PARTITION BY doc_id
      |        ORDER BY tf DESC, term) AS rk
      |    FROM tf WHERE doc_id % 97 = 0)
      |  WHERE rk <= 3
      |), cand AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    CAST(2 * nd - 2 * df + 1 AS HUGEINT)
      |      * 22 * tf.tf * tt * 1000000
      |      // (CAST(2 * df + 1 AS HUGEINT)
      |         * (CAST(10 AS HUGEINT) * tf.tf * tt
      |            + CAST(3 AS HUGEINT) * tt
      |            + CAST(9 AS HUGEINT) * dl.dl * nd)) AS contrib
      |  FROM qt
      |  JOIN tf USING (term)
      |  JOIN df USING (term)
      |  JOIN dl ON tf.doc_id = dl.doc_id
      |  CROSS JOIN stats
      |  WHERE tf.doc_id <> qt.query_id
      |), sc AS (
      |  SELECT query_id, doc_id, sum(contrib) AS score_ppm
      |  FROM cand GROUP BY 1, 2
      |), r AS (
      |  SELECT query_id, doc_id, score_ppm,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_ppm DESC, doc_id) AS rank
      |  FROM sc
      |)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id AS neighbor_id,
      |  CAST(score_ppm AS BIGINT) AS score_ppm
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** q252 — retrieval-based decontamination, the RETRIEVE-then-VERIFY
    * two-stage modern eval-leakage check: each eval-split document
    * (doc_id % 7 = 0, q44's split) poses its 3 most frequent terms as a
    * BM25 query against the TRAIN corpus only (stats, document
    * frequencies and posting lists all train-side), the top-1 train hit
    * is retrieved, and the pair is then VERIFIED by exact shared-5-gram
    * count — the q44/q73 n-gram evidence attached to the retrieval
    * candidate. Complements the existing decontamination family: q44 is
    * exact-overlap, q47 Bloom-prefiltered, q73 LSH-fuzzy; this is the
    * ranked-retrieval shape (a near-dup that shares vocabulary but not
    * contiguous n-grams scores high on BM25 and 0 on shared_5grams —
    * the two columns disagree exactly when a human should look).
    * Same scale shape as q250: posting-list equality joins only, and
    * the verification touches |eval| pairs, not a cross join.
    *
    * Query terms are the eval doc's top-3 by tf·idf (the same integer
    * idf rational the scorer uses), NOT raw tf: raw-tf queries are
    * stopwords, and a stopword query term drags the WHOLE corpus's
    * posting list into the candidate join — measured 27.6 s vs 2.9 s at
    * sf0.1 for identical verification power. Discriminative terms are
    * both what a retrieval decontaminator should query and what keeps
    * the candidate volume |eval|·3·df(rare) instead of |eval|·|corpus|.
    */
  def bm25Decontamination(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dd = docs(s, d)
    val tfAll = graft.CacheScope.persisted(dd
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val train = tfAll.filter(col("doc_id") % 7 =!= 0)
    val dl = train.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("tt"))
    val dfreq = graft.CacheScope.persisted(
      train.groupBy("term").agg(count(lit(1)).as("df")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("qsel").desc, col("term"))
    // the query batch carries its terms' df AND the corpus stats on
    // each row, then BROADCASTS against the posting lists — the
    // ANN-query convention (bruteForceTopK): a query batch is caller-
    // bounded at any corpus scale, and joining it map-side means the
    // candidate rows form WITHOUT shuffling the train tf table (joining
    // train⨝dfreq⨝dl first measured 17 s vs 5 s — two edge-sized
    // exchanges for three broadcast-sized tables)
    val qts = broadcast(tfAll.filter(col("doc_id") % 7 === 0)
      .join(dfreq, "term") // terms unseen in train retrieve nothing
      .crossJoin(broadcast(stats))
      .withColumn("qsel",
        expr("""CAST(tf AS DECIMAL(38,0))
               |  * ((2 * nd - 2 * df + 1) * 1000000 div (2 * df + 1))"""
          .stripMargin))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("doc_id").as("query_id"), col("term"),
        col("df"), col("nd"), col("tt")))
    val top1 = train
      .join(qts, "term")
      .join(dl, "doc_id")
      .withColumn("contrib", functions.Bm25.contribPpm)
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score_ppm"))
      // top-1 as a LEXICOGRAPHIC MAX over (score, −doc): a codegen'd
      // map-combinable struct max (the mrrFirstRelevant pattern) — the
      // TopK buffer aggregator pays per-row buffer ser/de and measured
      // 11 s over the ~3M candidate rows here where this max is free
      .groupBy(col("query_id"))
      .agg(max(struct(col("score_ppm"), (-col("doc_id")).as("nid"))).as("m"))
      .select(col("query_id"), (-col("m.nid")).as("neighbor_id"),
        col("m.score_ppm").as("score_ppm"))
    // VERIFY on the RETRIEVED id set only (the q209 membership
    // discipline): the r14 shape shingled the FULL corpus (two
    // corpus-wide array builds, ~9.5 task-CPU-s at sf0.1) to serve a
    // |eval|-row pair table. The retrieved ids — query_id ∪ neighbor_id
    // — broadcast (≤ 2·|eval| longs), so the semi join stays on the
    // scan side and only the relevant ≤ 2/7 of the corpus is ever
    // shingled. Grams hash to Fnv64 INSIDE the array before anything
    // leaves the scan stage: the one shuffle this verify pays (the
    // sh_q⨝sh_t pair assembly on neighbor_id) moves 8-byte-element
    // arrays, not ~30-byte gram strings, and array_intersect compares
    // longs. Losslessness is the standing Fnv64 birthday argument
    // (q26/q200): a miscount needs two DISTINCT 5-grams of one doc
    // pair colliding in 64 bits — P < (200·200)/2^64 per pair.
    // (An exploded relational count — gram rows joined per pair —
    // measured 14.4 task-CPU-s / 110 MB shuffle here: the explode
    // multiplies the pair columns onto every gram row. Rejected.)
    // top1 persisted: it feeds the id probe, the broadcast, and the
    // final projection.
    val top1p = graft.CacheScope.persisted(top1)
    val relIds = top1p.select(col("query_id").as("doc_id"))
      .union(top1p.select(col("neighbor_id").as("doc_id"))).distinct()
    val sh = dd.join(broadcast(relIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        transform(TextAnalysis.textShingles(col("text"), 5),
          g => graft.expressions.Fnv64.fnv64(g)).as("sh"))
    top1p
      .join(sh.select(col("doc_id").as("query_id"), col("sh").as("sh_q")),
        "query_id")
      .join(sh.select(col("doc_id").as("neighbor_id"), col("sh").as("sh_t")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("score_ppm"),
        size(array_intersect(col("sh_q"), col("sh_t"))).cast("bigint")
          .as("shared_5grams"))
      .orderBy("query_id")
  }

  val bm25DecontaminationOracle: String =
    s"""WITH $tokShSql, tfa AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(t) AS term FROM tok)
       |  GROUP BY 1, 2
       |), tr AS (
       |  SELECT * FROM tfa WHERE doc_id % 7 <> 0
       |), dl AS (
       |  SELECT doc_id, sum(tf) AS dl FROM tr GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS nd, sum(dl) AS tt FROM dl
       |), df AS (
       |  SELECT term, count(*) AS df FROM tr GROUP BY 1
       |), qt AS (
       |  SELECT doc_id AS query_id, term FROM (
       |    SELECT tfa.doc_id, term,
       |      row_number() OVER (PARTITION BY tfa.doc_id
       |        ORDER BY CAST(tf AS HUGEINT)
       |          * ((2 * nd - 2 * df + 1) * 1000000 // (2 * df + 1)) DESC,
       |          term) AS rk
       |    FROM tfa JOIN df USING (term) CROSS JOIN stats
       |    WHERE tfa.doc_id % 7 = 0)
       |  WHERE rk <= 3
       |), cand AS (
       |  SELECT qt.query_id, tr.doc_id,
       |    CAST(2 * nd - 2 * df + 1 AS HUGEINT)
       |      * 22 * tr.tf * tt * 1000000
       |      // (CAST(2 * df + 1 AS HUGEINT)
       |         * (CAST(10 AS HUGEINT) * tr.tf * tt
       |            + CAST(3 AS HUGEINT) * tt
       |            + CAST(9 AS HUGEINT) * dl.dl * nd)) AS contrib
       |  FROM qt
       |  JOIN tr USING (term)
       |  JOIN df USING (term)
       |  JOIN dl ON tr.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |), sc AS (
       |  SELECT query_id, doc_id, sum(contrib) AS score_ppm
       |  FROM cand GROUP BY 1, 2
       |), r AS (
       |  SELECT query_id, doc_id, score_ppm FROM (
       |    SELECT query_id, doc_id, score_ppm,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score_ppm DESC, doc_id) AS rk
       |    FROM sc)
       |  WHERE rk = 1
       |)
       |SELECT r.query_id, r.doc_id AS neighbor_id,
       |  CAST(r.score_ppm AS BIGINT) AS score_ppm,
       |  CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS shared_5grams
       |FROM r
       |JOIN sh sa ON sa.doc_id = r.query_id
       |JOIN sh sb ON sb.doc_id = r.doc_id
       |ORDER BY query_id""".stripMargin

  /** q253 — near-duplicate graph closure rate: the GLOBAL clustering
    * coefficient (3·triangles / wedges) of the q28 SimHash pair graph
    * ([[graft.operators.Triangles.globalCounts]], degree-oriented).
    * A near-dup relation that were perfectly transitive would close
    * every wedge (ppm = 10⁶); the gap measures how often "A dups B dups
    * C" fails to imply "A dups C" — the pair-level companion to q226's
    * cluster-overreach count, and the number that decides whether
    * connected-component clustering (q55) over-merges. Wedge counts
    * come from the degree AGGREGATE (never enumerated); the closure
    * test runs on the √m-bounded oriented wedge join.
    */
  def dupClosureRate(s: SparkSession, d: String): DataFrame =
    graft.operators.Triangles.globalCounts(
      DedupOps.simhashPairs(
        DedupOps.simhashSignatures(docs(s, d), "text", "doc_id"))
        .select("doc_a", "doc_b"),
      "doc_a", "doc_b")
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        // triangle counts can be super-linear in the graph: ppm
        // through DECIMAL(38,0) (the q156 cast-first discipline)
        expr("""CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT)
               |ELSE CAST(CAST(3 AS DECIMAL(38,0)) * n_triangles
               |  * 1000000 div n_wedges AS BIGINT) END"""
          .stripMargin).as("closure_ppm"))

  val dupClosureRateOracle: String =
    s"""WITH $simhashCandSql, pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |), deg AS (
       |  SELECT n, count(*) AS d FROM (
       |    SELECT doc_a AS n FROM pairs
       |    UNION ALL SELECT doc_b FROM pairs)
       |  GROUP BY n
       |), w AS (
       |  SELECT coalesce(sum(d * (d - 1) // 2), 0) AS n_wedges FROM deg
       |), ne AS (
       |  SELECT count(*) AS n_edges FROM pairs
       |), tri AS (
       |  SELECT count(*) AS n_triangles
       |  FROM pairs p1
       |  JOIN pairs p2 ON p2.doc_a = p1.doc_a AND p2.doc_b > p1.doc_b
       |  JOIN pairs p3 ON p3.doc_a = p1.doc_b AND p3.doc_b = p2.doc_b
       |)
       |SELECT CAST(n_edges AS BIGINT) AS n_edges,
       |  CAST(n_wedges AS BIGINT) AS n_wedges,
       |  CAST(n_triangles AS BIGINT) AS n_triangles,
       |  CAST(CASE WHEN n_wedges = 0 THEN 0
       |    ELSE 3 * n_triangles * 1000000 // n_wedges END AS BIGINT)
       |    AS closure_ppm
       |FROM ne, w, tri""".stripMargin

  /** q251 — Matryoshka truncation recall curve
    * ([[SimilarityOps.truncatedTopK]]): recall@5 of prefix-truncated
    * cosine ranking (8/16/32 of 64 dims) against the full-width exact
    * top-5 — the measurement that decides how narrow a serving index
    * can run before re-ranking is mandatory (Kusupati et al. 2022).
    * Complements q152 (JL random projection): truncation is the
    * projection MRL-trained models are optimized for, and the audit
    * shape is q67's recall-vs-exact-truth with the truth table built
    * ONCE and shared by all three widths. Counts are exact integers;
    * recall reported in ppm (hits·10⁶ div possible).
    */
  def matryoshkaRecall(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    // the four brute-force scans (truth + 3 truncations) are scan-local
    // cosine CPU over the corpus side (measured 5.7 task-CPU-s serial
    // on the one-row-group fixture). Widen ([[graft.Par.toCores]]) and
    // persist ONCE so each scan reads the spread cache. The 1% QUERY
    // side deliberately reads the raw table, not the cache: its
    // vec_id filter pushes down to the scan, while a cache-derived
    // spelling would pay `width` cached-partition tasks per broadcast
    // build, four times (measured +0.8 s at sf0.1).
    val corpus = graft.CacheScope.persisted(graft.Par.toCores(e))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = graft.CacheScope.persisted(
      SimilarityOps.bruteForceTopK(q, corpus, k = 5)
        .select("query_id", "neighbor_id"))
    val possible = truth.agg(count(lit(1)).as("possible"))
    Seq(8, 16, 32).map { dims =>
      SimilarityOps.truncatedTopK(q, corpus, k = 5, dims = dims)
        .select("query_id", "neighbor_id")
        .join(truth, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(possible))
        .select(lit(dims).cast("bigint").as("dims"), col("hits"),
          col("possible"),
          expr("hits * 1000000 div possible").as("recall_ppm"))
    }.reduce(_.unionByName(_)).orderBy("dims")
  }

  val matryoshkaRecallOracle: String = {
    val perDim = Seq(8, 16, 32).map { dims =>
      s"""s$dims AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY round(list_cosine_similarity(
         |          qv[1:$dims], v[1:$dims]), 4) DESC, vec_id) AS rk
         |    FROM q, c WHERE vec_id <> query_id)
         |  WHERE rk <= 5
         |), h$dims AS (
         |  SELECT count(*) AS hits
         |  FROM s$dims JOIN truth USING (query_id, vec_id)
         |)""".stripMargin
    }.mkString(", ")
    val rows = Seq(8, 16, 32).map { dims =>
      s"""SELECT CAST($dims AS BIGINT) AS dims, CAST(hits AS BIGINT) AS hits,
         |  CAST(possible AS BIGINT) AS possible,
         |  CAST(hits * 1000000 // possible AS BIGINT) AS recall_ppm
         |FROM h$dims, poss""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 100 = 0
       |), c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), truth AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
       |          vec_id) AS rk
       |    FROM q, c WHERE vec_id <> query_id)
       |  WHERE rk <= 5
       |), poss AS (
       |  SELECT count(*) AS possible FROM truth
       |), $perDim
       |$rows
       |ORDER BY dims""".stripMargin
  }

  /** q254 — sign-bit (1-bit) quantization recall
    * ([[SimilarityOps.withSignCode]] / [[SimilarityOps.hammingTopK]]):
    * recall@5 of Hamming-distance ranking over 64-bit sign codes against
    * the full-precision exact top-5 — the bottom rung of the
    * quantization ladder the corpus already climbs (int8 q72, PQ q102,
    * Matryoshka q251). 8 bytes/vector means the first-pass index for a
    * billion embeddings is 8 GB — RAM on one node, broadcast-able at
    * serving time; this query measures what that 32× compression costs
    * in recall. Codes live in two BIGINT halves (no sign-bit
    * arithmetic), distance is two XOR+popcounts, and `sum_hamming`
    * carries the exact integer distance mass so the hash check pins the
    * distances themselves, not just the id sets.
    */
  def hammingRecall(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val packed = SimilarityOps.withSignCode(e, "embedding", "h1", "h2")
      .select("vec_id", "h1", "h2")
    val qf = e.filter(col("vec_id") % 100 === 0)
    val q = qf.select(col("vec_id").as("query_id"),
      col("embedding").as("query_vec"))
    val qp = SimilarityOps.withSignCode(qf, "embedding", "qh1", "qh2")
      .select(col("vec_id").as("query_id"), col("qh1"), col("qh2"))
    val truth = graft.CacheScope.persisted(
      SimilarityOps.bruteForceTopK(q, e, k = 5)
        .select("query_id", "neighbor_id"))
    val possible = truth.agg(count(lit(1)).as("possible"))
    val ham = graft.CacheScope.persisted(
      SimilarityOps.hammingTopK(qp, packed, k = 5))
    val hits = ham.join(truth, Seq("query_id", "neighbor_id"))
      .agg(count(lit(1)).as("hits"))
    val hd = ham.agg(sum(col("hamming")).as("sum_hamming"))
    hits.crossJoin(broadcast(possible)).crossJoin(broadcast(hd))
      .select(lit(5L).as("k"), col("hits"), col("possible"),
        expr("hits * 1000000 div possible").as("recall_ppm"),
        col("sum_hamming"))
  }

  val hammingRecallOracle: String =
    """WITH pk AS (
      |  SELECT vec_id,
      |    sum(CASE WHEN v > 0 AND i <= 32
      |      THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END) AS h1,
      |    sum(CASE WHEN v > 0 AND i >= 33
      |      THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END) AS h2
      |  FROM (SELECT vec_id, unnest(embedding) AS v,
      |          generate_subscripts(embedding, 1) AS i FROM embeddings)
      |  GROUP BY vec_id
      |), q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id % 100 = 0
      |), c AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |), truth AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY round(list_cosine_similarity(qv, v), 4) DESC,
      |          vec_id) AS rk
      |    FROM q, c WHERE vec_id <> query_id)
      |  WHERE rk <= 5
      |), qp AS (
      |  SELECT vec_id AS query_id, h1 AS qh1, h2 AS qh2 FROM pk
      |  WHERE vec_id % 100 = 0
      |), ham AS (
      |  SELECT query_id, vec_id, hd FROM (
      |    SELECT qp.query_id, pk.vec_id,
      |      CAST(bit_count(xor(pk.h1, qp.qh1))
      |        + bit_count(xor(pk.h2, qp.qh2)) AS BIGINT) AS hd,
      |      row_number() OVER (PARTITION BY qp.query_id
      |        ORDER BY bit_count(xor(pk.h1, qp.qh1))
      |          + bit_count(xor(pk.h2, qp.qh2)), pk.vec_id) AS rk
      |    FROM qp, pk WHERE pk.vec_id <> qp.query_id)
      |  WHERE rk <= 5
      |), hits AS (
      |  SELECT count(*) AS hits FROM ham
      |  JOIN truth ON ham.query_id = truth.query_id
      |            AND ham.vec_id = truth.vec_id
      |), poss AS (
      |  SELECT count(*) AS possible FROM truth
      |), hsum AS (
      |  SELECT sum(hd) AS sum_hamming FROM ham
      |)
      |SELECT CAST(5 AS BIGINT) AS k, CAST(hits AS BIGINT) AS hits,
      |  CAST(possible AS BIGINT) AS possible,
      |  CAST(hits * 1000000 // possible AS BIGINT) AS recall_ppm,
      |  CAST(sum_hamming AS BIGINT) AS sum_hamming
      |FROM hits, poss, hsum""".stripMargin

  /** q255 — nearest-centroid domain classifier over the labeled
    * embedding corpus: per-label integer centroids from the 80% train
    * split (the q146 convention — floor(x·1000) quantization,
    * negative-safe floor-division means — so every distance is an exact
    * integer on any engine), held-out 20% assigned to the argmin-L2
    * centroid, output the full confusion matrix. This is the
    * domain-assignment step of a mixture pipeline (label = source
    * domain; route unlabeled docs to the nearest domain centroid before
    * q57/q115 mixing), and the cheapest possible classifier audit: the
    * centroid table is labels × dims rows — broadcast-sized at ANY
    * corpus scale — so assignment is a map-only pass over the corpus.
    */
  def nearestCentroid(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val qrows = graft.CacheScope.persisted(e
      .select(col("vec_id"), col("label").cast("bigint").as("label"),
        posexplode(expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000) AS BIGINT))")))
      .select(col("vec_id"), col("label"),
        (col("pos") + 1).cast("bigint").as("pos"), col("col").as("x")))
    val train = qrows.filter(col("vec_id") % 5 =!= 0)
    val cent = train.groupBy(col("label").as("cl"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .select(col("cl"), col("pos"),
        expr("(sx - (((sx % n) + n) % n)) div n").as("c"))
    val test = qrows.filter(col("vec_id") % 5 === 0)
    val dist = test.join(broadcast(cent), "pos")
      .groupBy(col("vec_id"), col("label"), col("cl"))
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
    dist.groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("dist"), col("cl"))).as("m"))
      .select(col("label"), col("m.cl").as("pred"))
      .groupBy(col("label").as("true_label"), col("pred").as("pred_label"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("true_label", "pred_label")
  }

  val nearestCentroidOracle: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(floor(x * 1000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), q AS (
      |  SELECT vec_id, label, CAST(u.i AS BIGINT) AS pos, qv[u.i] AS x
      |  FROM e, UNNEST(generate_series(1, 64)) AS u(i)
      |), tr AS (
      |  SELECT * FROM q WHERE vec_id % 5 <> 0
      |), cent AS (
      |  SELECT label AS cl, pos,
      |    ((sum(x) - (((sum(x) % count(*)) + count(*)) % count(*)))
      |      // count(*)) AS c
      |  FROM tr GROUP BY 1, 2
      |), te AS (
      |  SELECT * FROM q WHERE vec_id % 5 = 0
      |), dist AS (
      |  SELECT te.vec_id, te.label, cent.cl,
      |    sum((te.x - cent.c) * (te.x - cent.c)) AS dist
      |  FROM te JOIN cent USING (pos)
      |  GROUP BY 1, 2, 3
      |), pred AS (
      |  SELECT vec_id, label, cl AS pred FROM (
      |    SELECT vec_id, label, cl,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
      |    FROM dist)
      |  WHERE rn = 1
      |)
      |SELECT label AS true_label, pred AS pred_label,
      |  CAST(count(*) AS BIGINT) AS n_vecs
      |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------- registries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_dedup_exact" -> (dedupExact(_, _)),
    "q22_fingerprints" -> (fingerprints(_, _)),
    "q23_token_stats" -> (tokenStats(_, _)),
    "q24_text_quality" -> (textQuality(_, _)),
    "q25_lang_id" -> (langId(_, _)),
    "q26_ngram_jaccard" -> (ngramJaccard(_, _)),
    "q27_minhash_lsh" -> (minhashLsh(_, _)),
    "q28_simhash" -> (simhash(_, _)),
    "q29_cosine_topk" -> (cosineTopK(_, _)),
    "q30_ivf_topk" -> (ivfTopK(_, _)),
    "q31_embedding_neardup" -> (embeddingNearDup(_, _)),
    "q32_multimodal_features" -> (multimodalFeatures(_, _)),
    "q42_pii_scrub" -> (piiScrub(_, _)),
    "q43_repetition_score" -> (repetitionScore(_, _)),
    "q44_decontamination" -> (decontamination(_, _)),
    "q47_bloom_decontamination" -> (bloomDecontamination(_, _)),
    "q48_stratified_sample" -> (stratifiedSample(_, _)),
    "q49_pack_sequences" -> (packSequences(_, _)),
    "q50_quality_gate" -> (corpusQualityGate(_, _)),
    "q51_source_cap" -> (sourceCap(_, _)),
    "q52_token_budget" -> (tokenBudgetFill(_, _)),
    "q54_shuffle_order" -> (shuffleOrder(_, _)),
    "q55_dup_clusters" -> (dupClusters(_, _)),
    "q56_quantile_gate" -> (qualityQuantileGate(_, _)),
    "q57_mixture_sample" -> (mixtureSample(_, _)),
    "q58_cluster_split" -> (clusterSplit(_, _)),
    "q59_heavy_hitters" -> (heavyHitterTokens(_, _)),
    "q62_edit_distance" -> (editDistancePairs(_, _)),
    "q67_ivf_recall" -> (ivfRecall(_, _)),
    "q68_bigram_lm_score" -> (bigramLmScore(_, _)),
    "q69_chunk_documents" -> (chunkDocuments(_, _)),
    "q70_span_dedup" -> (spanDedup(_, _)),
    "q71_tfidf_terms" -> (tfidfTerms(_, _)),
    "q72_quantized_ann" -> (quantizedAnn(_, _)),
    "q73_fuzzy_decontamination" -> (fuzzyDecontamination(_, _)),
    "q74_segment_dedup" -> (segmentDedup(_, _)),
    "q75_unicode_normalize" -> (unicodeNormalize(_, _)),
    "q78_vocab_coverage" -> (vocabCoverage(_, _)),
    "q79_epoch_upsample" -> (epochUpsample(_, _)),
    "q85_hard_negatives" -> (hardNegatives(_, _)),
    "q90_image_features" -> (imageFeatures(_, _)),
    "q91_canonical_docs" -> (canonicalDocs(_, _)),
    "q93_curation_funnel" -> (curationFunnel(_, _)),
    "q98_png_codec" -> (pngCodecFeatures(_, _)),
    "q99_jpeg_codec" -> (jpegCodecRoundtrip(_, _)),
    "q102_pq_ann" -> (pqAnn(_, _)),
    "q104_ppjoin_neardup" -> (ppjoinNearDup(_, _)),
    "q105_pq_recall" -> (pqRecall(_, _)),
    "q106_wav_features" -> (audioFeatures(_, _)),
    "q110_pmi_collocations" -> (pmiCollocations(_, _)),
    "q113_semantic_dedup" -> (semanticDedupQ(_, _)),
    "q114_cms_frequency" -> (cmsFrequency(_, _)),
    "q115_dsir_selection" -> (dsirSelection(_, _)),
    "q123_pareto_frontier" -> (paretoFrontier(_, _)),
    "q124_ols_trend" -> (olsTrend(_, _)),
    "q129_novelty_score" -> (noveltyScore(_, _)),
    "q130_independence_residuals" -> (independenceResiduals(_, _)),
    "q131_rrf_fusion" -> (rrfFusion(_, _)),
    "q134_avi_codec" -> (videoFeatures(_, _)),
    "q135_ks_drift" -> (ksDrift(_, _)),
    "q136_token_hhi" -> (tokenHhi(_, _)),
    "q137_bpe_pairs" -> (bpePairs(_, _)),
    "q142_weighted_jaccard" -> (weightedJaccard(_, _)),
    "q143_twap" -> (twap(_, _)),
    "q144_embedding_dim_stats" -> (embeddingDimStats(_, _)),
    "q145_sketch_ks_drift" -> (sketchKsDrift(_, _)),
    "q146_kmeans" -> (kmeansClusters(_, _)),
    "q147_ivfpq_ann" -> (ivfPqAnn(_, _)),
    "q148_systematic_sample" -> (systematicSampleQ(_, _)),
    "q149_ivfpq_recall" -> (ivfPqRecall(_, _)),
    "q150_cluster_exemplars" -> (clusterExemplars(_, _)),
    "q151_containment" -> (containmentDetection(_, _)),
    "q152_jl_projection" -> (jlProjection(_, _)),
    "q153_bpe_merge" -> (bpeMergeRound(_, _)),
    "q159_modularity" -> (modularityScore(_, _)),
    "q160_tvd_drift" -> (tvdDrift(_, _)),
    "q161_bpe_encode" -> (bpeEncode(_, _)),
    "q162_classifier_eval" -> (classifierEval(_, _)),
    "q163_kappa" -> (kappaAgreement(_, _)),
    "q168_mrr_eval" -> (mrrEval(_, _)),
    "q174_cdc_chunks" -> (cdcChunks(_, _)),
    "q175_curriculum_interleave" -> (curriculumInterleave(_, _)),
    "q176_negative_sampling" -> (negativeSampling(_, _)),
    "q177_kmv_distinct" -> (kmvDistinct(_, _)),
    "q186_winnowing" -> (winnowing(_, _)),
    "q187_bag_dedup" -> (bagDedup(_, _)),
    "q188_token_burstiness" -> (tokenBurstiness(_, _)),
    "q189_blocklist_filter" -> (blocklistFilter(_, _)),
    "q193_ivf_probe_sweep" -> (ivfProbeSweep(_, _)),
    "q199_neardup_eval" -> (nearDupEval(_, _)),
    "q200_corpus_health" -> (corpusHealth(_, _)),
    "q250_bm25_retrieval" -> (bm25Retrieval(_, _)),
    "q251_matryoshka_recall" -> (matryoshkaRecall(_, _)),
    "q252_bm25_decontamination" -> (bm25Decontamination(_, _)),
    "q253_dup_closure_rate" -> (dupClosureRate(_, _)),
    "q254_hamming_recall" -> (hammingRecall(_, _)),
    "q255_nearest_centroid" -> (nearestCentroid(_, _)),
  )

  def oracleSql: Map[String, String] = Map(
    "q21_dedup_exact" -> dedupExactOracle,
    "q22_fingerprints" -> fingerprintsOracle,
    "q23_token_stats" -> tokenStatsOracle,
    "q24_text_quality" -> textQualityOracle,
    "q25_lang_id" -> langIdOracle,
    "q26_ngram_jaccard" -> ngramJaccardOracle,
    "q27_minhash_lsh" -> minhashLshOracle,
    "q28_simhash" -> simhashOracle,
    "q29_cosine_topk" -> cosineTopKOracle,
    "q30_ivf_topk" -> ivfTopKOracle,
    "q31_embedding_neardup" -> embeddingNearDupOracle,
    "q32_multimodal_features" -> multimodalFeaturesOracle,
    "q42_pii_scrub" -> piiScrubOracle,
    "q43_repetition_score" -> repetitionScoreOracle,
    "q44_decontamination" -> decontaminationOracle,
    "q47_bloom_decontamination" -> bloomDecontaminationOracle,
    "q48_stratified_sample" -> stratifiedSampleOracle,
    "q49_pack_sequences" -> packSequencesOracle,
    "q50_quality_gate" -> corpusQualityGateOracle,
    "q51_source_cap" -> sourceCapOracle,
    "q52_token_budget" -> tokenBudgetFillOracle,
    "q54_shuffle_order" -> shuffleOrderOracle,
    "q55_dup_clusters" -> dupClustersOracle,
    "q56_quantile_gate" -> qualityQuantileGateOracle,
    "q57_mixture_sample" -> mixtureSampleOracle,
    "q58_cluster_split" -> clusterSplitOracle,
    "q59_heavy_hitters" -> heavyHitterTokensOracle,
    "q62_edit_distance" -> editDistancePairsOracle,
    "q67_ivf_recall" -> ivfRecallOracle,
    "q68_bigram_lm_score" -> bigramLmScoreOracle,
    "q69_chunk_documents" -> chunkDocumentsOracle,
    "q70_span_dedup" -> spanDedupOracle,
    "q71_tfidf_terms" -> tfidfTermsOracle,
    "q72_quantized_ann" -> quantizedAnnOracle,
    "q73_fuzzy_decontamination" -> fuzzyDecontaminationOracle,
    "q74_segment_dedup" -> segmentDedupOracle,
    "q75_unicode_normalize" -> unicodeNormalizeOracle,
    "q78_vocab_coverage" -> vocabCoverageOracle,
    "q79_epoch_upsample" -> epochUpsampleOracle,
    "q85_hard_negatives" -> hardNegativesOracle,
    "q90_image_features" -> imageFeaturesOracle,
    "q91_canonical_docs" -> canonicalDocsOracle,
    "q93_curation_funnel" -> curationFunnelOracle,
    "q98_png_codec" -> pngCodecFeaturesOracle,
    "q99_jpeg_codec" -> jpegCodecRoundtripOracle,
    "q102_pq_ann" -> pqAnnOracle,
    "q104_ppjoin_neardup" -> ngramJaccardOracle,
    "q105_pq_recall" -> pqRecallOracle,
    "q106_wav_features" -> audioFeaturesOracle,
    "q110_pmi_collocations" -> pmiCollocationsOracle,
    "q113_semantic_dedup" -> semanticDedupOracle,
    "q114_cms_frequency" -> cmsFrequencyOracle,
    "q115_dsir_selection" -> dsirSelectionOracle,
    "q123_pareto_frontier" -> paretoFrontierOracle,
    "q124_ols_trend" -> olsTrendOracle,
    "q129_novelty_score" -> noveltyScoreOracle,
    "q130_independence_residuals" -> independenceResidualsOracle,
    "q131_rrf_fusion" -> rrfFusionOracle,
    "q134_avi_codec" -> videoFeaturesOracle,
    "q135_ks_drift" -> ksDriftOracle,
    "q136_token_hhi" -> tokenHhiOracle,
    "q137_bpe_pairs" -> bpePairsOracle,
    "q142_weighted_jaccard" -> weightedJaccardOracle,
    "q143_twap" -> twapOracle,
    "q144_embedding_dim_stats" -> embeddingDimStatsOracle,
    "q145_sketch_ks_drift" -> sketchKsDriftOracle,
    "q146_kmeans" -> kmeansClustersOracle,
    "q147_ivfpq_ann" -> ivfPqAnnOracle,
    "q148_systematic_sample" -> systematicSampleOracle,
    "q149_ivfpq_recall" -> ivfPqRecallOracle,
    "q150_cluster_exemplars" -> clusterExemplarsOracle,
    "q151_containment" -> containmentDetectionOracle,
    "q152_jl_projection" -> jlProjectionOracle,
    "q153_bpe_merge" -> bpeMergeRoundOracle,
    "q159_modularity" -> modularityScoreOracle,
    "q160_tvd_drift" -> tvdDriftOracle,
    "q161_bpe_encode" -> bpeEncodeOracle,
    "q162_classifier_eval" -> classifierEvalOracle,
    "q163_kappa" -> kappaAgreementOracle,
    "q168_mrr_eval" -> mrrEvalOracle,
    "q174_cdc_chunks" -> cdcChunksOracle,
    "q175_curriculum_interleave" -> curriculumInterleaveOracle,
    "q176_negative_sampling" -> negativeSamplingOracle,
    "q177_kmv_distinct" -> kmvDistinctOracle,
    "q186_winnowing" -> winnowingOracle,
    "q187_bag_dedup" -> bagDedupOracle,
    "q188_token_burstiness" -> tokenBurstinessOracle,
    "q189_blocklist_filter" -> blocklistFilterOracle,
    "q193_ivf_probe_sweep" -> ivfProbeSweepOracle,
    "q199_neardup_eval" -> nearDupEvalOracle,
    "q200_corpus_health" -> corpusHealthOracle,
    "q250_bm25_retrieval" -> bm25RetrievalOracle,
    "q251_matryoshka_recall" -> matryoshkaRecallOracle,
    "q252_bm25_decontamination" -> bm25DecontaminationOracle,
    "q253_dup_closure_rate" -> dupClosureRateOracle,
    "q254_hamming_recall" -> hammingRecallOracle,
    "q255_nearest_centroid" -> nearestCentroidOracle,
  )
}
