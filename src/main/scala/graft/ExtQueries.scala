package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.expressions.Fnv64
import graft.functions.TextAnalysis

/** Extension query registry (q201+): round-7 additions beyond the
  * 200-query core — corpus-quality rule engines in the C4/Gopher
  * tradition, prefix dedup, and classic star-schema share analytics.
  * Same contract as [[CoreQueries]]/[[LlmQueries]]: every query is
  * deterministic, integer/decimal-exact where the oracle hashes values,
  * and ships a DuckDB oracle computing the identical formula.
  */
object ExtQueries {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.load(s, d, name)
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  // shared oracle CTE: whitespace tokens of documents
  private val tokSql =
    """tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
      |  FROM documents
      |)""".stripMargin

  // ------------------------------------------------- corpus quality rules

  /** q201 — Gopher-style quality rule table (Rae et al. 2021's repetition
    * and word-statistics signals, re-expressed integer-exact): per
    * document token count, mean word length (centi-chars), stopword
    * vocabulary hits, and duplicate-bigram incidence (ppm), folded into a
    * single `kept` verdict. All four signals are scan-local array
    * expressions over the token vector — one pass, no shuffle beyond the
    * final order; at 100 TB this is a map-only job.
    *
    * Integer carriers keep the oracle bit-exact: mean word length rides
    * `total_chars * 100 div n_tokens`, duplicate-bigram share rides
    * `(n_bigrams - n_distinct) * 1e6 div n_bigrams`.
    */
  def gopherRules(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val stop = array(Seq("the", "a", "of", "to", "in", "and", "is")
      .map(lit): _*)
    docs(s, d)
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n_tokens", size(col("t")).cast("bigint"))
      .withColumn("mean_len_centi",
        expr("length(array_join(t, '')) * 100L div n_tokens"))
      .withColumn("stop_hits",
        size(array_intersect(array_distinct(col("t")), stop)).cast("bigint"))
      .withColumn("bi", when(col("n_tokens") >= 2,
        transform(sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1))))
        .otherwise(array().cast("array<string>")))
      .withColumn("dup_bigram_ppm",
        when(size(col("bi")) > 0,
          expr("(size(bi) - size(array_distinct(bi))) * 1000000L div size(bi)"))
          .otherwise(0L).cast("bigint"))
      .withColumn("kept",
        col("n_tokens").between(20, 1000) &&
          col("mean_len_centi").between(300, 700) &&
          col("stop_hits") >= 1 && col("dup_bigram_ppm") < 250000)
      .select("doc_id", "n_tokens", "mean_len_centi", "stop_hits",
        "dup_bigram_ppm", "kept")
      .orderBy("doc_id")
  }

  val gopherRulesOracle: String =
    s"""WITH $tokSql, m AS (
       |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens,
       |    length(array_to_string(t, '')) * 100 // len(t) AS mean_len_centi,
       |    CAST(len(list_intersect(list_distinct(t),
       |      ['the','a','of','to','in','and','is'])) AS BIGINT) AS stop_hits,
       |    CASE WHEN len(t) >= 2
       |         THEN list_transform(range(1, len(t)),
       |                             i -> t[i] || ' ' || t[i + 1])
       |         ELSE [] END AS bi
       |  FROM tok
       |), r AS (
       |  SELECT doc_id, n_tokens, mean_len_centi, stop_hits,
       |    CAST(CASE WHEN len(bi) > 0
       |         THEN (len(bi) - len(list_distinct(bi))) * 1000000 // len(bi)
       |         ELSE 0 END AS BIGINT) AS dup_bigram_ppm
       |  FROM m
       |)
       |SELECT doc_id, n_tokens, mean_len_centi, stop_hits, dup_bigram_ppm,
       |  (n_tokens BETWEEN 20 AND 1000)
       |    AND (mean_len_centi BETWEEN 300 AND 700)
       |    AND stop_hits >= 1 AND dup_bigram_ppm < 250000 AS kept
       |FROM r ORDER BY doc_id""".stripMargin

  /** q202 — leading-prefix dedup (the CCNet/CommonCrawl trick: pages that
    * share their opening lines are boilerplate copies even when tails
    * diverge): fingerprint each document's first 8 tokens, group, keep
    * the min doc id, report multi-member groups. One groupBy on a short
    * scan-local hash — the cheapest of the dedup family, used as the
    * first pass before shingle methods.
    */
  def prefixDedup(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(toks, 1, 8))).as("prefix_fp"))
      .groupBy("prefix_fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy("prefix_fp")
  }

  val prefixDedupOracle: String =
    s"""WITH $tokSql
       |SELECT md5(array_to_string(t[1:8], ' ')) AS prefix_fp,
       |  min(doc_id) AS keep_id, count(*) AS n_docs
       |FROM tok GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------- share analytics

  /** q203 — nation market share within region by order year (the TPC-H
    * Q8 shape on the customer axis): decimal-exact revenue per
    * (year, region, nation), and each nation's share of its region-year
    * in ppm through a DECIMAL(38,0) carrier (the q110/q116 rule — a
    * BIGINT ppm product overflows at 100 TB revenue sums).
    *
    * Scale shape: one fact-fact shuffle join (lineitem ⋈ orders on the
    * order key), all dimensions broadcast, one partial-aggregated
    * groupBy; the share window runs over the POST-aggregate table
    * (years × nations rows), never over fact rows.
    */
  def marketShare(s: SparkSession, d: String): DataFrame = {
    val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
    val nat = t(s, d, "lineitem")
      .select(col("l_orderkey"), rev.as("rev"))
      .join(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")
        .select("n_nationkey", "n_regionkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region").select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"),
        col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum(expr("CAST(rev * 10000 AS DECIMAL(38,0))")).as("rev_i"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_year", "region")
    nat.withColumn("reg_i", sum(col("rev_i")).over(w))
      .select(col("o_year").cast("int").as("o_year"), col("region"),
        col("nation"),
        expr("CAST(rev_i AS DOUBLE) / 10000").as("revenue"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * rev_i div reg_i AS BIGINT)")
          .as("share_ppm"))
      .orderBy("o_year", "region", "nation")
  }

  val marketShareOracle: String =
    """WITH nat AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |    r_name AS region, n_name AS nation,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS HUGEINT))
      |      AS rev_i
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2, 3
      |)
      |SELECT o_year, region, nation,
      |  CAST(rev_i AS DOUBLE) / 10000 AS revenue,
      |  CAST(1000000 * rev_i // sum(rev_i) OVER (PARTITION BY o_year, region)
      |       AS BIGINT) AS share_ppm
      |FROM nat ORDER BY o_year, region, nation""".stripMargin

  // --------------------------------------------- ML-prep: hashing, folds

  /** q204 — feature-hashing (the hashing trick): every token folds into
    * one of 64 md5 buckets; the corpus-level audit reports per-bucket
    * token mass, document reach, and distinct-vocabulary collisions —
    * the table you read before choosing a hash width. One explode + one
    * map-combinable groupBy on a 64-value key: at 100 TB the combine
    * collapses each partition to ≤64 rows before the shuffle.
    */
  def featureHashing(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tk"))
      .withColumn("bucket",
        conv(substring(md5(col("tk")), 1, 8), 16, 10).cast("bigint") % 64)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tk")).as("n_terms"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("bucket")

  val featureHashingOracle: String =
    s"""WITH $tokSql, ex AS (
       |  SELECT doc_id, unnest(t) AS tk FROM tok
       |)
       |SELECT CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT) % 64 AS bucket,
       |  count(*) AS n_tokens, count(DISTINCT tk) AS n_terms,
       |  count(DISTINCT doc_id) AS n_docs
       |FROM ex GROUP BY 1 ORDER BY 1""".stripMargin

  /** q205 — deterministic cross-validation folds: md5(doc_id) mod 5
    * assigns every document a stable fold independent of partitioning or
    * ingest order; per-fold size, token mass, and language reach verify
    * the split is balanced. The assignment is a scan-local expression —
    * the same trick seeds train/validation/test splits at any scale
    * with zero shuffles beyond the 5-row fold audit.
    */
  def cvFolds(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("bigint") % 5).as("fold"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("fold")

  val cvFoldsOracle: String =
    """WITH f AS (
      |  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |              AS BIGINT) % 5 AS fold,
      |    lang,
      |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents
      |)
      |SELECT fold, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  count(DISTINCT lang) AS n_langs
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** q206 — fold-leakage audit: near-duplicate pairs (the q26 verified
    * Jaccard ≥ 0.6 set) whose endpoints land in DIFFERENT q205 folds —
    * exactly the leakage a random split inflicts on eval metrics when
    * the corpus wasn't deduped first. Counting them per fold-pair is the
    * evidence a group-aware (cluster-then-split) strategy needs. The
    * pair set is the bounded near-dup pipeline's output; fold tagging is
    * two broadcast-sized joins on doc ids.
    */
  def foldLeakage(s: SparkSession, d: String): DataFrame = {
    val fold = docs(s, d).select(col("doc_id"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 5).as("fold"))
    val pairs = functions.DedupOps.ngramJaccardPairs(docs(s, d), "text", "doc_id")
      .select("doc_a", "doc_b")
    pairs
      .join(fold.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("fold", "fold_a"), Seq("doc_a"))
      .join(fold.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("fold", "fold_b"), Seq("doc_b"))
      .groupBy(least(col("fold_a"), col("fold_b")).as("fold_lo"),
        greatest(col("fold_a"), col("fold_b")).as("fold_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("fold_a") =!= col("fold_b"), 1L).otherwise(0L))
          .as("n_leaked"))
      .orderBy("fold_lo", "fold_hi")
  }

  val foldLeakageOracle: String =
    s"""WITH ${LlmQueries.tokShSql}, ex AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b,
       |      CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |        / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |        AS jaccard
       |    FROM cand JOIN sh sa ON doc_a = sa.doc_id
       |              JOIN sh sb ON doc_b = sb.doc_id)
       |  WHERE jaccard >= 0.6
       |), f AS (
       |  SELECT doc_id, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
       |                      AS BIGINT) % 5 AS fold
       |  FROM documents
       |)
       |SELECT least(fa.fold, fb.fold) AS fold_lo,
       |  greatest(fa.fold, fb.fold) AS fold_hi,
       |  count(*) AS n_pairs,
       |  CAST(sum(CASE WHEN fa.fold <> fb.fold THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_leaked
       |FROM pairs JOIN f fa ON doc_a = fa.doc_id
       |           JOIN f fb ON doc_b = fb.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------- classic OLAP join shapes

  /** q207 — late-shipment priority counts (the TPC-H Q4 shape): orders
    * per (year, priority) where at least one line shipped more than 60
    * days after the order date — an EXISTS that must decorrelate to a
    * LEFT SEMI hash join (asserted in ExtQueriesSpec), never a
    * per-order subquery.
    */
  def priorityShipLag(s: SparkSession, d: String): DataFrame = {
    val late = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"))
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate").cast("date").as("od"))
      .join(late, col("o_orderkey") === col("l_orderkey") &&
        col("sd") > date_add(col("od"), 60), "left_semi")
      .groupBy(year(col("od")).cast("int").as("o_year"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_year", "o_orderpriority")

  }

  val priorityShipLagOracle: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
      |  count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q208 — top supplier per ship year (the TPC-H Q15 shape): revenue
    * per (year, supplier) in exact decimal, then the per-year max via a
    * window over the POST-aggregate table (years × suppliers rows, not
    * fact rows). Ties keep every argmax supplier — deterministic because
    * the comparison is decimal-exact.
    */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
    val perSupp = t(s, d, "lineitem")
      .groupBy(year(col("l_shipdate")).cast("int").as("ship_year"),
        col("l_suppkey"))
      .agg(sum(rev).as("rev_d"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("ship_year")
    perSupp
      .withColumn("mx", max(col("rev_d")).over(w))
      .filter(col("rev_d") === col("mx"))
      .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("ship_year"), col("s_suppkey"), col("s_name"),
        col("rev_d").cast("double").as("revenue"))
      .orderBy("ship_year", "s_suppkey")
  }

  val topSupplierOracle: String =
    """WITH per AS (
      |  SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year, l_suppkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev_d
      |  FROM lineitem GROUP BY 1, 2
      |), mx AS (
      |  SELECT *, max(rev_d) OVER (PARTITION BY ship_year) AS m FROM per
      |)
      |SELECT ship_year, s_suppkey, s_name, CAST(rev_d AS DOUBLE) AS revenue
      |FROM mx JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_d = m ORDER BY ship_year, s_suppkey""".stripMargin

  // ------------------------------------- sketch/parameter tuning audits

  /** q209 — LSH band-shape sweep (the q193 probe-sweep discipline applied
    * to MinHash): the same 16 minhash signatures banded three ways —
    * 8 bands × 2 rows (recall-biased), 4 × 4 (default), 2 × 8
    * (precision-biased) — each measured as verified-pair recall against
    * the exact inverted-index truth set. This is the table that chooses
    * a production band shape for a target dedup recall. Per config the
    * pipeline is the bounded equality-join LSH; the sweep is 3× that
    * cost, never all-pairs.
    */
  /** Two fnv64 calls per shingle expanded into 16 Kirsch–Mitzenmacher
    * minhash signature columns (the [[functions.DedupOps]] formula),
    * persisted — shared by the q209 sweep (3 band shapes off ONE
    * signature table) and the q210 estimate audit. The bases were one
    * md5 split into two 60-bit halves; the digest (plus its hex
    * rendering and the conv re-parse) was the single largest CPU item
    * in the whole bench tail, and minhash only needs dispersal — two
    * salted [[graft.expressions.Fnv64]] values are ~20× cheaper and
    * equally portable (the oracles replay them via [[Fnv64.sql]]).
    */
  private def kmSigs(sh: DataFrame): DataFrame = {
    val p = functions.DedupOps.KmPrime
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"),
        (Fnv64.fnv64(col("g")) % p).as("h1"),
        (Fnv64.fnv64(concat(lit("h2|"), col("g"))) % p).as("h2"))
    graft.CacheScope.persisted(ex.groupBy(col("doc_id")).agg(
      min((col("h1") + col("h2") * lit(0L)) % p).as("sig_0"),
      (1 until 16).map(i =>
        min((col("h1") + col("h2") * lit(i.toLong)) % p).as(s"sig_$i")): _*))
  }

  def lshBandSweep(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val sh = graft.CacheScope.persisted(
      functions.DedupOps.shingleSets(dd, "text", "doc_id", 5))
    // ONE exact-verification pass for the WHOLE sweep: a band candidate
    // only counts if its full-set Jaccard reaches the threshold, and any
    // pair with Jaccard > 0 shares a shingle — so every pair a band
    // shape can verify is already IN the inverted-index truth set. The
    // per-shape counts are therefore plain intersections of the band
    // candidate tags with this one verified table; the previous form
    // re-ran array_intersect over every band candidate (a second
    // corpus-scale verification pass) to compute a subset of what the
    // truth pass had already decided.
    // NOTE the df-cap convention: truth comes from the inverted index
    // with the hot-shingle document-frequency cap (MaxShingleDocFreq),
    // so a J >= 0.6 pair whose EVERY shared shingle is hotter than the
    // cap is absent from truth AND from the membership counts below —
    // consistently, which is what keeps recall_ppm meaningful (both
    // numerator and denominator exclude it). The same convention runs
    // through every shingle-index query (q26/q47/q200/...).
    val verified = graft.CacheScope.persisted(
      functions.DedupOps.ngramJaccardPairs(dd, "text", "doc_id")
        .select("doc_a", "doc_b"))
    // driver-side bounded scalar, same shape as DedupOps.candidateGate:
    // it feeds BOTH the broadcast-vs-shuffle membership-join decision
    // (the old per-shape form inherited verifyJaccard's size gate; the
    // one-pass rewrite must not force-broadcast an unbounded pair set —
    // a duplicate-heavy corpus makes near-dup pairs quadratic in clique
    // size) and the n_truth literal, saving the separate count job
    val nTruth = verified.count()
    val vGated =
      if (nTruth <= functions.DedupOps.MaxBroadcastCandidates)
        broadcast(verified)
      else verified
    // ONE signature table, and ONE TAGGED band table across all three
    // shapes (8+4+2 = 14 band structs per doc — exactly the rows the
    // three per-shape tables held, now in one relation). The tag rides
    // the self-join key, so the whole sweep is ONE candidate shuffle +
    // ONE membership join + ONE aggregation action, where the per-shape
    // loop paid three self-joins, three verification counts and a
    // separate truth count (7 blocking jobs — measured 6.5 s, the
    // slowest non-inherent query in the r08 tail). Values are identical:
    // candidates per tag don't change, only how many jobs carry them.
    val sigs = kmSigs(sh)
    val bands = sigs.select(col("doc_id"),
      explode(array(Seq(2, 4, 8).flatMap { r =>
        (0 until 16 / r).map { b =>
          struct(lit(r).as("band_rows"), lit(b).as("band_idx"),
            Fnv64.fnv64(concat_ws("|",
              (b * r until (b + 1) * r).map(i => col(s"sig_$i")): _*))
              .as("band_hash"))
        }
      }: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_rows").as("band_rows"),
        col("bd.band_idx").as("band_idx"), col("bd.band_hash").as("band_hash"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_rows") === col("b.band_rows") &&
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.band_rows").as("band_rows"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verified is pair-scale (near-dups only) — broadcast while the
    // size gate above holds, so the candidate table never shuffles for
    // the membership check
    val perShape = cand
      .join(vGated, Seq("doc_a", "doc_b"))
      .groupBy(col("band_rows"))
      .agg(count(lit(1)).as("n_pairs"))
    val s2 = s
    import s2.implicits._
    // left join from the literal shape list so a shape with zero
    // verified pairs still emits its row (as the per-shape loop did)
    Seq(2L, 4L, 8L).toDF("band_rows")
      .join(perShape.withColumn("band_rows", col("band_rows").cast("bigint")),
        Seq("band_rows"), "left")
      .na.fill(0L, Seq("n_pairs"))
      .select(col("band_rows"), (lit(16L) / col("band_rows")).cast("bigint")
          .as("n_bands"), col("n_pairs"), lit(nTruth).as("n_truth"))
      .withColumn("recall_ppm",
        // verified pair counts scale with the corpus's dup mass: ppm
        // through DECIMAL(38,0) (the q253 cast-first discipline)
        expr("CAST(CAST(n_pairs AS DECIMAL(38,0)) * 1000000" +
          " div n_truth AS BIGINT)"))
      .orderBy("band_rows")
  }

  val lshBandSweepOracle: String = {
    val p = functions.DedupOps.KmPrime
    val sigCols = (0 until 16).map(i =>
      s"min((h1 + $i * h2) % $p) AS sig_$i").mkString(",\n    ")
    def bandCte(r: Int): String = {
      val bands = (0 until 16 / r).map { b =>
        val cols = (b * r until (b + 1) * r).map(i => s"sig_$i").mkString(", ")
        s"SELECT doc_id, $b AS band_idx, ${Fnv64.sql(s"concat_ws('|', $cols)")} AS band_hash FROM sig"
      }.mkString("\n  UNION ALL\n  ")
      s"""band$r AS (
         |  $bands
         |), cand$r AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM band$r a JOIN band$r b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id
         |), v$r AS (
         |  SELECT count(*) AS n FROM (
         |    SELECT doc_a FROM (
         |      SELECT doc_a, doc_b,
         |        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |          / (len(sa.sh) + len(sb.sh)
         |             - len(list_intersect(sa.sh, sb.sh))) AS jaccard
         |      FROM cand$r JOIN sh sa ON doc_a = sa.doc_id
         |                  JOIN sh sb ON doc_b = sb.doc_id)
         |    WHERE jaccard >= 0.6)
         |)""".stripMargin
    }
    s"""WITH ${LlmQueries.tokShSql}, exg AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), hh AS (
       |  SELECT doc_id,
       |    ${Fnv64.sql("g")} % $p AS h1,
       |    ${Fnv64.sql("'h2|' || g")} % $p AS h2
       |  FROM exg
       |), sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hh GROUP BY doc_id
       |), ex2 AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), tcand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ex2 a JOIN ex2 b ON a.g = b.g AND a.doc_id < b.doc_id
       |), truth AS (
       |  SELECT count(*) AS n FROM (
       |    SELECT doc_a FROM (
       |      SELECT doc_a, doc_b,
       |        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |          / (len(sa.sh) + len(sb.sh)
       |             - len(list_intersect(sa.sh, sb.sh))) AS jaccard
       |      FROM tcand JOIN sh sa ON doc_a = sa.doc_id
       |                 JOIN sh sb ON doc_b = sb.doc_id)
       |    WHERE jaccard >= 0.6)
       |), ${bandCte(2)}, ${bandCte(4)}, ${bandCte(8)}, u AS (
       |  SELECT CAST(2 AS BIGINT) AS band_rows, CAST(8 AS BIGINT) AS n_bands,
       |    (SELECT n FROM v2) AS n_pairs FROM (VALUES (1))
       |  UNION ALL SELECT 4, 4, (SELECT n FROM v4) FROM (VALUES (1))
       |  UNION ALL SELECT 8, 2, (SELECT n FROM v8) FROM (VALUES (1))
       |)
       |SELECT band_rows, n_bands, CAST(n_pairs AS BIGINT) AS n_pairs,
       |  (SELECT CAST(n AS BIGINT) FROM truth) AS n_truth,
       |  n_pairs * 1000000 // (SELECT n FROM truth) AS recall_ppm
       |FROM u ORDER BY band_rows""".stripMargin
  }

  /** q210 — MinHash Jaccard-estimate error audit: for every exact
    * near-dup pair, the fraction of the 16 minhash signature slots that
    * agree estimates the pair's Jaccard; the audit reports the estimate
    * (in 16ths as permille), the exact Jaccard, and the absolute error
    * in permille — integer-exact end to end (the q105/q149/q199 family:
    * every sketch ships with its measured error against exact truth).
    */
  def minhashEstimateError(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val sh = functions.DedupOps.shingleSets(dd, "text", "doc_id", 5)
    val sigs = kmSigs(sh)
    // exact Jaccard re-derived in INTEGER permille (inter * 1000 div
    // union) — never a double→bigint cast, whose truncation/rounding
    // disagrees between engines on representation boundaries
    val truthPairs = functions.DedupOps.ngramJaccardPairs(dd, "text", "doc_id")
      .select(col("doc_a"), col("doc_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("bigint")
    val uni = (size(col("sh_a")) + size(col("sh_b"))).cast("bigint") - inter
    val truth = truthPairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(size(array_intersect(sh_a, sh_b)) * 1000L div " +
          "(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b))) " +
          "AS BIGINT)").as("exact_permille"))
    truth
      .join(sigs.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sigs.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"CAST((${(0 until 16).map(i =>
          s"(CASE WHEN a.sig_$i = b.sig_$i THEN 1L ELSE 0L END)")
          .mkString(" + ")}) * 1000L div 16 AS BIGINT)").as("est_permille"),
        col("exact_permille"))
      .withColumn("abs_err_permille",
        abs(col("est_permille") - col("exact_permille")))
      .orderBy("doc_a", "doc_b")
  }

  val minhashEstimateErrorOracle: String = {
    val p = functions.DedupOps.KmPrime
    val sigCols = (0 until 16).map(i =>
      s"min((h1 + $i * h2) % $p) AS sig_$i").mkString(",\n    ")
    val matchSum = (0 until 16).map(i =>
      s"CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH ${LlmQueries.tokShSql}, exg AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), hh AS (
       |  SELECT doc_id,
       |    ${Fnv64.sql("g")} % $p AS h1,
       |    ${Fnv64.sql("'h2|' || g")} % $p AS h2
       |  FROM exg
       |), sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hh GROUP BY doc_id
       |), ex2 AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ex2 a JOIN ex2 b ON a.g = b.g AND a.doc_id < b.doc_id
       |), truth AS (
       |  SELECT doc_a, doc_b,
       |    CAST(inter * 1000 // (na + nb - inter) AS BIGINT)
       |      AS exact_permille
       |  FROM (
       |    SELECT doc_a, doc_b,
       |      len(list_intersect(sa.sh, sb.sh)) AS inter,
       |      len(sa.sh) AS na, len(sb.sh) AS nb
       |    FROM cand JOIN sh sa ON doc_a = sa.doc_id
       |              JOIN sh sb ON doc_b = sb.doc_id)
       |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.6
       |)
       |SELECT doc_a, doc_b,
       |  CAST(($matchSum) * 1000 // 16 AS BIGINT) AS est_permille,
       |  exact_permille,
       |  abs(($matchSum) * 1000 // 16 - exact_permille) AS abs_err_permille
       |FROM truth JOIN sig a ON doc_a = a.doc_id
       |           JOIN sig b ON doc_b = b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q211 — phrase-vocabulary growth curve (Heaps-law audit, log-free):
    * each distinct 5-gram shingle's FIRST document (min doc_id over an
    * ingest-ordered corpus), then cumulative phrase-vocabulary size per
    * corpus decile — the curve that predicts dedup-index and n-gram-LM
    * table growth as the corpus scales (unigram vocabulary saturates in
    * the first decile on any real corpus; the 5-gram curve is the one
    * that keeps growing). Two bounded aggregations: distinct
    * (shingle → min doc) and a 10-row cumulative sum; no windows over
    * raw rows.
    */
  def vocabGrowth(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val nDocs = dd.count()
    val firstSeen = dd
      .select(col("doc_id"),
        explode(TextAnalysis.textShingles(col("text"), 5)).as("tk"))
      .groupBy("tk").agg(min("doc_id").as("first_doc"))
    // the per-decile table is ≤10 rows — fold the running total on the
    // driver (the bounded-scalar shape) instead of a global-order window
    val per = firstSeen
      .withColumn("decile",
        least(expr(s"(first_doc * 10) div $nDocs") + 1, lit(10L)))
      .groupBy("decile").agg(count(lit(1)).as("new_terms"))
      .orderBy("decile")
      .collect()
    val cum = per.scanLeft(0L)(_ + _.getAs[Long]("new_terms")).tail
    val s2 = s
    import s2.implicits._
    per.zip(cum).toSeq
      .map(p => (p._1.getAs[Long]("decile"), p._1.getAs[Long]("new_terms"),
        p._2))
      .toDF("decile", "new_terms", "vocab_size")
      .orderBy("decile")
  }

  val vocabGrowthOracle: String =
    s"""WITH ${LlmQueries.tokShSql}, ex AS (
       |  SELECT doc_id, unnest(sh) AS tk FROM sh
       |), fs AS (
       |  SELECT tk, min(doc_id) AS first_doc FROM ex GROUP BY 1
       |), n AS (
       |  SELECT count(*) AS n_docs FROM documents
       |), per AS (
       |  SELECT least(first_doc * 10 // n_docs + 1, 10) AS decile,
       |    count(*) AS new_terms
       |  FROM fs CROSS JOIN n GROUP BY 1
       |)
       |SELECT CAST(decile AS BIGINT) AS decile, new_terms,
       |  CAST(sum(new_terms) OVER (ORDER BY decile) AS BIGINT) AS vocab_size
       |FROM per ORDER BY decile""".stripMargin

  // ------------------------------------------- corpus composition audits

  /** q212 — lexical diversity per language: token mass, distinct types,
    * hapax legomena (types seen once), and the integer-ppm type-token
    * and hapax rates — the diversity panel that flags template-generated
    * or over-deduplicated corpus slices. One (lang, token) aggregate
    * feeding one per-lang aggregate, both map-combinable.
    */
  def lexicalDiversity(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tk"))
      .groupBy("lang", "tk").agg(count(lit(1)).as("n"))
      .groupBy("lang")
      .agg(sum("n").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("lang"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("n_types * 1000000L div n_tokens").as("ttr_ppm"),
        expr("n_hapax * 1000000L div n_types").as("hapax_ppm"))
      .orderBy("lang")

  val lexicalDiversityOracle: String =
    """WITH tt AS (
      |  SELECT lang, tk, count(*) AS n FROM (
      |    SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS tk
      |    FROM documents)
      |  GROUP BY 1, 2
      |), per AS (
      |  SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
      |    count(*) AS n_types,
      |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |  FROM tt GROUP BY 1
      |)
      |SELECT lang, n_tokens, n_types, n_hapax,
      |  n_types * 1000000 // n_tokens AS ttr_ppm,
      |  n_hapax * 1000000 // n_types AS hapax_ppm
      |FROM per ORDER BY lang""".stripMargin

  /** q213 — dedup's effect on the source mixture: per source, document
    * and token mass BEFORE near-dup removal vs AFTER keeping only
    * cluster canonicals (the q91 SimHash-cluster policy), with the
    * share shift in ppm — the audit a mixture-weighted training run
    * needs, since dedup removes mass NON-uniformly across sources. The
    * removal set is the bounded near-dup pipeline; everything else is
    * two map-combinable aggregates and a 5-row join.
    */
  def dedupMixtureShift(s: SparkSession, d: String): DataFrame = {
    val dd = graft.CacheScope.persisted(docs(s, d)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens")))
    val pairs = functions.DedupOps.simhashPairs(
      functions.DedupOps.simhashSignatures(docs(s, d), "text", "doc_id"))
    val cc = operators.ConnectedComponents.components(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component").as("component_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component_id"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    // after = before − removed, per source: the removed set (cluster
    // non-canonicals — a vanishing fraction of the corpus) aggregates
    // directly, instead of anti-joining it back against the full corpus
    // and re-aggregating everything kept. Same values by arithmetic
    // (every doc is either kept or removed exactly once); one corpus
    // aggregate and a removal-sized aggregate replace two corpus-wide
    // passes and a corpus-wide anti-join — at 100 TB the difference
    // between touching the corpus once and three times. The
    // docs_after > 0 filter reproduces the previous inner join's drop
    // of a fully-removed source (impossible while canonicals are kept,
    // but the oracle's join shape says it, so the engine says it).
    val removedAgg = dd.join(cc, "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .groupBy("source")
      .agg(count(lit(1)).as("docs_removed"),
        sum("n_tokens").as("tokens_removed"))
    val before = dd.groupBy("source")
      .agg(count(lit(1)).as("docs_before"),
        sum("n_tokens").as("tokens_before"))
    val joined = before.join(removedAgg, Seq("source"), "left")
      .select(col("source"), col("docs_before"),
        (col("docs_before") - coalesce(col("docs_removed"), lit(0L)))
          .as("docs_after"),
        col("tokens_before"),
        (col("tokens_before") - coalesce(col("tokens_removed"), lit(0L)))
          .as("tokens_after"))
    // corpus totals via a global window over the per-source AGGREGATE —
    // bounded by source cardinality (a curated enum, single digits), so
    // the single-partition funnel holds a handful of rows, not data.
    // The previous broadcast-crossJoin spelling of the same totals cost
    // three extra jobs (persist of joined, the totals aggregate, the
    // broadcast build) — pure scheduling at this row count.
    //
    // Totals window BEFORE the docs_after > 0 filter: the oracle's
    // share denominators sum tokens_before over ALL sources and
    // tokens_after over the kept aggregate — a (hypothetical) fully
    // removed source must still contribute its before-mass to every
    // other source's share_shift, and would silently shift all shifts
    // if the filter ran first. The filter then reproduces the oracle's
    // inner join dropping that source's own row.
    joined
      .select(col("source"), col("docs_before"), col("docs_after"),
        col("tokens_before"), col("tokens_after"),
        expr("""CAST(CAST(tokens_after AS DECIMAL(38,0)) * 1000000
               |    div (sum(tokens_after) OVER ())
               |  - CAST(tokens_before AS DECIMAL(38,0)) * 1000000
               |    div (sum(tokens_before) OVER ()) AS BIGINT)"""
          .stripMargin).as("share_shift_ppm"))
      .filter(col("docs_after") > 0)
      .orderBy("source")
  }

  // share oracle pipeline with q28/q91: SimHash candidates + CC
  val dedupMixtureShiftOracle: String =
    s"""WITH RECURSIVE ${LlmQueries.simhashCcSql}, base AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents
       |), ranked AS (
       |  SELECT b.doc_id,
       |    row_number() OVER (PARTITION BY cc.component_id
       |      ORDER BY b.n_tokens DESC, b.doc_id) AS rk
       |  FROM cc JOIN base b ON cc.doc_id = b.doc_id
       |), removed AS (
       |  SELECT doc_id FROM ranked WHERE rk > 1
       |), before AS (
       |  SELECT source, count(*) AS docs_before,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_before
       |  FROM base GROUP BY 1
       |), aft AS (
       |  SELECT source, count(*) AS docs_after,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_after
       |  FROM base WHERE doc_id NOT IN (SELECT doc_id FROM removed)
       |  GROUP BY 1
       |)
       |SELECT source, docs_before, docs_after, tokens_before, tokens_after,
       |  CAST(tokens_after * 1000000
       |    // (SELECT sum(tokens_after) FROM aft)
       |  - tokens_before * 1000000
       |    // (SELECT sum(tokens_before) FROM before) AS BIGINT)
       |    AS share_shift_ppm
       |FROM before JOIN aft USING (source) ORDER BY source""".stripMargin

  /** q214 — customer-lifetime-value triangle: cohort = first-order year,
    * age = years since cohort; decimal-exact revenue per (cohort, age)
    * plus cumulative LTV cents per cohort — the table subscription and
    * retail analytics read retention economics from. First-order dates
    * are one map-combinable min; ages are a broadcast-joined derived
    * column; the cumulative runs over the bounded (cohorts × ages)
    * aggregate.
    */
  def cohortLtv(s: SparkSession, d: String): DataFrame = {
    val first = t(s, d, "orders")
      .groupBy("o_custkey")
      .agg(min(year(col("o_orderdate"))).as("cohort"))
    val per = t(s, d, "orders")
      .join(first, "o_custkey")
      .groupBy(col("cohort"), (year(col("o_orderdate")) - col("cohort"))
        .cast("bigint").as("age"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        sum(graft.functions.Cents.cents(col("o_totalprice")))
          .as("revenue_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort").orderBy("age")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        0)
    per.withColumn("cum_revenue_c", sum(col("revenue_c")).over(w))
      .select(col("cohort").cast("int").as("cohort"), col("age"),
        col("n_customers"), col("revenue_c"),
        col("cum_revenue_c").cast("bigint").as("cum_revenue_c"))
      .orderBy("cohort", "age")
  }

  val cohortLtvOracle: String =
    """WITH f AS (
      |  SELECT o_custkey, min(year(o_orderdate)) AS cohort
      |  FROM orders GROUP BY 1
      |), per AS (
      |  SELECT cohort,
      |    CAST(year(o_orderdate) - cohort AS BIGINT) AS age,
      |    count(DISTINCT o.o_custkey) AS n_customers,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS revenue_c
      |  FROM orders o JOIN f ON o.o_custkey = f.o_custkey
      |  GROUP BY 1, 2
      |)
      |SELECT CAST(cohort AS INTEGER) AS cohort, age, n_customers, revenue_c,
      |  CAST(sum(revenue_c) OVER (PARTITION BY cohort ORDER BY age
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_revenue_c
      |FROM per ORDER BY cohort, age""".stripMargin

  /** q215 — additive seasonal decomposition of monthly revenue (log-free
    * classical decomposition): trend = centered 3-month moving average,
    * seasonal = per-calendar-month mean deviation from trend, residual =
    * the rest — all exact integer cents (the deviation means use `div`).
    * The month table is bounded (years × 12), so every window here runs
    * over a bounded aggregate, never raw rows.
    */
  def seasonalDecompose(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).cast("int").as("yr"),
        month(col("o_orderdate")).cast("int").as("mo"))
      .agg(sum(graft.functions.Cents.cents(col("o_totalprice")))
        .as("revenue_c"))
      .withColumn("idx", col("yr") * 12 + col("mo"))
    val w3 = Window.orderBy("idx").rowsBetween(-1, 1)
    val wcnt = Window.orderBy("idx").rowsBetween(-1, 1)
    val trended = monthly
      .withColumn("sum3", sum(col("revenue_c")).over(w3))
      .withColumn("cnt3", count(lit(1)).over(wcnt))
      .withColumn("trend_c",
        when(col("cnt3") === 3, expr("CAST(sum3 div 3 AS BIGINT)")))
      .drop("sum3", "cnt3")
    val seasonal = trended.filter(col("trend_c").isNotNull)
      .groupBy("mo")
      .agg(expr("sum(revenue_c - trend_c) div count(1)").as("seasonal_c"))
    trended.join(broadcast(seasonal), Seq("mo"), "left")
      .select(col("yr"), col("mo"), col("revenue_c"),
        col("trend_c"), col("seasonal_c"),
        when(col("trend_c").isNotNull,
          col("revenue_c") - col("trend_c") - col("seasonal_c"))
          .as("resid_c"))
      .orderBy("yr", "mo")
  }

  val seasonalDecomposeOracle: String =
    """WITH m AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    CAST(month(o_orderdate) AS INTEGER) AS mo,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS revenue_c,
      |    yr * 12 + mo AS idx
      |  FROM orders GROUP BY 1, 2
      |), tr AS (
      |  SELECT yr, mo, revenue_c,
      |    CASE WHEN count(*) OVER (ORDER BY idx
      |        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) = 3
      |      THEN CAST(sum(revenue_c) OVER (ORDER BY idx
      |        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) // 3 AS BIGINT)
      |    END AS trend_c
      |  FROM m
      |), se AS (
      |  SELECT mo,
      |    CAST(sum(revenue_c - trend_c) // count(*) AS BIGINT) AS seasonal_c
      |  FROM tr WHERE trend_c IS NOT NULL GROUP BY 1
      |)
      |SELECT tr.yr, tr.mo, tr.revenue_c, tr.trend_c, se.seasonal_c,
      |  CASE WHEN tr.trend_c IS NOT NULL
      |       THEN tr.revenue_c - tr.trend_c - se.seasonal_c END AS resid_c
      |FROM tr LEFT JOIN se ON tr.mo = se.mo
      |ORDER BY tr.yr, tr.mo""".stripMargin

  /** q216 — join-cardinality estimation audit (the optimizer-statistics
    * op): predict |lineitem ⋈ orders| from 64-bucket key histograms —
    * Σ over buckets of n_left·n_right — against the exact per-key
    * product sum and the actual join count. The bucket estimate is what
    * a cost-based optimizer computes from table stats before choosing a
    * join strategy; the audit quantifies its overcount on this key
    * distribution. Histograms are map-combinable 64-row aggregates; the
    * exact product sum joins two per-key COUNT tables (never the raw
    * fact rows against each other).
    */
  def joinCardinality(s: SparkSession, d: String): DataFrame = {
    val lk = t(s, d, "lineitem").select(col("l_orderkey").as("k"))
    val ok = t(s, d, "orders").select(col("o_orderkey").as("k"))
    val lh = lk.groupBy((col("k") % 64).as("bucket"))
      .agg(count(lit(1)).as("nl"))
    val oh = ok.groupBy((col("k") % 64).as("bucket"))
      .agg(count(lit(1)).as("no"))
    val bucketEst = lh.join(oh, "bucket")
      .agg(sum(col("nl") * col("no")).cast("bigint").as("v"))
      .select(lit("bucket64_estimate").as("metric"), col("v"))
    val exact = lk.groupBy("k").agg(count(lit(1)).as("nl"))
      .join(ok.groupBy("k").agg(count(lit(1)).as("no")), "k")
      .agg(sum(col("nl") * col("no")).cast("bigint").as("v"))
      .select(lit("exact_key_product").as("metric"), col("v"))
    val actual = lk.join(ok, "k")
      .agg(count(lit(1)).cast("bigint").as("v"))
      .select(lit("actual_join_rows").as("metric"), col("v"))
    bucketEst.unionAll(exact).unionAll(actual).orderBy("metric")
  }

  val joinCardinalityOracle: String =
    """WITH lh AS (
      |  SELECT l_orderkey % 64 AS bucket, count(*) AS nl
      |  FROM lineitem GROUP BY 1
      |), oh AS (
      |  SELECT o_orderkey % 64 AS bucket, count(*) AS no
      |  FROM orders GROUP BY 1
      |), u AS (
      |  SELECT 'bucket64_estimate' AS metric,
      |    CAST(sum(nl * no) AS BIGINT) AS v
      |  FROM lh JOIN oh USING (bucket)
      |  UNION ALL
      |  SELECT 'exact_key_product', CAST(sum(nl * no) AS BIGINT) FROM (
      |    SELECT l_orderkey AS k, count(*) AS nl FROM lineitem GROUP BY 1) a
      |    JOIN (
      |    SELECT o_orderkey AS k, count(*) AS no FROM orders GROUP BY 1) b
      |    USING (k)
      |  UNION ALL
      |  SELECT 'actual_join_rows', CAST(count(*) AS BIGINT)
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)
      |SELECT metric, v FROM u ORDER BY metric""".stripMargin

  /** q217 — running inventory balance per part (audited sample): net
    * quantity movement per (part, ship day) — returns subtract, sales
    * add — with the running balance from ONE grouped bucketed prefix
    * pass over ALL sampled parts together
    * ([[graft.operators.PrefixSum.groupedExclusiveRunningTotals]]).
    * This is the running-balance ledger shape (inventory, account
    * balances, odometer rollups); at 100 TB the grouped pass is the
    * only formulation that neither loops parts nor serializes a part's
    * history into one task. The 1-in-50 part sample bounds the DUMPED
    * result, not the computation shape.
    */
  def runningInventory(s: SparkSession, d: String): DataFrame = {
    val moves = t(s, d, "lineitem")
      .filter(col("l_partkey") % 50 === 0)
      .groupBy(col("l_partkey").as("partkey"),
        col("l_shipdate").cast("date").as("day"))
      .agg(sum(when(col("l_returnflag") === "R", -col("l_quantity"))
          .otherwise(col("l_quantity"))).cast("bigint").as("net_qty"))
      // numeric leading order key: the prefix pass buckets on it (a DATE
      // would degrade to a single bucket)
      .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01")))
    graft.operators.PrefixSum.groupedExclusiveRunningTotals(
        moves, Seq("partkey"), Seq(col("epoch_day")),
        Seq((col("net_qty"), "balance_before")))
      .select(col("partkey"), col("day"), col("net_qty"),
        (col("balance_before") + col("net_qty")).cast("bigint")
          .as("balance_after"))
      .orderBy("partkey", "day")
  }

  val runningInventoryOracle: String =
    """WITH m AS (
      |  SELECT l_partkey AS partkey, CAST(l_shipdate AS DATE) AS day,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN -l_quantity
      |                  ELSE l_quantity END) AS BIGINT) AS net_qty
      |  FROM lineitem WHERE l_partkey % 50 = 0
      |  GROUP BY 1, 2
      |)
      |SELECT partkey, day, net_qty,
      |  CAST(sum(net_qty) OVER (PARTITION BY partkey ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS balance_after
      |FROM m ORDER BY partkey, day""".stripMargin

  // ------------------------------------------------------ graph features

  /** q218 — pivot-sampled harmonic centrality (the Eppstein–Wang
    * estimator shape): per-seed BFS distances (2 hops) from 4 pivot
    * customers over the customer–supplier bipartite graph
    * ([[graft.operators.ShortestPaths.seededHopDistances]]), folded to
    * Σ 1/d per node in the EXACT ×60 integer carrier (d ≤ 2 ⟹ 60/d is
    * integral) — log-free, bit-stable ranking of how close every market
    * participant sits to the pivot set. State is |V|·4 rows; rounds are
    * the bounded BFS.
    */
  def harmonicCentrality(s: SparkSession, d: String): DataFrame = {
    // long node ids through the BFS (customer → 2k, supplier → 2k+1,
    // the q76/q108/q126 convention) — the per-(id, seed) frontier
    // joins and distincts key on integers; presentation ids render on
    // the aggregated output only
    val e1 = t(s, d, "orders").join(t(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = e1.unionAll(e1.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = t(s, d, "customer").filter(col("c_custkey") <= 4)
      .select((col("c_custkey") * 2).as("id"),
        col("c_custkey").as("seed"))
    graft.operators.ShortestPaths.seededHopDistances(
        edges, "src", "dst", seeds, "id", "seed", maxHops = 2)
      .filter(col("dist") > 0)
      .groupBy("id")
      .agg(count(lit(1)).as("n_seeds_reached"),
        sum(expr("60L div dist")).cast("bigint").as("harmonic_x60"))
      .select(concat(when(col("id") % 2 === 0, "c").otherwise("s"),
        expr("id div 2")).as("id"),
        col("n_seeds_reached"), col("harmonic_x60"))
      .orderBy("id")
  }

  val harmonicCentralityOracle: String = {
    def step(k: Int): String =
      s"""d$k AS (
         |  SELECT id, seed, min(dist) AS dist FROM (
         |    SELECT id, seed, dist FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, p.seed, p.dist + 1
         |    FROM d${k - 1} p JOIN e ON e.src = p.id
         |  ) GROUP BY id, seed
         |)""".stripMargin
    s"""WITH e1 AS (
       |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
       |    's' || CAST(l_suppkey AS VARCHAR) AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |), e AS (
       |  SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1
       |), d0 AS (
       |  SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS id,
       |    c_custkey AS seed, CAST(0 AS BIGINT) AS dist
       |  FROM customer WHERE c_custkey <= 4
       |), ${step(1)}, ${step(2)}
       |SELECT id, count(*) AS n_seeds_reached,
       |  CAST(sum(60 // dist) AS BIGINT) AS harmonic_x60
       |FROM d2 WHERE dist > 0 GROUP BY id ORDER BY id""".stripMargin
  }

  /** q219 — local clustering coefficient over the part co-purchase graph
    * (the q100 edge set): per node, `2·triangles·10⁶ div (deg·(deg−1))`
    * ppm — the "how clique-like is this node's neighborhood" feature
    * recommenders and fraud models consume. Triangle counts ride the
    * degree-oriented wedge join ([[graft.operators.Triangles]]); degrees
    * are one map-combinable aggregate over the canonical edge set.
    */
  def clusteringCoefficient(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      .filter(col("l_partkey") % 4 === 0)
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
    val canon = graft.CacheScope.persisted(edges.distinct())
    val deg = canon.select(col("pa").as("node"))
      .unionAll(canon.select(col("pb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = graft.operators.Triangles.perNodeCounts(canon, "pa", "pb")
    deg.join(tri, Seq("node"), "left")
      .select(col("node").as("part_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("coeff_ppm",
        when(col("degree") >= 2,
          // per-node triangles are quadratic in degree (≤ d(d−1)/2)
          // and d² itself wraps past d ~ 3e9 hubs: both sides of the
          // divide ride DECIMAL(38,0) (the q253 cast-first discipline)
          expr("""CAST(CAST(2 AS DECIMAL(38,0)) * n_triangles * 1000000
                 |  div (CAST(degree AS DECIMAL(38,0)) * (degree - 1))
                 |  AS BIGINT)""".stripMargin))
          .otherwise(0L).cast("bigint"))
      .orderBy("part_id")
  }

  val clusteringCoefficientOracle: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0
      |), e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), deg AS (
      |  SELECT node, count(*) AS degree FROM (
      |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      |  GROUP BY 1
      |), tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM e e1 JOIN e e2 ON e1.v = e2.u
      |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
      |), tn AS (
      |  SELECT node, count(*) AS n_triangles FROM (
      |    SELECT a AS node FROM tri
      |    UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri)
      |  GROUP BY 1
      |)
      |SELECT deg.node AS part_id, deg.degree,
      |  coalesce(tn.n_triangles, 0) AS n_triangles,
      |  CAST(CASE WHEN deg.degree >= 2
      |    THEN 2 * coalesce(tn.n_triangles, 0) * 1000000
      |         // (deg.degree * (deg.degree - 1))
      |    ELSE 0 END AS BIGINT) AS coeff_ppm
      |FROM deg LEFT JOIN tn USING (node) ORDER BY part_id""".stripMargin

  /** q220 — deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis shape, log-free): each document draws a
    * 60-bit md5 key and competes on `key div weight` (smaller wins, so
    * heavier documents win proportionally more); the global top-20 by
    * that priority is the sample. Fully deterministic at any
    * parallelism — the distributed analog of `ORDER BY random()^(1/w)
    * LIMIT k` without floats or RNG state. One scan + one bounded
    * top-k.
    */
  def weightedSample(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("weight"),
        conv(substring(md5(concat(lit("ws-v1|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("bigint")
          .as("h"))
      .withColumn("priority", expr("h div weight"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(20)
      .select("doc_id", "source", "weight", "priority")

  val weightedSampleOracle: String =
    """SELECT doc_id, source,
      |  CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
      |    AS weight,
      |  CAST('0x' || substr(md5('ws-v1|' || CAST(doc_id AS VARCHAR)), 1, 15)
      |       AS BIGINT)
      |    // len(string_split_regex(lower(text), '\s+')) AS priority
      |FROM documents
      |ORDER BY priority, doc_id LIMIT 20""".stripMargin

  /** q221 — range-partition balance audit: exact nearest-rank octile
    * bounds on the fact's order key (from a by-value aggregate — the
    * q194 prefix discipline, not a sketch), then per-bucket row counts
    * and the max/mean imbalance in ppm. This is the check a range
    * partitioner (sort, Z-order write, bucketed join) runs before
    * committing to split points; imbalance ppm ≈ 1e6 means perfect.
    */
  def partitionBalance(s: SparkSession, d: String): DataFrame = {
    val byVal = graft.CacheScope.persisted(
      t(s, d, "lineitem").groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("cnt")))
    val pre = graft.operators.PrefixSum.exclusiveRunningTotal(
      byVal, Seq(col("k")), col("cnt"), "below")
    val tot = byVal.agg(sum("cnt").as("n"))
    val bounded = pre.crossJoin(broadcast(tot))
      .withColumn("bucket", expr("least((below * 8) div n, 7L)"))
    val perBucket = bounded.groupBy("bucket")
      .agg(sum("cnt").as("n_rows"), min("k").as("lo_key"),
        max("k").as("hi_key"))
    perBucket.crossJoin(broadcast(tot))
      .select(col("bucket").cast("bigint").as("bucket"), col("n_rows"),
        col("lo_key"), col("hi_key"),
        expr("n_rows * 8000000L div n").as("load_ppm"))
      .orderBy("bucket")
  }

  val partitionBalanceOracle: String =
    """WITH bv AS (
      |  SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1
      |), pre AS (
      |  SELECT k, cnt,
      |    coalesce(sum(cnt) OVER (ORDER BY k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
      |    (SELECT sum(cnt) FROM bv) AS n
      |  FROM bv
      |), b AS (
      |  SELECT k, cnt, least((below * 8) // n, 7) AS bucket, n FROM pre
      |)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  min(k) AS lo_key, max(k) AS hi_key,
      |  CAST(sum(cnt) * 8000000 // min(n) AS BIGINT) AS load_ppm
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q222 — encoding advisor: per candidate column, the statistics a
    * columnar writer weighs before choosing dictionary vs plain
    * encoding — row count, distinct values, total raw bytes, estimated
    * dictionary bytes (distinct·avg-len + 4/row), and the advised
    * encoding. One map-combinable aggregate per column over one scan;
    * the per-column union is a bounded loop (4 columns).
    */
  def encodingAdvisor(s: SparkSession, d: String): DataFrame = {
    val li = graft.CacheScope.persisted(t(s, d, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_shipdate", "l_partkey"))
    val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_partkey")
    cols.map { c =>
      li.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(c)).as("n_distinct"),
          sum(length(col(c).cast("string"))).cast("bigint").as("raw_bytes"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_distinct"),
          col("raw_bytes"),
          expr("""n_distinct * (raw_bytes div n_rows) + 4 * n_rows""")
            .cast("bigint").as("dict_bytes"))
        .withColumn("advice",
          when(col("dict_bytes") < col("raw_bytes"), lit("dictionary"))
            .otherwise(lit("plain")))
    }.reduce(_ unionAll _).orderBy("column_name")
  }

  val encodingAdvisorOracle: String = {
    def one(c: String): String =
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(sum(length(CAST($c AS VARCHAR))) AS BIGINT) AS raw_bytes,
         |  CAST(count(DISTINCT $c)
         |    * (sum(length(CAST($c AS VARCHAR))) // count(*))
         |    + 4 * count(*) AS BIGINT) AS dict_bytes
         |FROM lineitem""".stripMargin
    val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_partkey")
    s"""WITH u AS (
       |  ${cols.map(one).mkString("\n  UNION ALL\n  ")}
       |)
       |SELECT column_name, n_rows, n_distinct, raw_bytes, dict_bytes,
       |  CASE WHEN dict_bytes < raw_bytes THEN 'dictionary' ELSE 'plain' END
       |    AS advice
       |FROM u ORDER BY column_name""".stripMargin
  }

  /** q223 — ROUGE-1 multiset overlap for every verified near-dup pair:
    * precision/recall in ppm from BAG (not set) token intersections —
    * Σ min(count_a, count_b) per shared token — the summarization-eval
    * metric repurposed as a dup-pair similarity profile alongside
    * Jaccard (q26) and MinHash estimates (q210). Bag intersections come
    * from joining two (doc, token, count) aggregates on the bounded
    * pair set, never from re-scanning text.
    */
  def rougeOverlap(s: SparkSession, d: String): DataFrame = {
    val tc = graft.CacheScope.persisted(docs(s, d)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tk"))
      .groupBy("doc_id", "tk").agg(count(lit(1)).as("cnt")))
    val tot = tc.groupBy("doc_id").agg(sum("cnt").as("n_tokens"))
    val pairs = functions.DedupOps.ngramJaccardPairs(docs(s, d), "text", "doc_id")
      .select("doc_a", "doc_b")
    val inter = pairs
      .join(tc.select(col("doc_id").as("doc_a"), col("tk"),
        col("cnt").as("ca")), Seq("doc_a"))
      .join(tc.select(col("doc_id").as("doc_b"), col("tk"),
        col("cnt").as("cb")), Seq("doc_b", "tk"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(least(col("ca"), col("cb"))).as("overlap"))
    inter
      .join(tot.select(col("doc_id").as("doc_a"), col("n_tokens").as("na")),
        "doc_a")
      .join(tot.select(col("doc_id").as("doc_b"), col("n_tokens").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        col("overlap").cast("bigint").as("overlap"),
        expr("overlap * 1000000L div nb").as("precision_ppm"),
        expr("overlap * 1000000L div na").as("recall_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  val rougeOverlapOracle: String =
    s"""WITH ${LlmQueries.tokShSql}, ex AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b,
       |      CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |        / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |        AS jaccard
       |    FROM cand JOIN sh sa ON doc_a = sa.doc_id
       |              JOIN sh sb ON doc_b = sb.doc_id)
       |  WHERE jaccard >= 0.6
       |), tc AS (
       |  SELECT doc_id, tk, count(*) AS cnt FROM (
       |    SELECT doc_id, unnest(t) AS tk FROM tok)
       |  GROUP BY 1, 2
       |), tot AS (
       |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens
       |  FROM tc GROUP BY 1
       |), ov AS (
       |  SELECT p.doc_a, p.doc_b,
       |    CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS overlap
       |  FROM pairs p
       |  JOIN tc a ON a.doc_id = p.doc_a
       |  JOIN tc b ON b.doc_id = p.doc_b AND b.tk = a.tk
       |  GROUP BY 1, 2
       |)
       |SELECT ov.doc_a, ov.doc_b, ov.overlap,
       |  ov.overlap * 1000000 // tb.n_tokens AS precision_ppm,
       |  ov.overlap * 1000000 // ta.n_tokens AS recall_ppm
       |FROM ov JOIN tot ta ON ta.doc_id = ov.doc_a
       |        JOIN tot tb ON tb.doc_id = ov.doc_b
       |ORDER BY ov.doc_a, ov.doc_b""".stripMargin

  /** q224 — T5-style span corruption plan: deterministic mask spans
    * (every position whose Fnv64 draw hits 1-in-20 starts a 3-token
    * span), per document the masked-position count (overlaps unioned),
    * span count, and corruption rate ppm — the pretraining data-prep
    * transform computed as a pure scan (positions explode → two
    * codegen'd aggregates), reproducible at any parallelism and across
    * engines.
    */
  def spanCorruption(s: SparkSession, d: String): DataFrame = {
    // the oracle filters WHERE length(text) > 0 — match it EXACTLY:
    // split("") yields [""] (n = 1), so a size(tokens) >= 1 gate would
    // keep empty documents the oracle excludes
    val base = docs(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n"))
    // the start draw is Fnv64, not md5: the draw runs THREE times per
    // token position (own + two predecessors), and md5 allocates a
    // digest + hex string per call where Fnv64 is a register loop (the
    // q70 playbook — 80.9→7.0 task-CPU-s there). Sign bit is cleared
    // by the expression, so % 20 is already non-negative.
    def draw(pc: Column) =
      graft.expressions.Fnv64.fnv64(concat(lit("span-v1|"),
        col("doc_id").cast("string"), lit("|"), pc.cast("string"))) %
        20 === 0
    val pos = base.select(col("doc_id"), col("n"),
      explode(sequence(lit(1L), col("n"))).as("p"))
      .withColumn("starts", draw(col("p")))
    // masked(p) ⟺ a span starts in [p-2, p]; recompute the start draw
    // for the two predecessors scan-locally (no self-join, no window)
    def startAt(off: Int) =
      draw(col("p") - off) && col("p") - off >= 1
    pos
      .withColumn("masked", col("starts") || startAt(1) || startAt(2))
      .groupBy("doc_id")
      .agg(max("n").as("n_tokens"),
        sum(when(col("starts"), 1L).otherwise(0L)).as("n_spans"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"))
      .withColumn("corruption_ppm", expr("n_masked * 1000000L div n_tokens"))
      .orderBy("doc_id")
  }

  val spanCorruptionOracle: String = {
    def draw(p: String) = graft.expressions.Fnv64.sql(
      s"'span-v1|' || CAST(doc_id AS VARCHAR) || '|' || CAST($p AS VARCHAR)")
    s"""WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n
      |  FROM documents WHERE length(text) > 0
      |), pos AS (
      |  SELECT doc_id, n, unnest(range(1, n + 1)) AS p FROM base
      |), f AS (
      |  SELECT doc_id, n, p,
      |    ${draw("p")} % 20 = 0 AS starts,
      |    (p - 1 >= 1 AND ${draw("p - 1")} % 20 = 0) AS s1,
      |    (p - 2 >= 1 AND ${draw("p - 2")} % 20 = 0) AS s2
      |  FROM pos
      |)
      |SELECT doc_id, max(n) AS n_tokens,
      |  CAST(sum(CASE WHEN starts THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
      |  CAST(sum(CASE WHEN starts OR s1 OR s2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_masked,
      |  CAST(sum(CASE WHEN starts OR s1 OR s2 THEN 1 ELSE 0 END) * 1000000
      |    // max(n) AS BIGINT) AS corruption_ppm
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** q225 — rare-knowledge retention audit: 5-gram phrases with corpus
    * document frequency ≤ 2 are the "rare knowledge" a quality filter
    * risks deleting (unigrams saturate on any real corpus — the q211
    * lesson — so rarity lives in phrases); per q201-gate verdict, how
    * many documents and rare-phrase occurrences each side keeps.
    *
    * ONE pass over the exploded shingles: the shingle arrays are
    * distinct per document ([[TextAnalysis.shingles]] wraps
    * `array_distinct`), so `count(1)` per shingle IS the document
    * frequency — no `countDistinct` expand — and for the df ≤ 2
    * survivors the min/max `(doc_id, kept)` structs recover the entire
    * posting list exactly. That removes the r9-flagged docTok ⋈ rare
    * rejoin, which re-shuffled every shingle occurrence against a
    * rare-type set that at 5-gram granularity is MOST types (the
    * largest join in the suite for a 2-row answer); the surviving
    * shuffles are the single map-combinable shingle aggregate plus a
    * final 2-group rollup of the rare posting rows.
    */
  def rareTokenRetention(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val base = (docs(s, d)
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n_tokens", size(col("t")).cast("bigint"))
      .withColumn("mean_len_centi",
        expr("length(array_join(t, '')) * 100L div n_tokens"))
      .withColumn("stop_hits", size(array_intersect(array_distinct(col("t")),
        array(Seq("the", "a", "of", "to", "in", "and", "is").map(lit): _*)))
        .cast("bigint"))
      .withColumn("bi", when(col("n_tokens") >= 2,
        transform(sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1))))
        .otherwise(array().cast("array<string>")))
      .withColumn("dup_bigram_ppm",
        when(size(col("bi")) > 0,
          expr("(size(bi) - size(array_distinct(bi))) * 1000000L div size(bi)"))
          .otherwise(0L).cast("bigint"))
      .withColumn("kept",
        col("n_tokens").between(20, 1000) &&
          col("mean_len_centi").between(300, 700) &&
          col("stop_hits") >= 1 && col("dup_bigram_ppm") < 250000)
      .select(col("doc_id"), col("t"), col("kept")))
    val docTok = base.select(col("doc_id"), col("kept"),
      explode(TextAnalysis.shingles(col("t"), 5)).as("tk"))
    val rare = docTok.groupBy("tk")
      .agg(count(lit(1)).as("df"),
        min(struct(col("doc_id"), col("kept"))).as("lo"),
        max(struct(col("doc_id"), col("kept"))).as("hi"))
      .filter(col("df") <= 2)
      .select(col("tk"), explode(when(col("df") === 1, array(col("lo")))
        .otherwise(array(col("lo"), col("hi")))).as("e"))
      .select(col("tk"), col("e.doc_id").as("doc_id"), col("e.kept").as("kept"))
    rare.groupBy("kept")
      .agg(countDistinct(col("doc_id")).as("n_docs_with_rare"),
        count(lit(1)).as("rare_occurrences"),
        countDistinct(col("tk")).as("n_rare_types"))
      .orderBy("kept")
  }

  val rareTokenRetentionOracle: String =
    s"""WITH $tokSql, m AS (
       |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens,
       |    length(array_to_string(t, '')) * 100 // len(t) AS mean_len_centi,
       |    CAST(len(list_intersect(list_distinct(t),
       |      ['the','a','of','to','in','and','is'])) AS BIGINT) AS stop_hits,
       |    CASE WHEN len(t) >= 2
       |         THEN list_transform(range(1, len(t)),
       |                             i -> t[i] || ' ' || t[i + 1])
       |         ELSE [] END AS bi
       |  FROM tok
       |), g AS (
       |  SELECT doc_id, t,
       |    (n_tokens BETWEEN 20 AND 1000)
       |      AND (mean_len_centi BETWEEN 300 AND 700)
       |      AND stop_hits >= 1
       |      AND (CASE WHEN len(bi) > 0
       |           THEN (len(bi) - len(list_distinct(bi))) * 1000000 // len(bi)
       |           ELSE 0 END) < 250000 AS kept
       |  FROM m
       |), dt AS (
       |  SELECT doc_id, kept, unnest(
       |    CASE WHEN len(t) >= 5
       |         THEN list_distinct(list_transform(range(1, len(t) - 3),
       |                            i -> array_to_string(t[i:i+4], ' ')))
       |         ELSE [] END) AS tk
       |  FROM g
       |), rare AS (
       |  SELECT tk FROM (
       |    SELECT tk, count(DISTINCT doc_id) AS df FROM dt GROUP BY 1)
       |  WHERE df <= 2
       |)
       |SELECT kept, count(DISTINCT doc_id) AS n_docs_with_rare,
       |  count(*) AS rare_occurrences, count(DISTINCT dt.tk) AS n_rare_types
       |FROM dt JOIN rare USING (tk)
       |GROUP BY kept ORDER BY kept""".stripMargin

  /** q226 — dedup-cluster overreach audit: connected components imply
    * C(size,2) duplicate pairs, but only the directly-verified SimHash
    * pairs were ever checked — the gap is transitive overreach, the
    * classic CC-dedup failure mode (chains A~B~C where A≁C). Per
    * cluster size: cluster count, direct pairs, implied pairs, and
    * overreach ppm. Bounded aggregates over the near-dup pipeline's
    * outputs.
    */
  def clusterOverreach(s: SparkSession, d: String): DataFrame = {
    val pairs = graft.CacheScope.persisted(functions.DedupOps.simhashPairs(
      functions.DedupOps.simhashSignatures(docs(s, d), "text", "doc_id"))
      .select("doc_a", "doc_b"))
    val cc = operators.ConnectedComponents.components(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component"))
    val sizes = cc.groupBy("component").agg(count(lit(1)).as("size"))
    val direct = pairs
      .join(cc.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .groupBy("component").agg(count(lit(1)).as("n_direct"))
    sizes.join(direct, Seq("component"), "left")
      .select(col("size"), coalesce(col("n_direct"), lit(0L)).as("n_direct"))
      .groupBy("size")
      .agg(count(lit(1)).as("n_clusters"),
        sum("n_direct").cast("bigint").as("direct_pairs"))
      .withColumn("implied_pairs",
        expr("n_clusters * (size * (size - 1) div 2)").cast("bigint"))
      .withColumn("overreach_ppm",
        // pairs are QUADRATIC in cluster size — ppm through
        // DECIMAL(38,0) (the q156 cast-first discipline; bounded rows)
        expr("""CAST(CAST(implied_pairs - direct_pairs AS DECIMAL(38,0))
               |  * 1000000 div implied_pairs AS BIGINT)"""
          .stripMargin))
      .orderBy("size")
  }

  val clusterOverreachOracle: String =
    s"""WITH RECURSIVE ${LlmQueries.simhashCcSql}, sz AS (
       |  SELECT component_id, count(*) AS size FROM cc GROUP BY 1
       |), direct AS (
       |  SELECT cc.component_id, count(*) AS n_direct
       |  FROM pairs p JOIN cc ON p.doc_a = cc.doc_id
       |  GROUP BY 1
       |), per AS (
       |  SELECT sz.size, coalesce(direct.n_direct, 0) AS n_direct
       |  FROM sz LEFT JOIN direct USING (component_id)
       |)
       |SELECT size, count(*) AS n_clusters,
       |  CAST(sum(n_direct) AS BIGINT) AS direct_pairs,
       |  CAST(count(*) * (size * (size - 1) // 2) AS BIGINT) AS implied_pairs,
       |  CAST((count(*) * (size * (size - 1) // 2) - sum(n_direct)) * 1000000
       |    // (count(*) * (size * (size - 1) // 2)) AS BIGINT)
       |    AS overreach_ppm
       |FROM per GROUP BY size ORDER BY size""".stripMargin

  /** q227 — top-p (nucleus) vocabulary truncation per language: order
    * each language's vocabulary by descending frequency and keep the
    * smallest prefix covering ≥ 90% of token mass — the vocabulary-
    * pruning step tokenizer and sampling pipelines share. The cumulative
    * runs over the per-language VOCABULARY aggregate (bounded by the
    * vocabulary, not the corpus — the q122 bounded-window argument);
    * ties break by token for bit-stable prefixes.
    */
  def topPVocab(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = docs(s, d)
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tk"))
      .groupBy("lang", "tk").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("tk"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy("lang")
    vocab
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("mass", sum(col("n")).over(tot))
      // kept ⟺ the PREVIOUS prefix had not yet reached 90%
      .filter(expr("(cum - n) * 10 < mass * 9"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept_types"),
        max("cum").cast("bigint").as("kept_mass"),
        max("mass").cast("bigint").as("total_mass"))
      // token masses scale with the corpus: ppm through DECIMAL(38,0)
      .withColumn("kept_ppm",
        expr("CAST(CAST(kept_mass AS DECIMAL(38,0)) * 1000000" +
          " div total_mass AS BIGINT)"))
      .orderBy("lang")
  }

  val topPVocabOracle: String =
    """WITH v AS (
      |  SELECT lang, tk, count(*) AS n FROM (
      |    SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS tk
      |    FROM documents)
      |  GROUP BY 1, 2
      |), c AS (
      |  SELECT lang, tk, n,
      |    sum(n) OVER (PARTITION BY lang ORDER BY n DESC, tk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(n) OVER (PARTITION BY lang) AS mass
      |  FROM v
      |)
      |SELECT lang, count(*) AS n_kept_types,
      |  CAST(max(cum) AS BIGINT) AS kept_mass,
      |  CAST(max(mass) AS BIGINT) AS total_mass,
      |  CAST(max(cum) * 1000000 // max(mass) AS BIGINT) AS kept_ppm
      |FROM c WHERE (cum - n) * 10 < mass * 9
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** q228 — χ² keyword extraction per source: the 3 tokens most
    * associated with each source by the chi-square statistic over the
    * (in-source, out-of-source) × (token, not-token) contingency table —
    * integer-exact through a DECIMAL(38,0) carrier for N·(ad−bc)²
    * scaled by 10⁶ against the margin product. Contingency cells come
    * from two map-combinable aggregates; ranking windows run over the
    * bounded per-source vocabulary.
    */
  def chi2Keywords(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = graft.CacheScope.persisted(docs(s, d)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tk")))
    val n = ex.count()
    val bySrcTok = ex.groupBy("source", "tk").agg(count(lit(1)).as("a"))
    val byTok = ex.groupBy("tk").agg(count(lit(1)).as("tokTot"))
    val bySrc = ex.groupBy("source").agg(count(lit(1)).as("srcTot"))
    val cells = bySrcTok
      .join(broadcast(byTok), "tk")
      .join(broadcast(bySrc), "source")
      .withColumn("b", col("srcTot") - col("a"))
      .withColumn("c", col("tokTot") - col("a"))
      .withColumn("dd", lit(n) - col("a") - col("b") - col("c"))
    val scored = cells.withColumn("chi2_x1e6",
      expr(s"""CAST(CAST($n AS DECIMAL(38,0))
             |  * (a * dd - b * c) * (a * dd - b * c) * 1000000
             |  div (CAST(srcTot AS DECIMAL(38,0)) * ($n - srcTot)
             |       * tokTot * ($n - tokTot)) AS BIGINT)""".stripMargin))
    val w = Window.partitionBy("source")
      .orderBy(col("chi2_x1e6").desc, col("tk"))
    scored
      .filter(col("a") * lit(n) > col("srcTot") * col("tokTot")) // enriched only
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("source"), col("rk").cast("bigint").as("rk"), col("tk"),
        col("a").cast("bigint").as("in_source"), col("chi2_x1e6"))
      .orderBy("source", "rk")
  }

  val chi2KeywordsOracle: String =
    """WITH ex AS (
      |  SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tk
      |  FROM documents
      |), n AS (SELECT count(*) AS n FROM ex),
      |st AS (SELECT source, tk, count(*) AS a FROM ex GROUP BY 1, 2),
      |tt AS (SELECT tk, count(*) AS tokTot FROM ex GROUP BY 1),
      |ss AS (SELECT source, count(*) AS srcTot FROM ex GROUP BY 1),
      |cells AS (
      |  SELECT st.source, st.tk, st.a, ss.srcTot, tt.tokTot, n.n,
      |    ss.srcTot - st.a AS b, tt.tokTot - st.a AS c,
      |    n.n - ss.srcTot - tt.tokTot + st.a AS dd
      |  FROM st JOIN tt USING (tk) JOIN ss USING (source), n
      |), scored AS (
      |  SELECT source, tk, a,
      |    CAST(CAST(n AS HUGEINT)
      |      * (a * dd - b * c) * (a * dd - b * c) * 1000000
      |      // (CAST(srcTot AS HUGEINT) * (n - srcTot)
      |         * tokTot * (n - tokTot)) AS BIGINT) AS chi2_x1e6,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY CAST(CAST(n AS HUGEINT)
      |        * (a * dd - b * c) * (a * dd - b * c) * 1000000
      |        // (CAST(srcTot AS HUGEINT) * (n - srcTot)
      |           * tokTot * (n - tokTot)) AS BIGINT) DESC, tk) AS rk
      |  FROM cells WHERE a * n > srcTot * tokTot
      |)
      |SELECT source, CAST(rk AS BIGINT) AS rk, tk,
      |  CAST(a AS BIGINT) AS in_source, chi2_x1e6
      |FROM scored WHERE rk <= 3 ORDER BY source, rk""".stripMargin

  /** q229 — exponential time-decay popularity with a one-month
    * half-life, log-free: each part's score is Σ quantity div 2^age
    * (age in months before the corpus's last ship month) — the exact-
    * integer analog of exp-decay popularity every recommender
    * freshness signal uses. `pow(2, age)` stays integral (ages bounded
    * by the corpus span), the anchor month is one broadcast scalar, and
    * the whole query is one scan + one map-combinable aggregate.
    * Top-25 by (score, partkey) for a bounded dump.
    */
  def decayPopularity(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_partkey"),
        col("l_quantity").cast("bigint").as("qty"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("bigint").as("m"))
    val anchor = li.agg(max("m").as("m_max"))
    li.crossJoin(broadcast(anchor))
      .withColumn("age", col("m_max") - col("m"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(expr("qty div CAST(pow(2, least(age, 62L)) AS BIGINT)"))
        .cast("bigint").as("decayed_qty"),
        sum("qty").cast("bigint").as("raw_qty"))
      .orderBy(col("decayed_qty").desc, col("partkey"))
      .limit(25)
  }

  val decayPopularityOracle: String =
    """WITH li AS (
      |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS m
      |  FROM lineitem
      |), a AS (SELECT max(m) AS m_max FROM li)
      |SELECT l_partkey AS partkey,
      |  CAST(sum(qty // CAST(pow(2, least(m_max - m, 62)) AS BIGINT))
      |       AS BIGINT) AS decayed_qty,
      |  CAST(sum(qty) AS BIGINT) AS raw_qty
      |FROM li, a
      |GROUP BY 1 ORDER BY decayed_qty DESC, partkey LIMIT 25""".stripMargin

  /** q230 — degree distribution + CCDF of the part co-purchase graph:
    * nodes per degree and the count of nodes with degree ≥ d — the
    * heavy-tail profile that decides whether hub caps (q112's
    * `maxDegree`) and skew salting are needed for a given graph. The
    * distribution is two bounded aggregates; the CCDF window runs over
    * the distinct-degree table (bounded by max degree, not nodes).
    */
  def degreeDistribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      .filter(col("l_partkey") % 4 === 0)
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .distinct()
    val deg = edges.select(col("pa").as("node"))
      .unionAll(edges.select(col("pb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val distr = deg.groupBy("degree").agg(count(lit(1)).as("n_nodes"))
    val w = Window.orderBy(col("degree").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    distr
      .withColumn("n_nodes_ge", sum(col("n_nodes")).over(w))
      .select(col("degree").cast("bigint").as("degree"), col("n_nodes"),
        col("n_nodes_ge").cast("bigint").as("n_nodes_ge"))
      .orderBy("degree")
  }

  val degreeDistributionOracle: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0
      |), e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), deg AS (
      |  SELECT node, count(*) AS degree FROM (
      |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      |  GROUP BY 1
      |), distr AS (
      |  SELECT degree, count(*) AS n_nodes FROM deg GROUP BY 1
      |)
      |SELECT CAST(degree AS BIGINT) AS degree, n_nodes,
      |  CAST(sum(n_nodes) OVER (ORDER BY degree DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_nodes_ge
      |FROM distr ORDER BY degree""".stripMargin

  /** q231 — order backlog aging: open (non-final-status) orders bucketed
    * by age against the corpus's last order date — the ops dashboard
    * table behind "how stale is our queue". Age buckets are fixed
    * (≤30/≤90/≤365/>365 days); the anchor is one broadcast scalar; one
    * scan + one map-combinable aggregate.
    */
  def backlogAging(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .select(col("o_orderstatus").as("status"),
        col("o_orderdate").cast("date").as("od"))
    val anchor = o.agg(max("od").as("d_max"))
    o.crossJoin(broadcast(anchor))
      .withColumn("age", datediff(col("d_max"), col("od")))
      .withColumn("age_bucket",
        when(col("age") <= 30, "a_0_30")
          .when(col("age") <= 90, "b_31_90")
          .when(col("age") <= 365, "c_91_365")
          .otherwise("d_over_365"))
      .groupBy("status", "age_bucket")
      .agg(count(lit(1)).as("n_orders"), max("age").cast("bigint").as("max_age"))
      .orderBy("status", "age_bucket")
  }

  val backlogAgingOracle: String =
    """WITH o AS (
      |  SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS od
      |  FROM orders
      |), a AS (SELECT max(od) AS d_max FROM o),
      |b AS (
      |  SELECT status, d_max - od AS age FROM o, a
      |)
      |SELECT status,
      |  CASE WHEN age <= 30 THEN 'a_0_30'
      |       WHEN age <= 90 THEN 'b_31_90'
      |       WHEN age <= 365 THEN 'c_91_365'
      |       ELSE 'd_over_365' END AS age_bucket,
      |  count(*) AS n_orders, CAST(max(age) AS BIGINT) AS max_age
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q232 — near-dup threshold sensitivity curve: verified pair counts
    * at Jaccard cuts 0.5/0.6/0.7/0.8 from ONE candidate+verify pass
    * (the exact inverted index computes each pair's Jaccard once; the
    * sweep is four conditional counts, not four pipelines) — the table
    * that picks a production dedup threshold against its
    * aggressiveness.
    */
  def jaccardThresholdCurve(s: SparkSession, d: String): DataFrame = {
    val sh = functions.DedupOps.shingleSets(docs(s, d), "text", "doc_id", 5)
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val cand = ex.as("a").join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val jac = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(expr("""CAST(size(array_intersect(sh_a, sh_b)) * 1000L div
                     |  (size(sh_a) + size(sh_b)
                     |   - size(array_intersect(sh_a, sh_b))) AS BIGINT)"""
        .stripMargin).as("j_permille"))
    val agg = jac.agg(
      sum(when(col("j_permille") >= 500, 1L).otherwise(0L)).as("t500"),
      sum(when(col("j_permille") >= 600, 1L).otherwise(0L)).as("t600"),
      sum(when(col("j_permille") >= 700, 1L).otherwise(0L)).as("t700"),
      sum(when(col("j_permille") >= 800, 1L).otherwise(0L)).as("t800"))
    agg.select(explode(array(
        struct(lit(500L).as("threshold_permille"), col("t500").as("n_pairs")),
        struct(lit(600L).as("threshold_permille"), col("t600").as("n_pairs")),
        struct(lit(700L).as("threshold_permille"), col("t700").as("n_pairs")),
        struct(lit(800L).as("threshold_permille"), col("t800").as("n_pairs")))))
      .select(col("col.threshold_permille"),
        col("col.n_pairs").cast("bigint").as("n_pairs"))
      .orderBy("threshold_permille")
  }

  val jaccardThresholdCurveOracle: String =
    s"""WITH ${LlmQueries.tokShSql}, ex AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |), j AS (
       |  SELECT CAST(len(list_intersect(sa.sh, sb.sh)) * 1000
       |    // (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |    AS BIGINT) AS jp
       |  FROM cand JOIN sh sa ON doc_a = sa.doc_id
       |            JOIN sh sb ON doc_b = sb.doc_id
       |), t AS (
       |  SELECT CAST(unnest([500, 600, 700, 800]) AS BIGINT)
       |    AS threshold_permille
       |)
       |SELECT t.threshold_permille,
       |  CAST((SELECT count(*) FROM j WHERE j.jp >= t.threshold_permille)
       |       AS BIGINT) AS n_pairs
       |FROM t ORDER BY threshold_permille""".stripMargin

  /** q233 — numeric-profile correlation matrix: pairwise Pearson r
    * (×10⁶, IEEE-fixed-shape from exact integer moments — the
    * q124/q185 discipline) across quantity, extended price, discount,
    * and tax — the first table a feature-engineering pass reads to
    * drop collinear columns. All six pairs come from ONE map-combinable
    * moment aggregate over one scan; cent/percent integer carriers keep
    * the moments exact.
    */
  def numericCorrelations(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(
      col("l_quantity").cast("bigint").as("q"),
      graft.functions.Cents.cents(col("l_extendedprice"))
        .as("p"),
      graft.functions.Cents.cents(col("l_discount")).as("dd"),
      graft.functions.Cents.cents(col("l_tax")).as("tx"))
    val cols = Seq("q", "p", "dd", "tx")
    // products ride DECIMAL(38,0) BEFORE the sum (a BIGINT Σx² wraps at
    // this scale); every moment converts to DOUBLE exactly once so both
    // engines run the identical IEEE op sequence
    val moments = li.agg(count(lit(1)).as("n"),
      cols.flatMap(c => Seq(
        sum(col(c).cast("decimal(38,0)")).as(s"s_$c"),
        sum((col(c) * col(c)).cast("decimal(38,0)")).as(s"ss_$c"))) ++
      cols.combinations(2).toSeq.map { case Seq(a, b) =>
        sum((col(a) * col(b)).cast("decimal(38,0)")).as(s"sp_${a}_$b") }: _*)
    def D(c: String) = s"CAST($c AS DOUBLE)"
    val pairs = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      struct(lit(s"${a}_$b").as("pair"),
        expr(s"""CAST(round((${D("n")} * ${D(s"sp_${a}_$b")}
               |  - ${D(s"s_$a")} * ${D(s"s_$b")})
               |  / sqrt((${D("n")} * ${D(s"ss_$a")}
               |          - ${D(s"s_$a")} * ${D(s"s_$a")})
               |         * (${D("n")} * ${D(s"ss_$b")}
               |            - ${D(s"s_$b")} * ${D(s"s_$b")}))
               |  * 1000000) AS BIGINT)""".stripMargin).as("r_x1e6"))
    }
    moments.select(explode(array(pairs: _*)).as("c"))
      .select(col("c.pair"), col("c.r_x1e6"))
      .orderBy("pair")
  }

  val numericCorrelationsOracle: String = {
    val cols = Seq("q", "p", "dd", "tx")
    def D(c: String) = s"CAST($c AS DOUBLE)"
    val prs = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      s"""SELECT '${a}_$b' AS pair,
         |  CAST(round((${D("n")} * ${D(s"sp_${a}_$b")}
         |    - ${D(s"s_$a")} * ${D(s"s_$b")})
         |    / sqrt((${D("n")} * ${D(s"ss_$a")}
         |            - ${D(s"s_$a")} * ${D(s"s_$a")})
         |           * (${D("n")} * ${D(s"ss_$b")}
         |              - ${D(s"s_$b")} * ${D(s"s_$b")}))
         |    * 1000000) AS BIGINT) AS r_x1e6
         |  FROM m""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH li AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS q,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p,
       |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS dd,
       |    CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tx
       |  FROM lineitem
       |), m AS (
       |  SELECT count(*) AS n,
       |    ${cols.map(c =>
              s"CAST(sum($c) AS HUGEINT) AS s_$c, " +
              s"CAST(sum($c * $c) AS HUGEINT) AS ss_$c").mkString(",\n    ")},
       |    ${cols.combinations(2).toSeq.map { case Seq(a, b) =>
              s"CAST(sum($a * $b) AS HUGEINT) AS sp_${a}_$b" }
              .mkString(",\n    ")}
       |  FROM li
       |)
       |SELECT pair, r_x1e6 FROM (
       |  $prs
       |) ORDER BY pair""".stripMargin
  }

  /** q234 — data-contract validation: one violations table for the
    * constraint battery a publishing pipeline enforces — NOT NULL,
    * domain CHECKs, uniqueness of the business key, and referential
    * integrity into orders — each constraint one map-combinable count
    * (uniqueness via groupBy-count > 1, never a window; RI via
    * left-anti join). The (constraint, n_violations) shape is what a
    * contract gate asserts on before a commit goes live.
    */
  def dataContract(s: SparkSession, d: String): DataFrame = {
    val li = graft.CacheScope.persisted(t(s, d, "lineitem"))
    def row(name: String, v: Column): DataFrame =
      li.agg(v.cast("bigint").as("n_violations"))
        .select(lit(name).as("constraint"), col("n_violations"))
    val notNull = row("c1_keys_not_null",
      sum(when(col("l_orderkey").isNull || col("l_linenumber").isNull ||
        col("l_partkey").isNull || col("l_suppkey").isNull, 1L)
        .otherwise(0L)))
    val domain = row("c2_domain_checks",
      sum(when(col("l_quantity") <= 0 || col("l_extendedprice") <= 0 ||
        col("l_discount") < 0 || col("l_discount") > 1 ||
        !col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)))
    val unique = li.groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("n"))
      .agg(sum(when(col("n") > 1, col("n") - 1).otherwise(0L))
        .cast("bigint").as("n_violations"))
      .select(lit("c3_business_key_unique").as("constraint"),
        col("n_violations"))
    val ri = li.join(t(s, d, "orders").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).cast("bigint").as("n_violations"))
      .select(lit("c4_orderkey_exists").as("constraint"), col("n_violations"))
    notNull.unionAll(domain).unionAll(unique).unionAll(ri)
      .orderBy("constraint")
  }

  val dataContractOracle: String =
    """WITH u AS (
      |  SELECT 'c1_keys_not_null' AS "constraint",
      |    CAST(sum(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
      |      OR l_partkey IS NULL OR l_suppkey IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_violations
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'c2_domain_checks',
      |    CAST(sum(CASE WHEN l_quantity <= 0 OR l_extendedprice <= 0
      |      OR l_discount < 0 OR l_discount > 1
      |      OR l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END)
      |      AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'c3_business_key_unique',
      |    CAST(coalesce(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END), 0)
      |         AS BIGINT) FROM (
      |    SELECT count(*) AS n FROM lineitem
      |    GROUP BY l_orderkey, l_linenumber)
      |  UNION ALL
      |  SELECT 'c4_orderkey_exists', CAST(count(*) AS BIGINT)
      |  FROM lineitem WHERE l_orderkey NOT IN
      |    (SELECT o_orderkey FROM orders)
      |)
      |SELECT "constraint", n_violations FROM u ORDER BY 1""".stripMargin

  /** q235 — supplier-concentration HHI per part: the Herfindahl index of
    * each part's supplier quantity shares (×10⁶, exact via the
    * DECIMAL(38,0) carrier: Σ qᵢ² · 10⁶ div (Σ qᵢ)²) — the supply-risk
    * score procurement dashboards rank by. Two map-combinable
    * aggregates; top-20 most concentrated multi-supplier parts for a
    * bounded dump.
    */
  def supplierHhi(s: SparkSession, d: String): DataFrame = {
    val per = t(s, d, "lineitem")
      .groupBy(col("l_partkey").as("partkey"),
        col("l_suppkey").as("suppkey"))
      .agg(sum(col("l_quantity").cast("bigint")).as("q"))
    per.groupBy("partkey")
      .agg(count(lit(1)).as("n_suppliers"),
        sum("q").as("total_q"),
        sum(expr("CAST(q * q AS DECIMAL(38,0))")).as("sq"))
      .filter(col("n_suppliers") >= 2)
      .select(col("partkey"), col("n_suppliers"),
        col("total_q").cast("bigint").as("total_q"),
        expr("""CAST(sq * 1000000 div
               |  (CAST(total_q AS DECIMAL(38,0)) * total_q) AS BIGINT)"""
          .stripMargin).as("hhi_ppm"))
      .orderBy(col("hhi_ppm").desc, col("partkey"))
      .limit(20)
  }

  val supplierHhiOracle: String =
    """WITH per AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2
      |), agg AS (
      |  SELECT partkey, count(*) AS n_suppliers,
      |    CAST(sum(q) AS BIGINT) AS total_q,
      |    sum(CAST(q AS HUGEINT) * q) AS sq
      |  FROM per GROUP BY 1
      |)
      |SELECT partkey, n_suppliers, total_q,
      |  CAST(sq * 1000000 // (CAST(total_q AS HUGEINT) * total_q) AS BIGINT)
      |    AS hhi_ppm
      |FROM agg WHERE n_suppliers >= 2
      |ORDER BY hhi_ppm DESC, partkey LIMIT 20""".stripMargin

  /** q236 — return rate by brand: returned share of quantity and of
    * decimal-exact revenue per part brand (ppm) — the product-quality
    * signal merchandising watches. One broadcast dimension join, one
    * conditional aggregate.
    */
  def returnsByBrand(s: SparkSession, d: String): DataFrame = {
    val rev = expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    |  * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    |  * 10000 AS DECIMAL(38,0))""".stripMargin)
    t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"),
        sum(rev).as("rev_i"),
        sum(when(col("l_returnflag") === "R", rev)
          .otherwise(lit(0).cast("decimal(38,0)"))).as("ret_rev_i"))
      .select(col("brand"), col("n_lines"),
        col("n_returned").cast("bigint").as("n_returned"),
        expr("n_returned * 1000000L div n_lines").as("returned_lines_ppm"),
        expr("CAST(ret_rev_i * 1000000 div rev_i AS BIGINT)")
          .as("returned_revenue_ppm"))
      .orderBy("brand")
  }

  val returnsByBrandOracle: String =
    """WITH li AS (
      |  SELECT p_brand AS brand, l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS HUGEINT)
      |      AS rev_i
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |)
      |SELECT brand, count(*) AS n_lines,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_returned,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) AS returned_lines_ppm,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN rev_i ELSE 0 END)
      |    * 1000000 // sum(rev_i) AS BIGINT) AS returned_revenue_ppm
      |FROM li GROUP BY 1 ORDER BY 1""".stripMargin

  /** q237 — growth accounting (the active-user waterfall): per period,
    * active users split into new / retained / resurrected, plus the
    * previous period's churned — the table every growth dashboard leads
    * with. WEEKLY grain (the fixture's events span one month; swap the
    * period expression for months in production). Period sets come from
    * one (user, week) distinct aggregate; the waterfall is a self-join
    * on week−1 and a first-seen table — no windows over event rows.
    */
  def growthAccounting(s: SparkSession, d: String): DataFrame = {
    val um = graft.CacheScope.persisted(Tables.events(s, d)
      .select(col("user_id"),
        (datediff(col("ts").cast("date"), lit("1970-01-01")) / 7)
          .cast("bigint").as("m"))
      .distinct())
    val first = um.groupBy("user_id").agg(min("m").as("m_first"))
    val prev = um.select(col("user_id").as("pu"), (col("m") + 1).as("pm"))
    val active = um.join(first, "user_id")
      .join(prev, col("m") === col("pm") && col("user_id") === col("pu"),
        "left")
    val waterfall = active
      .groupBy("m")
      .agg(count(lit(1)).as("active"),
        sum(when(col("m_first") === col("m"), 1L).otherwise(0L)).as("new_users"),
        sum(when(col("pu").isNotNull, 1L).otherwise(0L)).as("retained"),
        sum(when(col("pu").isNull && col("m_first") < col("m"), 1L)
          .otherwise(0L)).as("resurrected"))
    val nxt = um.select(col("user_id").as("cu"), col("m").as("cm"))
    val churned = um.select(col("user_id"), (col("m") + 1).as("m"))
      .join(nxt, col("m") === col("cm") && col("user_id") === col("cu"),
        "left_anti")
      .groupBy("m").agg(count(lit(1)).as("churned_from_prev"))
    waterfall.join(churned, Seq("m"), "left")
      .select(col("m").cast("bigint").as("week_idx"), col("active"),
        col("new_users"), col("retained"), col("resurrected"),
        coalesce(col("churned_from_prev"), lit(0L)).as("churned_from_prev"))
      .orderBy("week_idx")
  }

  val growthAccountingOracle: String =
    """WITH um AS (
      |  SELECT DISTINCT user_id,
      |    CAST((CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS BIGINT) AS m
      |  FROM events
      |), f AS (
      |  SELECT user_id, min(m) AS m_first FROM um GROUP BY 1
      |), w AS (
      |  SELECT um.m, count(*) AS active,
      |    sum(CASE WHEN f.m_first = um.m THEN 1 ELSE 0 END) AS new_users,
      |    sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS retained,
      |    sum(CASE WHEN p.user_id IS NULL AND f.m_first < um.m
      |        THEN 1 ELSE 0 END) AS resurrected
      |  FROM um JOIN f USING (user_id)
      |  LEFT JOIN um p ON p.user_id = um.user_id AND p.m = um.m - 1
      |  GROUP BY um.m
      |), ch AS (
      |  SELECT a.m + 1 AS m, count(*) AS churned_from_prev
      |  FROM um a LEFT JOIN um b
      |    ON b.user_id = a.user_id AND b.m = a.m + 1
      |  WHERE b.user_id IS NULL
      |  GROUP BY a.m + 1
      |)
      |SELECT w.m AS week_idx, CAST(active AS BIGINT) AS active,
      |  CAST(new_users AS BIGINT) AS new_users,
      |  CAST(retained AS BIGINT) AS retained,
      |  CAST(resurrected AS BIGINT) AS resurrected,
      |  CAST(coalesce(ch.churned_from_prev, 0) AS BIGINT)
      |    AS churned_from_prev
      |FROM w LEFT JOIN ch ON ch.m = w.m
      |ORDER BY week_idx""".stripMargin

  /** q238 — shuffle-partition advisor: per table, exact byte-width
    * statistics (rows, Σ string-rendered row bytes as a deterministic
    * width proxy) and the partition count that lands each table at a
    * 32 MiB target — the `spark.sql.shuffle.partitions` sizing table an
    * operator reads before submitting at a new scale. One
    * map-combinable aggregate per table, bounded loop over 4 tables.
    */
  def partitionAdvisor(s: SparkSession, d: String): DataFrame = {
    val target = 32L * 1024 * 1024
    Seq("lineitem", "orders", "customer", "part").map { tn =>
      val df = t(s, d, tn)
      val widths = df.columns
        .map(c => coalesce(length(col(c).cast("string")), lit(0)))
        .reduce(_ + _)
      df.agg(count(lit(1)).as("n_rows"),
          sum(widths.cast("bigint")).cast("bigint").as("est_bytes"))
        .select(lit(tn).as("table_name"), col("n_rows"), col("est_bytes"),
          greatest(lit(1L), expr(s"(est_bytes + ${target - 1}) div $target"))
            .cast("bigint").as("advised_partitions"))
    }.reduce(_ unionAll _).orderBy("table_name")
  }

  val partitionAdvisorOracle: String = {
    val target = 32L * 1024 * 1024
    val cols = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"))
    val selects = cols.toSeq.sortBy(_._1).map { case (tn, cs) =>
      val w = cs.map(c => s"coalesce(length(CAST($c AS VARCHAR)), 0)")
        .mkString(" + ")
      s"""SELECT '$tn' AS table_name, count(*) AS n_rows,
         |  CAST(sum($w) AS BIGINT) AS est_bytes,
         |  CAST(greatest(1, (sum($w) + ${target - 1}) // $target) AS BIGINT)
         |    AS advised_partitions
         |  FROM $tn""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH u AS (
       |  $selects
       |)
       |SELECT table_name, n_rows, est_bytes, advised_partitions
       |FROM u ORDER BY table_name""".stripMargin
  }

  /** q239 — deseasonalized month-over-month growth: q215's additive
    * decomposition subtracted from monthly revenue, then the MoM delta
    * of the seasonally-adjusted series in ppm — "did we actually grow,
    * or is it just December". All integer cents over the bounded
    * months table; MoM via a self-join on month index (no window
    * needed at this grain).
    */
  def deseasonalizedGrowth(s: SparkSession, d: String): DataFrame = {
    val dec = seasonalDecompose(s, d)
      .filter(col("seasonal_c").isNotNull)
      .select(col("yr"), col("mo"),
        (col("yr") * 12 + col("mo")).cast("bigint").as("idx"),
        (col("revenue_c") - col("seasonal_c")).as("adj_c"))
    val prev = dec.select((col("idx") + 1).as("idx"),
      col("adj_c").as("prev_adj_c"))
    dec.join(prev, "idx")
      .select(col("yr"), col("mo"),
        col("adj_c").cast("bigint").as("adj_c"),
        col("prev_adj_c").cast("bigint").as("prev_adj_c"),
        // monthly revenue-cents masses scale with the corpus ($92B a
        // month crosses 2^63/10⁶): ppm through DECIMAL(38,0)
        expr("CAST(CAST(adj_c - prev_adj_c AS DECIMAL(38,0)) * 1000000" +
          " div prev_adj_c AS BIGINT)").as("growth_ppm"))
      .orderBy("yr", "mo")
  }

  val deseasonalizedGrowthOracle: String =
    """WITH m AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    CAST(month(o_orderdate) AS INTEGER) AS mo,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS revenue_c,
      |    yr * 12 + mo AS idx
      |  FROM orders GROUP BY 1, 2
      |), tr AS (
      |  SELECT yr, mo, idx, revenue_c,
      |    CASE WHEN count(*) OVER (ORDER BY idx
      |        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) = 3
      |      THEN CAST(sum(revenue_c) OVER (ORDER BY idx
      |        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) // 3 AS BIGINT)
      |    END AS trend_c
      |  FROM m
      |), se AS (
      |  SELECT mo,
      |    CAST(sum(revenue_c - trend_c) // count(*) AS BIGINT) AS seasonal_c
      |  FROM tr WHERE trend_c IS NOT NULL GROUP BY 1
      |), adj AS (
      |  SELECT tr.yr, tr.mo, tr.idx,
      |    tr.revenue_c - se.seasonal_c AS adj_c
      |  FROM tr JOIN se ON tr.mo = se.mo
      |)
      |SELECT a.yr, a.mo, CAST(a.adj_c AS BIGINT) AS adj_c,
      |  CAST(p.adj_c AS BIGINT) AS prev_adj_c,
      |  CAST((a.adj_c - p.adj_c) * 1000000 // p.adj_c AS BIGINT)
      |    AS growth_ppm
      |FROM adj a JOIN adj p ON p.idx = a.idx - 1
      |ORDER BY a.yr, a.mo""".stripMargin

  /** q240 — brand-mix drift between the first and last ship years:
    * total-variation distance of the brand revenue mix (Σ|Δshare|/2, in
    * ppm through integer share arithmetic) plus the per-brand share
    * deltas — "did our product mix move" in one number plus its
    * decomposition (the q160 corpus-drift TVD applied to the sales
    * axis). Two conditional aggregates off one scan; year anchors are
    * broadcast scalars.
    */
  def brandMixDrift(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        year(col("l_shipdate")).cast("int").as("yr"),
        expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               |  * 100 AS BIGINT)""".stripMargin).as("rev_c"))
    val yrs = li.agg(min("yr").as("y_lo"), max("yr").as("y_hi"))
    val per = li.crossJoin(broadcast(yrs))
      .filter(col("yr") === col("y_lo") || col("yr") === col("y_hi"))
      .groupBy("brand")
      .agg(sum(when(col("yr") === col("y_lo"), col("rev_c")).otherwise(0L))
          .cast("decimal(38,0)").as("rev_lo"),
        sum(when(col("yr") === col("y_hi"), col("rev_c")).otherwise(0L))
          .cast("decimal(38,0)").as("rev_hi"))
    val tot = per.agg(sum("rev_lo").as("t_lo"), sum("rev_hi").as("t_hi"))
    per.crossJoin(broadcast(tot))
      .select(col("brand"),
        expr("CAST(rev_lo * 1000000 div t_lo AS BIGINT)").as("share_lo_ppm"),
        expr("CAST(rev_hi * 1000000 div t_hi AS BIGINT)").as("share_hi_ppm"))
      .withColumn("delta_ppm", col("share_hi_ppm") - col("share_lo_ppm"))
      .orderBy("brand")
  }

  val brandMixDriftOracle: String =
    """WITH li AS (
      |  SELECT p_brand AS brand,
      |    CAST(year(l_shipdate) AS INTEGER) AS yr,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS rev_c
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), y AS (SELECT min(yr) AS y_lo, max(yr) AS y_hi FROM li),
      |per AS (
      |  SELECT brand,
      |    CAST(sum(CASE WHEN yr = y_lo THEN rev_c ELSE 0 END) AS HUGEINT)
      |      AS rev_lo,
      |    CAST(sum(CASE WHEN yr = y_hi THEN rev_c ELSE 0 END) AS HUGEINT)
      |      AS rev_hi
      |  FROM li, y WHERE yr = y_lo OR yr = y_hi
      |  GROUP BY brand
      |), tot AS (
      |  SELECT sum(rev_lo) AS t_lo, sum(rev_hi) AS t_hi FROM per
      |)
      |SELECT brand,
      |  CAST(rev_lo * 1000000 // t_lo AS BIGINT) AS share_lo_ppm,
      |  CAST(rev_hi * 1000000 // t_hi AS BIGINT) AS share_hi_ppm,
      |  CAST(rev_hi * 1000000 // t_hi - rev_lo * 1000000 // t_lo AS BIGINT)
      |    AS delta_ppm
      |FROM per, tot ORDER BY brand""".stripMargin

  /** q241 — token position bias: for the 20 most frequent tokens, the
    * mean normalized position within documents (per-mille: 0 = always
    * opens the document, 1000 = always closes it) — template and
    * boilerplate structure show up as tokens pinned to one end. The
    * per-occurrence position rides exact integer scaling
    * (`(pos−1)·1000 div (n−1)`); one explode feeds both the frequency
    * top-k and the position means.
    */
  def tokenPositionBias(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = graft.CacheScope.persisted(docs(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(posexplode(col("t")).as(Seq("p0", "tk")),
        (size(col("t")) - 1).as("nm1"))
      .select(col("tk"), expr("p0 * 1000L div nm1").as("relpos_permille")))
    val top = pos.groupBy("tk").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tk")).limit(20)
    pos.join(broadcast(top), "tk")
      .groupBy("tk")
      .agg(max("n").as("n"),
        expr("sum(relpos_permille) div count(1)").as("mean_pos_permille"))
      .select(col("tk"), col("n").cast("bigint").as("n"),
        col("mean_pos_permille").cast("bigint").as("mean_pos_permille"))
      .orderBy("tk")
  }

  val tokenPositionBiasOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
      |  FROM documents
      |), pos AS (
      |  SELECT u.tk AS tk,
      |    (u.p0 - 1) * 1000 // (n - 1) AS relpos_permille
      |  FROM (SELECT len(t) AS n,
      |          unnest(list_transform(range(1, len(t) + 1),
      |            i -> {'p0': i, 'tk': t[i]})) AS u
      |        FROM tok WHERE len(t) >= 2)
      |), top AS (
      |  SELECT tk, count(*) AS n FROM pos GROUP BY 1
      |  ORDER BY n DESC, tk LIMIT 20
      |)
      |SELECT pos.tk, CAST(max(top.n) AS BIGINT) AS n,
      |  CAST(sum(relpos_permille) // count(*) AS BIGINT)
      |    AS mean_pos_permille
      |FROM pos JOIN top USING (tk)
      |GROUP BY pos.tk ORDER BY pos.tk""".stripMargin

  /** q242 — year-over-year revenue bridge per brand: the finance
    * waterfall decomposing Δrevenue into a volume effect
    * (Δqty × old avg unit price) and a price/mix effect (the
    * remainder) — integer milli-cent unit prices (`rev·1000 div qty`)
    * keep the decomposition exact and additive by construction. One
    * conditional aggregate per brand off one scan.
    */
  def revenueBridge(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        year(col("l_shipdate")).cast("int").as("yr"),
        col("l_quantity").cast("bigint").as("qty"),
        graft.functions.Cents.cents(col("l_extendedprice"))
          .as("rev_c"))
    val yrs = li.agg(min("yr").as("y_lo"), max("yr").as("y_hi"))
    li.crossJoin(broadcast(yrs))
      .filter(col("yr") === col("y_lo") || col("yr") === col("y_hi"))
      .groupBy("brand")
      .agg(sum(when(col("yr") === col("y_lo"), col("qty")).otherwise(0L))
          .cast("bigint").as("q1"),
        sum(when(col("yr") === col("y_hi"), col("qty")).otherwise(0L))
          .cast("bigint").as("q2"),
        sum(when(col("yr") === col("y_lo"), col("rev_c")).otherwise(0L))
          .cast("bigint").as("r1"),
        sum(when(col("yr") === col("y_hi"), col("rev_c")).otherwise(0L))
          .cast("bigint").as("r2"))
      .filter(col("q1") > 0 && col("q2") > 0)
      .select(col("brand"), col("r1"), col("r2"),
        (col("r2") - col("r1")).as("delta_c"),
        expr("(q2 - q1) * (r1 * 1000 div q1) div 1000")
          .cast("bigint").as("volume_effect_c"))
      .withColumn("price_mix_effect_c",
        col("delta_c") - col("volume_effect_c"))
      .orderBy("brand")
  }

  val revenueBridgeOracle: String =
    """WITH li AS (
      |  SELECT p_brand AS brand, CAST(year(l_shipdate) AS INTEGER) AS yr,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS rev_c
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), y AS (SELECT min(yr) AS y_lo, max(yr) AS y_hi FROM li),
      |per AS (
      |  SELECT brand,
      |    CAST(sum(CASE WHEN yr = y_lo THEN qty ELSE 0 END) AS BIGINT) AS q1,
      |    CAST(sum(CASE WHEN yr = y_hi THEN qty ELSE 0 END) AS BIGINT) AS q2,
      |    CAST(sum(CASE WHEN yr = y_lo THEN rev_c ELSE 0 END) AS BIGINT)
      |      AS r1,
      |    CAST(sum(CASE WHEN yr = y_hi THEN rev_c ELSE 0 END) AS BIGINT)
      |      AS r2
      |  FROM li, y WHERE yr = y_lo OR yr = y_hi
      |  GROUP BY brand
      |)
      |SELECT brand, r1, r2, r2 - r1 AS delta_c,
      |  CAST((q2 - q1) * (r1 * 1000 // q1) // 1000 AS BIGINT)
      |    AS volume_effect_c,
      |  CAST(r2 - r1 - (q2 - q1) * (r1 * 1000 // q1) // 1000 AS BIGINT)
      |    AS price_mix_effect_c
      |FROM per WHERE q1 > 0 AND q2 > 0 ORDER BY brand""".stripMargin

  /** q243 — Lorenz curve of customer revenue concentration: customers
    * ranked ascending by spend, cumulative revenue share at each decile
    * of the customer population — the curve behind the q165 Gini
    * number, as the dashboard artifact. Ranks ride the bucketed prefix
    * sum over the per-customer aggregate (never a global window over
    * customers); shares are exact integer ppm.
    */
  def lorenzCurve(s: SparkSession, d: String): DataFrame = {
    val per = graft.CacheScope.persisted(t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(graft.functions.Cents.cents(col("o_totalprice")))
        .cast("bigint").as("rev_c")))
    val pre = graft.operators.PrefixSum.groupedExclusiveRunningTotals(
      per.withColumn("one", lit(1L)).withColumn("g", lit(1)),
      Seq("g"), Seq(col("rev_c"), col("o_custkey")),
      Seq((col("one"), "n_before"), (col("rev_c"), "rev_before")),
      broadcastOffsets = true)
    val tot = per.agg(count(lit(1)).as("n"),
      sum("rev_c").cast("decimal(38,0)").as("t"))
    pre.crossJoin(broadcast(tot))
      .withColumn("decile", expr("least((n_before * 10) div n, 9L) + 1"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        max(expr("""CAST(CAST((rev_before + rev_c) AS DECIMAL(38,0))
                   |  * 1000000 div t AS BIGINT)""".stripMargin))
          .as("cum_share_ppm"))
      .select(col("decile").cast("bigint").as("decile"), col("n_customers"),
        col("cum_share_ppm"))
      .orderBy("decile")
  }

  val lorenzCurveOracle: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1
      |), pre AS (
      |  SELECT o_custkey, rev_c,
      |    coalesce(sum(1) OVER (ORDER BY rev_c, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS n_before,
      |    coalesce(sum(rev_c) OVER (ORDER BY rev_c, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS rev_before,
      |    (SELECT count(*) FROM per) AS n,
      |    (SELECT CAST(sum(rev_c) AS HUGEINT) FROM per) AS t
      |  FROM per
      |)
      |SELECT CAST(least((n_before * 10) // n, 9) + 1 AS BIGINT) AS decile,
      |  count(*) AS n_customers,
      |  CAST(max(CAST(rev_before + rev_c AS HUGEINT) * 1000000 // t)
      |       AS BIGINT) AS cum_share_ppm
      |FROM pre GROUP BY 1 ORDER BY 1""".stripMargin

  /** q244 — ABC inventory classification: parts ranked DESCENDING by
    * revenue; class A covers the first 80% of cumulative revenue, B the
    * next 15%, C the tail — the stock-policy segmentation warehouses
    * run on. Class assignment uses the EXCLUSIVE running share (a
    * part straddling a boundary belongs to the class its first cent
    * falls in — deterministic), ranks from the bucketed prefix sum.
    */
  def abcClassification(s: SparkSession, d: String): DataFrame = {
    val per = graft.CacheScope.persisted(t(s, d, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     |  * (1 - CAST(l_discount AS DECIMAL(4,2)))
                     |  * 10000 AS BIGINT)""".stripMargin)).as("rev_i"))
      .withColumn("neg", -col("rev_i")))
    val pre = graft.operators.PrefixSum.groupedExclusiveRunningTotals(
      per.withColumn("g", lit(1)),
      Seq("g"), Seq(col("neg"), col("l_partkey")),
      Seq((col("rev_i"), "rev_before")),
      broadcastOffsets = true)
    val tot = per.agg(sum("rev_i").cast("decimal(38,0)").as("t"))
    pre.crossJoin(broadcast(tot))
      .withColumn("cls",
        when(expr("CAST(rev_before AS DECIMAL(38,0)) * 100 < t * 80"), "A")
          .when(expr("CAST(rev_before AS DECIMAL(38,0)) * 100 < t * 95"), "B")
          .otherwise("C"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_parts"),
        sum("rev_i").cast("decimal(38,0)").as("cls_rev"))
      .crossJoin(broadcast(tot))
      .select(col("cls"), col("n_parts"),
        expr("CAST(cls_rev * 1000000 div t AS BIGINT)").as("rev_share_ppm"))
      .orderBy("cls")
  }

  val abcClassificationOracle: String =
    """WITH per AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT))
      |      AS BIGINT) AS rev_i
      |  FROM lineitem GROUP BY 1
      |), pre AS (
      |  SELECT l_partkey, rev_i,
      |    coalesce(sum(rev_i) OVER (ORDER BY rev_i DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS rev_before,
      |    (SELECT CAST(sum(rev_i) AS HUGEINT) FROM per) AS t
      |  FROM per
      |), cl AS (
      |  SELECT rev_i, t,
      |    CASE WHEN CAST(rev_before AS HUGEINT) * 100 < t * 80 THEN 'A'
      |         WHEN CAST(rev_before AS HUGEINT) * 100 < t * 95 THEN 'B'
      |         ELSE 'C' END AS cls
      |  FROM pre
      |)
      |SELECT cls, count(*) AS n_parts,
      |  CAST(CAST(sum(rev_i) AS HUGEINT) * 1000000 // min(t) AS BIGINT)
      |    AS rev_share_ppm
      |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin

  /** q245 — order-consolidation opportunities: a customer's orders
    * within 7 days of the previous order could have shipped together;
    * sessions come from the islands trick (`order rank − dense day
    * rank` is NOT needed here — a gap flag + running session count per
    * customer, windows bounded by orders-per-customer). Reports
    * customers with at least one multi-order session: sessions, orders,
    * and the consolidation saving (orders − sessions).
    */
  def orderConsolidation(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
    val w = Window.partitionBy("o_custkey").orderBy("od")
    val sess = o
      .withColumn("prev", lag(col("od"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          datediff(col("od"), col("prev")) > 7, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    sess.groupBy("o_custkey", "sid")
      .agg(count(lit(1)).as("n_orders"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_orders").as("n_orders"),
        sum(expr("n_orders - 1")).cast("bigint").as("consolidatable"))
      .filter(col("n_orders") > col("n_sessions"))
      .select(col("o_custkey").as("custkey"), col("n_sessions"),
        col("n_orders").cast("bigint").as("n_orders"),
        col("consolidatable"))
      .orderBy("custkey")
  }

  val orderConsolidationOracle: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders
      |), m AS (
      |  SELECT o_custkey, od,
      |    CASE WHEN lag(od) OVER w IS NULL
      |           OR od - lag(od) OVER w > 7 THEN 1 ELSE 0 END AS new_sess
      |  FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY od)
      |), s AS (
      |  SELECT o_custkey,
      |    sum(new_sess) OVER (PARTITION BY o_custkey ORDER BY od
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m
      |), per AS (
      |  SELECT o_custkey, sid, count(*) AS n_orders
      |  FROM s GROUP BY 1, 2
      |)
      |SELECT o_custkey AS custkey, count(*) AS n_sessions,
      |  CAST(sum(n_orders) AS BIGINT) AS n_orders,
      |  CAST(sum(n_orders - 1) AS BIGINT) AS consolidatable
      |FROM per GROUP BY 1
      |HAVING sum(n_orders) > count(*) ORDER BY custkey""".stripMargin

  /** q246 — 1-NN label purity (label-noise detector): for a 1-in-4
    * sample of embeddings, does the nearest neighbor (exact cosine,
    * q29's rounded+tie-broken ranking) carry the same label? Per-label
    * purity ppm is the first audit a classification corpus runs —
    * labels whose neighborhoods disagree are mislabeled or the classes
    * genuinely overlap. Queries broadcast; the corpus never shuffles.
    */
  def knnLabelPurity(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))
    val nn = functions.SimilarityOps.bruteForceTopK(
      queries.drop("query_label"), emb, 1)
    nn.join(broadcast(queries.select("query_id", "query_label")), "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), "neighbor_id")
      .groupBy(col("query_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("n_label") === col("query_label"), 1L).otherwise(0L))
          .as("n_same"))
      .withColumn("purity_ppm", expr("n_same * 1000000L div n_queries"))
      .orderBy("label")
  }

  val knnLabelPurityOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
      |    label AS query_label
      |  FROM embeddings WHERE vec_id % 4 = 0
      |), s AS (
      |  SELECT query_id, query_label, vec_id, e.label AS n_label,
      |    round(list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])), 4)
      |      AS sim
      |  FROM q, embeddings e WHERE vec_id <> query_id
      |), r AS (
      |  SELECT query_id, query_label, n_label,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY sim DESC, vec_id) AS rank
      |  FROM s
      |)
      |SELECT query_label AS label, count(*) AS n_queries,
      |  CAST(sum(CASE WHEN n_label = query_label THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_same,
      |  CAST(sum(CASE WHEN n_label = query_label THEN 1 ELSE 0 END)
      |    * 1000000 // count(*) AS BIGINT) AS purity_ppm
      |FROM r WHERE rank = 1
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q247 — hour-of-day activity profile per event type: counts and
    * within-type share ppm for each (event_type, hour) cell — the
    * capacity-planning heatmap (when to schedule compaction, when the
    * stream peaks). One map-combinable aggregate; shares via a
    * broadcast-joined per-type total.
    */
  def hourlyActivity(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_type"), hour(col("ts")).cast("int").as("hr"))
    val per = e.groupBy("event_type", "hr").agg(count(lit(1)).as("n_events"))
    val tot = per.groupBy("event_type").agg(sum("n_events").as("type_total"))
    per.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("hr"), col("n_events"),
        expr("n_events * 1000000L div type_total").as("share_ppm"))
      .orderBy("event_type", "hr")
  }

  val hourlyActivityOracle: String =
    """WITH per AS (
      |  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), tot AS (
      |  SELECT event_type, CAST(sum(n_events) AS BIGINT) AS type_total
      |  FROM per GROUP BY 1
      |)
      |SELECT per.event_type, hr, n_events,
      |  CAST(n_events * 1000000 // type_total AS BIGINT) AS share_ppm
      |FROM per JOIN tot USING (event_type)
      |ORDER BY per.event_type, hr""".stripMargin

  /** q248 — multi-round BPE TRAINER to a merge budget: six
    * count→argmax→merge rounds over the corpus vocabulary
    * ([[graft.functions.Bpe.train]]), emitting the learned merge table
    * (rk, l, r) in rank order — the actual tokenizer-training
    * deliverable q153 (one round) and q161 (apply a fixed table) build
    * toward. Each round is one job over the DISTINCT-token vocabulary
    * (sufficient statistics for every pair count); the only driver
    * traffic is the 1-row winning pair per round. The oracle unrolls
    * the same six rounds as chained CTEs.
    */
  def bpeTrain(s: SparkSession, d: String): DataFrame =
    graft.functions.Bpe.train(docs(s, d), "text", merges = 6)
      .select(col("rank").cast("bigint").as("rk"), col("l"), col("r"))
      .orderBy("rk")

  /** Six chained training-round CTEs (pair counts → argmax top$k →
    * merged vocabulary v${k+1}) over the whole-corpus character
    * vocabulary — shared by the q248 trainer oracle and the q257
    * fertility oracle (which re-applies the SAME top$k tables).
    */
  private val bpeTrainChainSql: String = {
    def round(k: Int): String =
      s"""pc$k AS (
         |  SELECT sym[i] AS l, sym[i + 1] AS r, sum(cnt) AS n
         |  FROM v$k, UNNEST(range(1, len(sym))) AS u(i)
         |  WHERE sym[i] <> sym[i + 1]
         |  GROUP BY 1, 2
         |), top$k AS (
         |  SELECT l, r FROM pc$k ORDER BY n DESC, l, r LIMIT 1
         |), v${k + 1} AS (
         |  SELECT list_filter(list_transform(range(1, len(sym) + 1), i -> CASE
         |      WHEN sym[i] = t.l AND i < len(sym) AND sym[i + 1] = t.r
         |        THEN t.l || t.r
         |      WHEN i > 1 AND sym[i - 1] = t.l AND sym[i] = t.r THEN NULL
         |      ELSE sym[i] END), x -> x IS NOT NULL) AS sym, cnt
         |  FROM v$k, top$k t
         |)""".stripMargin
    s"""toks AS (
       |  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |  FROM documents
       |), v1 AS (
       |  SELECT regexp_extract_all(tok, '.') AS sym, count(*) AS cnt
       |  FROM toks WHERE len(tok) >= 2 GROUP BY tok
       |),
       |${(1 to 6).map(round).mkString(",\n")}""".stripMargin
  }

  val bpeTrainOracle: String =
    s"""WITH $bpeTrainChainSql
       |SELECT * FROM (
       |${(1 to 6).map(k =>
          s"  SELECT CAST($k AS BIGINT) AS rk, l, r FROM top$k")
         .mkString(" UNION ALL\n")}
       |) ORDER BY rk""".stripMargin

  /** q249 — sliding-window document chunking (window 32 tokens, stride
    * 24 — 8-token overlap): the context-window splitter every
    * pretraining / RAG ingestion pipeline runs before packing. Chunk
    * boundaries are pure integer arithmetic over the token vector —
    * chunk k of an n-token document starts at 1 + 24k, and the chunk
    * count is ((n − 32 + 23) div 24) + 1 capped below at 1 — so the
    * whole operator is one scan-local explode: no shuffle, no window, a
    * map-only job at 100 TB. Emitted for a deterministic 1-in-25
    * document sample (the oracle hashes per-chunk rows; the arithmetic
    * is identical for every document), with first/last token of each
    * chunk as the content check.
    */
  def docChunking(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
      .filter(col("doc_id") % 25 === 0 && length(col("text")) > 0)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")).cast("bigint"))
      .withColumn("n_chunks",
        greatest(expr("(n - 9) div 24"), lit(0L)).cast("bigint") + 1L)
    base
      .select(col("doc_id"), col("n"), col("t"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("k"))
      .withColumn("start_tok", lit(1L) + col("k") * 24)
      .withColumn("chunk_len", least(lit(32L), col("n") - col("start_tok") + 1))
      .select(col("doc_id"), col("k").as("chunk_idx"), col("start_tok"),
        col("chunk_len"),
        element_at(col("t"), col("start_tok").cast("int")).as("first_tok"),
        element_at(col("t"),
          (col("start_tok") + col("chunk_len") - 1).cast("int")).as("last_tok"))
      .orderBy("doc_id", "chunk_idx")
  }

  val docChunkingOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
      |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 25 = 0 AND length(text) > 0
      |), c AS (
      |  SELECT doc_id, toks, n,
      |    unnest(range(0, greatest((n - 32 + 23) // 24, 0) + 1)) AS k
      |  FROM t
      |)
      |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
      |  CAST(1 + k * 24 AS BIGINT) AS start_tok,
      |  CAST(least(32, n - (1 + k * 24) + 1) AS BIGINT) AS chunk_len,
      |  toks[CAST(1 + k * 24 AS INTEGER)] AS first_tok,
      |  toks[CAST(1 + k * 24 + least(32, n - (1 + k * 24) + 1) - 1 AS INTEGER)]
      |    AS last_tok
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** q257 — tokenizer fertility by source: train the q248 merge table,
    * apply it over the per-source vocabulary
    * ([[graft.functions.Bpe.applyMerges]] — carrier columns survive the
    * rounds), and report tokens-per-word (fertility, ppm) and
    * chars-per-token (centi) for every source — the standard tokenizer
    * evaluation that decides whether a vocabulary serves all corpus
    * slices equally (a domain with fertility 2× the rest pays 2× the
    * sequence length for the same text). Completes the tokenizer story:
    * q153 one round, q248 the trainer, q161 encode, q257 the eval.
    * Scale shape unchanged from q248: everything runs on the DISTINCT
    * (source, token) vocabulary — sufficient statistics for every
    * count here — so the corpus collapses zipfian-fold before any
    * per-round transform; all ratios are exact integer div.
    */
  def tokenizerFertility(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val merges = graft.functions.Bpe.train(dd, "text", merges = 6)
    val v0 = dd
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
      .select(col("source"), expr("regexp_extract_all(tok, '.', 0)").as("sym"),
        col("cnt"))
    graft.functions.Bpe.applyMerges(v0, merges)
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(size(col("sym")).cast("bigint") * col("cnt")).as("n_tokens"),
        sum(expr("aggregate(sym, 0L, (a, x) -> a + length(x))") * col("cnt"))
          .as("n_chars"))
      .select(col("source"), col("n_words"), col("n_tokens"),
        // piece mass scales with the corpus: ppm through DECIMAL(38,0)
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000" +
          " div n_words AS BIGINT)").as("fertility_ppm"),
        expr("n_chars * 100 div n_tokens").as("cpt_centi"))
      .orderBy("source")
  }

  val tokenizerFertilityOracle: String = {
    def evRound(k: Int): String =
      s"""ev$k AS (
         |  SELECT source,
         |    list_filter(list_transform(range(1, len(sym) + 1), i -> CASE
         |      WHEN sym[i] = t.l AND i < len(sym) AND sym[i + 1] = t.r
         |        THEN t.l || t.r
         |      WHEN i > 1 AND sym[i - 1] = t.l AND sym[i] = t.r THEN NULL
         |      ELSE sym[i] END), x -> x IS NOT NULL) AS sym, cnt
         |  FROM ev${k - 1}, top$k t
         |)""".stripMargin
    s"""WITH $bpeTrainChainSql, ev0 AS (
       |  SELECT source, regexp_extract_all(tok, '.') AS sym,
       |    count(*) AS cnt
       |  FROM (
       |    SELECT source,
       |      unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |    FROM documents)
       |  WHERE len(tok) >= 2 GROUP BY source, tok
       |),
       |${(1 to 6).map(evRound).mkString(",\n")}
       |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_words,
       |  CAST(sum(len(sym) * cnt) AS BIGINT) AS n_tokens,
       |  CAST(sum(len(sym) * cnt) * 1000000 // sum(cnt) AS BIGINT)
       |    AS fertility_ppm,
       |  CAST(sum(list_sum(list_transform(sym, x -> len(x))) * cnt) * 100
       |    // sum(len(sym) * cnt) AS BIGINT) AS cpt_centi
       |FROM ev6 GROUP BY source ORDER BY source""".stripMargin
  }

  /** q256 — neighborhood function N(r) of the co-purchase graph
    * ([[graft.operators.NeighborhoodFunction.multiSourceReachCounts]]):
    * exact ball sizes within r = 1..3 hops from a deterministic bounded
    * customer root sample, computed as a multi-source bitmask BFS — one
    * BIGINT of root bits per node, rounds are edge-join + map-combinable
    * bit_or, and NO (root, node) pair table ever materializes (the
    * first-cut frontier/anti-join formulation paid an 8M-row distinct
    * at hop 3 on this hub-heavy graph; the bitmask rounds carry |E|
    * longs). The unbounded-source generalization — per-node HLL
    * sketches, Boldi & Vigna 2011's HyperBall — is
    * [[graft.operators.NeighborhoodFunction.hyperBall]], audited against
    * these exact counts in NeighborhoodFunctionSpec rather than here
    * (two full-graph sketch-union rounds are real money in the bench;
    * the estimator's correctness doesn't need re-proving per scale
    * factor). Connectivity audits of THIS kind decide whether a
    * near-dup graph is safe to close transitively (q253's closure rate
    * is the pair-level companion).
    */
  def neighborhoodFunction(s: SparkSession, d: String): DataFrame = {
    val e0 = t(s, d, "orders").join(t(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = graft.CacheScope.persisted(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    // roots: graph customers with custkey % 100 = 0 AND custkey ≤ 2000
    // (src = custkey·2: src % 200 = 0, src ≤ 4000) — drawn FROM the
    // edge set so every root has degree ≥ 1 at any scale factor, and
    // CAPPED at 20 roots so the exact pair table stays sample-bounded
    // as the fixtures scale (the hop-3 frontier multiplies every
    // reached node's degree; an uncapped root sample would grow the
    // intermediate linearly with corpus size on top of that)
    val roots = graft.CacheScope.persisted(
      sym.select(col("src")).distinct()
        .filter(col("src") % 200 === 0 && col("src") <= 4000)
        .select(col("src").as("root")))
    val nSources = roots.agg(count(lit(1)).as("n_sources"))
    // exact counts via MS-BFS bitmasks: root bit = custkey/100 − 1 ∈
    // [0, 19] straight from arithmetic (no window, no driver round-trip
    // for the assignment); each round is an edge join + map-combinable
    // bit_or — no (root, node) pair table at any hop
    val rootBits = roots.select(col("root").as("id"),
      expr("shiftleft(1L, cast(root div 200 AS INT) - 1)").as("mask"))
    val exact = graft.operators.NeighborhoodFunction
      .multiSourceReachCounts(sym, rootBits, rounds = 3)
    exact.crossJoin(broadcast(nSources))
      .select(col("hop").cast("bigint").as("hop"), col("n_sources"),
        col("reached_pairs"),
        expr("reached_pairs div n_sources").as("avg_reached"))
      .orderBy("hop")
  }

  val neighborhoodFunctionOracle: String =
    """WITH e0 AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |), sym AS (
      |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
      |), roots AS (
      |  SELECT DISTINCT src AS root FROM sym
      |  WHERE src % 200 = 0 AND src <= 4000
      |), ns AS (
      |  SELECT count(*) AS n_sources FROM roots
      |), s0 AS (
      |  SELECT root, root AS node FROM roots
      |), s1 AS (
      |  SELECT root, node FROM s0
      |  UNION SELECT s0.root, sym.dst FROM s0 JOIN sym ON s0.node = sym.src
      |), s2 AS (
      |  SELECT root, node FROM s1
      |  UNION SELECT s1.root, sym.dst FROM s1 JOIN sym ON s1.node = sym.src
      |), s3 AS (
      |  SELECT root, node FROM s2
      |  UNION SELECT s2.root, sym.dst FROM s2 JOIN sym ON s2.node = sym.src
      |), c AS (
      |  SELECT 1 AS hop, count(*) AS reached_pairs FROM s1
      |  UNION ALL SELECT 2, count(*) FROM s2
      |  UNION ALL SELECT 3, count(*) FROM s3
      |)
      |SELECT CAST(hop AS BIGINT) AS hop,
      |  CAST(n_sources AS BIGINT) AS n_sources,
      |  CAST(reached_pairs AS BIGINT) AS reached_pairs,
      |  CAST(reached_pairs // n_sources AS BIGINT) AS avg_reached
      |FROM c, ns ORDER BY hop""".stripMargin

  /** q258 — l-diversity audit: the companion gate to q167's
    * k-anonymity. A quasi-identifier class can be large (k-anonymous)
    * yet still leak — if every member shares one sensitive value, the
    * attacker learns it without identifying anyone (Machanavajjhala et
    * al. 2007's homogeneity attack). Per QI class (nation ×
    * account-balance band) count the DISTINCT sensitive values (market
    * segment); per threshold l ∈ {2,3,5} report how many classes fall
    * below and how many rows they expose. One map-combinable aggregate
    * over the raw table (bounded by the QI domain), a 3-row broadcast
    * cross join, one re-aggregate — the q167 scale shape exactly.
    */
  def lDiversity(s: SparkSession, d: String): DataFrame = {
    val classes = t(s, d, "customer")
      .groupBy(col("c_nationkey"),
        (floor(col("c_acctbal")).cast("bigint")
          - (floor(col("c_acctbal")).cast("bigint") % 1000)).as("bal_band"))
      .agg(countDistinct(col("c_mktsegment")).as("l_div"),
        count(lit(1)).as("cls_size"))
    val ls = s.createDataFrame(Seq(Tuple1(2L), Tuple1(3L), Tuple1(5L)))
      .toDF("l")
    classes.crossJoin(broadcast(ls))
      .groupBy("l")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("l_div") < col("l"), 1L).otherwise(0L))
          .as("classes_below"),
        sum(when(col("l_div") < col("l"), col("cls_size")).otherwise(0L))
          .as("rows_at_risk"))
      .orderBy("l")
  }

  val lDiversityOracle: String =
    """WITH cls AS (
      |  SELECT c_nationkey,
      |    CAST(floor(c_acctbal) AS BIGINT)
      |      - (CAST(floor(c_acctbal) AS BIGINT) % 1000) AS bal_band,
      |    count(DISTINCT c_mktsegment) AS l_div,
      |    count(*) AS cls_size
      |  FROM customer GROUP BY 1, 2
      |), ls AS (
      |  SELECT unnest([2, 3, 5]) AS l
      |)
      |SELECT CAST(l AS BIGINT) AS l,
      |  CAST(count(*) AS BIGINT) AS n_classes,
      |  CAST(sum(CASE WHEN l_div < l THEN 1 ELSE 0 END) AS BIGINT)
      |    AS classes_below,
      |  CAST(sum(CASE WHEN l_div < l THEN cls_size ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk
      |FROM cls, ls GROUP BY l ORDER BY l""".stripMargin

  /** q259 — Theil–Sen robust trend of monthly revenue: slope = the
    * weighted lower median of all pairwise month-to-month slopes,
    * intercept = the median residual at that slope (Sen 1968) — the
    * outlier-proof counterpart to q124's OLS (one wild month moves OLS
    * by its magnitude, Theil–Sen not at all; ~29% breakdown point).
    * All arithmetic integer-exact: revenue in cents via decimal-first
    * sums, slopes centi-scaled with truncating division (Spark `div`
    * and DuckDB `//` agree toward zero, negatives included), medians
    * via the q140 value-domain discipline. The cumulative windows here
    * are GLOBAL but run over the pairwise-slope VALUE DOMAIN, bounded
    * by the calendar-month count squared — a domain constant, never row
    * count (PlanHygieneSpec allowlist) — so at 100 TB the only
    * data-sized job is the monthly pre-aggregate. (A first cut routed
    * these through the bucketed PrefixSum: bit-identical, but two
    * sketch+collect pipelines cost 5 s on a 3k-row domain where the
    * window costs nothing — the bucketed machinery is for cumulative
    * sums over DATA-scaled rows.)
    */
  def theilSen(s: SparkSession, d: String): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val monthly = graft.CacheScope.persisted(
      t(s, d, "orders")
        .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("bigint").as("mi"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast("bigint").as("cents")))
    val nPoints = monthly.agg(count(lit(1)).as("n_points"))
    val slopes = monthly.as("a").join(monthly.as("b"), col("b.mi") > col("a.mi"))
      .select(expr("((b.cents - a.cents) * 100) div (b.mi - a.mi)").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("w"))
    val slopeTot = slopes.agg(sum(col("w")).as("tw"))
    // persisted: TWO consumers (the intercept residuals and the final
    // select) would otherwise each replay the slope-median pipeline
    val slopeMed = graft.CacheScope.persisted(
      slopes.withColumn("cw", sum(col("w")).over(win))
        .crossJoin(broadcast(slopeTot))
        .filter(col("cw") * 2 >= col("tw"))
        .agg(min(col("v")).as("slope_centi"), max(col("tw")).as("n_pairs")))
    val icepts = monthly.crossJoin(broadcast(slopeMed))
      .select((col("cents") * 100 - col("slope_centi") * col("mi")).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("w"))
    val iTot = icepts.agg(sum(col("w")).as("tw2"))
    val iceptMed = icepts.withColumn("cw", sum(col("w")).over(win))
      .crossJoin(broadcast(iTot))
      .filter(col("cw") * 2 >= col("tw2"))
      .agg(min(col("v")).as("intercept_centi"))
    nPoints.crossJoin(broadcast(slopeMed)).crossJoin(broadcast(iceptMed))
      .select(col("n_points"), col("n_pairs"), col("slope_centi"),
        col("intercept_centi"))
  }

  val theilSenOracle: String =
    """WITH m AS (
      |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS mi,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), np AS (
      |  SELECT count(*) AS n_points FROM m
      |), p AS (
      |  SELECT ((b.cents - a.cents) * 100) // (b.mi - a.mi) AS v
      |  FROM m a JOIN m b ON b.mi > a.mi
      |), sv AS (
      |  SELECT v, count(*) AS w FROM p GROUP BY v
      |), sc AS (
      |  SELECT v, w,
      |    sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
      |    sum(w) OVER () AS tw
      |  FROM sv
      |), sm AS (
      |  SELECT min(v) AS slope_centi, max(tw) AS n_pairs
      |  FROM sc WHERE cw * 2 >= tw
      |), iv AS (
      |  SELECT (cents * 100 - (SELECT slope_centi FROM sm) * mi) AS v
      |  FROM m
      |), ivv AS (
      |  SELECT v, count(*) AS w FROM iv GROUP BY v
      |), ic AS (
      |  SELECT v, w,
      |    sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
      |    sum(w) OVER () AS tw
      |  FROM ivv
      |), im AS (
      |  SELECT min(v) AS intercept_centi FROM ic WHERE cw * 2 >= tw
      |)
      |SELECT CAST(n_points AS BIGINT) AS n_points,
      |  CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(slope_centi AS BIGINT) AS slope_centi,
      |  CAST(intercept_centi AS BIGINT) AS intercept_centi
      |FROM np, sm, im""".stripMargin

  /** q260 — CUPED variance reduction (Deng et al. 2013): using each
    * customer's PRE-period revenue as the control covariate for their
    * post-period metric, report θ = Cov(pre, post)/Var(pre) and the
    * variance fraction CUPED removes (ρ², ppm) — the number that says
    * how much smaller an A/B test gets for free. All moments are one
    * map-combinable aggregate over the per-customer totals; the ratios
    * are exact integer arithmetic in DECIMAL(38,0) carriers
    * (hecto-dollar units keep every intermediate under 10³⁸; Spark
    * integral `div` and DuckDB HUGEINT `//` truncate identically, and
    * ρ²·10⁶ is computed as ((cov·10⁶ div varx) · cov) div vary so the
    * truncation order is pinned cross-engine). Scale shape: one
    * customer-keyed aggregate + one 1-row moment aggregate — nothing
    * else, at any corpus size.
    */
  def cuped(s: SparkSession, d: String): DataFrame = {
    val per = t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(year(col("o_orderdate")) < 1996,
          col("o_totalprice").cast(DecimalType(18, 2))).otherwise(lit(0)))
          .as("pre_d"),
        sum(when(year(col("o_orderdate")) >= 1996,
          col("o_totalprice").cast(DecimalType(18, 2))).otherwise(lit(0)))
          .as("post_d"))
      .select(
        expr("CAST(pre_d * 100 AS BIGINT) div 10000").as("x"),
        expr("CAST(post_d * 100 AS BIGINT) div 10000").as("y"))
    per.agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(DecimalType(38, 0)).as("sx"),
        sum(col("y")).cast(DecimalType(38, 0)).as("sy"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(38, 0))).as("syy"))
      .select(col("n").as("n_units"),
        expr("(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)")
          .as("theta_ppm"),
        expr("""((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx))
               |  * (n * sxy - sx * sy) div (n * syy - sy * sy)"""
          .stripMargin).as("var_reduction_ppm"))
  }

  val cupedOracle: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(CAST(sum(CASE WHEN year(o_orderdate) < 1996
      |        THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) * 100
      |      AS BIGINT) // 10000 AS BIGINT) AS x,
      |    CAST(CAST(sum(CASE WHEN year(o_orderdate) >= 1996
      |        THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) * 100
      |      AS BIGINT) // 10000 AS BIGINT) AS y
      |  FROM orders GROUP BY 1
      |), st AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx,
      |    CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM per
      |)
      |SELECT CAST(n AS BIGINT) AS n_units,
      |  CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
      |    AS BIGINT) AS theta_ppm,
      |  CAST(((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx))
      |    * (n * sxy - sx * sy) // (n * syy - sy * sy)
      |    AS BIGINT) AS var_reduction_ppm
      |FROM st""".stripMargin

  /** q261 — min-cost Viterbi segmentation: the OTHER tokenizer family.
    * BPE (q153/q248/q161/q257) applies learned merges greedily; a
    * unigram-LM tokenizer (Kudo 2018, SentencePiece) instead segments
    * each word to MINIMIZE total piece cost by dynamic programming.
    * Here the piece inventory is the top-16 character 2/3-grams by
    * corpus frequency, cost 101+rank against 100 per single char, and
    * each word's optimal segmentation comes from a scan-local Viterbi
    * fold (three rolling DP states — max piece length 3 — in one
    * `aggregate` over the character positions; no explode, no shuffle,
    * no per-position rows). Piece counts ride the cost in one integer
    * (C = cost·1024 + pieces), so the minimum is unique and the
    * decomposition exact. Per source: words, pieces, cost, and
    * pieces-per-word — directly comparable to q257's BPE fertility.
    *
    * Scale shape: everything runs on the DISTINCT-token vocabulary
    * (sufficient statistics, zipf-collapsed), the inventory is a
    * 16-row broadcast map, and its rank is a bounded 16×16 self-join —
    * no window anywhere. The oracle replays the identical DP as a
    * recursive CTE (DuckDB 1.0's `list_reduce` returns inconsistent
    * folds on longer inputs — measured, avoided).
    */
  def viterbiSegmentation(s: SparkSession, d: String): DataFrame = {
    // widen BEFORE the tokenize explode ([[graft.Par.toCores]]): the
    // corpus-scale tokenize runs inside the scan projection (measured
    // 8.9 task-CPU-s at ~1.6-way on the one-row-group fixture). The
    // groupBy partial-aggregates map-side, so the shuffle still carries
    // (source, tok) partials, not raw tokens. The cached counts are
    // then spread to core-count partitions too, so the Viterbi DP below
    // (per-distinct-token, CPU-bound) runs wide.
    val tokc = graft.CacheScope.persisted(graft.Par.toCores(
      graft.Par.toCores(docs(s, d))
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) >= 2)
        .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))))
    val vcb = tokc.groupBy("tok").agg(sum(col("cnt")).as("cnt"))
    val grams = Seq(2, 3).map { n =>
      vcb.select(explode(expr(
        s"transform(sequence(1, length(tok) - ${n - 1}), " +
          s"i -> substring(tok, i, $n))")).as("g"), col("cnt"))
    }.reduce(_.unionByName(_))
      .groupBy("g").agg(sum(col("cnt")).as("n"))
    val cand = grams.orderBy(col("n").desc, col("g")).limit(16)
    // rank via a bounded 16×16 self-join (count of strictly-better
    // candidates) — deterministic, window-free
    val inv = cand.as("a").join(cand.as("b"),
        col("b.n") > col("a.n") ||
          (col("b.n") === col("a.n") && col("b.g") < col("a.g")), "left")
      .groupBy(col("a.g").as("gram"))
      .agg((count(col("b.g")) + 101L).as("cost"))
    val invMap = inv.agg(map_from_entries(
      collect_list(struct(col("gram"), col("cost")))).as("m"))
    val dp = tokc.crossJoin(broadcast(invMap))
      .withColumn("cval", TextAnalysis.minCostSegmentation("tok", "m"))
    dp.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum((col("cval") % 1024L) * col("cnt")).as("n_pieces"),
        sum(expr("(cval div 1024) * cnt")).as("cost_units"))
      .withColumn("pieces_per_word_ppm",
        // piece mass scales with the corpus: ppm through DECIMAL(38,0)
        expr("CAST(CAST(n_pieces AS DECIMAL(38,0)) * 1000000" +
          " div n_words AS BIGINT)"))
      .orderBy("source")
  }

  val viterbiSegmentationOracle: String =
    """WITH RECURSIVE tokc AS (
      |  SELECT source, tok, count(*) AS cnt FROM (
      |    SELECT source,
      |      unnest(string_split_regex(lower(text), '\s+')) AS tok
      |    FROM documents)
      |  WHERE length(tok) >= 2 GROUP BY 1, 2
      |), vcb AS (
      |  SELECT tok, sum(cnt) AS cnt FROM tokc GROUP BY tok
      |), gc AS (
      |  SELECT g, sum(cnt) AS n FROM (
      |    SELECT substring(tok, CAST(u.i AS INT), 2) AS g, cnt
      |    FROM vcb, UNNEST(range(1, length(tok))) AS u(i)
      |    UNION ALL
      |    SELECT substring(tok, CAST(u.i AS INT), 3) AS g, cnt
      |    FROM vcb, UNNEST(range(1, length(tok) - 1)) AS u(i))
      |  GROUP BY g
      |), cand AS (
      |  SELECT g, n FROM gc ORDER BY n DESC, g LIMIT 16
      |), inv AS (
      |  SELECT a.g, 101 + (
      |    SELECT count(*) FROM cand b
      |    WHERE b.n > a.n OR (b.n = a.n AND b.g < a.g)) AS cost
      |  FROM cand a
      |), toks AS (
      |  SELECT DISTINCT tok FROM tokc
      |), seg AS (
      |  SELECT tok, 0 AS i, 0::BIGINT AS a,
      |    (1::BIGINT << 40) AS b, (1::BIGINT << 40) AS c
      |  FROM toks
      |  UNION ALL
      |  SELECT s.tok, s.i + 1,
      |    least(
      |      s.a + 102401,
      |      CASE WHEN s.i + 1 >= 2
      |        THEN coalesce(s.b + i2.cost * 1024 + 1, 1::BIGINT << 40)
      |        ELSE 1::BIGINT << 40 END,
      |      CASE WHEN s.i + 1 >= 3
      |        THEN coalesce(s.c + i3.cost * 1024 + 1, 1::BIGINT << 40)
      |        ELSE 1::BIGINT << 40 END),
      |    s.a, s.b
      |  FROM seg s
      |  LEFT JOIN inv i2 ON i2.g = substring(s.tok, s.i, 2)
      |  LEFT JOIN inv i3 ON i3.g = substring(s.tok, s.i - 1, 3)
      |  WHERE s.i < length(s.tok)
      |), dp AS (
      |  SELECT tok, a AS cval FROM seg WHERE i = length(tok)
      |)
      |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_words,
      |  CAST(sum((cval % 1024) * cnt) AS BIGINT) AS n_pieces,
      |  CAST(sum((cval // 1024) * cnt) AS BIGINT) AS cost_units,
      |  CAST(sum((cval % 1024) * cnt) * 1000000 // sum(cnt) AS BIGINT)
      |    AS pieces_per_word_ppm
      |FROM tokc JOIN dp USING (tok)
      |GROUP BY source ORDER BY source""".stripMargin

  /** q262 — Neyman sample allocation (Neyman 1934): split a 1000-unit
    * sampling budget across market-segment strata proportionally to
    * nₕ·σₕ — the allocation minimizing the stratified estimator's
    * variance, the design step BEFORE q48's stratified draw executes.
    * Since nₕ·σₕ = √(nₕ·Σx² − (Σx)²), the weight is one exact integer
    * square root ([[graft.functions.Sampling.isqrt]] — floor-double-
    * sqrt with ±1 integer correction, engine-exact below 2⁵³) of the
    * scaled variance numerator; spend rides kilodollar units with
    * floor-before-cast so every carrier stays far below the exactness
    * bound. One customer-keyed aggregate, one stratum aggregate
    * (bounded by the segment domain), one broadcast total — nothing
    * data-sized past the first aggregate at any scale.
    */
  def neymanAllocation(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment").as("seg"))
      .agg(expr(
        """CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2)))) AS BIGINT)
          |  div 1000""".stripMargin).as("x"))
    // variance numerator in DECIMAL(38,0): n·Σx² − (Σx)² multiplies
    // count-scale factors, so the long form overflows past ~1e7
    // customers per stratum (the q156 cast-first discipline); vh is
    // internal — isqrt and the output schema are unchanged
    val strata = cust.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_h"),
        (count(lit(1)).cast("decimal(38,0)")
            * sum(col("x").cast("decimal(38,0)") * col("x"))
          - sum(col("x")).cast("decimal(38,0)") * sum(col("x"))).as("vh"))
      .withColumn("sigma_weight", functions.Sampling.isqrt(col("vh")))
    val tot = strata.agg(sum(col("sigma_weight")).as("tw"))
    strata.crossJoin(broadcast(tot))
      .select(col("seg"), col("n_h"), col("sigma_weight"),
        expr("sigma_weight * 1000 div tw").as("alloc_per_mille"))
      .orderBy("seg")
  }

  val neymanAllocationOracle: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment AS seg,
      |    CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2)))) AS BIGINT)
      |      // 1000 AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), st AS (
      |  SELECT seg, count(*) AS n_h,
      |    count(*) * sum(x * x) - sum(x) * sum(x) AS vh
      |  FROM cust GROUP BY seg
      |), s0 AS (
      |  SELECT seg, n_h, vh,
      |    CAST(floor(sqrt(CAST(vh AS DOUBLE))) AS BIGINT) AS r0
      |  FROM st
      |), s1 AS (
      |  SELECT seg, n_h, vh,
      |    CASE WHEN r0 * r0 > vh THEN r0 - 1 ELSE r0 END AS r1
      |  FROM s0
      |), sq AS (
      |  SELECT seg, n_h,
      |    CASE WHEN (r1 + 1) * (r1 + 1) <= vh THEN r1 + 1 ELSE r1 END AS w
      |  FROM s1
      |), tot AS (
      |  SELECT sum(w) AS tw FROM sq
      |)
      |SELECT seg, CAST(n_h AS BIGINT) AS n_h,
      |  CAST(w AS BIGINT) AS sigma_weight,
      |  CAST(w * 1000 // tw AS BIGINT) AS alloc_per_mille
      |FROM sq, tot ORDER BY seg""".stripMargin

  /** q263 — fill-in-the-middle transform accounting (Bavarian et al.
    * 2022, "Efficient Training of Language Models to Fill in the
    * Middle"): every document is deterministically routed to PSM
    * (prefix-suffix-middle), SPM, or plain autoregressive form by a
    * hash gate on its id (50/30/20), and its two FIM cut points come
    * from two more hash digits — the standard pretraining-corpus
    * transform, made reproducible (no RNG: the md5-prefix device q186's
    * winnowing already uses, identical in both engines). Per
    * (source, mode): document/token counts, the prefix/middle/suffix
    * token mass the cuts produce, and the output length including the
    * three sentinel tokens a FIM document gains — the number a token-
    * budget plan needs before turning FIM on.
    *
    * Scale shape: pure per-row integer math inside the document scan
    * (tokenize + two md5 words), one bounded aggregate by
    * (source, mode) — map-combined, nothing data-sized shuffles. The
    * scan is repartitioned to cores first (one-row-group fixture).
    */
  def fimSplit(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("doc_id").cast("string"))
    val base = graft.Par.toCores(docs(s, d), col("doc_id"))
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n"),
        conv(substring(h, 1, 8), 16, 10).cast("bigint").as("h1"),
        conv(substring(h, 9, 8), 16, 10).cast("bigint").as("h2"))
      .withColumn("mode",
        when(col("n") < 4, lit("plain"))
          .when(col("h1") % 10 < 5, lit("psm"))
          .when(col("h1") % 10 < 8, lit("spm"))
          .otherwise(lit("plain")))
      // cut points in [1, n-1]; the greatest() guard keeps the modulus
      // positive for the short docs the gate already routed to plain
      .withColumn("c1", col("h1") % greatest(col("n") - 1, lit(1L)) + 1)
      .withColumn("c2", col("h2") % greatest(col("n") - 1, lit(1L)) + 1)
    val split = base.select(col("source"), col("mode"), col("n"),
      when(col("mode") === "plain", col("n"))
        .otherwise(least(col("c1"), col("c2"))).as("p_len"),
      when(col("mode") === "plain", lit(0L))
        .otherwise(greatest(col("c1"), col("c2")) -
          least(col("c1"), col("c2"))).as("m_len"),
      when(col("mode") === "plain", lit(0L))
        .otherwise(col("n") - greatest(col("c1"), col("c2"))).as("s_len"))
    split.groupBy(col("source"), col("mode"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        sum(col("p_len")).as("prefix_tokens"),
        sum(col("m_len")).as("middle_tokens"),
        sum(col("s_len")).as("suffix_tokens"))
      .withColumn("out_tokens",
        col("n_tokens") + when(col("mode") === "plain", lit(0L))
          .otherwise(lit(3L) * col("n_docs")))
      .orderBy("source", "mode")
  }

  val fimSplitOracle: String =
    """WITH base AS (
      |  SELECT source,
      |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) AS h1,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)
      |      AS BIGINT) AS h2
      |  FROM documents
      |), m AS (
      |  SELECT source, n,
      |    CASE WHEN n < 4 THEN 'plain'
      |         WHEN h1 % 10 < 5 THEN 'psm'
      |         WHEN h1 % 10 < 8 THEN 'spm'
      |         ELSE 'plain' END AS mode,
      |    h1 % greatest(n - 1, 1) + 1 AS c1,
      |    h2 % greatest(n - 1, 1) + 1 AS c2
      |  FROM base
      |), sp AS (
      |  SELECT source, mode, n,
      |    CASE WHEN mode = 'plain' THEN n ELSE least(c1, c2) END AS p_len,
      |    CASE WHEN mode = 'plain' THEN 0
      |         ELSE greatest(c1, c2) - least(c1, c2) END AS m_len,
      |    CASE WHEN mode = 'plain' THEN 0
      |         ELSE n - greatest(c1, c2) END AS s_len
      |  FROM m
      |)
      |SELECT source, mode,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS n_tokens,
      |  CAST(sum(p_len) AS BIGINT) AS prefix_tokens,
      |  CAST(sum(m_len) AS BIGINT) AS middle_tokens,
      |  CAST(sum(s_len) AS BIGINT) AS suffix_tokens,
      |  CAST(sum(n) + CASE WHEN mode = 'plain' THEN 0
      |    ELSE 3 * count(*) END AS BIGINT) AS out_tokens
      |FROM sp GROUP BY source, mode ORDER BY source, mode""".stripMargin

  /** q264 — cross-source shingle containment matrix: for every ordered
    * source pair (a, b), the share of a's distinct 5-gram shingles that
    * also occur in b — the directional containment (Broder 1997) that
    * answers "which crawl feeds duplicate each other", the source-level
    * triage BEFORE document-level dedup spends compute (a feed 90%-
    * contained in another can be dropped wholesale). Exact integer ppm.
    *
    * Scale shape: one distinct over (source, shingle) — the zipf-
    * collapsed sufficient statistic — then a self-equality-join on the
    * shingle whose per-key multiplicity is bounded by the SOURCE COUNT
    * (≤ 20 here), never by document frequency: a shingle appearing in a
    * million documents is still one row per source. The matrix
    * aggregate is bounded by |sources|².
    */
  def sourceContainment(s: SparkSession, d: String): DataFrame = {
    val sg = graft.CacheScope.persisted(
      graft.Par.toCores(docs(s, d), col("doc_id"))
        .select(col("source"),
          explode(TextAnalysis.textShingles(col("text"), 5)).as("g"))
        .distinct())
    val sizes = sg.groupBy("source").agg(count(lit(1)).as("n_a"))
    sg.join(sg.select(col("source").as("source_b"), col("g")), Seq("g"))
      .filter(col("source") =!= col("source_b"))
      .groupBy(col("source"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes), Seq("source"))
      .select(col("source").as("source_a"), col("source_b"),
        col("n_common"), col("n_a"),
        // cross-source shared-shingle TYPE counts scale with the
        // corpus's shingle mass: ppm through DECIMAL(38,0)
        expr("CAST(CAST(n_common AS DECIMAL(38,0)) * 1000000" +
          " div n_a AS BIGINT)").as("containment_ppm"))
      .orderBy("source_a", "source_b")
  }

  val sourceContainmentOracle: String =
    """WITH tok AS (
      |  SELECT source, string_split_regex(lower(text), '\s+') AS t
      |  FROM documents
      |), sg AS (
      |  SELECT DISTINCT source, array_to_string(t[i:i+4], ' ') AS g
      |  FROM tok, UNNEST(range(1, len(t) - 3)) AS u(i)
      |  WHERE len(t) >= 5
      |), sizes AS (
      |  SELECT source, count(*) AS n_a FROM sg GROUP BY source
      |), pairs AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    count(*) AS n_common
      |  FROM sg a JOIN sg b ON a.g = b.g AND a.source <> b.source
      |  GROUP BY 1, 2
      |)
      |SELECT source_a, source_b,
      |  CAST(n_common AS BIGINT) AS n_common,
      |  CAST(n_a AS BIGINT) AS n_a,
      |  CAST(n_common * 1000000 // n_a AS BIGINT) AS containment_ppm
      |FROM pairs JOIN sizes ON pairs.source_a = sizes.source
      |ORDER BY source_a, source_b""".stripMargin

  // ------------------------------------------------------- registries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q201_gopher_rules" -> (gopherRules(_, _)),
    "q202_prefix_dedup" -> (prefixDedup(_, _)),
    "q203_market_share" -> (marketShare(_, _)),
    "q204_feature_hashing" -> (featureHashing(_, _)),
    "q205_cv_folds" -> (cvFolds(_, _)),
    "q206_fold_leakage" -> (foldLeakage(_, _)),
    "q207_priority_ship_lag" -> (priorityShipLag(_, _)),
    "q208_top_supplier" -> (topSupplier(_, _)),
    "q209_lsh_band_sweep" -> (lshBandSweep(_, _)),
    "q210_minhash_est_error" -> (minhashEstimateError(_, _)),
    "q211_vocab_growth" -> (vocabGrowth(_, _)),
    "q212_lexical_diversity" -> (lexicalDiversity(_, _)),
    "q213_dedup_mixture_shift" -> (dedupMixtureShift(_, _)),
    "q214_cohort_ltv" -> (cohortLtv(_, _)),
    "q215_seasonal_decompose" -> (seasonalDecompose(_, _)),
    "q216_join_cardinality" -> (joinCardinality(_, _)),
    "q217_running_inventory" -> (runningInventory(_, _)),
    "q218_harmonic_centrality" -> (harmonicCentrality(_, _)),
    "q219_clustering_coeff" -> (clusteringCoefficient(_, _)),
    "q220_weighted_sample" -> (weightedSample(_, _)),
    "q221_partition_balance" -> (partitionBalance(_, _)),
    "q222_encoding_advisor" -> (encodingAdvisor(_, _)),
    "q223_rouge_overlap" -> (rougeOverlap(_, _)),
    "q224_span_corruption" -> (spanCorruption(_, _)),
    "q225_rare_token_retention" -> (rareTokenRetention(_, _)),
    "q226_cluster_overreach" -> (clusterOverreach(_, _)),
    "q227_top_p_vocab" -> (topPVocab(_, _)),
    "q228_chi2_keywords" -> (chi2Keywords(_, _)),
    "q229_decay_popularity" -> (decayPopularity(_, _)),
    "q230_degree_distribution" -> (degreeDistribution(_, _)),
    "q231_backlog_aging" -> (backlogAging(_, _)),
    "q232_jaccard_threshold_curve" -> (jaccardThresholdCurve(_, _)),
    "q233_numeric_correlations" -> (numericCorrelations(_, _)),
    "q234_data_contract" -> (dataContract(_, _)),
    "q235_supplier_hhi" -> (supplierHhi(_, _)),
    "q236_returns_by_brand" -> (returnsByBrand(_, _)),
    "q237_growth_accounting" -> (growthAccounting(_, _)),
    "q238_partition_advisor" -> (partitionAdvisor(_, _)),
    "q239_deseasonalized_growth" -> (deseasonalizedGrowth(_, _)),
    "q240_brand_mix_drift" -> (brandMixDrift(_, _)),
    "q241_token_position_bias" -> (tokenPositionBias(_, _)),
    "q242_revenue_bridge" -> (revenueBridge(_, _)),
    "q243_lorenz_curve" -> (lorenzCurve(_, _)),
    "q244_abc_classification" -> (abcClassification(_, _)),
    "q245_order_consolidation" -> (orderConsolidation(_, _)),
    "q246_knn_label_purity" -> (knnLabelPurity(_, _)),
    "q247_hourly_activity" -> (hourlyActivity(_, _)),
    "q248_bpe_train" -> (bpeTrain(_, _)),
    "q249_doc_chunking" -> (docChunking(_, _)),
    "q256_neighborhood_function" -> (neighborhoodFunction(_, _)),
    "q257_tokenizer_fertility" -> (tokenizerFertility(_, _)),
    "q258_l_diversity" -> (lDiversity(_, _)),
    "q259_theil_sen" -> (theilSen(_, _)),
    "q260_cuped" -> (cuped(_, _)),
    "q261_viterbi_segmentation" -> (viterbiSegmentation(_, _)),
    "q262_neyman_allocation" -> (neymanAllocation(_, _)),
    "q263_fim_split" -> (fimSplit(_, _)),
    "q264_source_containment" -> (sourceContainment(_, _))
  )

  def oracleSql: Map[String, String] = Map(
    "q201_gopher_rules" -> gopherRulesOracle,
    "q202_prefix_dedup" -> prefixDedupOracle,
    "q203_market_share" -> marketShareOracle,
    "q204_feature_hashing" -> featureHashingOracle,
    "q205_cv_folds" -> cvFoldsOracle,
    "q206_fold_leakage" -> foldLeakageOracle,
    "q207_priority_ship_lag" -> priorityShipLagOracle,
    "q208_top_supplier" -> topSupplierOracle,
    "q209_lsh_band_sweep" -> lshBandSweepOracle,
    "q210_minhash_est_error" -> minhashEstimateErrorOracle,
    "q211_vocab_growth" -> vocabGrowthOracle,
    "q212_lexical_diversity" -> lexicalDiversityOracle,
    "q213_dedup_mixture_shift" -> dedupMixtureShiftOracle,
    "q214_cohort_ltv" -> cohortLtvOracle,
    "q215_seasonal_decompose" -> seasonalDecomposeOracle,
    "q216_join_cardinality" -> joinCardinalityOracle,
    "q217_running_inventory" -> runningInventoryOracle,
    "q218_harmonic_centrality" -> harmonicCentralityOracle,
    "q219_clustering_coeff" -> clusteringCoefficientOracle,
    "q220_weighted_sample" -> weightedSampleOracle,
    "q221_partition_balance" -> partitionBalanceOracle,
    "q222_encoding_advisor" -> encodingAdvisorOracle,
    "q223_rouge_overlap" -> rougeOverlapOracle,
    "q224_span_corruption" -> spanCorruptionOracle,
    "q225_rare_token_retention" -> rareTokenRetentionOracle,
    "q226_cluster_overreach" -> clusterOverreachOracle,
    "q227_top_p_vocab" -> topPVocabOracle,
    "q228_chi2_keywords" -> chi2KeywordsOracle,
    "q229_decay_popularity" -> decayPopularityOracle,
    "q230_degree_distribution" -> degreeDistributionOracle,
    "q231_backlog_aging" -> backlogAgingOracle,
    "q232_jaccard_threshold_curve" -> jaccardThresholdCurveOracle,
    "q233_numeric_correlations" -> numericCorrelationsOracle,
    "q234_data_contract" -> dataContractOracle,
    "q235_supplier_hhi" -> supplierHhiOracle,
    "q236_returns_by_brand" -> returnsByBrandOracle,
    "q237_growth_accounting" -> growthAccountingOracle,
    "q238_partition_advisor" -> partitionAdvisorOracle,
    "q239_deseasonalized_growth" -> deseasonalizedGrowthOracle,
    "q240_brand_mix_drift" -> brandMixDriftOracle,
    "q241_token_position_bias" -> tokenPositionBiasOracle,
    "q242_revenue_bridge" -> revenueBridgeOracle,
    "q243_lorenz_curve" -> lorenzCurveOracle,
    "q244_abc_classification" -> abcClassificationOracle,
    "q245_order_consolidation" -> orderConsolidationOracle,
    "q246_knn_label_purity" -> knnLabelPurityOracle,
    "q247_hourly_activity" -> hourlyActivityOracle,
    "q248_bpe_train" -> bpeTrainOracle,
    "q249_doc_chunking" -> docChunkingOracle,
    "q256_neighborhood_function" -> neighborhoodFunctionOracle,
    "q257_tokenizer_fertility" -> tokenizerFertilityOracle,
    "q258_l_diversity" -> lDiversityOracle,
    "q259_theil_sen" -> theilSenOracle,
    "q260_cuped" -> cupedOracle,
    "q261_viterbi_segmentation" -> viterbiSegmentationOracle,
    "q262_neyman_allocation" -> neymanAllocationOracle,
    "q263_fim_split" -> fimSplitOracle,
    "q264_source_containment" -> sourceContainmentOracle
  )
}
