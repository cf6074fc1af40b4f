package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over embedding columns
  * (`array<float>`), computed with built-in higher-order array functions
  * (zip_with/aggregate/transform) in DOUBLE precision.
  *
  * Scale shapes:
  * - brute-force top-k: queries broadcast against the corpus scan — the
  *   corpus never shuffles; cost is |Q|·|C| dot products, the baseline.
  *   Ranking is a bounded top-k AGGREGATION (see [[TopK]]), not a window:
  *   the exchange carries |Q| buffers of k entries, never the |Q|·|C|
  *   scored rows.
  * - sign-LSH blocking: bucket by per-dimension sign bits (axis-aligned
  *   random-hyperplane LSH — portable to any engine because the planes
  *   are the coordinate axes); near-identical vectors land in the same
  *   bucket, turning all-pairs near-dup into an equality join.
  * - IVF: assign every vector to its nearest seed centroid (one bounded
  *   `max_by` aggregation), probe the top-P buckets per query — only
  *   |C|/buckets·P dot products per query instead of |C|.
  */
object SimilarityOps {

  /** Cosine similarity of two float-array columns, computed in double via
    * the native codegen'd expression (graft.expressions.CosineSimilarity).
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.CosineSimilarity.cosine(a, b)

  /** The built-in higher-order-function formulation — semantically and
    * bit-identical to [[cosine]] (same per-accumulator order), but
    * evaluated interpreted; kept as the reference implementation the
    * native expression is tested against.
    */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (s, x) => s + x))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (s, x) => s + x))
    dot / (na * nb)
  }

  /** Deterministic per-group top-k ranking of pre-scored candidates:
    * (group, rank, neighbor_id, sim) with rank 1..k by sim DESC, id ASC.
    * Bounded-buffer aggregation — map-side partials truncate to k before
    * the shuffle (see [[TopK]] for why this replaces the row_number
    * window form at scale).
    */
  private def rankTopK(scored: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame =
    scored.groupBy(col(groupCol))
      .agg(TopK.top_k(col("sim"), col(idCol), k).as("tk"))
      .select(col(groupCol), posexplode(col("tk")))
      .select(col(groupCol), (col("pos") + 1).cast("bigint").as("rank"),
        col("col").getField("id").as("neighbor_id"),
        col("col").getField("sim").as("sim"))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), rank-deterministic via rounded
    * similarity + id tie-break.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("query_vec"), col("embedding")), 4))
    // top-1 as a struct max: identical to the rank-1 row of the TopK
    // aggregate ((sim desc, id asc) ⇔ max of (sim, -id), field-by-field
    // struct comparison), but fully codegen'd with map-side combine —
    // the typed TopK aggregator pays per-row buffer management that
    // dominates candidate-scale inputs when only the argmax is wanted.
    // Unscored candidates (null/NaN sim — e.g. a zero or null embedding
    // makes cosine 0/0) are FILTERED first: TopK drops them
    // (TopK.scala:46), but Spark's double ordering ranks NaN above
    // every real value, so an unfiltered struct max would elect the
    // unscored candidate — and a query whose candidates are all
    // unscored must yield no row here, exactly as its empty TopK
    // buffer explodes to no rows
    if (k == 1)
      scored.filter(col("sim").isNotNull && !isnan(col("sim")))
        .groupBy(col("query_id"))
        .agg(max(struct(col("sim"),
          (-col("vec_id")).cast("long").as("nid"))).as("m"))
        .select(col("query_id"), lit(1L).as("rank"),
          (-col("m.nid")).cast("long").as("neighbor_id"),
          col("m.sim").as("sim"))
    else rankTopK(scored, "query_id", "vec_id", k)
  }

  /** [[bruteForceTopK]] over the first `dims` coordinates only —
    * Matryoshka-style prefix truncation (Kusupati et al. 2022): MRL-
    * trained embeddings keep most ranking signal in their leading
    * coordinates, so serving can score at a fraction of the dimension
    * (and memory bandwidth) and re-rank survivors at full width. Same
    * broadcast/no-corpus-shuffle shape as the full-width scorer; the
    * slice happens inside the scoring expression, so the corpus column
    * is never materialized twice.
    */
  def truncatedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dims: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(
        slice(col("query_vec"), 1, dims), slice(col("embedding"), 1, dims)), 4))
    rankTopK(scored, "query_id", "vec_id", k)
  }

  /** Sign-bit binary quantization of a 64-dim float vector: bit i set
    * iff v[i] > 0, stored as TWO 32-bit halves in BIGINT columns so no
    * engine ever touches a sign bit (64 dims → 8 bytes, a 32×
    * compression over float32 — the 1-bit regime of the quantization
    * ladder q72/q102 start). Scan-local: an `aggregate` fold over a
    * bounded literal sequence — no explode, no shuffle; at 100 TB this
    * is a map-only re-encode of the corpus.
    */
  def withSignCode(df: DataFrame, vecCol: String, h1: String,
      h2: String): DataFrame =
    df.withColumn(h1, expr(
        s"aggregate(sequence(0, 31), 0L, (acc, i) -> acc + " +
          s"IF(element_at($vecCol, i + 1) > 0.0, shiftleft(1L, i), 0L))"))
      .withColumn(h2, expr(
        s"aggregate(sequence(32, 63), 0L, (acc, i) -> acc + " +
          s"IF(element_at($vecCol, i + 1) > 0.0, shiftleft(1L, i - 32), 0L))"))

  /** Hamming-distance top-k over sign codes: queries (query_id, qh1,
    * qh2) against packed corpus (vec_id, h1, h2). Distance is two XORs
    * and two popcounts per candidate — the cheapest possible first-pass
    * ranking, which is the point: at serving scale the float corpus
    * never loads, only 8 bytes/vector. Deterministic ties (distance
    * asc, id asc). Returns (query_id, rank, neighbor_id, hamming).
    */
  def hammingTopK(queries: DataFrame, packed: DataFrame,
      k: Int): DataFrame = {
    val scored = packed.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim",
        -(expr("bit_count(h1 ^ qh1) + bit_count(h2 ^ qh2)").cast("double")))
    rankTopK(scored, "query_id", "vec_id", k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (-col("sim")).cast("bigint").as("hamming"))
  }

  /** Rank of the FIRST relevant result per query (relevant = corpus
    * `label` equals the query's `query_label`) and its reciprocal —
    * the ingredients of MRR, retrieval's standard first-hit metric.
    * NO ranking window anywhere: the best relevant neighbor is a
    * lexicographic max aggregate over (sim, −id), and its rank is
    * 1 + count of strictly-better neighbors — two map-combinable
    * aggregates, so a query's full candidate list never materializes in
    * one partition (a rank window partitioned by query would put an
    * entire corpus-sized partition behind each of the few queries).
    * Queries broadcast; the corpus never shuffles. A query whose label
    * never occurs elsewhere reports rank 0 / rr 0.
    */
  def mrrFirstRelevant(queries: DataFrame, corpus: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("query_vec"), col("embedding")), 4))
      // drop unscored candidates (null/NaN sim from a zero or null
      // embedding) exactly as [[bruteForceTopK]] does: NaN orders above
      // every real value in Spark, so an unfiltered zero vector would
      // rank FIRST for every query — elected "first relevant" when it
      // shares the label, and counted as a strictly-better neighbor
      // (deflating MRR) when it does not
      .filter(col("sim").isNotNull && !isnan(col("sim")))
    val best = scored.filter(col("label") === col("query_label"))
      .groupBy(col("query_id"))
      .agg(max(struct(col("sim"), (-col("vec_id")).as("nv"))).as("b"))
      .select(col("query_id"), col("b.sim").as("bsim"),
        (-col("b.nv")).as("bvec"))
    scored.join(broadcast(best), Seq("query_id"), "left")
      .groupBy(col("query_id"))
      .agg(first(col("query_label")).as("label"),
        when(first(col("bsim")).isNull, 0L)
          .otherwise(sum(when(col("sim") > col("bsim") ||
              (col("sim") === col("bsim") && col("vec_id") < col("bvec")), 1L)
            .otherwise(0L)) + 1)
          .as("first_rel_rank"))
      .select(col("query_id"), col("label"),
        col("first_rel_rank").cast("bigint").as("first_rel_rank"),
        expr("CASE WHEN first_rel_rank = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE CAST(1000000 div first_rel_rank AS BIGINT) END").as("rr_ppm"))
  }

  /** Brute-force EXACT squared-L2 top-k — the truth baseline for
    * L2-metric indexes (IVF-PQ ranks by L2, so its recall audit must
    * compare against L2 truth, not cosine truth: the two metrics rank
    * differently on unnormalized vectors). Fold-ordered double sums, id
    * tie-break — bit-reproducible, no rounding needed. Same scale shape
    * as [[bruteForceTopK]].
    */
  def bruteForceTopKL2(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", -l2sq(col("query_vec").cast("array<double>"),
        col("embedding").cast("array<double>")))
    rankTopK(scored, "query_id", "vec_id", k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (-col("sim")).as("l2_dist"))
  }

  /** Predicate-filtered brute-force top-k — the "filtered vector
    * search" every retrieval stack needs (metadata constraints on ANN:
    * tenant, language, freshness … or, as in hard-negative mining,
    * a DIFFERENT class label than the query). The predicate applies
    * BEFORE ranking, so the top-k is over the eligible subset — running
    * plain top-k and filtering after would under-fill k. Same scale
    * shape as [[bruteForceTopK]]: queries broadcast, corpus never
    * shuffles, bounded top-k aggregation, and the predicate fuses into
    * the scan's codegen stage.
    */
  def filteredTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      keep: Column): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .filter(keep)
      .withColumn("sim", round(cosine(col("query_vec"), col("embedding")), 4))
    rankTopK(scored, "query_id", "vec_id", k)
  }

  /** Int8 scalar quantization with a fixed [-1, 1] → [-127, 127] scale:
    * q[d] = floor(v[d] · 127). The 100 TB memory lever for ANN — 4×
    * smaller vectors (and integer SIMD dot products on real hardware)
    * at a bounded rank error. Float→double is exact and double·127 is
    * correctly rounded, so the quantized codes are bit-identical in any
    * IEEE engine — unlike a trained codebook, nothing here depends on
    * iteration order.
    */
  def quantize8(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(127)).cast("long"))

  /** Brute-force top-k over int8-quantized codes: integer dot products
    * (exact — no float ordering anywhere), rank by dot DESC with id
    * tie-break. Same scale shape as [[bruteForceTopK]]: queries
    * broadcast, corpus never shuffles, bounded top-k aggregation.
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val qq = queries.select(col("query_id"), quantize8(col("query_vec")).as("qv"))
    val cc = corpus.select(col("vec_id"), quantize8(col("embedding")).as("cv"))
    val scored = cc.crossJoin(broadcast(qq))
      .filter(col("query_id") =!= col("vec_id"))
      // integer dot as the TopK sort key: values ≤ 127²·dims ≪ 2⁵³, so
      // the double carrier is exact
      .withColumn("sim",
        aggregate(zip_with(col("qv"), col("cv"), (x, y) => x * y),
          lit(0L), (s, x) => s + x).cast("double"))
    rankTopK(scored, "query_id", "vec_id", k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("sim").cast("bigint").as("qdot"))
  }

  /** Split a double-array column into `m` contiguous subvectors of
    * `subDim` dims each: (…, s, sub) rows via one transform+posexplode.
    */
  private def subvectors(v: Column, m: Int, subDim: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      s => slice(v, s * subDim + 1, lit(subDim)))

  /** Exact squared L2 between two double arrays, folded in index order
    * (0 + t₁ + t₂ + … — every term ≥ 0, so the seed add is exact and the
    * whole fold is bit-reproducible in any IEEE engine).
    */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, x) => s + x)

  /** Product-quantization codebook from seed vectors: centroid `j` of
    * subspace `s` is seed vector j's s-th subvector (seeds = the first
    * `kCodes` ids). A production build would Lloyd-train each subspace
    * (see [[kmeansCentroids]]); the seeded codebook is deterministic and
    * engine-replayable, which is what puts the WHOLE PQ pipeline —
    * encode and ADC ranking — under an exact oracle. Returns
    * (s, j, cent: array<double>).
    */
  def pqCodebook(emb: DataFrame, m: Int, subDim: Int, kCodes: Int): DataFrame =
    emb.filter(col("vec_id") < kCodes)
      .select(col("vec_id").as("j"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("j"), posexplode(subvectors(col("v"), m, subDim)))
      .select(col("pos").as("s"), col("j"), col("col").as("cent"))

  /** PQ encode: each corpus vector → `m` small codes (argmin-L2 centroid
    * per subspace, id tie-break). The 100 TB memory lever beyond int8
    * SQ: 64-dim float32 → 8 byte codes is 32×. One broadcast of the
    * (m·k)-row codebook against the corpus scan, folded into a bounded
    * `min_by` — the corpus never shuffles wider than (vec_id, s).
    * Returns (vec_id, s, code).
    */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, m: Int,
      subDim: Int): DataFrame =
    corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), posexplode(subvectors(col("v"), m, subDim)))
      .select(col("vec_id"), col("pos").as("s"), col("col").as("sub"))
      .join(broadcast(codebook), "s")
      .withColumn("d2", l2sq(col("sub"), col("cent")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(col("j"), struct(col("d2"), col("j"))).as("code"))

  /** PQ top-k via asymmetric distance computation (ADC): per query, a
    * lookup table of EXACT query-to-centroid distances (|Q|·m·k rows —
    * broadcast-sized by construction), joined to the corpus codes on
    * (subspace, code) equality, so corpus vectors are ranked WITHOUT
    * ever being decoded. The per-vector distance sums its m subspace
    * terms in fixed subspace order (conditional aggregates + one
    * left-associated add chain), keeping the doubles bit-reproducible
    * on any partitioning. Rank by distance ASC, id tie-break.
    */
  def pqTopK(corpus: DataFrame, codebook: DataFrame, queries: DataFrame,
      k: Int, m: Int, subDim: Int): DataFrame = {
    val enc = pqEncode(corpus, codebook, m, subDim)
    val lut = queries.select(col("query_id"),
        col("query_vec").cast("array<double>").as("v"))
      .select(col("query_id"), posexplode(subvectors(col("v"), m, subDim)))
      .select(col("query_id"), col("pos").as("ls"), col("col").as("qsub"))
      .join(broadcast(codebook), col("ls") === col("s"))
      .select(col("query_id"), col("ls"), col("j"),
        l2sq(col("qsub"), col("cent")).as("dq"))
    val partials = enc.join(broadcast(lut),
        col("s") === col("ls") && col("code") === col("j"))
      .filter(col("vec_id") =!= col("query_id"))
    val sums = (0 until m).map(i =>
      sum(when(col("s") === i, col("dq"))).as(s"d_$i"))
    val scored = partials.groupBy(col("query_id"), col("vec_id"))
      .agg(sums.head, sums.tail: _*)
      .withColumn("sim", -(0 until m).map(i => col(s"d_$i")).reduce(_ + _))
    rankTopK(scored, "query_id", "vec_id", k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (-col("sim")).as("pq_dist"))
  }

  /** IVF-PQ: the production ANN composite (Jégou et al. 2011's IVFADC) —
    * an inverted-file coarse quantizer partitions the corpus, and product
    * quantization compresses the RESIDUAL (v − coarse centroid), which
    * carries far less variance than v itself, so the same code budget
    * quantizes finer. At 100 TB this is THE serving layout: queries probe
    * `probes` coarse buckets (pruning |C|·(1 − probes/kCoarse) of the
    * corpus before any ranking) and rank 8-byte codes via ADC lookup
    * tables — never decoding, never shuffling the corpus (assignment is
    * one bounded min_by; encode and ADC are broadcast joins).
    *
    * Both quantizers are seeded (coarse centroid j = vector j; residual
    * codebook entry j = seed (kCoarse+j)'s residual subvector), and every
    * distance is a fold-ordered double sum — so encode, probe, and ADC
    * ranking all replay bit-exactly in another engine: the oracle
    * certifies the whole composite index, not a tolerance band.
    * Returns (query_id, rank, neighbor_id, ivfpq_dist).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      kCoarse: Int, probes: Int, m: Int, subDim: Int,
      kCodes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cd = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val coarse = cd.filter(col("vec_id") < kCoarse)
      .select(col("vec_id").as("cj"), col("v").as("cvec"))
    // coarse assignment: argmin fold-ordered L2 (cj tie-break), residual
    // computed in the same pass — corpus rows never shuffle wider than 1
    val assigned = cd.crossJoin(broadcast(coarse))
      .withColumn("cd2", l2sq(col("v"), col("cvec")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cj"), col("cvec")),
          struct(col("cd2"), col("cj"))).as("cc"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("cc").getField("cj").as("bucket"),
        zip_with(col("v"), col("cc").getField("cvec"),
          (a, b) => a - b).as("rv"))
    // residual codebook: seeds kCoarse..kCoarse+kCodes-1 — their residuals
    // are nonzero (unlike the coarse seeds', which are exactly 0)
    val codebook = assigned
      .filter(col("vec_id") >= kCoarse && col("vec_id") < kCoarse + kCodes)
      .select((col("vec_id") - kCoarse).as("j"),
        posexplode(subvectors(col("rv"), m, subDim)))
      .select(col("pos").as("s"), col("j"), col("col").as("cent"))
    val enc = assigned
      .select(col("vec_id"), col("bucket"),
        posexplode(subvectors(col("rv"), m, subDim)))
      .select(col("vec_id"), col("bucket"), col("pos").as("s"),
        col("col").as("sub"))
      .join(broadcast(codebook), "s")
      .withColumn("d2", l2sq(col("sub"), col("cent")))
      .groupBy(col("vec_id"), col("bucket"), col("s"))
      .agg(min_by(col("j"), struct(col("d2"), col("j"))).as("code"))
    // probe: per-query top-P coarse buckets (partition-bounded window —
    // kCoarse rows per query), query residual vs each probed centroid
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cd2"), col("cj"))
    val probed = queries
      .select(col("query_id"), col("query_vec").cast("array<double>").as("qv"))
      .crossJoin(broadcast(coarse))
      .withColumn("cd2", l2sq(col("qv"), col("cvec")))
      .withColumn("rn", row_number().over(pw)).filter(col("rn") <= probes)
      .select(col("query_id"), col("cj").as("bucket"),
        zip_with(col("qv"), col("cvec"), (a, b) => a - b).as("qrv"))
    ivfPqRank(enc, codebook, probed, k, m, subDim)
  }

  /** The shared ADC ranking tail of IVF-PQ: per-(query, probed-bucket)
    * residual LUT joined to the bucket-restricted codes on
    * (bucket, subspace, code) equality, distances summed in fixed
    * subspace order — bit-identical whether `enc` comes from the
    * in-query composite ([[ivfPqTopK]]) or the persisted index
    * ([[queryIvfPqIndex]]).
    */
  private def ivfPqRank(enc: DataFrame, codebook: DataFrame,
      probed: DataFrame, k: Int, m: Int, subDim: Int): DataFrame = {
    val lut = probed
      .select(col("query_id"), col("bucket"),
        posexplode(subvectors(col("qrv"), m, subDim)))
      .select(col("query_id"), col("bucket"), col("pos").as("ls"),
        col("col").as("qsub"))
      .join(broadcast(codebook), col("ls") === col("s"))
      .select(col("query_id"), col("bucket").as("lb"), col("ls"), col("j"),
        l2sq(col("qsub"), col("cent")).as("dq"))
    val partials = enc.join(broadcast(lut),
        col("bucket") === col("lb") && col("s") === col("ls") &&
          col("code") === col("j"))
      .filter(col("vec_id") =!= col("query_id"))
    val sums = (0 until m).map(i =>
      sum(when(col("s") === i, col("dq"))).as(s"d_$i"))
    val scored = partials.groupBy(col("query_id"), col("vec_id"))
      .agg(sums.head, sums.tail: _*)
      .withColumn("sim", -(0 until m).map(i => col(s"d_$i")).reduce(_ + _))
    rankTopK(scored, "query_id", "vec_id", k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (-col("sim")).as("ivfpq_dist"))
  }

  /** Persist an IVF-PQ index: coarse centroids and residual codebook as
    * broadcast-sized sidecars, and the corpus CODES (vec_id, s, code)
    * written `partitionBy(bucket)` — 8-byte codes per vector on disk,
    * one directory per coarse cell. At 100 TB this is the layout the
    * scaladoc of [[ivfPqTopK]] promises: the assignment + encode scan
    * is paid ONCE at build; every query batch reads only its probed
    * cells' code directories (partition pruning) and never touches a
    * raw embedding.
    */
  def buildIvfPqIndex(emb: DataFrame, indexDir: String, kCoarse: Int,
      m: Int, subDim: Int, kCodes: Int): Unit = {
    val cd = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val coarse = cd.filter(col("vec_id") < kCoarse)
      .select(col("vec_id").as("cj"), col("v").as("cvec"))
    val assigned = graft.CacheScope.persisted(
      cd.crossJoin(broadcast(coarse))
        .withColumn("cd2", l2sq(col("v"), col("cvec")))
        .groupBy(col("vec_id"))
        .agg(min_by(struct(col("cj"), col("cvec")),
            struct(col("cd2"), col("cj"))).as("cc"),
          first(col("v")).as("v"))
        .select(col("vec_id"), col("cc").getField("cj").as("bucket"),
          zip_with(col("v"), col("cc").getField("cvec"),
            (a, b) => a - b).as("rv")))
    val codebook = assigned
      .filter(col("vec_id") >= kCoarse && col("vec_id") < kCoarse + kCodes)
      .select((col("vec_id") - kCoarse).as("j"),
        posexplode(subvectors(col("rv"), m, subDim)))
      .select(col("pos").as("s"), col("j"), col("col").as("cent"))
    coarse.write.mode("overwrite").parquet(s"$indexDir/coarse")
    codebook.write.mode("overwrite").parquet(s"$indexDir/codebook")
    assigned
      .select(col("vec_id"), col("bucket"),
        posexplode(subvectors(col("rv"), m, subDim)))
      .select(col("vec_id"), col("bucket"), col("pos").as("s"),
        col("col").as("sub"))
      .join(broadcast(codebook), "s")
      .withColumn("d2", l2sq(col("sub"), col("cent")))
      .groupBy(col("vec_id"), col("bucket"), col("s"))
      .agg(min_by(col("j"), struct(col("d2"), col("j"))).as("code"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/codes")
  }

  /** Query a persisted IVF-PQ index, bit-identical to the in-query
    * [[ivfPqTopK]] composite. The probed coarse-cell set is collected
    * to the driver — bounded by kCoarse, never by data — and applied as
    * a literal `isin` filter so the codes scan statically prunes to the
    * probed partition directories; m and subDim are derived from the
    * persisted codebook (one broadcast-sized read), so the caller needs
    * no build-time parameters.
    */
  def queryIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, queries: DataFrame, k: Int,
      probes: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coarse = spark.read.parquet(s"$indexDir/coarse")
    val codebook = spark.read.parquet(s"$indexDir/codebook")
    val shape = codebook
      .select(max(col("s")).as("ms"), max(size(col("cent"))).as("sd"))
      .collect()(0)
    val (m, subDim) = (shape.getInt(0) + 1, shape.getInt(1))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cd2"), col("cj"))
    val probed = graft.CacheScope.persisted(queries
      .select(col("query_id"), col("query_vec").cast("array<double>").as("qv"))
      .crossJoin(broadcast(coarse))
      .withColumn("cd2", l2sq(col("qv"), col("cvec")))
      .withColumn("rn", row_number().over(pw)).filter(col("rn") <= probes)
      .select(col("query_id"), col("cj").as("bucket"),
        zip_with(col("qv"), col("cvec"), (a, b) => a - b).as("qrv")))
    // partition-column type inference may narrow bucket to int on read —
    // normalize to long for the literal filter
    val buckets = probed.select(col("bucket").cast("long")).distinct()
      .collect().map(_.getLong(0))
    val enc = spark.read.parquet(s"$indexDir/codes")
      .filter(col("bucket").isin(buckets: _*))
    ivfPqRank(enc, codebook, probed, k, m, subDim)
  }

  /** Exact distributed Lloyd's k-means over INTEGER-quantized embeddings
    * — the clustering primitive behind SemDeDup blocking, IVF coarse
    * quantizers, and data-mixture cluster balancing, with every step
    * under an exact cross-engine oracle (unlike [[kmeansCentroids]],
    * whose float means are only rounding-stable):
    *
    *  - quantize: q[d] = floor(v[d] · 1000) (float→double exact,
    *    double·1000 correctly rounded, floor exact → bit-identical in
    *    any IEEE engine);
    *  - init: the first k vectors by id, cluster ids 0..k-1 in id order;
    *  - assign: argmin integer squared-L2 (ties → lower cluster id) —
    *    a pure projection over a BROADCAST of k literal centroids, the
    *    corpus never shuffles;
    *  - update: per-dimension floor-divided integer mean
    *    (Math.floorDiv(sum, n)) via ONE map-combinable aggregation of
    *    k·dims sums (k rows, dims sum columns — no explode); empty
    *    clusters keep their previous centroid.
    *
    * Driver traffic per iteration is k·dims longs — bounded by the
    * centroid count, never by data, the same shape any distributed
    * k-means (Spark MLlib included) uses. Returns per-cluster stats
    * under the FINAL assignment: (cluster, n_members, inertia = Σ
    * squared-L2 to the assigned pre-update centroid, centroid_l1 = Σ|c|
    * of the post-update centroid). Inertia rides a DECIMAL(38,0)
    * carrier internally (Σ over 100 TB of ~10⁸-scale distances wraps
    * BIGINT) and is cast to BIGINT in the final projection.
    */
  def kmeansExactStats(embDf: DataFrame, k: Int, dims: Int,
      iters: Int): DataFrame = {
    val (assigned, cents) = kmeansCore(embDf, k, dims, iters)
    val l1 = cents.map { case (cid, cv) =>
      (cid.toLong, cv.map(math.abs).sum) }
    val l1Df = broadcast(
      embDf.sparkSession.createDataFrame(l1).toDF("cl", "centroid_l1"))
    assigned.groupBy(col("cl"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist").cast("decimal(38,0)")).as("inertia_d"))
      .join(l1Df, "cl")
      .select(col("cl").as("cluster"),
        col("n_members").cast("bigint").as("n_members"),
        col("inertia_d").cast("bigint").as("inertia"),
        col("centroid_l1").cast("bigint").as("centroid_l1"))
      .orderBy("cluster")
  }

  /** The final per-vector assignment of [[kmeansExactStats]]'s run:
    * (vec_id, cluster, dist) under the last Lloyd round's centroids —
    * the input to cluster-balanced selection, SemDeDup blocking, or
    * exemplar extraction.
    */
  def kmeansAssignments(embDf: DataFrame, k: Int, dims: Int,
      iters: Int): DataFrame =
    kmeansCore(embDf, k, dims, iters)._1
      .select(col("vec_id"), col("cl").as("cluster"), col("dist"))

  /** Shared Lloyd loop: returns (final assignment (vec_id, qv, cl, dist),
    * post-update centroids).
    */
  private def kmeansCore(embDf: DataFrame, k: Int, dims: Int,
      iters: Int): (DataFrame, Seq[(Int, Array[Long])]) = {
    // the assignment table only exists after round 1 — iters=0 would
    // return a null DataFrame that NPEs in the caller with no hint
    // that the iteration count was the problem
    require(iters >= 1, s"kmeans needs at least one iteration, got $iters")
    val eq = graft.CacheScope.persisted(
      embDf.select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1000).cast("long")).as("qv")))
    var cents: Seq[(Int, Array[Long])] =
      eq.orderBy("vec_id").limit(k).collect()
        .sortBy(_.getLong(0)).zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Long](1).toArray) }.toSeq

    def assign(c: Seq[(Int, Array[Long])]): DataFrame = {
      val scored = c.map { case (cid, cv) =>
        struct(
          aggregate(
            zip_with(col("qv"), array(cv.map(lit(_)): _*),
              (x, cc) => (x - cc) * (x - cc)),
            lit(0L), (s, x) => s + x).as("dist"),
          lit(cid.toLong).as("cl"))
      }
      eq.select(col("vec_id"), col("qv"), least(scored: _*).as("best"))
        .select(col("vec_id"), col("qv"),
          col("best").getField("cl").as("cl"),
          col("best").getField("dist").as("dist"))
    }

    def update(a: DataFrame,
        prev: Seq[(Int, Array[Long])]): Seq[(Int, Array[Long])] = {
      val sumCols = (0 until dims).map(i =>
        sum(element_at(col("qv"), i + 1)).as(s"s$i"))
      val byCl = a.groupBy(col("cl"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect().map { r =>
          val n = r.getLong(1)
          r.getLong(0).toInt ->
            (0 until dims).map(i => Math.floorDiv(r.getLong(2 + i), n)).toArray
        }.toMap
      prev.map { case (cid, cv) => (cid, byCl.getOrElse(cid, cv)) }
    }

    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = assign(cents)
      cents = update(assigned, cents)
    }
    (assigned, cents)
  }

  /** Deterministic Johnson-Lindenstrauss sign projection: y[j] = Σ_i
    * R[j][i] · q[i] with R a ±1 matrix derived from md5 parities (the
    * Achlioptas 2001 database-friendly JL construction — ±1 entries
    * preserve pairwise distances in expectation as well as Gaussians).
    * The input is the floor(×1000) integer quantization, so every
    * projected coordinate is an EXACT integer — the projection replays
    * bit-for-bit in any engine with md5, and downstream ANN (LSH
    * bucketing, coarse quantizers) can run in the reduced space at
    * outDims/dims of the memory and dot-product cost.
    *
    * Scale shape: the sign matrix is outDims·dims literal ±1s baked into
    * the plan (a few KB — no join, no shuffle, no driver traffic at
    * eval time); the projection is one codegen'd projection over the
    * corpus scan.
    */
  def jlProject(embDf: DataFrame, dims: Int, outDims: Int): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, i: Int): Long = {
      // first hex nibble of md5("<j>_<i>") — mirrors the SQL oracle's
      // substr(md5(...), 1, 1); 0-7 → +1, 8-f → -1
      val h = md.digest(s"${j}_$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0x8) == 0) 1L else -1L
    }
    val q = transform(col("embedding").cast("array<double>"),
      x => floor(x * 1000).cast("long"))
    val ys = (0 until outDims).map { j =>
      val row = array((1 to dims).map(i => lit(sign(j, i))): _*)
      aggregate(zip_with(q, row, (x, s) => x * s), lit(0L), (s, x) => s + x)
    }
    embDf.select(col("vec_id"), posexplode(array(ys: _*)))
      .select(col("vec_id"), col("pos").cast("bigint").as("dim"),
        col("col").as("y"))
  }

  /** Sign-LSH bucket key over the first `dims` dimensions: bit d set iff
    * v[d] > 0. Scale-invariant, so exact and scaled duplicates share a
    * bucket. 16 bits by default → 65,536 buckets: within-bucket all-pairs
    * work stays sub-quadratic far longer than the 256-bucket 8-bit key
    * (expected bucket size |C|/2^dims, so candidate pairs scale as
    * |C|²/2^dims — every extra bit halves them).
    */
  def signBucket(v: Column, dims: Int = 16): Column =
    (1 to dims).map(d =>
      when(element_at(v, d) > 0f, lit(1L << (d - 1))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Embedding near-duplicate pairs: sign-LSH bucket equality join, then
    * exact cosine ≥ threshold verification within buckets.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.999,
      dims: Int = 16): DataFrame = {
    val b = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), dims).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(cosine(col("a.embedding"), col("b.embedding")), 4))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("sim"))
  }

  /** Nearest-seed assignment: every vector keyed to its best seed by
    * rounded cosine (seed_id tie-break) via ONE `max_by` aggregation over
    * the k-seed cross product — identical result to the
    * `row_number()=1` window but the exchange carries |C| rows, not
    * |C|·k scored rows.
    */
  private def assignNearestSeed(vecs: DataFrame, seeds: DataFrame,
      vecCol: String, idCol: String): DataFrame =
    vecs.crossJoin(broadcast(seeds))
      .withColumn("s6", round(cosine(col(vecCol), col("seed_vec")), 6))
      .groupBy(col(idCol))
      .agg(
        max_by(col("seed_id"), struct(col("s6"), (-col("seed_id")).as("nid")))
          .as("bucket"),
        first(col(vecCol)).as(vecCol))

  /** Deterministic k-means centroid training for IVF: init from the
    * first k vectors by id, then `iters` Lloyd rounds — assign every
    * vector to its nearest centroid by cosine (id tie-break), recompute
    * centroids as element-wise means. Entirely DataFrame ops: assignment
    * is a broadcast of k centroids against the corpus scan folded into a
    * bounded `max_by` aggregation; the update is one posexplode + two
    * keyed aggregations. Deterministic: same data → same centroids, any
    * partitioning (the assignment argmax is computed on rounded
    * similarity, and centroid means feed back only through that rounding
    * — stable in practice and covered by the determinism spec).
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    var centroids = emb.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("seed_id"),
        col("embedding").cast("array<double>").as("seed_vec"))
    for (_ <- 0 until iters) {
      val assigned = assignNearestSeed(emb, centroids, "embedding", "vec_id")
        .select(col("bucket").as("seed_id"),
          col("embedding").cast("array<double>").as("v"))
      val updated = assigned
        .select(col("seed_id"), posexplode(col("v")))
        .groupBy(col("seed_id"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("seed_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("seed_vec"))
      // a cluster that attracted zero vectors this round keeps its
      // PREVIOUS centroid (standard Lloyd, and kmeansCore's behavior)
      // instead of vanishing: the groupBy emits only assigned seed_ids,
      // and a dropped centroid would silently shrink every later round
      // and the IVF index built on it from k buckets to fewer
      centroids = centroids.as("c")
        .join(updated.as("u"), col("c.seed_id") === col("u.seed_id"), "left")
        .select(col("c.seed_id").as("seed_id"),
          coalesce(col("u.seed_vec"), col("c.seed_vec")).as("seed_vec"))
    }
    centroids
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * cluster the embedding space, compare vectors only WITHIN their
    * cluster, and flag every vector that has a lower-id cluster-mate with
    * cosine ≥ `threshold`. Cluster blocking is what makes semantic dedup
    * tractable at 100 TB: with k ∝ √N centroids the within-cluster pair
    * count stays near-linear instead of the N² of all-pairs, the
    * assignment is the same bounded `max_by` aggregation as IVF (corpus
    * never shuffles wider than one row per vector), and the pair
    * generation is an equality join on the cluster key. Returns
    * (vec_id, bucket, is_dup) for every input vector — callers keep the
    * `is_dup = 0` set (the semantic representatives).
    */
  def semanticDedup(emb: DataFrame, seeds: DataFrame,
      threshold: Double = 0.99): DataFrame = {
    // the assignment feeds both sides of the pair join and the final
    // projection — persist it, or the k-cosine assignment scan reruns 3×
    val assigned = graft.CacheScope.persisted(
      assignNearestSeed(emb, seeds, "embedding", "vec_id"))
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(cosine(col("a.embedding"), col("b.embedding")), 4))
      .filter(col("sim") >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.join(dropped.withColumn("is_dup", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"),
        coalesce(col("is_dup"), lit(0L)).as("is_dup"))
  }

  /** IVF-style ANN: `seeds` are the centroid set (bootstrap via
    * [[kmeansCentroids]] or any deterministic pick). Every corpus vector
    * is assigned to its nearest seed (bounded `max_by` aggregation); each
    * query probes its `probes` nearest seed buckets (bounded [[TopK]]
    * aggregation) and ranks only those vectors.
    */
  def ivfTopK(corpus: DataFrame, seeds: DataFrame, queries: DataFrame,
      k: Int, probes: Int = 2): DataFrame = {
    val assigned = assignNearestSeed(corpus, seeds, "embedding", "vec_id")
    rankProbed(assigned, seeds, queries, k, probes)
  }

  /** [[ivfTopK]] for SEVERAL probe counts in ONE pipeline: because the
    * probed-bucket list for p probes is the length-p PREFIX of the same
    * deterministic bucket ranking, a probe sweep needs exactly one
    * corpus assignment, one bucket ranking at max(probes), and one
    * scored candidate table — each candidate row fans out to the tag of
    * every probe count whose prefix contains its bucket. The per-probe
    * loop this replaces rebuilt the assignment and re-ranked per count
    * (3× the jobs and stages for byte-identical results). Returns
    * (probes, query_id, rank, neighbor_id, sim).
    */
  def ivfTopKSweep(corpus: DataFrame, seeds: DataFrame, queries: DataFrame,
      k: Int, probesList: Seq[Int]): DataFrame = {
    val maxP = probesList.max
    val assigned = assignNearestSeed(corpus, seeds, "embedding", "vec_id")
    val probed = queries.crossJoin(broadcast(seeds))
      .withColumn("s6", round(cosine(col("query_vec"), col("seed_vec")), 6))
      .groupBy(col("query_id"))
      .agg(TopK.top_k(col("s6"), col("seed_id"), maxP).as("tk"),
        first(col("query_vec")).as("query_vec"))
      .select(col("query_id"), col("query_vec"),
        posexplode(col("tk").getField("id")))
      .select(col("query_id"), col("query_vec"),
        (col("pos") + 1).as("rn"), col("col").as("bucket"))
    val pArr = array(probesList.map(lit): _*)
    val scored = probed.join(assigned, "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("query_vec"), col("embedding")), 4))
      .withColumn("probes", explode(filter(pArr, p => p >= col("rn"))))
    scored.groupBy(col("probes"), col("query_id"))
      .agg(TopK.top_k(col("sim"), col("vec_id"), k).as("tk"))
      .select(col("probes"), col("query_id"), posexplode(col("tk")))
      .select(col("probes").cast("bigint").as("probes"), col("query_id"),
        (col("pos") + 1).cast("bigint").as("rank"),
        col("col").getField("id").as("neighbor_id"),
        col("col").getField("sim").as("sim"))
  }

  /** The per-query probed-bucket table: (query_id, query_vec, bucket)
    * for each query's `probes` nearest seeds (shared by [[rankProbed]]
    * and the persisted-index path, which also collects the distinct
    * buckets for partition pruning — computing this ONCE, not once per
    * consumer, halves the |Q|×|seeds| scoring cross-join).
    */
  private def probeBuckets(seeds: DataFrame, queries: DataFrame,
      probes: Int): DataFrame =
    queries.crossJoin(broadcast(seeds))
      .withColumn("s6", round(cosine(col("query_vec"), col("seed_vec")), 6))
      .groupBy(col("query_id"))
      .agg(TopK.top_k(col("s6"), col("seed_id"), probes).as("tk"),
        first(col("query_vec")).as("query_vec"))
      .select(col("query_id"), col("query_vec"),
        explode(col("tk").getField("id")).as("bucket"))

  /** Rank a precomputed probed-bucket table against an assignment
    * table (shared by [[ivfTopK]] and the persisted-index path).
    */
  private def rankProbedBuckets(assigned: DataFrame,
      probed: DataFrame, k: Int): DataFrame = {
    val scored = probed.join(assigned, "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("query_vec"), col("embedding")), 4))
    rankTopK(scored, "query_id", "vec_id", k)
  }

  /** Probe + rank against an existing assignment table (shared by
    * [[ivfTopK]] and the persisted-index path).
    */
  private def rankProbed(assigned: DataFrame, seeds: DataFrame,
      queries: DataFrame, k: Int, probes: Int): DataFrame =
    rankProbedBuckets(assigned, probeBuckets(seeds, queries, probes), k)

  /** Persist an IVF index: trained centroids plus the corpus assignment
    * table written `partitionBy(bucket)` — one directory per centroid.
    * Building pays the assignment scan ONCE; every later query batch
    * reads only its probed buckets' directories (partition pruning),
    * instead of re-assigning a 100 TB corpus per query.
    */
  def buildIvfIndex(emb: DataFrame, indexDir: String, k: Int,
      iters: Int = 3): Unit = {
    val centroids = kmeansCentroids(emb, k, iters)
    centroids.write.mode("overwrite").parquet(s"$indexDir/centroids")
    assignNearestSeed(emb, centroids, "embedding", "vec_id")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/assignments")
  }

  /** Query a persisted IVF index. The probed bucket set is collected to
    * the driver — bounded by the centroid count k, never by data — and
    * applied as a literal `isin` filter, so the assignments scan
    * statically prunes to the probed partition directories.
    */
  def queryIvfIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, k: Int, probes: Int = 2): DataFrame = {
    val seeds = spark.read.parquet(s"$indexDir/centroids")
    val assigned = spark.read.parquet(s"$indexDir/assignments")
    // ONE probe pass, persisted: the bucket collect (for the literal
    // pruning filter) and the ranking read the same table — the
    // previous shape re-ran the |Q|×|seeds| cosine cross-join and its
    // TopK aggregation a second time inside rankProbed (the
    // queryIvfPqIndex discipline)
    val probed = graft.CacheScope.persisted(
      probeBuckets(seeds, queries, probes))
    val buckets = probed.select(col("bucket")).distinct()
      .collect().map(_.getLong(0))
    rankProbedBuckets(assigned.filter(col("bucket").isin(buckets: _*)),
      probed, k)
  }
}
