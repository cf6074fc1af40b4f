package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import TextAnalysis.shingles

/** Near-duplicate and exact-duplicate detection over document corpora —
  * the dedup family a large-scale training-data pipeline needs: exact
  * (hash groupBy), MinHash+LSH (shingle→minhash→band→bucket join),
  * SimHash (bitwise signature + chunk blocking), and exact n-gram
  * Jaccard verification.
  *
  * Hashing is md5-based so the same computation is expressible in any
  * ANSI-ish engine (the DuckDB oracle runs the identical formulas). At
  * 100 TB the interesting property is the candidate-generation shape:
  * LSH band buckets / SimHash chunks turn the quadratic all-pairs problem
  * into an equality join on a bucket key — a plain hash shuffle that
  * scales out, with per-bucket sizes bounded by band width. Only
  * candidates (a vanishing fraction) pay the exact verification cost.
  *
  * SimHash ships in two tiers: the 32-bit md5 form
  * ([[simhashSignatures]]/[[simhashPairs]], 8-bit chunk blocking) whose
  * every step the DuckDB oracle replays bit-for-bit, and the 64-bit
  * xxhash64 form ([[simhash64Signatures]]/[[simhashBlockPairs]], Manku
  * block-permutation blocking with ~32-bit join keys) for corpus scale,
  * where 8-bit chunk buckets collide at n²/256 and stop being
  * join-sized. Both are pigeonhole-lossless at their hamming bound;
  * the 64-bit tier is spec-verified against brute force instead of the
  * SQL oracle (xxhash64 is not portable to DuckDB).
  */
object DedupOps {

  /** Modulus for Kirsch-Mitzenmacher hash derivation: 2^31−1 (Mersenne).
    * Small enough that h1 + i·h2 never overflows a BIGINT in any engine
    * (DuckDB errors on overflow where Spark wraps), large enough for
    * minhash uniformity.
    */
  val KmPrime: Long = 2147483647L

  /** Default candidate-count gate for broadcasting the candidate-pair set
    * into verification joins. Below this, the candidates (two longs each)
    * broadcast in a few MB and the big shingle table never shuffles;
    * above it, verification falls back to plain shuffle joins — slower,
    * but immune to the hot-bucket blowup that would OOM every executor if
    * an unexpectedly dense corpus made "candidates" stop being sparse.
    */
  val MaxBroadcastCandidates: Long = 100000L

  /** Default document-frequency cutoff for shingles feeding an inverted
    * index. A stop-shingle ("of the and of the") present in d documents
    * generates d²/2 candidate pairs — quadratic in corpus size, the one
    * hot key that breaks the equality-join shape at 100 TB. Shingles in
    * more than this many documents are excluded from candidate
    * GENERATION only (verification always uses full shingle sets), the
    * standard recall trade: pairs sharing ONLY ubiquitous shingles sit
    * far below any useful Jaccard threshold anyway.
    */
  val MaxShingleDocFreq: Int = 1000

  /** Exact dedup: keep the lowest-id row per identical normalized text.
    * One hash shuffle on the 16-byte fingerprint, map-side combinable.
    */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** k MinHash signature values over word n-gram shingles: sig_i =
    * min over shingles of md5(i || '|' || shingle). String-min MinHash —
    * portable, uniform, and one md5 per (shingle, i).
    */
  def minhashSignatures(sh: Column, k: Int): Seq[Column] =
    (0 until k).map { i =>
      array_min(transform(sh, s => md5(concat(lit(s"$i|"), s)))).as(s"sig_$i")
    }

  /** LSH band keys: hash `rows` consecutive signature values per band.
    * Docs sharing ANY band key become candidate pairs.
    */
  def lshBands(k: Int, rows: Int): Seq[Column] = {
    require(k % rows == 0, s"k=$k must be divisible by band rows=$rows")
    (0 until k / rows).map { b =>
      md5(concat_ws("|", (0 until rows).map(r => col(s"sig_${b * rows + r}")): _*))
        .as(s"band_$b")
    }
  }

  /** MinHash+LSH near-dup pipeline: shingle → k signatures → bands →
    * bucket self-join → exact Jaccard verification of candidates.
    * Returns (doc_a, doc_b, jaccard) for verified pairs ≥ threshold.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 5, k: Int = 16, bandRows: Int = 4,
      threshold: Double = 0.6,
      maxBroadcastCandidates: Long = MaxBroadcastCandidates): DataFrame = {
    val sh = shingleSets(docs, textCol, idCol, shingleN)
    val exploded = lshBandTable(sh, k, bandRows)
    val cand = exploded.as("a").join(exploded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, sh, threshold, maxBroadcastCandidates)
  }

  /** The persisted, exploded LSH band table (doc_id, band_idx, band_hash)
    * a bucket join consumes — one row per (doc, band).
    *
    * Kirsch-Mitzenmacher signatures: two 60-bit base hashes from ONE md5
    * per shingle, k derived hashes h1 + i·h2 mod P — 8x less hashing
    * than k independent digests, and the min-aggregation runs as
    * explode + codegen'd integer ops with map-side partial mins (one
    * hash shuffle on doc_id). Docs with no shingles drop out (they
    * cannot be near-dups of anything). Persisted because every caller
    * joins the band table against itself or a sibling corpus — without
    * it the full signature pipeline would recompute once per join side.
    */
  private def lshBandTable(sh: DataFrame, k: Int, bandRows: Int): DataFrame = {
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .withColumn("h", md5(col("g")))
      .select(col("doc_id"),
        (conv(substring(col("h"), 1, 15), 16, 10).cast("bigint") % KmPrime).as("h1"),
        (conv(substring(col("h"), 17, 15), 16, 10).cast("bigint") % KmPrime).as("h2"))
    val sigs = ex.groupBy(col("doc_id")).agg(
      min((col("h1") + col("h2") * lit(0L)) % KmPrime).as("sig_0"),
      (1 until k).map(i =>
        min((col("h1") + col("h2") * lit(i.toLong)) % KmPrime).as(s"sig_$i")): _*)
    val bands = sigs.select(Seq(col("doc_id")) ++ lshBands(k, bandRows): _*)
    graft.CacheScope.persisted(
      bands.select(col("doc_id"), posexplode(
        array((0 until k / bandRows).map(b => col(s"band_$b")): _*)))
        .toDF("doc_id", "band_idx", "band_hash"))
  }

  /** Fuzzy decontamination via MinHash+LSH: eval documents whose shingle
    * Jaccard with ANY training document reaches `threshold`, with
    * candidates generated by LSH band-bucket collision ACROSS the two
    * corpora instead of the exact inverted index ([[crossCorpusOverlap]]).
    *
    * The trade vs the exact path is the standard LSH one: candidate
    * volume no longer scales with shingle document frequency at all —
    * each doc emits exactly k/bandRows band rows regardless of length or
    * content, so the cross join is |T|·(k/r) vs |E|·(k/r) equality rows —
    * at the cost of probabilistic recall near the threshold (a ≥0.6 pair
    * missing all 4 bands has probability (1−j⁴)⁴ ≈ 0.55 at j=0.6,
    * vanishing as j→1 where contamination actually lives). Every
    * surviving candidate is still EXACTLY verified, so precision is 1 —
    * the output is a strict subset of [[crossCorpusOverlap]]'s.
    */
  def lshDecontamination(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, shingleN: Int = 5, k: Int = 16, bandRows: Int = 4,
      threshold: Double = 0.6,
      maxBroadcastCandidates: Long = MaxBroadcastCandidates): DataFrame = {
    val shT = shingleSets(train, textCol, idCol, shingleN)
    val shE = shingleSets(eval, textCol, idCol, shingleN)
    val bandsT = lshBandTable(shT, k, bandRows)
    val bandsE = lshBandTable(shE, k, bandRows)
    val cand = bandsT.as("t").join(bandsE.as("e"),
        col("t.band_idx") === col("e.band_idx") &&
          col("t.band_hash") === col("e.band_hash"))
      .select(col("t.doc_id").as("train_id"), col("e.doc_id").as("eval_id"))
      .distinct()
    verifyOverlap(cand, shT, shE, threshold, maxBroadcastCandidates)
  }

  /** Exact n-gram Jaccard near-dup pairs: candidates from the inverted
    * shingle index (equality join on shingle — sparse by construction at
    * high n, with hot stop-shingles capped out by document frequency),
    * verified against the full shingle sets.
    *
    * The inverted index keys on [[graft.expressions.Fnv64]] of the
    * shingle, not the raw string: the key exists only to find equal
    * shingles, so an 8-byte integer join key replaces a ~30-byte string
    * in the self-join's shuffle AND turns the join's equality compare
    * into one long compare. LOSSLESS for candidates — equal strings
    * always collide — and every candidate is still exactly verified
    * against the full string shingle sets, so a hash collision can only
    * ADD a candidate that verification then rejects; output is
    * byte-identical to the raw-string index. The one semantic nudge:
    * the document-frequency cap counts per HASH, so two distinct
    * shingles colliding (birthday bound ~n²/2⁶⁴) could pool their df
    * past `maxShingleDf` and drop out of generation — the same
    * deliberate recall trade the cap itself already makes, narrowed by
    * 19 orders of magnitude.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 5, threshold: Double = 0.6,
      maxShingleDf: Int = MaxShingleDocFreq,
      maxBroadcastCandidates: Long = MaxBroadcastCandidates): DataFrame = {
    val sh = shingleSets(docs, textCol, idCol, shingleN)
    val ex = dropHotShingles(hashedShingleIndex(sh), maxShingleDf)
    val cand = ex.as("a").join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, sh, threshold, maxBroadcastCandidates)
  }

  /** Near-CONTAINMENT pairs: |A∩B| / min(|A|,|B|) ≥ threshold over
    * shingle sets — the dedup semantics Jaccard systematically misses.
    * An excerpt, a quoted passage, or a page embedded in a larger
    * boilerplate frame has containment ≈ 1 while its Jaccard is only
    * |small|/|large| (a half-length excerpt scores J ≈ 0.5, far under
    * any near-dup threshold) — so containment detection is its own
    * required pass in corpus curation (Broder 1997 defines both
    * resemblance AND containment for exactly this reason).
    *
    * Same candidate generation as [[ngramJaccardPairs]] (inverted
    * shingle index, hot-shingle df cap): a pair with containment ≥ t
    * shares ≥ t·min(|A|,|B|) ≥ 1 shingles, so the equality join finds
    * it. The score is an exact integer ppm — inter·10⁶ div min — no
    * float anywhere, so the oracle check is a hash match, not a
    * tolerance band.
    */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 5, thresholdPpm: Long = 900000L,
      maxShingleDf: Int = MaxShingleDocFreq,
      maxBroadcastCandidates: Long = MaxBroadcastCandidates): DataFrame = {
    val sh = shingleSets(docs, textCol, idCol, shingleN)
    // hashed index key — same losslessness argument as [[ngramJaccardPairs]]
    val ex = dropHotShingles(hashedShingleIndex(sh), maxShingleDf)
    val cand = ex.as("a").join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val c = graft.CacheScope.persisted(cand)
    val gate = candidateGate(c, maxBroadcastCandidates)
    val withA = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .join(gate(c), "doc_a")
    sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      .join(gate(withA), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("containment_ppm",
        expr("(inter * 1000000) div least(size(sh_a), size(sh_b))"))
      .filter(col("containment_ppm") >= thresholdPpm)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        col("containment_ppm"))
  }

  /** Prefix-filtered exact Jaccard pairs (the AllPairs/PPJoin candidate
    * scheme, Bayardo et al. 2007 / Xiao et al. 2008): order every
    * document's shingles by GLOBAL rarity (ascending document frequency,
    * shingle tie-break — one canonical order corpus-wide), index only
    * each document's first |x| − ⌈t·|x|⌉ + 1 shingles, and generate
    * candidates from prefix-prefix equality joins plus the length filter
    * min(|x|,|y|) ≥ ⌈t·max(|x|,|y|)⌉.
    *
    * LOSSLESS, unlike the df-cap inverted index ([[ngramJaccardPairs]]):
    * J(x,y) ≥ t forces |x∩y| ≥ t·max(|x|,|y|), and the FIRST common
    * shingle in canonical order sits at position ≤ |x| − |x∩y| + 1 ≤
    * prefix length in BOTH documents — so every qualifying pair
    * collides. The scale story: prefix tokens are each document's
    * globally-rarest shingles, so the inverted index concentrates on
    * short posting lists by construction — the stop-shingle d²/2 blowup
    * never enters candidate generation, with no recall trade to make.
    * Verification is the shared exact-Jaccard tail.
    */
  def ppjoinPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 5, threshold: Double = 0.6,
      maxBroadcastCandidates: Long = MaxBroadcastCandidates): DataFrame = {
    val sh = shingleSets(docs, textCol, idCol, shingleN)
    verifyJaccard(ppjoinCandidates(sh, threshold), sh, threshold,
      maxBroadcastCandidates)
  }

  /** Candidate generation for [[ppjoinPairs]] over pre-computed shingle
    * sets (doc_id, sh) — package-private so the positional filter's
    * pruning (invisible in the lossless final result) is directly
    * testable; `positional = false` degrades to the plain
    * prefix+length AllPairs scheme.
    */
  private[graft] def ppjoinCandidates(sh: DataFrame, threshold: Double,
      positional: Boolean = true): DataFrame = {
    // threshold as an EXACT ppm rational: ceil(sz * threshold) on raw
    // doubles can round one past the true integer bound (0.07 * 100
    // evaluates to 7.000000000000001 → ceil 8), which shortens the
    // prefix and tightens the length filter by one — silently LOSSY at
    // exact-boundary pairs, where this scheme's whole pitch is
    // losslessness. With tPpm integer, sz·tPpm is exact in a double up
    // to 2^53 and the divide by a representable power of ten lands
    // within 1 ulp — never the 10⁻⁶ gap to the next rational — so the
    // ceil is exact for any threshold expressible in ppm.
    val tPpm = math.round(threshold * 1e6).toDouble
    def minOverlap(sz: Column): Column = ceil(sz * lit(tPpm) / lit(1e6))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("df"))
    val prefixes = ex.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("g")))),
          x => x.getField("g")).as("sorted"),
        count(lit(1)).as("sz"))
      .select(col("doc_id"), col("sz"),
        posexplode(slice(col("sorted"), lit(1),
          (col("sz") - minOverlap(col("sz")) + 1).cast("int"))))
      .select(col("doc_id"), col("sz"), (col("pos") + 1).as("p"),
        col("col").as("g"))
    // POSITIONAL filter (the "P" in PPJoin, Xiao et al. 2008 §3.2): a
    // collision on token g at 1-based canonical positions (pa, pb)
    // bounds the TRUE overlap by
    //   B = min(pa, pb) + min(sz_a − pa, sz_b − pb)
    // (common tokens strictly before g number ≤ min(pa,pb) − 1 — the
    // canonical order is global, so shared tokens preceding g sit at
    // positions < pa in a AND < pb in b; g itself adds 1; common tokens
    // after g number ≤ min of the suffix lengths). Jaccard ≥ t forces
    // overlap ≥ ⌈t·(sz_a+sz_b)/(1+t)⌉, so B ≥ that bound holds on EVERY
    // collision of a qualifying pair — filtering each collision row is
    // lossless, and it kills the candidates whose only collisions sit at
    // the tail of both prefixes before verifyJaccard pays an
    // array_intersect over the full shingle sets.
    val posFilter =
      if (positional)
        // t/(1+t) as the exact rational tPpm/(10⁶+tPpm): same 1-ulp
        // argument as minOverlap — the raw double t/(1+t) literal
        // carries the threshold's own representation error into ceil
        least(col("a.p"), col("b.p")) +
          least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p")) >=
          ceil((col("a.sz") + col("b.sz")) * lit(tPpm) / lit(1e6 + tPpm))
      else lit(true)
    prefixes.as("a").join(prefixes.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") >= minOverlap(col("b.sz")) &&
          col("b.sz") >= minOverlap(col("a.sz")) &&
          posFilter)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Document-frequency cap (see [[MaxShingleDocFreq]]): drop shingles
    * whose posting list exceeds `maxDf` docs before pair generation. The
    * hot set is tiny by definition (few shingles can be that common), so
    * it broadcasts into an anti-join — no extra shuffle on the big side.
    */
  private def dropHotShingles(ex: DataFrame, maxDf: Int): DataFrame =
    ex.join(broadcast(dropHotShinglesKeys(ex, maxDf)), Seq("g"), "left_anti")

  /** The shingle-set projection every near-dup pipeline starts from.
    * Persisted MEMORY_AND_DISK: each pipeline consumes it 3–4 times
    * (inverted index / signatures + both verification sides), and the
    * tokenize+shingle transform is the most expensive scan work — at any
    * scale, recomputing it per consumer dominates the query. Spill-safe:
    * the projection is (id, shingle array), a fraction of corpus bytes.
    */
  private[graft] def shingleSets(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int): DataFrame =
    graft.CacheScope.persisted(
      docs.select(col(idCol).as("doc_id"),
        TextAnalysis.textShingles(col(textCol), shingleN).as("sh")))

  /** Exploded inverted-index rows (doc_id, g) with g = Fnv64 of the
    * shingle string — the 8-byte join key [[ngramJaccardPairs]] /
    * [[containmentPairs]] shuffle instead of raw ~30-byte shingle
    * strings (collision/losslessness argument on the callers).
    */
  private def hashedShingleIndex(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), explode(col("sh")).as("g0"))
      .select(col("doc_id"), graft.expressions.Fnv64.fnv64(col("g0")).as("g"))

  /** Cross-corpus overlap (decontamination): eval documents whose shingle
    * Jaccard with ANY training document reaches `threshold`. Same
    * inverted-index candidate generation as near-dup detection (with the
    * same document-frequency cap, counted across BOTH corpora), joined
    * ACROSS the two corpora; candidate verification broadcasts while the
    * candidate set is provably small and falls back to shuffle joins
    * beyond `maxBroadcastCandidates`.
    */
  def crossCorpusOverlap(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, shingleN: Int = 5, threshold: Double = 0.6,
      maxShingleDf: Int = MaxShingleDocFreq,
      maxBroadcastCandidates: Long = MaxBroadcastCandidates): DataFrame =
    overlapImpl(train, eval, textCol, idCol, shingleN, threshold,
      maxShingleDf, maxBroadcastCandidates, trainPrefilter = (exT, _) => exT)

  /** [[crossCorpusOverlap]] with a Bloom-filter prefilter on the train
    * side — the 100 TB shape. The eval corpus's shingles compress into a
    * few MB of bloom bits (a distributed [[BloomOps.bloomAgg]], merged
    * like any aggregate); train shingles that definitely don't occur in
    * eval are dropped AT THE SCAN, before the inverted-index join ever
    * shuffles them. Since a Bloom filter has no false negatives and every
    * surviving candidate still passes exact Jaccard verification against
    * full shingle sets, the output is byte-identical to
    * [[crossCorpusOverlap]] — only the intermediate volume changes
    * (on a decontamination workload, train >> eval, so the join input
    * shrinks from corpus-scale to roughly the contaminated fraction).
    *
    * `expectedEvalShingles` sizes the filter; it is a capacity bound, not
    * a count — oversizing costs bits (10 bits/item at fpp=0.01), never
    * correctness.
    */
  def bloomDecontamination(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, shingleN: Int = 5, threshold: Double = 0.6,
      maxShingleDf: Int = MaxShingleDocFreq,
      maxBroadcastCandidates: Long = MaxBroadcastCandidates,
      expectedEvalShingles: Long = 1L << 22, fpp: Double = 0.01): DataFrame =
    overlapImpl(train, eval, textCol, idCol, shingleN, threshold,
      maxShingleDf, maxBroadcastCandidates,
      trainPrefilter = (exT, exE) => {
        // scalar subquery: the one-row bloom aggregate evaluates once and
        // reaches every task as a literal — exactly how Spark's own
        // InjectRuntimeFilter plans its bloom probes
        val bloom = exE.agg(
          BloomOps.bloomAgg(col("g"), expectedEvalShingles, fpp).as("__bf"))
        exT.filter(BloomOps.mightContain(bloom.scalar(), col("g")))
      })

  /** Shared decontamination body; `trainPrefilter(exT, exE)` may thin the
    * exploded train shingles (it must never drop a shingle that occurs in
    * eval — bloom/anti-join prefilters satisfy this by construction). The
    * hot-shingle document-frequency cap is always computed over the
    * UNFILTERED union so prefiltering cannot shift candidate semantics.
    */
  private def overlapImpl(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, shingleN: Int, threshold: Double,
      maxShingleDf: Int, maxBroadcastCandidates: Long,
      trainPrefilter: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val shT = shingleSets(train, textCol, idCol, shingleN)
    val shE = shingleSets(eval, textCol, idCol, shingleN)
    val exT0 = shT.select(col("doc_id").as("train_id"), explode(col("sh")).as("g"))
    val exE = shE.select(col("doc_id").as("eval_id"), explode(col("sh")).as("g"))
    val exT = trainPrefilter(exT0, exE)
    // df counted over the union: a shingle hot in either corpus is a hot
    // join key in the cross-corpus candidate join all the same
    val hot = dropHotShinglesKeys(
      exT0.select(col("train_id").as("doc_id"), col("g"))
        .unionByName(exE.select(col("eval_id").as("doc_id"), col("g"))),
      maxShingleDf)
    val cand = exT.join(broadcast(hot), Seq("g"), "left_anti")
      .join(exE.join(broadcast(hot), Seq("g"), "left_anti"), "g")
      .select("train_id", "eval_id").distinct()
    verifyOverlap(cand, shT, shE, threshold, maxBroadcastCandidates)
  }

  /** Exact cross-corpus Jaccard on (train_id, eval_id) candidates against
    * the two shingle-set tables — the verification tail shared by every
    * decontamination variant (inverted-index, Bloom-prefiltered, LSH).
    * Candidates persist once (consumed by the gate count + two joins) and
    * broadcast while provably sparse, with the same shuffle fallback as
    * [[verifyJaccard]].
    */
  private def verifyOverlap(cand: DataFrame, shT: DataFrame, shE: DataFrame,
      threshold: Double, maxBroadcast: Long): DataFrame = {
    val c = graft.CacheScope.persisted(cand)
    val gate = candidateGate(c, maxBroadcast)
    val inter = size(array_intersect(col("sh_t"), col("sh_e")))
    val union = size(col("sh_t")) + size(col("sh_e")) - inter
    val withT = shT.select(col("doc_id").as("train_id"), col("sh").as("sh_t"))
      .join(gate(c), "train_id")
    shE.select(col("doc_id").as("eval_id"), col("sh").as("sh_e"))
      .join(gate(withT), "eval_id")
      .withColumn("overlap", inter.cast("double") / union)
      .filter(col("overlap") >= threshold)
      .select(col("eval_id"), col("train_id"), round(col("overlap"), 6).as("overlap"))
  }

  /** The hot-shingle key set for [[dropHotShingles]], reusable when two
    * exploded sides must be filtered by the same combined-df cutoff.
    */
  private def dropHotShinglesKeys(ex: DataFrame, maxDf: Int): DataFrame =
    graft.CacheScope.persisted(
      ex.groupBy(col("g"))
        // plain count, not countDistinct: every caller feeds exploded
        // DISTINCT per-doc shingle sets, so (doc_id, g) is already unique
        // and the cheap map-side-combinable count IS the document frequency
        // (countDistinct would add a second dedup aggregation pass)
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf)
        .select(col("g")))

  /** Size-gated broadcast: count the (persisted) candidate set ONCE —
    * a bounded driver-side long, not data — and broadcast the
    * verification probe sides only while candidates are provably sparse.
    * Past the gate, verification degrades to plain shuffle joins on
    * doc id instead of OOMing executors with an unbounded broadcast.
    */
  private def candidateGate(cand: DataFrame,
      maxBroadcast: Long): DataFrame => DataFrame = {
    val useBroadcast = cand.count() <= maxBroadcast
    df => if (useBroadcast) broadcast(df) else df
  }

  /** Exact Jaccard on candidate pairs against per-doc shingle sets. The
    * candidate set is a vanishing fraction of the corpus by construction,
    * so it is normally BROADCAST into the shingle table twice — the big
    * side never shuffles for verification — with a size-gated fallback to
    * shuffle joins when a dense corpus breaks that assumption.
    */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
      threshold: Double, maxBroadcast: Long): DataFrame = {
    val c = graft.CacheScope.persisted(cand)
    val gate = candidateGate(c, maxBroadcast)
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    val withA = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .join(gate(c), "doc_a")
    sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      .join(gate(withA), "doc_b")
      .withColumn("jaccard", inter.cast("double") / union)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Segment-level boilerplate removal (the CCNet/RefinedWeb "dedup the
    * corpus by paragraph" pass, over fixed token windows since the
    * fixture has no newlines): split each document into consecutive
    * `segTokens`-token segments, drop every occurrence of segments whose
    * corpus DOCUMENT frequency exceeds `maxDocFreq`, and rebuild the
    * remaining text in original order. Returns per doc: total segments,
    * kept segments, and the md5 of the rewritten text (md5("") when a
    * document was pure boilerplate).
    *
    * Scale shape: segment generation is embarrassingly parallel
    * (transform+posexplode at the scan), frequency is a distinct + one
    * map-combinable count on the 16-byte segment hash, removal is an
    * anti-join on the same hash, and the rebuild is one groupBy(doc) with
    * an in-group sort (array_sort over collect_list — group-sized, never
    * a global window). Driver traffic: none.
    */
  def segmentDedupRewrite(docs: DataFrame, textCol: String, idCol: String,
      segTokens: Int = 10, maxDocFreq: Int = 1): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("t"))
    val segs = graft.CacheScope.persisted( // consumed by df-count + rebuild
      toks.filter(size(col("t")) >= 1)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, cast(ceil(size(t) / $segTokens.0) as int) - 1), " +
            s"i -> array_join(slice(t, i * $segTokens + 1, $segTokens), ' '))")))
        .toDF("doc_id", "seg_idx", "seg")
        .withColumn("h", md5(col("seg"))))
    // document frequency, not occurrence count: a segment repeated inside
    // one document is that document's own text, not corpus boilerplate
    val hot = segs.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq).select(col("h"))
    val kept = segs.join(hot, Seq("h"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("kept_segments"),
      md5(array_join(transform(
        array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
        x => x.getField("seg")), " ")).as("new_md5"))
    val totals = segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_segments"))
    docs.select(col(idCol).as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("kept_segments"), lit(0L)).as("kept_segments"),
        coalesce(col("new_md5"), lit(md5Empty)).as("new_md5"))
  }

  /** md5("") — the rewrite fingerprint of a fully-deduplicated document. */
  private val md5Empty: String = "d41d8cd98f00b204e9800998ecf8427e"

  /** 32-bit SimHash signature over shingles: one md5 per shingle, bit i
    * taken from nibble i/4 of the hex digest; signature bit i is the sign
    * of the ±1 vote sum. Returns (doc_id, simhash) with simhash BIGINT.
    *
    * All `bits` vote bits derive from ONE radix conversion of the
    * digest's first 8 hex chars into a 32-bit integer, then integer
    * shift/mask per bit — the same single-`conv` trick lshBandTable
    * uses. The r05 form (32 independent `conv(substring(h,p,1))` string
    * ops per exploded shingle row) made this the slowest query in the
    * bench (21.8 s); the bit MAPPING is unchanged — hex char p (1-based)
    * is nibble 8−p of the value, so bit i sits at shift 4·(7−i/4)+i%4.
    */
  def simhashSignatures(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 5, bits: Int = 32): DataFrame = {
    require(bits <= 32, s"simhash bits must be <= 32, got $bits")
    // scan-stage signature: [[graft.expressions.SimhashSignature]] folds
    // the md5 votes per document inside the scan — the previous
    // explode → 32-sum groupBy spelled the same value but shuffled every
    // (doc, shingle) row into a partial aggregate, the most expensive
    // job of each SimHash query (13.9 CPU-s at sf0.1; spec pins the two
    // forms equal row-for-row). The null filter reproduces explode's
    // drop of shingle-less documents.
    graft.CacheScope.persisted( // consumed by both chunk sides
      shingleSets(docs, textCol, idCol, shingleN)
        .select(col("doc_id"), graft.expressions.SimhashSignature
          .simhashSignature(col("sh"), bits).as("simhash"))
        .filter(col("simhash").isNotNull))
  }

  /** The explode → 32-sum-aggregate spelling of [[simhashSignatures]],
    * kept as the reference implementation the native expression is
    * spec-tested against (exactly the [[TextAnalysis.shingles]] /
    * textShingles pairing).
    */
  private[graft] def simhashSignaturesComposed(docs: DataFrame,
      textCol: String, idCol: String,
      shingleN: Int = 5, bits: Int = 32): DataFrame = {
    require(bits <= 32, s"simhash bits must be <= 32, got $bits")
    val ex = shingleSets(docs, textCol, idCol, shingleN)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .withColumn("v",
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("bigint"))
    val votes = (0 until bits).map { i =>
      val bit = shiftright(col("v"), 4 * (7 - i / 4) + i % 4) % 2
      sum(bit * 2 - 1).as(s"s_$i")
    }
    ex.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .withColumn("simhash",
        (0 until bits).map(i =>
          when(col(s"s_$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _))
      .select(col("doc_id"), col("simhash"))
  }

  /** Duplicated-span coverage — the per-document analysis behind exact
    * substring deduplication (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": remove any span of ≥ N tokens
    * that occurs more than once in the corpus). For every document:
    * how many of its N-gram start positions are duplicated anywhere in
    * the corpus (including within the document), and how many TOKENS the
    * union of those duplicated spans covers — the exact byte count a
    * substring-dedup pass would cut.
    *
    * Scale shape: one generation pass (positions explode map-side), one
    * map-combinable count per n-gram hash, one equality semi-join back,
    * and a per-document window for the interval union — partitioned by
    * doc id, never global. Driver traffic: none.
    *
    * The positional index hashes with [[graft.expressions.Fnv64]], not
    * md5: the hash never reaches the output — it only groups equal
    * spans — and one fingerprint per (doc, position) made the md5
    * digest + hex rendering the single largest CPU sink in the suite
    * (~81 task-CPU-s at sf0.1). Fnv64 is codegen'd integer folding at
    * ~20× less CPU, spelled identically in the DuckDB oracle
    * ([[graft.expressions.Fnv64.sql]]). Collision risk: two DISTINCT
    * spans colliding in the 2⁶³ space would mark a unique span
    * duplicated — at 10⁹ corpus positions the birthday bound is ~5·10⁻²
    * expected colliding PAIRS corpus-wide, and a false "duplicated"
    * span only overcounts coverage by ≤ spanN tokens for the two docs
    * involved; dispersal, not resistance, is what grouping needs.
    */
  def duplicatedSpanStats(docs: DataFrame, textCol: String, idCol: String,
      spanN: Int = 8): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("t"))
    // (doc, pos, hash of the N tokens starting at pos), 0-based positions
    val grams = graft.CacheScope.persisted( // consumed by count + semi-join probe
      toks.filter(size(col("t")) >= spanN)
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0), size(col("t")) - spanN),
            i => graft.expressions.Fnv64.fnv64(
              array_join(slice(col("t"), i + 1, lit(spanN)), " ")))))
        .toDF("doc_id", "pos", "h"))
    val dupHashes = grams.groupBy("h").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1).select("h")
    val dupPos = grams.join(dupHashes, Seq("h"), "left_semi")
    // interval union per doc: tokens [pos, pos+N) not already covered by
    // an earlier duplicated span = pos+N − max(prev span ends, pos)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val covered = dupPos
      .withColumn("prev_end", max(col("pos") + spanN).over(w))
      .withColumn("new_tokens", greatest(lit(0),
        col("pos") + spanN - greatest(coalesce(col("prev_end"), col("pos")), col("pos"))))
    val perDoc = covered.groupBy("doc_id").agg(
      count(lit(1)).as("n_dup_positions"),
      sum(col("new_tokens")).as("dup_tokens_covered"))
    toks.select(col("doc_id"),
        size(col("t")).cast("bigint").as("n_tokens"),
        greatest(size(col("t")) - (spanN - 1), lit(0)).cast("bigint").as("n_positions"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_positions"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
        coalesce(col("dup_tokens_covered"), lit(0L)).cast("bigint").as("dup_tokens_covered"),
        round(coalesce(col("dup_tokens_covered"), lit(0L)).cast("double") /
          col("n_tokens"), 6).as("dup_ratio"))
  }

  /** SimHash near-dup pairs: block on 8-bit signature chunks (equality
    * join — candidates must agree on ≥1 of 4 chunks, which any pair at
    * hamming ≤ 3 necessarily does), verify hamming ≤ maxHamming.
    */
  def simhashPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunks = sigs.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(j =>
        (col("simhash") / math.pow(2, 8 * j).toLong).cast("bigint") % 256): _*)))
      .toDF("doc_id", "simhash", "chunk_idx", "chunk_val")
    // hamming gate BEFORE the distinct: the chunk join's candidate set
    // is inherently ~n²/(4·256) rows (8-bit buckets), and hamming is a
    // pure function of the pair — distinct-then-filter and
    // filter-then-distinct return the same set, but the former shuffles
    // the full quadratic candidate mass into the dedup hash aggregate
    // (measured 18 CPU-s at sf0.1; unbounded at corpus scale) while the
    // latter distincts only the true near-dups, map-side-filtered
    // inside the join's own stage
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** 64-bit SimHash signature over shingles — the corpus-scale variant
    * of [[simhashSignatures]] (which stays 32-bit/md5 for oracle
    * portability). Per-shingle hashing is native `xxhash64` (codegen'd,
    * no digest allocation); signature bit i is the sign of the ±1 vote
    * sum over shingle-hash bit i. Returns (doc_id, simhash64).
    *
    * Why 64 bits at scale: collision blocking over a b-bit signature
    * keys candidates on signature SUBSTRINGS, and expected random
    * collisions scale as n²/2^|key|. 32-bit signatures cap |key| at
    * 8 bits for hamming ≤ 3 (4-way pigeonhole) — n²/256 per chunk
    * table, quadratic blowup long before 100 TB. 64 bits support the
    * Manku block scheme below with ~32-bit keys.
    */
  def simhash64Signatures(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 5): DataFrame = {
    val ex = shingleSets(docs, textCol, idCol, shingleN)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .withColumn("v", xxhash64(col("g")))
    val votes = (0 until 64).map { i =>
      // ±1 vote from bit i; logical shift so bit 63 is sign-free
      sum(shiftrightunsigned(col("v"), i) % 2 * 2 - 1).as(s"s_$i")
    }
    ex.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .withColumn("simhash64",
        (0 until 64).map(i =>
          when(col(s"s_$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _))
      .select(col("doc_id"), col("simhash64"))
  }

  /** Near-dup pairs over 64-bit signatures via block-permutation
    * blocking (Manku, Jain & Das Sarma, "Detecting Near-Duplicates for
    * Web Crawling", WWW'07): split the signature into `blocks`
    * contiguous blocks; any pair at hamming ≤ maxHamming differs in at
    * most maxHamming blocks, so it AGREES EXACTLY on some combination of
    * (blocks − maxHamming) blocks — pigeonhole, no recall loss. Each doc
    * emits one row per C(blocks, blocks−maxHamming) combination keyed by
    * the concatenated block values; candidates form by equality join on
    * (combo, key) and are exactly verified (bit_count ≤ maxHamming,
    * filtered BEFORE the distinct — see [[simhashPairs]]).
    *
    * The 100 TB shape: with blocks = 6, maxHamming = 3, keys carry
    * ~32 signature bits, so random collisions are n²/2³² per combo ×
    * 20 combos — candidate volume stays join-sized where the 8-bit
    * chunk scheme's n²/2⁸ explodes. Trade: 20 rows per doc in the
    * blocking table vs 4 — linear cost for a quadratic saving.
    *
    * Returns (doc_a, doc_b, hamming), doc_a < doc_b, one row per pair.
    */
  def simhashBlockPairs(sigs: DataFrame, maxHamming: Int = 3,
      blocks: Int = 6): DataFrame = {
    require(blocks > maxHamming,
      s"need more blocks ($blocks) than allowed differing bits ($maxHamming)")
    require(blocks <= 64, s"at most one block per bit, got $blocks")
    val keep = blocks - maxHamming
    // block boundaries: first (64 % blocks) blocks get the extra bit
    val sizes = Array.tabulate(blocks)(j => 64 / blocks + (if (j < 64 % blocks) 1 else 0))
    val offsets = sizes.scanLeft(0)(_ + _)
    def blockVal(j: Int): Column = {
      // blocks = 1 makes the single block 64 bits wide, where
      // (1L << 64) - 1 wraps to 0 (JVM shift mod 64) and would key
      // every doc to 0 — a full cross product; -1L is the full mask
      val mask = if (sizes(j) == 64) -1L else (1L << sizes(j)) - 1L
      shiftrightunsigned(col("simhash64"), offsets(j)).bitwiseAND(lit(mask))
    }
    // every keep-sized combination of block indices, in a fixed order so
    // combo i means the same block set on both join sides
    val combos = (0 until blocks).combinations(keep).toSeq
    val keyed = sigs.select(col("doc_id"), col("simhash64"), posexplode(
        array(combos.map(c => concat_ws("|", c.map(blockVal): _*)): _*)))
      .toDF("doc_id", "simhash64", "combo", "key")
    keyed.as("a").join(keyed.as("b"),
        col("a.combo") === col("b.combo") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash64 ^ b.simhash64)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
