package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface: tokenizing,
  * shingling, fingerprinting, token statistics, quality scoring, and
  * n-gram-heuristic language ID. All pure Column expressions (codegen'd
  * built-ins / higher-order array functions — no UDFs), so they inline
  * into whole-stage codegen over the document scan and scale linearly
  * with document bytes.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased.
    *
    * Split semantics are INTENTIONALLY the raw regex-split's, including
    * its artifact: text with leading whitespace yields a leading ""
    * token (and "" itself yields [""]). Every oracle replays the same
    * form (DuckDB `string_split_regex(lower(text), '\s+')` behaves
    * identically), so token counts, shingles, BM25 postings and the SQL
    * side agree BECAUSE both keep the artifact — trimming here without
    * touching every oracle (or vice versa) breaks the hash parity, and
    * the fixture corpus contains no leading-whitespace documents to
    * make the artifact matter.
    */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** BPE-ish subword proxy: letter runs, digit runs, and single
    * punctuation marks each count as one token.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Distinct word n-gram shingles of a raw text column (the unit of
    * near-dup detection) — native single-pass expression.
    */
  def textShingles(text: Column, n: Int): Column =
    graft.expressions.WordShingles.shingles(text, n)

  /** Built-in-composition form of shingling over a token array; kept as
    * the reference implementation [[textShingles]] is tested against
    * (interpreted HOFs — 10x slower at scale).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  /** Normalization for fingerprinting: lowercase, collapse whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact content fingerprint (md5 of normalized text) — the dedup key. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Rolling-shingle fingerprint: the minimum shingle hash. Equal for
    * exact dups, stable under small edits away from the minimizing
    * shingle — the 1-hash special case of the MinHash signature.
    */
  def minShingleFingerprint(toks: Column, n: Int): Column =
    array_min(transform(shingles(toks, n), s => md5(s)))

  /** Native single-pass form of [[minShingleFingerprint]] straight from
    * the raw text — tokenize, shingle, hash, min in one expression with
    * no intermediate arrays (the scan-speed path).
    */
  def minShingleHash(text: Column, n: Int): Column =
    graft.expressions.MinShingleHash.minShingleHash(text, n)

  /** Tiny per-language stopword lists for the n-gram-heuristic language
    * ID. Public common function words.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "que"),
  )

  /** Count of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** PII scrubbing for training corpora: mask emails, phone-like number
    * runs, and URLs with typed placeholder tokens. Plain regexes kept to
    * the portable common subset (character classes, quantifiers,
    * alternation) so any engine applies the identical policy.
    */
  val piiRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("https?://[^\\s]+", "<URL>"),
    ("\\+?[0-9][0-9() .-]{7,}[0-9]", "<PHONE>"),
  )

  def scrubPii(text: Column): Column =
    piiRules.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Min-cost Viterbi segmentation value of the token in column
    * `tokCol` against the piece-cost map in column `mapCol`
    * (gram → cost for pieces of length 2 or 3; single characters always
    * cost 100). Returns C = total_cost·1024 + piece_count — cost and
    * count ride one integer so the DP minimum is unique and the caller
    * decomposes exactly (`C div 1024`, `C % 1024`; words must be
    * < 1024 pieces). A scan-local `aggregate` fold carrying three
    * rolling DP states — the unigram-LM tokenizer's inner loop (Kudo
    * 2018) with max piece length 3; no explode, no shuffle, no
    * per-position rows. Used by q261; pinned on constructed inputs in
    * LlmOpsSpec.
    */
  def minCostSegmentation(tokCol: String, mapCol: String): Column = {
    val INF = 1099511627776L // 2^40
    // empty-token guard: Spark's sequence(1, 0) is the DESCENDING
    // [1, 0], so the fold would run twice over a zero-length token and
    // report 2 phantom pieces; an empty token segments to 0 pieces at
    // cost 0 (what an oracle's empty generate_series range computes)
    expr(
      s"""IF(length($tokCol) < 1, 0L,
         |  aggregate(sequence(1, length($tokCol)),
         |  named_struct('a', 0L, 'b', ${INF}L, 'c', ${INF}L),
         |  (st, i) -> named_struct(
         |    'a', least(
         |      st.a + 102401L,
         |      IF(i >= 2, coalesce(st.b
         |        + element_at($mapCol, substring($tokCol, i - 1, 2)) * 1024L
         |        + 1L, ${INF}L), ${INF}L),
         |      IF(i >= 3, coalesce(st.c
         |        + element_at($mapCol, substring($tokCol, i - 2, 3)) * 1024L
         |        + 1L, ${INF}L), ${INF}L)),
         |    'b', st.a,
         |    'c', st.b),
         |  st -> st.a))""".stripMargin)
  }
}
