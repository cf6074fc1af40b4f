package graft.expressions

import java.security.MessageDigest

import scala.collection.mutable

/** The ONE tokenizer (and per-thread MD5) shared by the shingle-family
  * expressions ([[WordShingles]], [[MinShingleHash]]) — their
  * correctness contract is that tokenization is char-for-char
  * identical across them AND to `split(lower(text), "\\s+", -1)`:
  * split on Java-regex `\s+` runs (space, \t, \n, \x0B, \f, \r),
  * leading/trailing empty tokens kept, lowercasing done by the CALLER
  * via UTF8String.toLowerCase for parity with the `lower()` builtin.
  * Before this object each expression carried its own copy of the
  * loop with a comment promising they stay in sync; sharing the code
  * makes divergence impossible instead of comment-enforced.
  */
private[expressions] object ShingleText {
  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Tokens of `text`, exactly like `split(text, "\\s+", -1)`. */
  def tokenize(text: String): mutable.ArrayBuffer[String] = {
    val tokens = mutable.ArrayBuffer.empty[String]
    val len = text.length
    var i = 0
    var start = 0
    while (i < len) {
      if (isSpace(text.charAt(i))) {
        tokens += text.substring(start, i)
        while (i < len && isSpace(text.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    tokens += text.substring(start, len)
    tokens
  }

  // MessageDigest is not thread-safe but IS reusable (digest() resets);
  // a per-row getInstance pays provider lookup + allocation on every
  // document in the codegen hot path — one instance per task thread,
  // reused across rows and across the expressions that hash shingles
  val localMd: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
}
