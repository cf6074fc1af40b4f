package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Lower}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: WordShingles lowercases its input internally, so a
  * `lower(...)` feeding it is redundant work per row — strip it. A small
  * but genuine rule in the normalize-away-idempotent-prework family; it
  * also documents the full Catalyst extension stack this library uses
  * (Expression with codegen → Rule[LogicalPlan] → SparkSessionExtensions
  * injection).
  */
object EliminateRedundantLowerUnderShingles extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case WordShingles(Lower(child), n, d) => WordShingles(child, n, d)
    }
}

/** Optimizer rule: Unicode normalization is idempotent per form —
  * `NFC(NFC(x)) = NFC(x)` (Unicode Standard, ch. 3 C14) — so nested
  * same-form normalizations collapse to one. Composed pipelines hit
  * this shape naturally (a cleansing stage normalizes defensively on
  * input AND output); the rule removes the per-row double work.
  * Different forms do NOT collapse (NFC∘NFD ≠ NFC) and are left alone.
  */
object CollapseIdempotentNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnicodeNormalize(inner @ UnicodeNormalize(_, f1), f2) if f1 == f2 =>
        inner
    }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`.
  *
  * Besides the optimizer rules, the native expressions register as SQL
  * functions, so a SQL-only user (`spark.sql(...)`, thrift, notebooks)
  * reaches the same codegen'd kernels as the Scala API:
  * `word_shingles(text, n)`, `min_shingle_hash(text, n)`,
  * `cosine_similarity(a, b)`, `unicode_normalize(s, 'NFC')`.
  * Int/string parameters arrive as literals (the usual SQL-function
  * convention — they parameterize codegen and cannot be per-row).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def arity(args: Seq[Expression], n: Int, fn: String,
      sig: String): Unit =
    require(args.length == n,
      s"$fn expects $n arguments ($sig), got ${args.length}")

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT parameter, got $other")
  }

  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal STRING parameter, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => EliminateRedundantLowerUnderShingles)
    e.injectOptimizerRule(_ => CollapseIdempotentNormalize)
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => {
        arity(args, 2, "word_shingles", "text, n")
        WordShingles(args.head, intLit(args(1), "word_shingles"))
      }))
    e.injectFunction((FunctionIdentifier("min_shingle_hash"),
      info("min_shingle_hash", "min_shingle_hash(text, n) - min md5 over word n-grams"),
      (args: Seq[Expression]) => {
        arity(args, 2, "min_shingle_hash", "text, n")
        MinShingleHash(args.head, intLit(args(1), "min_shingle_hash"))
      }))
    e.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float/double arrays"),
      (args: Seq[Expression]) => {
        arity(args, 2, "cosine_similarity", "a, b")
        CosineSimilarity(args.head, args(1))
      }))
    e.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize", "unicode_normalize(s, form) - NFC/NFD/NFKC/NFKD normalization"),
      (args: Seq[Expression]) => {
        arity(args, 2, "unicode_normalize", "s, form")
        UnicodeNormalize(args.head, strLit(args(1), "unicode_normalize"))
      }))
    e.injectFunction((FunctionIdentifier("hilbert_index"),
      info("hilbert_index", "hilbert_index(x, y, bits) - Hilbert-curve index over a 2^bits grid"),
      (args: Seq[Expression]) => {
        arity(args, 3, "hilbert_index", "x, y, bits")
        HilbertIndex(args.head, args(1), intLit(args(2), "hilbert_index"))
      }))
    e.injectFunction((FunctionIdentifier("muldiv128"),
      info("muldiv128", "muldiv128(a, b, m) - exact floor(a*b/m) through a 128-bit intermediate; NULL on sign/overflow contract violation"),
      (args: Seq[Expression]) => {
        arity(args, 3, "muldiv128", "a, b, m")
        MulDiv128(args.head, args(1), args(2))
      }))
    e.injectFunction((FunctionIdentifier("fnv64"),
      info("fnv64", "fnv64(s) - FNV-1a 64-bit hash of a string, sign bit cleared (portable dispersal hash)"),
      (args: Seq[Expression]) => {
        arity(args, 1, "fnv64", "s")
        Fnv64(args.head)
      }))
    e.injectFunction((FunctionIdentifier("simhash_signature"),
      info("simhash_signature", "simhash_signature(shingles, bits) - md5-vote SimHash of a string array; NULL for an empty array"),
      (args: Seq[Expression]) => {
        arity(args, 2, "simhash_signature", "shingles, bits")
        SimhashSignature(args.head, intLit(args(1), "simhash_signature"))
      }))
  }
}
