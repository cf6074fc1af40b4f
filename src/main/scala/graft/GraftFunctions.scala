package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.toColumn

import graft.expressions.{CosineSimilarity, Fnv64, MinShingleHash, UnicodeNormalize, WordShingles}

/** SQL registration for the native expressions, so `spark.sql` users get
  * the same operators as the Column API:
  * `SELECT cosine_similarity(a, b)`, `SELECT word_shingles(text, 5)`,
  * `SELECT min_shingle_hash(text, 5)`.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    registry.createOrReplaceTempFunction("min_shingle_hash",
      exprs => MinShingleHash(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    registry.createOrReplaceTempFunction("fnv64",
      exprs => Fnv64(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("unicode_normalize",
      exprs => UnicodeNormalize(exprs(0), exprs(1).eval() match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case s: String => s
      }), "built-in")
    spark.udf.register("heavy_hitters_10",
      org.apache.spark.sql.functions.udaf(
        graft.functions.HeavyHitters.MisraGries(10),
        org.apache.spark.sql.Encoders.STRING))
  }
}
