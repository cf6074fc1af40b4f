package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over embedding columns
  * (`array<float>`), computed with built-in higher-order array functions
  * (zip_with/aggregate/transform) in DOUBLE precision.
  *
  * Scale shapes:
  * - brute-force top-k: queries broadcast against the corpus scan — the
  *   corpus never shuffles; cost is |Q|·|C| dot products, the baseline.
  * - sign-LSH blocking: bucket by leading-dimension sign bits (an
  *   axis-aligned random-hyperplane LSH); near-identical vectors land in
  *   the same bucket, turning all-pairs near-dup into an equality join.
  * - IVF: assign every vector to its nearest seed centroid (one shuffle
  *   by bucket), probe the top-P buckets per query — |C|/buckets·P dot
  *   products per query instead of |C|.
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

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), rank-deterministic via rounded
    * similarity + id tie-break.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("query_vec"), col("embedding")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** Sign-LSH bucket key over the first `dims` dimensions: bit d set iff
    * v[d] > 0. Scale-invariant, so exact and scaled duplicates share a
    * bucket.
    */
  def signBucket(v: Column, dims: Int = 8): Column =
    (1 to dims).map(d =>
      when(element_at(v, d) > 0f, lit(1L << (d - 1))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Embedding near-duplicate pairs: sign-LSH bucket equality join, then
    * exact cosine ≥ threshold verification within buckets.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.999,
      dims: Int = 8): DataFrame = {
    val b = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), dims).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(cosine(col("a.embedding"), col("b.embedding")), 4))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("sim"))
  }

  /** Deterministic k-means centroid training for IVF: init from the
    * first k vectors by id, then `iters` Lloyd rounds — assign every
    * vector to its nearest centroid by cosine (id tie-break), recompute
    * centroids as element-wise means. Entirely DataFrame ops: assignment
    * is a broadcast of k centroids against the corpus scan; the update is
    * one posexplode + two keyed aggregations. Deterministic: same data →
    * same centroids, any partitioning (mean is order-free in double only
    * approximately, but the assignment argmax is computed on rounded
    * similarity, and centroid means feed back only through that rounding
    * — stable in practice and covered by the determinism spec).
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    var centroids = emb.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("seed_id"),
        col("embedding").cast("array<double>").as("seed_vec"))
    for (_ <- 0 until iters) {
      val w = Window.partitionBy(col("vec_id")).orderBy(
        round(cosine(col("embedding"), col("seed_vec")), 6).desc, col("seed_id"))
      val assigned = emb.crossJoin(broadcast(centroids))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("seed_id"), col("embedding").cast("array<double>").as("v"))
      centroids = assigned
        .select(col("seed_id"), posexplode(col("v")))
        .groupBy(col("seed_id"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("seed_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("seed_vec"))
    }
    centroids
  }

  /** IVF-style ANN: `seeds` are the centroid set (bootstrap via
    * [[kmeansCentroids]] or any deterministic pick). Every corpus vector
    * is assigned to its
    * nearest seed; each query probes its `probes` nearest seed buckets
    * and ranks only those vectors.
    */
  def ivfTopK(corpus: DataFrame, seeds: DataFrame, queries: DataFrame,
      k: Int, probes: Int = 2): DataFrame = {
    def nearestSeeds(vecs: DataFrame, vecCol: String, idCol: String,
        n: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(
        round(cosine(col(vecCol), col("seed_vec")), 6).desc, col("seed_id"))
      vecs.crossJoin(broadcast(seeds))
        .withColumn("seed_rank", row_number().over(w))
        .filter(col("seed_rank") <= n)
    }
    val assigned = nearestSeeds(corpus, "embedding", "vec_id", 1)
      .select(col("vec_id"), col("embedding"), col("seed_id").as("bucket"))
    val probed = nearestSeeds(queries, "query_vec", "query_id", probes)
      .select(col("query_id"), col("query_vec"), col("seed_id").as("bucket"))
    val scored = probed.join(assigned, "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("query_vec"), col("embedding")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("vec_id").as("neighbor_id"), col("sim"))
  }
}
