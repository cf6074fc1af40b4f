package graft.expressions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.SimilarityOps

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native codegen expression is bit-identical to the HOF formulation") {
    val e = Tables.embeddings(spark, sf)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < 20 && col("b.vec_id") < 20)
    val diff = pairs.select(
      SimilarityOps.cosine(col("a.embedding"), col("b.embedding")).as("native"),
      SimilarityOps.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .filter(!(col("native") <=> col("hof")))
    assert(diff.count() == 0, "native and HOF cosine must agree bit-for-bit")
  }

  test("expression participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf).limit(10)
    val plan = e.select(SimilarityOps.cosine(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the *(n) prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [cosine_similarity"),
      s"expected the projection inside a codegen stage in:\n$plan")
  }

  test("known values: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(1f, 2f), 1.0),
      (Array(1f, 1f), Array(-1f, -1f), -1.0),
    ).toDF("a", "b", "expected")
    val bad = df.filter(
      abs(SimilarityOps.cosine(col("a"), col("b")) - col("expected")) > 1e-12)
    assert(bad.count() == 0)
  }
}
