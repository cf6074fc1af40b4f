package graft

import org.apache.spark.sql.functions._

/** The pure-SQL face of the engine: fixture tables registered as views,
  * representative queries run through spark.sql (a reference user working
  * in SQL cells gets the same engine).
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("registered views + spark.sql reproduce the DataFrame results") {
    Seq("lineitem", "orders", "customer", "nation", "documents")
      .foreach(t => Tables.load(spark, sf, t).createOrReplaceTempView(t))
    GraftFunctions.register(spark)
    val sqlRevenue = spark.sql(
      """SELECT n_name AS nation,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(sqlRevenue.count() > 0)
    // native expressions via SQL over a registered corpus view
    val sims = spark.sql(
      """SELECT doc_id, size(word_shingles(text, 5)) AS n_shingles
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin)
      .as[(Long, Int)].collect()
    assert(sims.forall(_._2 > 0))
  }

  test("SQL-only cookbook: extensions-registered functions inside a MERGE + rollup") {
    // the SQL-only user's session: extensions injected at build time
    // (spark.sql.extensions=graft.expressions.GraftExtensions), every
    // step spark.sql — no Column API anywhere
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new graft.expressions.GraftExtensions).getOrCreate()
    try {
      Tables.load(s2, sf, "customer").createOrReplaceTempView("customer")
      // cleanse with a registered codegen'd kernel (unicode_normalize),
      // stage an updates batch, MERGE it (updateAll+insertAll as the
      // engine's anti-join ∪ source form), roll up bucketed by another
      // registered kernel (min_shingle_hash)
      s2.sql("""CREATE OR REPLACE TEMP VIEW target0 AS
        |SELECT c_custkey AS k, unicode_normalize(trim(c_name), 'NFC') AS name,
        |       CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |FROM customer""".stripMargin)
      s2.sql("""CREATE OR REPLACE TEMP VIEW updates AS
        |SELECT k, name, bal * 2 AS bal FROM target0 WHERE k % 10 = 0""".stripMargin)
      s2.sql("""CREATE OR REPLACE TEMP VIEW merged AS
        |SELECT * FROM updates
        |UNION ALL
        |SELECT t.* FROM target0 t LEFT ANTI JOIN updates u ON t.k = u.k""".stripMargin)
      val sqlRollup = s2.sql("""
        |SELECT substr(min_shingle_hash(name, 1), 1, 1) AS bucket,
        |       count(*) AS n, CAST(sum(bal) AS DOUBLE) AS total
        |FROM merged GROUP BY 1""".stripMargin)
      // pin against the Scala-API pipeline: Merge.upsert + the same
      // rollup through the Column-side kernels — identical rows
      val target = s2.table("target0")
      val scalaRollup = graft.operators.Merge
        .upsert(target, s2.table("updates"), Seq("k"))
        .groupBy(substring(
          graft.expressions.MinShingleHash.minShingleHash(col("name"), 1), 1, 1)
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum("bal").cast("double").as("total"))
      assert(sqlRollup.exceptAll(scalaRollup).isEmpty
        && scalaRollup.exceptAll(sqlRollup).isEmpty,
        "SQL-only pipeline must equal the Scala-API pipeline row-for-row")
      // the merge actually upserted: doubled balances for the k%10 slice
      val probe = s2.sql(
        "SELECT count(*) FROM merged m JOIN target0 t ON m.k = t.k " +
          "AND m.k % 10 = 0 AND m.bal = t.bal * 2").head().getLong(0)
      assert(probe > 0, "updated rows must carry the source values")
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    }
  }
}
