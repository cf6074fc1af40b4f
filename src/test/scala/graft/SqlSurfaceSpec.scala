package graft

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
}
