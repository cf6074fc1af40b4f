package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Bronze, Gold, Merge, Silver}

/** The oracle-verified query registry (driver contract, SparkEntry).
  *
  * Every query here is DETERMINISTIC (FIXTURES.md rules): no wall-clock, no
  * partition-dependent ids, explicit orderBy on key columns, and money
  * aggregates summed in DecimalType so the result is bit-identical
  * regardless of partitioning/parallelism — which is both what the DuckDB
  * oracle hash needs and what makes results reproducible on a real
  * cluster.
  */
object Queries {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.load(s, d, name)

  /** Decimal-exact revenue: inputs cast to decimal FIRST (both are stored
    * 2-decimal values, so the cast is unambiguous — no .005 rounding ties,
    * unlike casting the double product), then multiplied and summed in
    * exact decimal arithmetic. Bit-identical in Spark and DuckDB at any
    * parallelism.
    */
  private def revenueDec =
    col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(4, 2)))

  // ---------------------------------------------------------------- M0

  /** Flagship (SURVEY.md §7 M0): cleanse → DQ gate → dedup → join
    * orders→customer→nation → monthly revenue by nation. Exercises scan,
    * filter, conditional, window, broadcast join and agg in one plan.
    */
  def flagship(s: SparkSession, d: String): DataFrame = {
    val clean = Silver.cleanseLineitem(t(s, d, "lineitem"))
    val (pass, _) = Silver.quarantineSplit(Silver.applyDqRules(clean))
    // tie-break beyond ship_date: duplicate claim lines can share the
    // latest date with different amounts, and "pick any" is not a
    // deterministic (or oracle-checkable) semantics
    val deduped = Silver.dedupLatest(
      pass, Seq("l_orderkey", "l_linenumber"),
      Seq(col("ship_date").desc, col("l_extendedprice").desc,
        col("l_discount").desc, col("l_quantity").desc))
    deduped
      .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(date_format(col("ship_date"), "yyyy-MM").as("ship_month"),
        col("n_name").as("nation"))
      .agg(sum(revenueDec).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("ship_month", "nation")
  }

  val flagshipOracle: String =
    """WITH clean AS (
      |  SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity,
      |         CAST(l_shipdate AS DATE) AS ship_date,
      |         CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev
      |  FROM lineitem
      |  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
      |    AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
      |    AND NOT (l_shipdate > TIMESTAMP '2005-01-01')
      |    AND regexp_matches(l_returnflag, '^[ANR]$')
      |    AND l_extendedprice > 0 AND l_quantity > 0
      |    AND l_discount >= 0 AND l_discount <= 1
      |), dedup AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
      |                                 ORDER BY ship_date DESC, l_extendedprice DESC,
      |                                          l_discount DESC, l_quantity DESC) AS rn
      |    FROM clean) WHERE rn = 1
      |)
      |SELECT strftime(ship_date, '%Y-%m') AS ship_month, n_name AS nation,
      |       CAST(SUM(rev) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
      |FROM dedup
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------- registries

  /** name → query; merged into SparkEntry.queries. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
      "q01_flagship_revenue" -> (flagship(_, _))
    ) ++ CoreQueries.queries ++ LlmQueries.queries ++ ExtQueries.queries

  /** name → DuckDB oracle SQL; merged into SparkEntry.oracleSql. */
  def oracleSql: Map[String, String] = Map(
    "q01_flagship_revenue" -> flagshipOracle
  ) ++ CoreQueries.oracleSql ++ LlmQueries.oracleSql ++ ExtQueries.oracleSql
}
