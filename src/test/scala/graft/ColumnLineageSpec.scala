package graft

import org.apache.spark.sql.functions._

import graft.tools.ColumnLineage

/** Leaf fixtures as case classes so the LocalRelation's own attribute
  * names (not tuple `_1`/`_2`) are what lineage reports.
  */
case class LinA(k: Long, v: String)
case class LinB(k2: Long, v2: String)
case class LinC(id: Long, toks: Seq[String])

/** Column-provenance extraction: derived columns trace to exactly the
  * leaf fields whose values can flow into them, through projects,
  * aggregates, joins, unions and explodes.
  */
class ColumnLineageSpec extends SparkSpec {
  import spark.implicits._

  test("derived column traces through join + aggregate to both leaf tables") {
    val li = Tables.load(spark, sf, "lineitem")
    val ord = Tables.load(spark, sf, "orders")
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
    val lin = ColumnLineage.lineage(df)
    assert(lin("revenue") ==
      Set("lineitem.l_extendedprice", "lineitem.l_discount"), lin("revenue"))
    assert(lin("o_orderstatus") == Set("orders.o_orderstatus"))
  }

  test("union merges lineage positionally; rename keeps provenance") {
    val a = Seq(LinA(1L, "x")).toDS().toDF()
      .select(col("k"), col("v").as("w"))
    val b = Seq(LinB(2L, "y")).toDS().toDF()
      .select(col("k2").as("k"), col("v2").as("w"))
    val lin = ColumnLineage.lineage(a.unionByName(b))
    assert(lin("w") == Set("local.v", "local.v2"), lin("w"))
    assert(lin("k") == Set("local.k", "local.k2"), lin("k"))
  }

  test("explode output traces to the generator's input column") {
    val df = Seq(LinC(1L, Seq("a", "b"))).toDS().toDF()
      .select(col("id"), explode(col("toks")).as("tok"))
    val lin = ColumnLineage.lineage(df)
    assert(lin("tok") == Set("local.toks"), lin("tok"))
    assert(lin("id") == Set("local.id"))
  }

  test("a real pipeline query yields leaf provenance; counts alone may be empty") {
    val df = SparkEntry.queries("q01_flagship_revenue")(spark, sf)
    val lin = ColumnLineage.lineage(df)
    assert(lin.nonEmpty)
    // a pure count(lit(1)) column legitimately has NO value lineage —
    // everything else must trace to at least one leaf field
    val empty = lin.filter(_._2.isEmpty).keys.toSet
    assert(empty.subsetOf(Set("n_lines")), s"unexpected empty lineage: $empty")
    val revCol = lin.keys.find(_.contains("revenue")).getOrElse(
      fail(s"no revenue column in ${lin.keys}"))
    assert(lin(revCol).exists(_.startsWith("lineitem.")),
      s"$revCol lineage ${lin(revCol)} misses lineitem")
    graft.CacheScope.drain(spark, blocking = true)
  }
}
