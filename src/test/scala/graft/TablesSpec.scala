package graft

/** The per-(session, path) relation memo and its explicit escape hatch. */
class TablesSpec extends SparkSpec {

  test("load memoizes per (session, path); invalidate() drops the memo " +
      "and the reload still reads the same data") {
    val a = Tables.load(spark, sf, "region")
    val b = Tables.load(spark, sf, "region")
    assert(a eq b, "same session+path must return the memoized instance")
    val rows = a.count()
    Tables.invalidate()
    val c = Tables.load(spark, sf, "region")
    assert(!(c eq a), "invalidate must force a fresh relation (re-listed, " +
      "footers re-read)")
    assert(c.count() == rows, "reload must see the same data")
    // and the fresh relation memoizes again
    assert(Tables.load(spark, sf, "region") eq c)
  }
}
