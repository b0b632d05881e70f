package graft

/** The driver's own smoke contract: `SparkEntry.entry(spark)` must run
  * on sf0.001 and produce rows (TPC-H Q1's four groups), and every
  * catalog entry must resolve through `queries` with an `oracleSql`
  * alias set that matches (DocsSpec covers alias content). */
class SmokeSpec extends GraftSuite {

  test("entry() produces the TPC-H Q1 groups on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    // the driver's synthetic lineitem populates all 6 flag/status groups
    // (unlike classic TPC-H's 4 — A/O and R/O exist here)
    assert(rows.length == 6, rows.mkString(";"))
    assert(rows.map(_.getString(0)).toSet == Set("A", "N", "R"))
    assert(rows.map(_.getString(1)).toSet == Set("F", "O"))
    assert(rows.map(_.getLong(9)).sum > 0)
  }

  test("queries and oracleSql are consistent with the catalog") {
    assert(SparkEntry.queries.size == SparkEntry.catalog.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.size == SparkEntry.catalog.count(_.oracle.isDefined))
    assert(SparkEntry.catalog.map(_.name).distinct.size == SparkEntry.catalog.size,
      "duplicate query names would silently drop catalog entries in the map")
  }
}
