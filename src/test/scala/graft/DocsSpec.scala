package graft

/** Keeps the judge-facing docs honest: every catalog query must appear
  * in PARITY.md (the SURVEY §2 evidence map), so adding an operator
  * without documenting it fails the build. */
class DocsSpec extends GraftSuite {

  test("every catalog query is documented in PARITY.md") {
    val parity = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("PARITY.md")))
    val missing = SparkEntry.catalog.map(_.name).filterNot(parity.contains)
    assert(missing.isEmpty, s"undocumented queries: ${missing.mkString(", ")}")
  }

  test("every oracle query has matching column aliases in spark and sql") {
    // cheap sanity: the oracle SQL must mention every output column name
    // the Spark side produces (the gate sorts columns by name)
    SparkEntry.catalog.filter(_.oracle.isDefined).foreach { q =>
      val cols = q.run(spark, sf).columns
      val sql = q.oracle.get.toLowerCase
      val missing = cols.filterNot(c => sql.contains(c.toLowerCase))
      assert(missing.isEmpty,
        s"${q.name}: oracle SQL lacks column aliases ${missing.mkString(", ")}")
    }
  }

  test("every catalog query has a recorded BASELINE.md bench row") {
    // the perf gate compares BENCH_rN against these rows; a query added
    // without recording its baseline silently escapes the 2x gate
    val baseline = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("BASELINE.md")))
    val missing = SparkEntry.catalog.map(_.name)
      .filterNot(n => baseline.contains(s"| $n | 0.1 |"))
    assert(missing.isEmpty, s"queries without a bench baseline: ${missing.mkString(", ")}")
  }
}
