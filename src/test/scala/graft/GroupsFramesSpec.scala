package graft

import graft.plans.GroupsFrames
import org.apache.spark.sql.functions._

/** Parse-level GROUPS window frames (round-12 verdict item #5): the
  * injected parser (GraftExtensions → GroupsFrameParser) must run raw
  * SQL:2011 GROUPS text on any extension-bearing session, and the
  * rewrite must be semantically exact across the bounds grid. The
  * oracle-checked catalog row is q_window_groups_sql; these tests pin
  * the parser wire, the bound translations, and the loud-failure
  * contract for unsupported shapes. */
class GroupsFramesSpec extends GraftSuite {

  private def fixture(): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // groups of unequal size over k: k=1 ×1, k=2 ×2, k=3 ×3, k=5 ×1
    val rows = Seq((1, 10.0), (2, 20.0), (2, 30.0), (3, 1.0), (3, 2.0),
      (3, 4.0), (5, 100.0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.zipWithIndex.map { case ((k, v), i) =>
        Row(i.toLong, k, v) }, 2),
      StructType(Seq(StructField("id", LongType), StructField("k", IntegerType),
        StructField("v", DoubleType))))
      .createOrReplaceTempView("gf_t")
  }

  test("raw GROUPS SQL text parses and runs on an extension session (the parser wire)") {
    // The shared test session carries GraftExtensions, exactly like
    // Engine.session and the wire server — so spark.sql sees the raw
    // text; no explicit rewrite call anywhere in this test.
    fixture()
    val got = spark.sql(
      """SELECT id, SUM(v) OVER (ORDER BY k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM gf_t ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // group sums: k1=10, k2=50, k3=7, k5=100; 1 GROUP preceding + peers
    val want = Seq(0L -> 10.0, 1L -> 60.0, 2L -> 60.0, 3L -> 57.0,
      4L -> 57.0, 5L -> 57.0, 6L -> 107.0)
    assert(got.toSeq == want, got.mkString(","))
  }

  test("bounds grid matches the dense_rank composition on every frame") {
    fixture()
    val frames = Seq(
      "UNBOUNDED PRECEDING AND CURRENT ROW",
      "2 PRECEDING AND 1 PRECEDING",
      "1 PRECEDING AND 1 FOLLOWING",
      "CURRENT ROW AND UNBOUNDED FOLLOWING",
      "1 FOLLOWING AND UNBOUNDED FOLLOWING")
    frames.foreach { f =>
      val got = spark.sql(
        s"""SELECT id, SUM(v) OVER (ORDER BY k GROUPS BETWEEN $f) AS s
           |FROM gf_t ORDER BY id""".stripMargin)
        .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
      val want = spark.sql(
        s"""WITH r AS (SELECT id, v, DENSE_RANK() OVER (ORDER BY k) AS g FROM gf_t)
           |SELECT id, SUM(v) OVER (ORDER BY g RANGE BETWEEN $f) AS s
           |FROM r ORDER BY id""".stripMargin)
        .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
      assert(got.toSeq == want.toSeq, s"frame $f: got=${got.mkString(",")}")
    }
  }

  test("two GROUPS windows over the same spec share one cells subquery (collapse)") {
    fixture()
    // Round-17: decomposable aggregates take the peer-group COLLAPSE —
    // one cells join per (partition, order) spec, both frames windowed
    // over the same model-sized cells frame, no corpus window at all.
    val rewritten = GroupsFrames.rewrite(
      """SELECT id,
        |  SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a,
        |  COUNT(*) OVER (ORDER BY k GROUPS BETWEEN 2 PRECEDING AND CURRENT ROW) AS b
        |FROM gf_t""".stripMargin)
    assert(rewritten.contains("__gcells0") && !rewritten.contains("__gcells1"), rewritten)
    assert(rewritten.contains("__gw0_0") && rewritten.contains("__gw0_1"), rewritten)
    assert(spark.sql(rewritten).count() == 7)
  }

  test("WITH prefix is preserved; PARTITION BY carries through") {
    fixture()
    val got = spark.sql(
      """WITH doubled AS (SELECT id, k % 2 AS p, k, v * 2 AS v2 FROM gf_t)
        |SELECT id, SUM(v2) OVER (PARTITION BY p ORDER BY k
        |  GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |FROM doubled ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // p=1 (k odd: k1=20, k3=14, k5=200), p=0 (k2=100)
    val want = Seq(0L -> 20.0, 1L -> 100.0, 2L -> 100.0, 3L -> 34.0,
      4L -> 34.0, 5L -> 34.0, 6L -> 234.0)
    assert(got.toSeq == want, got.mkString(","))
  }

  test("unsupported shapes fail loudly, never silently misparse") {
    fixture()
    // GROUP BY at top level: SELECT * hoisting would change meaning
    val e1 = intercept[IllegalArgumentException](spark.sql(
      "SELECT k, SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM gf_t GROUP BY k"))
    assert(e1.getMessage.contains("GROUP BY"), e1.getMessage)
    // DISTINCT
    val e3 = intercept[IllegalArgumentException](spark.sql(
      "SELECT DISTINCT SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM gf_t"))
    assert(e3.getMessage.contains("DISTINCT"), e3.getMessage)
    // star projection in the frame-carrying block: the wrapper's synthetic
    // __gdr column would silently join the star's expansion — refuse
    // (round-13 ADVICE). Bare star, trailing star, and qualified star.
    Seq(
      "SELECT *, SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM gf_t",
      "SELECT SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s, * FROM gf_t",
      "SELECT t.*, SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM gf_t t"
    ).foreach { q =>
      val e = intercept[IllegalArgumentException](spark.sql(q))
      assert(e.getMessage.contains("star projection"), s"$q => ${e.getMessage}")
    }
    // ...but a multiplication star is NOT a projection star
    assert(spark.sql(
      """SELECT id, v * 2 AS d, 2 * (v + 1) AS e,
        |  SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM gf_t""".stripMargin).count() == 7)
    // count(*) is inside parens — also not a projection star
    assert(spark.sql(
      """SELECT id, COUNT(*) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c
        |FROM gf_t""".stripMargin).count() == 7)
  }

  test("GROUPS frames inside subqueries and CTE bodies are rewritten recursively (round-14)") {
    fixture()
    // buried in a derived table: each block rewrites against its own
    // dense_rank column; the OUTER star is fine (outer block carries no
    // frame, so no wrapper is added around it)
    val sub = spark.sql(
      """SELECT * FROM (SELECT id, SUM(v) OVER (ORDER BY k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM gf_t) x
        |ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = Seq(0L -> 10.0, 1L -> 60.0, 2L -> 60.0, 3L -> 57.0,
      4L -> 57.0, 5L -> 57.0, 6L -> 107.0)
    assert(sub.toSeq == want, sub.mkString(","))
    // in a CTE body (the JDBC-user shape from the round-13 verdict)
    val cte = spark.sql(
      """WITH w AS (
        |  SELECT id, SUM(v) OVER (ORDER BY k
        |    GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |  FROM gf_t)
        |SELECT id, s FROM w ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(cte.toSeq == want, cte.mkString(","))
    // a (WITH ... SELECT ...) derived table — previously a loud refusal
    val nested = spark.sql(
      """SELECT a FROM (WITH c AS (SELECT * FROM gf_t)
        |  SELECT id, SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a
        |  FROM c) d ORDER BY a""".stripMargin).collect()
    assert(nested.length == 7)
    // frames in BOTH the CTE body and the outer block: two independent
    // rewrites, each against its own rank column
    val both = spark.sql(
      """WITH w AS (
        |  SELECT id, k, v, SUM(v) OVER (ORDER BY k
        |    GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM gf_t)
        |SELECT id, run, MAX(run) OVER (ORDER BY k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS m
        |FROM w ORDER BY id""".stripMargin).collect()
    assert(both.length == 7)
    // unsupported shape INSIDE a subquery still fails loudly through the
    // recursion (DISTINCT in the frame-carrying inner block)
    val e = intercept[IllegalArgumentException](spark.sql(
      """SELECT s FROM (SELECT DISTINCT SUM(v) OVER (ORDER BY k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM gf_t) x""".stripMargin))
    assert(e.getMessage.contains("DISTINCT"), e.getMessage)
  }

  test("comments, qualified references, and mixed identifier+frame statements (review hardening)") {
    fixture()
    // (1) an apostrophe inside a line comment must not open a phantom
    // quote that hides FROM from the scanner
    val withComment = spark.sql(
      """SELECT id, SUM(v) OVER (ORDER BY k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s -- user's total
        |FROM gf_t ORDER BY id""".stripMargin).collect()
    assert(withComment.length == 7)
    // (2) single-relation FROM keeps its visible name as the wrapper
    // alias, so table-qualified references still resolve after hoisting
    val qualified = spark.sql(
      """SELECT gf_t.id, SUM(gf_t.v) OVER (ORDER BY gf_t.k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM gf_t WHERE gf_t.k > 0 ORDER BY gf_t.id""".stripMargin).collect()
    assert(qualified.length == 7)
    // and with an explicit alias
    val aliased = spark.sql(
      """SELECT t.id, SUM(t.v) OVER (ORDER BY t.k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM gf_t AS t ORDER BY t.id""".stripMargin).collect()
    assert(aliased.length == 7)
    // (3) a column named `groups` used with BETWEEN alongside a REAL
    // GROUPS frame: the frame rewrites, the identifier must not trip the
    // leftover-frame check
    spark.sql("SELECT id, k, v, k AS groups FROM gf_t").createOrReplaceTempView("gf_g")
    val mixed = spark.sql(
      """SELECT id, SUM(v) OVER (ORDER BY k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM gf_g WHERE groups BETWEEN 1 AND 5 ORDER BY id""".stripMargin).collect()
    assert(mixed.length == 7)
    // (4) a parenthesized (WITH ... SELECT ...) derived table is rewritten
    // by the round-14 recursion as its own block — never against the
    // OUTER block's dense_rank column (covered in the recursive-rewrite
    // test below); here just pin that the rewrite stays block-local: the
    // outer statement gains no __gdr wrapper of its own
    val rw = GroupsFrames.rewrite(
      """SELECT a FROM (WITH c AS (SELECT * FROM gf_t)
        |  SELECT id, SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a
        |  FROM c) d""".stripMargin)
    assert(rw.trim.startsWith("SELECT a FROM ("), rw)
    assert(rw.contains("__gcells0"), rw) // inner block took the collapse
  }

  test("collapse semantics: NULL keys, DESC order, dense_rank routing, AVG fallback") {
    fixture()
    // NULL order keys form their own peer group; the null-safe (<=>)
    // join-back must pair those rows with their cell
    spark.sql(
      """SELECT id, CASE WHEN k = 5 THEN NULL ELSE k END AS k, v FROM gf_t"""
    ).createOrReplaceTempView("gf_n")
    val coll = spark.sql(
      """SELECT id, SUM(v) OVER (ORDER BY k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM gf_n ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val general = spark.sql(
      """WITH r AS (SELECT id, v, DENSE_RANK() OVER (ORDER BY k) AS g FROM gf_n)
        |SELECT id, SUM(v) OVER (ORDER BY g RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM r ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(coll.toSeq == general.toSeq,
      s"null-key collapse: ${coll.mkString(",")} vs ${general.mkString(",")}")
    assert(coll.count(_ => true) == 7)

    // DESC order direction carries into the cells rank + window
    val desc = spark.sql(
      """SELECT id, SUM(v) OVER (ORDER BY k DESC
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM gf_t ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val descWant = spark.sql(
      """WITH r AS (SELECT id, v, DENSE_RANK() OVER (ORDER BY k DESC) AS g FROM gf_t)
        |SELECT id, SUM(v) OVER (ORDER BY g RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM r ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(desc.toSeq == descWant.toSeq, desc.mkString(","))

    // a bare same-keyed DENSE_RANK routes to the cells' rank column —
    // no outer corpus window survives in the rewritten text
    val routed = GroupsFrames.rewrite(
      """SELECT id, DENSE_RANK() OVER (ORDER BY k) AS dr,
        |  SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM gf_t""".stripMargin)
    assert(routed.contains("__gcells0.__gdrc0"), routed)
    assert(!routed.contains("DENSE_RANK() OVER (ORDER BY k)"), routed)
    assert(spark.sql(routed).count() == 7)

    // an UNRELATED window (different keys / non-rank fn) just stays on
    // the outer block — collapse still applies to the GROUPS frame
    val mixed = spark.sql(
      """SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rn,
        |  SUM(v) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM gf_t ORDER BY id""".stripMargin).collect()
    assert(mixed.length == 7 && mixed.map(_.getInt(1)).toSeq == (1 to 7),
      mixed.mkString(","))

    // AVG is NOT decomposed (type-exact SUM/COUNT decomposition is
    // engine-typing-dependent): falls back to the general two-window
    // form — and still computes the right values there
    val avgRw = GroupsFrames.rewrite(
      """SELECT id, AVG(v) OVER (ORDER BY k
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a
        |FROM gf_t""".stripMargin)
    assert(avgRw.contains("__gdr0") && !avgRw.contains("__gcells"), avgRw)
    assert(spark.sql(avgRw).count() == 7)
  }

  test("'groups' as an identifier is untouched; statements without GROUPS frames are identity") {
    val sql1 = "SELECT k AS groups, v FROM gf_t WHERE k > 0 ORDER BY groups"
    assert(GroupsFrames.rewrite(sql1) eq sql1) // identity, same instance
    fixture()
    assert(spark.sql(sql1).count() == 7)
    // a column NAMED groups used with BETWEEN trips the cheap guard but
    // carries no GROUPS-framed OVER clause: must pass through untouched
    val sql2 = "SELECT id FROM gf_t WHERE k BETWEEN 1 AND 3 AND id >= 0 ORDER BY id"
    val sql3 = "SELECT k AS groups FROM gf_t WHERE k BETWEEN 2 AND 3"
    assert(GroupsFrames.rewrite(sql3) == sql3)
    assert(spark.sql("SELECT groups FROM (" + sql3 + ") WHERE groups BETWEEN 2 AND 3").count() == 5)
    assert(spark.sql(sql2).count() == 6)
    // quoted literal containing the frame text: the scanner skips quotes,
    // no OVER span matches, statement unchanged
    val sql4 = "SELECT 'GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW' AS s"
    assert(GroupsFrames.rewrite(sql4) == sql4)
    assert(spark.sql(sql4).head().getString(0).startsWith("GROUPS"))
  }
}
