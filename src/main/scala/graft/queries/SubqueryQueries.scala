package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery decorrelation (SURVEY.md §2 "Subquery decorrelation" row): the
  * reference claims subquery support (reference README.md:110) but lowers
  * subqueries to joins BEFORE plan serialization, so the proto never shows
  * them — the observable surface is SQL text in, join plans out. This file
  * exercises exactly that surface on Spark: each query is ONE SQL text
  * (modulo table names) run by BOTH engines — Spark parses it and
  * Catalyst's RewritePredicateSubquery / scalar-subquery decorrelation
  * rules lower EXISTS / NOT EXISTS / IN / NOT IN / correlated scalar
  * aggregates to semi / anti / null-aware-anti / aggregate-then-join
  * plans, while DuckDB runs the same text as the oracle. PlanShapeSpec
  * pins the lowering (semi/anti joins present, no per-row subquery
  * re-execution, no CartesianProduct).
  *
  * Why SQL text and not the DataFrame API here: the DataFrame API has no
  * EXISTS/IN-subquery surface — hand-writing the semi join would test our
  * own rewrite, not the engine's. The decorrelation rules are the
  * component under test.
  *
  * Scale story (common): decorrelation is precisely what makes these
  * 100 TB-safe — a correlated subquery executed per outer row is O(n)
  * queries; the decorrelated plan is one shuffle-or-broadcast join per
  * subquery, chosen by stats/AQE like any other join. Per-query notes
  * inline.
  *
  * Driver-schema adaptations (TESTDATA.md): lineitem has no
  * l_commitdate/l_receiptdate → "late" is l_shipdate vs o_orderdate + an
  * interval; customer has no c_phone → cntrycode is c_nationkey % 10.
  */
object SubqueryQueries {

  /** Render one SQL text against bare (DuckDB) or prefixed (Spark temp
    * view) table names — the ONLY difference between the two engines'
    * query strings. */
  private type Sql = String => String

  /** Register the tables a query reads under scoped, per-directory view
    * names and run the text — shared [[Q.sqlRun]] machinery. */
  private def run(tables: String*)(sql: Sql): (SparkSession, String) => DataFrame =
    Q.sqlRun("sq", tables: _*)(sql)

  // TPC-H Q4 (order priority checking): correlated EXISTS → left-semi
  // join on o_orderkey. Scale: the date window prunes orders at the scan;
  // the semi join ships each lineitem key at most once (semi, not inner —
  // no fan-out on multi-line orders) and the interval predicate rides the
  // join as a non-equi residual, not a per-row subquery.
  private val q4: Sql = p =>
    s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
       |FROM ${p}orders
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1996-07-01'
       |  AND EXISTS (SELECT 1 FROM ${p}lineitem
       |              WHERE l_orderkey = o_orderkey
       |                AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // TPC-H Q17 (small-quantity-order revenue): correlated scalar AVG →
  // decorrelated to a per-partkey aggregate joined back on l_partkey.
  // Scale: the naive plan is one AVG query per outer row; the decorrelated
  // plan aggregates lineitem ONCE (two-phase, map-side partial) and joins.
  // AVG(l_quantity) is exact cross-engine: quantities are integral doubles
  // (≤50), so the double sum is order-independent. Money sum is decimal.
  private val q17: Sql = p =>
    s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
       |FROM ${p}lineitem, ${p}part
       |WHERE p_partkey = l_partkey AND p_brand = 'Brand#12'
       |  AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
       |                    FROM ${p}lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  // TPC-H Q21 (suppliers who kept orders waiting): EXISTS + NOT EXISTS on
  // the same table with a two-column correlation (l_orderkey from l1,
  // o_orderdate from orders) → one left-semi + one left-anti join on
  // l_orderkey. Scale: both subquery joins key on l_orderkey, the same key
  // as the l1⋈orders join, so AQE can pipeline them in one shuffle
  // lineage; nation is a broadcast dim. No per-row re-scan of lineitem.
  private val q21: Sql = p =>
    s"""SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
       |FROM ${p}supplier, ${p}lineitem l1, ${p}orders, ${p}nation
       |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
       |  AND o_orderstatus = 'F'
       |  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
       |  AND s_nationkey = n_nationkey
       |  AND n_name IN ('NATION_7', 'NATION_8', 'NATION_9')
       |  AND EXISTS (SELECT 1 FROM ${p}lineitem l2
       |              WHERE l2.l_orderkey = l1.l_orderkey
       |                AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM ${p}lineitem l3
       |                  WHERE l3.l_orderkey = l1.l_orderkey
       |                    AND l3.l_suppkey <> l1.l_suppkey
       |                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
       |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  // TPC-H Q22 (global sales opportunity): uncorrelated scalar subquery
  // (computed once, broadcast as a literal into every task) + NOT EXISTS
  // anti join. The scalar AVG is decimal-sum-then-divide so both engines
  // derive the identical threshold (a bare AVG(double) would let
  // merge-order noise flip boundary rows). Scale: scalar subquery is one
  // tiny aggregate; the anti join shuffles on custkey like any join.
  private val q22: Sql = p =>
    s"""SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode,
       |  CAST(COUNT(*) AS BIGINT) AS numcust,
       |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
       |FROM ${p}customer
       |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
       |                          / COUNT(*)
       |                   FROM ${p}customer WHERE c_acctbal > 0)
       |  AND NOT EXISTS (SELECT 1 FROM ${p}orders
       |                  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
       |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin

  // IN (subquery) → left-semi join. Scale: semi join on custkey — the
  // subquery side is deduplicated by the semi semantics (no DISTINCT
  // needed, no fan-out), broadcast or shuffled from stats.
  private val inSql: Sql = p =>
    s"""SELECT c_custkey, c_name FROM ${p}customer
       |WHERE c_custkey IN (SELECT o_custkey FROM ${p}orders
       |                    WHERE o_totalprice > 400000)
       |ORDER BY c_custkey""".stripMargin

  // NOT IN (nullable subquery) → null-aware anti join. NULLIF keeps the
  // subquery column nullable, forcing Spark's NAAJ path (three-valued
  // logic: one NULL in the set empties the result — the planner cannot
  // use a plain anti join). Scale note IN THE PLAN: null-aware anti join
  // requires a broadcast build side in Spark; at 100 TB prefer NOT EXISTS
  // (plain anti join, q22) unless the subquery is provably small — this
  // row exists to pin the semantics + the NAAJ lowering, and its build
  // side (55 distinct suppkeys) is exactly the provably-small case.
  private val notInSql: Sql = p =>
    s"""SELECT s_suppkey, s_name FROM ${p}supplier
       |WHERE s_suppkey NOT IN (SELECT NULLIF(l_suppkey, -1) FROM ${p}lineitem
       |                        WHERE l_quantity > 49 AND l_partkey < 120)
       |ORDER BY s_suppkey""".stripMargin

  // Scalar subquery in the SELECT list: executed once, result inlined
  // into the projection of every row (Spark: ScalarSubquery reused across
  // the stage; never per-row). Scale: the denominator is one COUNT over
  // supplier, not a join.
  private val scalarProj: Sql = p =>
    s"""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_sup,
       |  CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM ${p}supplier) AS share
       |FROM ${p}supplier JOIN ${p}nation ON s_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  // Correlated EXISTS / NOT EXISTS in one statement: EXISTS lowers to a
  // left-semi join on the correlation key, NOT EXISTS to a PLAIN anti
  // join (no null-awareness needed — the correlation predicate can't be
  // null-confused the way NOT IN can, which is why q22 and every
  // 100 TB-scale anti pattern should prefer this spelling over NOT IN).
  // Both branches share one orders scan per side, keyed on custkey.
  private val existsSql: Sql = p =>
    s"""SELECT c_custkey, c_name FROM ${p}customer c
       |WHERE EXISTS (SELECT 1 FROM ${p}orders o
       |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
       |  AND NOT EXISTS (SELECT 1 FROM ${p}orders o
       |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
       |                    AND o.o_totalprice < 50000)
       |ORDER BY c_custkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_tpch_q4", q4(""))(run("orders", "lineitem")(q4)),
    Q("q_tpch_q17", q17(""))(run("lineitem", "part")(q17)),
    Q("q_tpch_q21", q21(""))(run("supplier", "lineitem", "orders", "nation")(q21)),
    Q("q_tpch_q22", q22(""))(run("customer", "orders")(q22)),
    Q("q_subq_in", inSql(""))(run("customer", "orders")(inSql)),
    Q("q_subq_not_in", notInSql(""))(run("supplier", "lineitem")(notInSql)),
    Q("q_subq_scalar_proj", scalarProj(""))(run("supplier", "nation")(scalarProj)),
    Q("q_subq_exists", existsSql(""))(run("customer", "orders")(existsSql))
  )
}
