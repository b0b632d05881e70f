package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Qh._

/** Multi-join TPC-H-class queries (SURVEY.md §2.4 depth): the reference's
  * own distributed-planner tests are multi-stage TPC-H shapes
  * (reference ballista/scheduler/src/planner.rs:257-570 plans Q3/Q12-class
  * trees into shuffle stages); this file provides the 3-to-6-table
  * analogs over the driver tables, each a full DuckDB oracle row.
  *
  * Parameter adaptations to the driver schema (TESTDATA.md): there is no
  * `partsupp` table and no `o_shippriority`/`l_commitdate` columns, so Q9
  * substitutes `p_retailprice` for `ps_supplycost` and Q3 drops
  * `o_shippriority` from the select list; semantics (join graph, filters,
  * aggregate, top-k) are otherwise the textbook shapes.
  *
  * Scale notes, per query, live on the query. Common to all four:
  * money math is decimal-exact (see [[Qh]]) so results are
  * merge-order-independent across 1000 executors, and every top-k is
  * `orderBy.limit` so it compiles to TakeOrderedAndProject (per-partition
  * heaps + driver merge of k rows), never a global sort.
  */
object TpchQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  /** Exact per-row revenue: extendedprice * (1 - discount), decimal. */
  private def revenueExpr = {
    val one = lit(1).cast(D3)
    col("l_extendedprice").cast(D12) * (one - col("l_discount").cast(D3))
  }
  private val sqlRevenue =
    """CAST(l_extendedprice AS DECIMAL(12,2))
      | * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))""".stripMargin

  /** Derived partsupp: the driver schema ships no `partsupp` table, so
    * the four queries that need one (Q2/Q11/Q16/Q20) derive it — every
    * part gets 4 suppliers with a supply cost (integer CENTS — decimal
    * division scale rules differ across engines, integer cents don't)
    * and an availqty, all PURE INTEGER FUNCTIONS of (p_partkey, k), so
    * both engines materialize the identical relation and the textbook
    * join/subquery shapes run unchanged. The 17·k term stays
    * collision-free mod any driver supplier count (10/100/1000). */
  private def partsupp(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(col("p_partkey"))
      .crossJoin(broadcast(t(s, d, "supplier").agg(count(lit(1)).as("nsupp"))))
      .select(col("p_partkey"), explode(expr("sequence(0, 3)")).as("k"), col("nsupp"))
      .select(col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") * 31 + col("k") * 17 + 7) % col("nsupp")).as("ps_suppkey"),
        ((col("p_partkey") * 13 + col("k") * 7919) % 100000).as("ps_cost_cents"),
        ((col("p_partkey") * 7 + col("k") * 13) % 1000 + 1).as("ps_availqty"))

  private val PsCte =
    """ns AS (SELECT COUNT(*) AS nsupp FROM supplier),
      |ps AS (SELECT p_partkey AS ps_partkey,
      |         (p_partkey * 31 + k * 17 + 7) % nsupp AS ps_suppkey,
      |         (p_partkey * 13 + k * 7919) % 100000 AS ps_cost_cents,
      |         (p_partkey * 7 + k * 13) % 1000 + 1 AS ps_availqty
      |       FROM part, ns, (SELECT unnest(range(0, 4)) AS k))""".stripMargin

  val all: Seq[Q] = Seq(

    // TPC-H Q3 (shipping priority): customer ⋈ orders ⋈ lineitem,
    // opposite-side date filters, revenue per order, top 10.
    // Scale: the mktsegment filter (1/5 of customers) is pushed into the
    // customer scan; orders⋈customer shuffles on custkey BEFORE touching
    // lineitem, so the widest join (lineitem⋈orders on orderkey) sees
    // only date-filtered orders. No broadcast hint — at 100 TB customer
    // is not broadcastable; AQE may still flip the post-filter side to
    // broadcast at runtime from observed sizes (see PlanShapeSpec).
    Q("q_tpch_q3",
      s"""SELECT l_orderkey,
         |  CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue,
         |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING'
         |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-06-30'
         |  AND l_shipdate > TIMESTAMP '1998-06-30'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-06-30").cast("timestamp"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-30").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(revenueExpr).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 (local supplier volume): the 6-table join —
    // customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region, with the
    // Q5 twist that the customer and supplier must share a nation.
    // Scale: region (constant 5 rows) and nation (constant 25) are
    // explicitly broadcast — they never grow with SF, so those two joins
    // cost zero shuffle at any scale. The fact-side join order keeps the
    // biggest table (lineitem) in ONE shuffle pipeline: lineitem⋈orders
    // on orderkey, then ⋈supplier (supplier = SF×100 rows, left to the
    // optimizer/AQE to broadcast or shuffle from stats), then the
    // customer join carries only (custkey, nationkey) forward.
    Q("q_tpch_q5",
      s"""SELECT n_name,
         |  CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val asiaNations = broadcast(
        t(s, d, "nation").join(
          broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey")))
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      t(s, d, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(revenueExpr).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q9 (product-type profit): part ⋈ lineitem ⋈ orders ⋈
    // supplier ⋈ nation, profit per (nation, year). `p_retailprice`
    // stands in for the missing partsupp.ps_supplycost.
    // Scale: the `p_name LIKE '%red%'` predicate is a StringContains that
    // reaches the part scan as a pushed filter (asserted in
    // PlanShapeSpec), so only ~1/8 of parts ever leave the scan; the
    // filtered part side then prunes lineitem EARLY (first join), before
    // the wider orders join. nation is broadcast; part/supplier are left
    // to stats/AQE.
    Q("q_tpch_q9",
      s"""SELECT n_name AS nation,
         |  CAST(year(o_orderdate) AS INT) AS o_year,
         |  CAST(SUM($sqlRevenue
         |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))
         |    AS DOUBLE) AS sum_profit
         |FROM part, lineitem, orders, supplier, nation
         |WHERE p_partkey = l_partkey AND o_orderkey = l_orderkey
         |  AND s_suppkey = l_suppkey AND s_nationkey = n_nationkey
         |  AND p_name LIKE '%red%'
         |GROUP BY n_name, o_year ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
      val redParts = t(s, d, "part").filter(col("p_name").contains("red"))
      val amount = revenueExpr -
        col("p_retailprice").cast(D12) * col("l_quantity").cast(D12)
      t(s, d, "lineitem")
        .join(redParts, col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q18 (large-volume customer): orders whose total lineitem
    // quantity exceeds a threshold, joined back to customer, top 100 by
    // price. Q18's `o_orderkey IN (SELECT ... HAVING SUM > T)` is
    // re-expressed as aggregate-then-join — the exact plan every engine
    // (including the reference's, via its HashJoin on the aggregated
    // subquery) lowers the IN to, and it lets the qualifying sum ride
    // along instead of being recomputed.
    // Scale: the lineitem aggregation is partial→final on l_orderkey
    // (map-side combine ships one row per order per partition), and the
    // aggregated result (46 rows here; ~0.3% of orders at any SF) is tiny
    // → AQE broadcasts the join back against orders. Top 100 via
    // TakeOrderedAndProject.
    Q("q_tpch_q18",
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice, sum_qty
        |FROM big, orders, customer
        |WHERE o_orderkey = l_orderkey AND c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      val big = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(D12)).as("qty"))
        .filter(col("qty") > lit(300).cast(D12))
        .select(col("l_orderkey"), col("qty").cast("double").as("sum_qty"))
      t(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // TPC-H Q6 (forecasting revenue change): pure scan-aggregate — every
    // predicate pushes into the parquet scan (range filters on date,
    // discount, quantity), no join, no group key, one partial+final agg
    // to a single row. The simplest possible 100 TB query: scan
    // bandwidth is the only cost. Decimal sum for order-independence.
    Q("q_tpch_q6",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |             * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.05
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.05) &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(D12) * col("l_discount").cast(D3))
          .cast("double").as("revenue"))
    },

    // TPC-H Q10 (returned-item reporting): customer ⋈ orders ⋈ lineitem ⋈
    // nation, revenue lost to returns per customer, top 20. Driver-schema
    // adaptation: no c_address/c_phone/c_comment, so the select list
    // carries the columns that exist.
    // Scale: the quarter filter prunes orders at the scan and the
    // returnflag filter prunes lineitem; the join tree aggregates to one
    // row per customer BEFORE the broadcast nation join; top 20 is
    // TakeOrderedAndProject.
    Q("q_tpch_q10",
      s"""SELECT c_custkey, c_name,
         |  CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue,
         |  c_acctbal, n_name
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate >= TIMESTAMP '1996-10-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(revenueExpr).cast("double").as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q19 (discounted revenue): the classic OR-of-ANDs predicate —
    // three (brand, size-range, quantity-range) disjuncts over a
    // part ⋈ lineitem join. What it tests at the plan level: Catalyst
    // extracts the common-prefix conjuncts per side (p_size >= 1 appears
    // in every disjunct; per-table OR branches) so BOTH scans still get
    // pushed filters, and the residual OR evaluates on joined rows.
    // Driver-schema adaptation: no p_container/l_shipmode/
    // l_shipinstruct, so the disjuncts use the columns that exist —
    // the OR-of-ANDs structure is the point, not the constants.
    Q("q_tpch_q19",
      s"""SELECT CAST(SUM($sqlRevenue) AS DOUBLE) AS revenue
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND (
         |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))"""
        .stripMargin) { (s, d) =>
      val disjunct = (
        col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) || (
        col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) || (
        col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30))
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("p_partkey") === col("l_partkey"))
        .filter(disjunct)
        .agg(sum(revenueExpr).cast("double").as("revenue"))
    },

    // TPC-H Q12 (shipping modes / priority): THE reference planner test
    // query — planner.rs:335-371 plans exactly this join + dual
    // conditional-count shape into ShuffleWriter stages
    // (planner.rs:390-400 shows the partial CASE-sum aggregate below the
    // l_shipmode exchange). Driver-schema adaptation (file header):
    // lineitem has no l_shipmode/l_commitdate/l_receiptdate, so the
    // in-list filter and group key use l_returnflag and the date window
    // filters l_shipdate; the essential shape — selective scan filters,
    // one orderkey join, two codegen'd conditional sums, tiny group-by —
    // is identical. Scale: both filters push into the lineitem scan, the
    // join shuffles only filtered rows, the CASE sums are map-side
    // partial so the final exchange carries 2 longs per group.
    Q("q_tpch_q12",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(hi, 1).otherwise(0)).as("high_line_count"),
          sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // TPC-H Q7 (volume shipping): bidirectional trade volume between two
    // nations by year — a 6-relation join where nation appears TWICE
    // (supplier side and customer side). Scale: both nation dims
    // broadcast (self-aliased), the fact chain shuffles on its join
    // keys, and the two-nation OR filter evaluates on broadcast-joined
    // name columns before the (nation, nation, year) aggregate whose
    // output is 2 rows × years.
    Q("q_tpch_q7",
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(SUM(volume) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
         |    $sqlRevenue AS volume
         |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <  TIMESTAMP '1998-01-01')
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val n1 = t(s, d, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(revenueExpr).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q8 (national market share): the share of one supplier
    // nation's volume within one region's market for one part type, by
    // order year. Scale: the share is a ratio of two decimal-exact
    // conditional sums computed in ONE aggregate pass (no second scan);
    // part/nation/region dims broadcast; output is |years| rows.
    Q("q_tpch_q8",
      s"""SELECT o_year,
         |  ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
         |                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |        / CAST(SUM(volume) AS DOUBLE), 9) AS mkt_share
         |FROM (
         |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         |    $sqlRevenue AS volume, n2.n_name AS nation
         |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
         |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
         |    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
         |    AND p_type = 'PROMO'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate <  TIMESTAMP '1998-01-01')
         |GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
      val n1 = t(s, d, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
      val zero = lit(0).cast(D12)
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n1_region") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("nation") === "NATION_3", revenueExpr).otherwise(zero)).cast("double") /
            sum(revenueExpr).cast("double"), 9).as("mkt_share"))
        .orderBy("o_year")
    },

    // TPC-H Q13 (customer order-count distribution): LEFT OUTER join so
    // zero-order customers survive with count 0, then a GROUP BY ON AN
    // AGGREGATE — the two-level aggregation shape. Scale: both
    // aggregates are two-phase; the first keys on c_custkey (high
    // cardinality, no skew), the second on the tiny count domain.
    Q("q_tpch_q13",
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q14 (promotion effect): promo share of one month's revenue —
    // a single-row ratio of conditional sums in one pass over the
    // month's lineitem ⋈ broadcast part.
    Q("q_tpch_q14",
      s"""SELECT ROUND(100.00
         |  * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $sqlRevenue
         |             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |  / CAST(SUM($sqlRevenue) AS DOUBLE), 9) AS promo_revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate <  TIMESTAMP '1997-10-01'""".stripMargin) { (s, d) =>
      val zero = lit(0).cast(D12)
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", revenueExpr).otherwise(zero)).cast("double") /
          sum(revenueExpr).cast("double"), 9).as("promo_revenue"))
    },

    // TPC-H Q15 (top supplier): quarter revenue per supplier, then the
    // supplier(s) hitting the maximum — the "view + scalar subquery"
    // shape. Scale: the revenue aggregate keys on l_suppkey; the MAX is
    // a 1-row broadcast; equality on decimal-exact totals (cast to
    // double once) is deterministic, unlike float-summed revenue.
    Q("q_tpch_q15",
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no, CAST(SUM($sqlRevenue) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate <  TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier, revenue
         |WHERE s_suppkey = supplier_no
         |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(revenueExpr).cast("double").as("total_revenue"))
      val mx = rev.agg(max("total_revenue").as("mx"))
      t(s, d, "supplier")
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // TPC-H Q2 (minimum-cost supplier): for each qualifying part, the
    // region's cheapest supplier — the correlated-MIN shape, lowered to
    // aggregate-then-join (same decorrelation as q_tpch_q17). Scale:
    // the region-filtered supplier side broadcasts; the per-part MIN is
    // a keyed two-phase aggregate joined back on (part, cost) — no
    // per-part subquery execution.
    Q("q_tpch_q2",
      s"""WITH $PsCte
         |SELECT s_acctbal, s_name, n_name, p_partkey,
         |  CAST(ps_cost_cents / 100.0 AS DOUBLE) AS supplycost
         |FROM part, ps, supplier, nation, region
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |  AND p_size <= 10 AND p_type = 'LARGE'
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'EUROPE'
         |  AND ps_cost_cents = (
         |    SELECT MIN(ps2.ps_cost_cents)
         |    FROM ps ps2, supplier s2, nation n2, region r2
         |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
         |      AND r2.r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20""".stripMargin) { (s, d) =>
      val regionSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
      val psr = partsupp(s, d)
        .join(regionSupp, col("ps_suppkey") === col("s_suppkey"))
      val minCost = psr.groupBy("ps_partkey")
        .agg(min("ps_cost_cents").as("min_cents"))
      t(s, d, "part").filter(col("p_size") <= 10 && col("p_type") === "LARGE")
        .join(psr, col("p_partkey") === col("ps_partkey"))
        .join(minCost.withColumnRenamed("ps_partkey", "mc_partkey"),
          col("p_partkey") === col("mc_partkey") &&
            col("ps_cost_cents") === col("min_cents"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          (col("ps_cost_cents") / 100.0).as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(20)
    },

    // TPC-H Q11 (important stock): per-part inventory value within one
    // nation, kept when above a fraction of the national total — the
    // HAVING-with-scalar-subquery shape. Scale: value sums are exact
    // integer cents·qty; the threshold is a 1-row broadcast; both
    // aggregates are two-phase on high-cardinality ps_partkey.
    Q("q_tpch_q11",
      s"""WITH $PsCte,
         |nps AS (SELECT ps_partkey, ps_cost_cents * ps_availqty AS val
         |        FROM ps, supplier, nation
         |        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |          AND n_name = 'NATION_5')
         |SELECT ps_partkey, CAST(SUM(val) AS BIGINT) AS value_cents
         |FROM nps GROUP BY ps_partkey
         |HAVING SUM(val) > (SELECT SUM(val) * 0.01 FROM nps)
         |ORDER BY value_cents DESC, ps_partkey""".stripMargin) { (s, d) =>
      val nps = partsupp(s, d)
        .join(t(s, d, "supplier"), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_cost_cents") * col("ps_availqty")).as("val"))
      val thr = nps.agg((sum("val") * 0.01).as("thr"))
      nps.groupBy("ps_partkey").agg(sum("val").as("value_cents"))
        .crossJoin(broadcast(thr))
        .filter(col("value_cents") > col("thr"))
        .select(col("ps_partkey"), col("value_cents"))
        .orderBy(col("value_cents").desc, col("ps_partkey"))
    },

    // TPC-H Q16 (parts/supplier relationship): supplier counts per part
    // descriptor, excluding "complaint" suppliers (negative balance ≙
    // the missing comment field) — NOT IN + COUNT DISTINCT. Scale: the
    // exclusion list is tiny and broadcast as an anti join; the distinct
    // count is two-phase.
    Q("q_tpch_q16",
      s"""WITH $PsCte
         |SELECT p_brand, p_type, p_size,
         |  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM ps, part
         |WHERE p_partkey = ps_partkey
         |  AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      partsupp(s, d)
        .join(t(s, d, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)),
          col("ps_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier").filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // TPC-H Q20 (excess inventory): suppliers whose stock of a part
    // family exceeds half of what they actually shipped in a year — the
    // nested correlated-aggregate shape, lowered to agg-then-join with
    // the comparison rewritten 2·availqty > Σqty so the shipped side
    // stays a decimal-exact sum (no 0.5·decimal cross-engine scale
    // drama). Scale: the year's (part, supplier) shipping aggregate is
    // two-phase on a composite key; the final supplier membership is a
    // semi join.
    Q("q_tpch_q20",
      s"""WITH $PsCte,
         |q AS (SELECT l_partkey, l_suppkey,
         |        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sumq
         |      FROM lineitem
         |      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |        AND l_shipdate <  TIMESTAMP '1998-01-01'
         |      GROUP BY l_partkey, l_suppkey),
         |cand AS (SELECT DISTINCT ps_suppkey
         |         FROM ps
         |         JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'small%'
         |         JOIN q ON q.l_partkey = ps_partkey AND q.l_suppkey = ps_suppkey
         |         WHERE 2.0 * ps_availqty > sumq)
         |SELECT s_suppkey, s_name FROM supplier
         |WHERE s_suppkey IN (SELECT ps_suppkey FROM cand)
         |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val q = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast(D12)).cast("double").as("sumq"))
      val cand = partsupp(s, d)
        .join(broadcast(t(s, d, "part").filter(col("p_name").like("small%"))
          .select("p_partkey")), col("ps_partkey") === col("p_partkey"))
        .join(q, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(lit(2.0) * col("ps_availqty") > col("sumq"))
        .select("ps_suppkey").distinct()
      t(s, d, "supplier")
        .join(cand, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }
  )
}
