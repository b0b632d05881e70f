package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Qh._

/** Relational-operator parity (SURVEY.md §2.2-§2.4, §2.7): scans,
  * projection/filter/predicates, all 8 join types + theta residual +
  * null-safe + cross, set ops, distinct, sort (nulls ordering), top-k,
  * limit/offset, values, empty relation.
  *
  * Scale notes are per-query; the common ones: dimension joins are
  * broadcast (no shuffle of the fact side), filters/projections are
  * declarative so Catalyst pushes them into the parquet scan, and every
  * result is deterministically ordered so the correctness gate is
  * order-stable at any partition count.
  */
object RelationalQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val all: Seq[Q] = Seq(

    // --- scans / projection / filter (ProjectionNode+SelectionNode,
    // reference datafusion.proto:134-145; pushdown per §4.1) -------------
    Q("q_scan_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      // Filter + projection reach the parquet scan (PushedFilters /
      // ReadSchema); at 100 TB this reads 5 of 16 columns and prunes
      // row groups on l_shipdate stats.
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") < 5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("double").as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    Q("q_predicates",
      """SELECT p_partkey,
        |       CASE WHEN p_size BETWEEN 10 AND 20 THEN 'mid'
        |            WHEN p_size IN (1, 2, 3) THEN 'small'
        |            ELSE 'other' END AS bucket,
        |       p_name LIKE '%gre%' AS has_gre,
        |       p_brand IS NOT NULL AS brand_nn,
        |       NOT (p_size = 7) AS not_seven
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // BETWEEN/IN/CASE/LIKE/IS NULL/NOT (reference datafusion.proto:
      // 389-446, 596-633) — all codegen'd row-local expressions.
      t(s, d, "part").select(
        col("p_partkey"),
        when(col("p_size").between(10, 20), "mid")
          .when(col("p_size").isin(1, 2, 3), "small")
          .otherwise("other").as("bucket"),
        col("p_name").like("%gre%").as("has_gre"),
        col("p_brand").isNotNull.as("brand_nn"),
        (!(col("p_size") === 7)).as("not_seven"))
        .orderBy("p_partkey")
    },

    // --- values / empty relation (reference datafusion.proto:167-169,
    // 212-217) ----------------------------------------------------------
    Q("q_values",
      """SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, NULL)) AS t(id, tag)
        |ORDER BY id""".stripMargin) { (s, _) =>
      s.sql("SELECT id, tag FROM VALUES (1, 'a'), (2, 'b'), (3, CAST(NULL AS STRING)) AS t(id, tag) ORDER BY id")
    },

    Q("q_empty_relation", "SELECT 1 AS one") { (s, _) =>
      s.sql("SELECT 1 AS one")
    },

    // --- joins (reference datafusion.proto:240-265, 1173-1212) ----------
    Q("q_join_inner_agg",
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |       ${sqlDsum("o_totalprice")} AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      // Dimension side broadcast: at 100 TB customer is far smaller than
      // orders — broadcast() avoids shuffling the fact table entirely.
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy("c_mktsegment")
    },

    Q("q_join_left",
      """SELECT c_custkey, COUNT(o_orderkey) AS n
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n"))
        .orderBy("c_custkey")
    },

    Q("q_join_right",
      """SELECT c_custkey, COUNT(o_orderkey) AS n
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n"))
        .orderBy("c_custkey")
    },

    Q("q_join_full",
      """SELECT COALESCE(c_custkey, -1) AS ck, COUNT(o_orderkey) AS n
        |FROM customer FULL JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY ck""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "full")
        .groupBy(coalesce(col("c_custkey"), lit(-1L)).as("ck"))
        .agg(count(col("o_orderkey")).as("n"))
        .orderBy("ck")
    },

    Q("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    Q("q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    Q("q_join_theta_residual",
      s"""SELECT o_orderkey, COUNT(*) AS n_big_items
         |FROM orders JOIN lineitem
         |  ON o_orderkey = l_orderkey AND l_quantity > 45
         |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // Equi-key + residual theta filter in one join condition (reference
      // JoinNode.filter, datafusion.proto:256-265). Catalyst keeps the
      // equi part as the join key and evaluates the residual post-probe.
      t(s, d, "orders")
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey") && col("l_quantity") > 45)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_big_items"))
        .orderBy("o_orderkey")
    },

    Q("q_join_nullsafe",
      """SELECT COALESCE(a.k, -1) AS k, COUNT(*) AS n
        |FROM (SELECT NULLIF(c_nationkey, 3) AS k FROM customer) a
        |JOIN (SELECT NULLIF(s_nationkey, 3) AS k FROM supplier) b
        |  ON a.k IS NOT DISTINCT FROM b.k
        |GROUP BY 1 ORDER BY k""".stripMargin) { (s, d) =>
      // Null-safe equality <=> (reference null_equals_null,
      // datafusion.proto:263): NULL keys match each other. The
      // supplier side pre-collapses to per-key counts BEFORE the join
      // (round-16 core decade fix): the join's only consumer is a
      // per-key COUNT, so enumerating the c_k × s_k many-to-many pairs
      // is quadratic in corpus size at fixed key cardinality — 21.4×
      // at 10× data, ~6G joined rows at sf10 — for an answer that is
      // algebraically Σ cnt_b over matches. The <=> operator under
      // test still executes as a real null-safe hash join (broadcast
      // |nations|-row build side, NULL keys matching NULL), and n is
      // unchanged: count(*) over the expanded pairs ≡ sum(cnt).
      val a = t(s, d, "customer").select(nullif(col("c_nationkey"), lit(3)).as("k"))
      val b = t(s, d, "supplier").select(nullif(col("s_nationkey"), lit(3)).as("kb"))
        .groupBy(col("kb")).agg(count(lit(1)).as("cnt"))
      a.join(broadcast(b), col("k") <=> col("kb"))
        .groupBy(coalesce(col("k"), lit(-1)).as("k"))
        .agg(sum("cnt").as("n")).orderBy("k")
    },

    Q("q_join_right_semi",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // Right-semi join (reference JoinType RIGHTSEMI, datafusion.proto:
      // 247): Spark has no right_semi type — swap inputs + left_semi, the
      // same rewrite the reference's planner note prescribes (SURVEY §2.4).
      t(s, d, "orders")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
    },

    Q("q_join_right_anti",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // Right-anti join (reference JoinType RIGHTANTI, datafusion.proto:
      // 248): swap inputs + left_anti.
      t(s, d, "orders")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
    },

    Q("q_cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select("r_name", "n_name").orderBy("r_name", "n_name")
    },

    Q("q_join_using",
      """SELECT n_nationkey, n_name, r_name
        |FROM (SELECT n_nationkey, n_name, n_regionkey AS rk FROM nation) n
        |JOIN (SELECT r_regionkey AS rk, r_name FROM region) r USING (rk)
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      // USING constraint (reference JoinConstraint, datafusion.proto:
      // 251-254) — join on the shared column name, emitted once.
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"),
        col("n_regionkey").as("rk"))
      val r = t(s, d, "region").select(col("r_regionkey").as("rk"), col("r_name"))
      n.join(broadcast(r), Seq("rk"))
        .select("n_nationkey", "n_name", "r_name").orderBy("n_nationkey")
    },

    // --- set operations (reference datafusion.proto:267-273; INTERSECT/
    // EXCEPT rewrite to semi/anti joins, SURVEY.md §2.7) ------------------
    Q("q_union_all",
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier
        |) GROUP BY nk ORDER BY nk""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("n")).orderBy("nk")
    },

    Q("q_union_all_multi",
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier
        |  UNION ALL
        |  SELECT n_nationkey AS nk FROM nation
        |) GROUP BY nk ORDER BY nk""".stripMargin) { (s, d) =>
      // Multi-input union (reference UnionNode takes N inputs,
      // datafusion.proto:271-273): chained unions flatten to one Union
      // operator in Catalyst.
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .union(t(s, d, "nation").select(col("n_nationkey").cast("int").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("n")).orderBy("nk")
    },

    Q("q_union_distinct",
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .distinct().orderBy("nk")
    },

    Q("q_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    Q("q_except",
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    Q("q_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")
    },

    // --- bag-semantics set ops (ALL variants) ---------------------------
    Q("q_except_all",
      """SELECT nk, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin) { (s, d) =>
      // EXCEPT ALL — bag semantics: each nation key survives
      // max(0, count_left − count_right) times, which the DISTINCT
      // variant (q_except) collapses. Both engines implement the
      // multiset subtraction natively; the rollup makes the
      // multiplicities visible (and the output model-sized). Lowering:
      // Spark plans a left-anti-style hash join on counted rows — no
      // sort, map-side partials on both inputs.
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .exceptAll(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("n"))
        .orderBy("nk")
    },

    Q("q_intersect_all",
      """SELECT nk, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin) { (s, d) =>
      // INTERSECT ALL — each key appears min(count_left, count_right)
      // times; the DISTINCT variant (q_intersect) can't distinguish a
      // 1:1 from a 100:7 overlap, which is exactly what a
      // duplicate-aware reconciliation audit needs.
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersectAll(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("n"))
        .orderBy("nk")
    },

    // --- declarative data-quality constraint audit ----------------------
    Q("q_audit_constraints",
      """WITH u AS (SELECT 'orderkey_unique' AS check_name,
        |         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
        |       FROM orders),
        |c AS (SELECT 'custname_complete',
        |        CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      FROM customer),
        |r AS (SELECT 'orders_custkey_ri',
        |        CAST(COUNT(*) AS BIGINT)
        |      FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |g AS (SELECT 'discount_range',
        |        CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
        |             AS BIGINT)
        |      FROM lineitem),
        |v AS (SELECT 'returnflag_domain',
        |        CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
        |             AS BIGINT)
        |      FROM lineitem)
        |SELECT check_name, n_violations, n_violations = 0 AS pass
        |FROM (SELECT * FROM u UNION ALL SELECT * FROM c UNION ALL SELECT * FROM r
        |      UNION ALL SELECT * FROM g UNION ALL SELECT * FROM v)
        |ORDER BY check_name""".stripMargin) { (s, d) =>
      // Declarative data-quality constraints (the Deequ/data-contract
      // operator): uniqueness, completeness, referential integrity,
      // numeric range, and categorical domain — each evaluated as an
      // exact violation COUNT, assembled into one verdict frame in ONE
      // plan (no driver-side count() round trips — the q_events_funnel
      // assembly discipline). On the conformant gate corpus every check
      // passes; the audit's value is the exact zero, not a boolean.
      // Shape for 100 TB: every check is a map-side-collapsed aggregate
      // over its own table scan; the RI check is the one join — a
      // broadcast anti join against the dimension keys. A production
      // deployment runs this frame nightly and alerts on pass=false —
      // the operator IS the contract.
      val orders = t(s, d, "orders")
      val customer = t(s, d, "customer")
      val lineitem = t(s, d, "lineitem")
      val u = orders.agg((count(lit(1)) - countDistinct(col("o_orderkey")))
        .as("n_violations")).select(lit("orderkey_unique").as("check_name"), col("n_violations"))
      val c = customer.agg(sum(when(col("c_name").isNull, 1L).otherwise(0L))
        .as("n_violations")).select(lit("custname_complete").as("check_name"), col("n_violations"))
      val r = orders.join(broadcast(customer.select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("orders_custkey_ri").as("check_name"), col("n_violations"))
      val g = lineitem.agg(sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
        .otherwise(0L)).as("n_violations"))
        .select(lit("discount_range").as("check_name"), col("n_violations"))
      val v = lineitem.agg(sum(when(!col("l_returnflag").isInCollection(Seq("A", "N", "R")), 1L)
        .otherwise(0L)).as("n_violations"))
        .select(lit("returnflag_domain").as("check_name"), col("n_violations"))
      u.unionByName(c).unionByName(r).unionByName(g).unionByName(v)
        .select(col("check_name"), col("n_violations"),
          (col("n_violations") === 0).as("pass"))
        .orderBy("check_name")
    },

    // --- one-pass column profiler (Deequ analyzer-suite analog) ---------
    Q("q_audit_profile",
      """WITH a AS (SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn1,
        |    COUNT(DISTINCT o_orderkey) AS nd1,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS mn1, CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
        |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn2,
        |    COUNT(DISTINCT o_custkey) AS nd2,
        |    CAST(MIN(o_custkey) AS VARCHAR) AS mn2, CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
        |    SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nn3,
        |    COUNT(DISTINCT o_orderstatus) AS nd3,
        |    MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
        |    SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn4,
        |    COUNT(DISTINCT o_totalprice) AS nd4,
        |    CAST(CAST(FLOOR(MIN(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS mn4,
        |    CAST(CAST(FLOOR(MAX(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS mx4,
        |    SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn5,
        |    COUNT(DISTINCT o_orderdate) AS nd5,
        |    strftime(MIN(o_orderdate), '%Y-%m-%d') AS mn5,
        |    strftime(MAX(o_orderdate), '%Y-%m-%d') AS mx5,
        |    SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn6,
        |    COUNT(DISTINCT o_orderpriority) AS nd6,
        |    MIN(o_orderpriority) AS mn6, MAX(o_orderpriority) AS mx6
        |  FROM orders)
        |SELECT col_name, CAST(n AS BIGINT) AS n_rows,
        |  CAST(n_nulls AS BIGINT) AS n_nulls,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  CAST((1000000 * n_nulls) // n AS BIGINT) AS null_ppm,
        |  min_repr, max_repr
        |FROM (
        |  SELECT 'o_orderkey' AS col_name, n, nn1 AS n_nulls, nd1 AS n_distinct,
        |         mn1 AS min_repr, mx1 AS max_repr FROM a
        |  UNION ALL SELECT 'o_custkey', n, nn2, nd2, mn2, mx2 FROM a
        |  UNION ALL SELECT 'o_orderstatus', n, nn3, nd3, mn3, mx3 FROM a
        |  UNION ALL SELECT 'o_totalprice', n, nn4, nd4, mn4, mx4 FROM a
        |  UNION ALL SELECT 'o_orderdate', n, nn5, nd5, mn5, mx5 FROM a
        |  UNION ALL SELECT 'o_orderpriority', n, nn6, nd6, mn6, mx6 FROM a)
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      // One-pass COLUMN PROFILER — the Deequ analyzer-suite sibling of
      // q_audit_constraints: where the audit CHECKS declared contracts,
      // the profiler DISCOVERS the dataset's shape (per column: rows,
      // nulls, null ppm, exact distinct count, min/max) — the first
      // thing a pipeline runs on an unknown drop before writing
      // contracts at all. Two scans: a plain min/max/null aggregate
      // (map-side-collapsed, no distinct) plus one exploded two-phase
      // distinct count — at 100 TB production swaps the second scan for
      // approx_count_distinct (HLL partials, folding into scan 1) and
      // keeps this exact form for sampled audits.
      // Min/max render deterministically cross-engine: integers/strings
      // verbatim, timestamps via an explicit date format, doubles as
      // FLOOR(x*100) cents — floor-of-the-same-IEEE-double agrees
      // everywhere, where printf/decimal roundings would not. The
      // verdict frame is 6 rows assembled IN-plan (no driver count()
      // round trips — the q_audit_constraints discipline).
      // Two scans, NOT 6 countDistincts in one agg: Spark rewrites
      // multi-column exact distincts into a 7-way Expand + wide
      // double-aggregate, measured 3.2 s solo at sf0.1; this form —
      // scan 1 = plain min/max/null agg (no distinct), scan 2 = one
      // posexplode to (col, value) + a two-phase distinct-then-count —
      // measures ~4x faster and shuffles only (col, value) group keys.
      val o = t(s, d, "orders")
      def stats(i: Int, cn: String, mn: Column, mx: Column): Seq[Column] = Seq(
        sum(when(col(cn).isNull, 1L).otherwise(0L)).as(s"nn$i"),
        mn.cast("string").as(s"mn$i"), mx.cast("string").as(s"mx$i"))
      val aggs = Seq(count(lit(1)).as("n")) ++
        stats(1, "o_orderkey", min("o_orderkey"), max("o_orderkey")) ++
        stats(2, "o_custkey", min("o_custkey"), max("o_custkey")) ++
        stats(3, "o_orderstatus", min("o_orderstatus"), max("o_orderstatus")) ++
        stats(4, "o_totalprice",
          floor(min("o_totalprice") * 100).cast("long"),
          floor(max("o_totalprice") * 100).cast("long")) ++
        stats(5, "o_orderdate",
          date_format(min(col("o_orderdate").cast("timestamp")), "yyyy-MM-dd"),
          date_format(max(col("o_orderdate").cast("timestamp")), "yyyy-MM-dd")) ++
        stats(6, "o_orderpriority", min("o_orderpriority"), max("o_orderpriority"))
      val names = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      // distinct counts: one explode to (column position, value-as-string
      // — injective for every profiled type), two-phase dedup + count;
      // COUNT(DISTINCT) excludes NULLs, so filter them the same way
      val nd = o.select(posexplode(array(
          col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
          // + 0.0 folds IEEE -0.0 into 0.0 BEFORE the string render:
          // the oracle's COUNT(DISTINCT) on native doubles sees one
          // value where "-0.0"/"0.0" would string-render as two
          col("o_orderstatus"), (col("o_totalprice") + lit(0.0)).cast("string"),
          col("o_orderdate").cast("string"), col("o_orderpriority")))
          .as(Seq("pos", "v")))
        .filter(col("v").isNotNull)
        .groupBy("pos", "v").agg(count(lit(1)).as("dummy")).drop("dummy")
        .groupBy("pos").agg(count(lit(1)).as("n_distinct"))
      val tuples = names.zipWithIndex.map { case (cn, j) =>
        val i = j + 1
        s"'$cn', $j, n, nn$i, mn$i, mx$i"
      }.mkString(", ")
      o.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(6, $tuples) AS (col_name, pos, n_rows, n_nulls, min_repr, max_repr)")
        .join(broadcast(nd), Seq("pos"), "left")
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          expr("(1000000 * n_nulls) div n_rows").as("null_ppm"),
          col("min_repr"), col("max_repr"))
        .orderBy("col_name")
    },

    // --- DISTINCT ON emulation ------------------------------------------
    Q("q_distinct_on_emul",
      """SELECT DISTINCT ON (c_nationkey) c_nationkey AS nk, c_custkey, c_acctbal
        |FROM customer
        |ORDER BY c_nationkey, c_acctbal DESC, c_custkey
        |""".stripMargin) { (s, d) =>
      // DISTINCT ON (Postgres/DuckDB) — "the first row of each group
      // under this ordering": unparseable in Spark, so the engine side
      // is the min_by-over-ordering-struct composition (the exact
      // lowering Spark WOULD do), while the ORACLE runs DuckDB's
      // NATIVE DISTINCT ON — certifying the emulation against the real
      // operator, the q_window_exclude_emul pattern. Richest-customer-
      // per-nation with a custkey tiebreak so the pick is total-order
      // deterministic. Shape: partial-aggregatable min_by, one
      // nation-keyed exchange, no window sort.
      t(s, d, "customer")
        .groupBy(col("c_nationkey").as("nk"))
        .agg(min_by(
          struct(col("c_custkey"), col("c_acctbal")),
          struct((-col("c_acctbal")).as("neg"), col("c_custkey"))).as("m"))
        .select(col("nk"), col("m.c_custkey").as("c_custkey"),
          col("m.c_acctbal").as("c_acctbal"))
        .orderBy("nk")
    },

    // --- QUALIFY emulation ----------------------------------------------
    Q("q_qualify_emul",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) <= 2
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
      // QUALIFY (Snowflake/DuckDB/BigQuery; not in Spark 4.1.2) — a
      // WHERE for window functions. The engine side is the canonical
      // lowering (window column + filter + projection drop), the oracle
      // is DuckDB's NATIVE QUALIFY — the emulation certified against
      // the real clause. Top-2 orders per customer, fully tiebroken.
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // --- sort / top-k / limit+offset (reference datafusion.proto:147-152,
    // 280-286, SortExecNode.fetch top-k 1264-1269) ------------------------
    Q("q_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      // sort+limit fuses into TakeOrderedAndProject: each partition keeps
      // its local top-10, only 10×nPartitions rows reach the driver —
      // the plan that survives 100 TB (never a global sort).
      t(s, d, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
    },

    Q("q_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 10""".stripMargin) { (s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").offset(10).limit(20)
    },

    Q("q_sort_nulls",
      """SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS pr
        |FROM orders
        |ORDER BY pr ASC NULLS FIRST, o_orderkey LIMIT 50""".stripMargin) { (s, d) =>
      // Explicit nulls placement (reference SortExprNode nulls_first,
      // datafusion.proto:645-649; DataFusion/Spark defaults differ —
      // SURVEY.md §7.3 — so parity requires it spelled out).
      t(s, d, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("pr"))
        .orderBy(col("pr").asc_nulls_first, col("o_orderkey")).limit(50)
    },

    // --- subquery alias (reference datafusion.proto:292-295) -------------
    Q("q_subquery_alias",
      """SELECT big.o_orderkey, big.o_totalprice
        |FROM (SELECT * FROM orders WHERE o_totalprice > 200000) AS big
        |ORDER BY big.o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").filter(col("o_totalprice") > 200000).alias("big")
        .select(col("big.o_orderkey"), col("big.o_totalprice"))
        .orderBy("o_orderkey")
    },
  )
}
