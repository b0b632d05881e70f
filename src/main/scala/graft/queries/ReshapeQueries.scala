package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational reshaping + array-programming surface (beyond the
  * reference's §2 inventory, same spirit as its projection/agg layer):
  * PIVOT (long→wide conditional aggregation), UNPIVOT (wide→long melt),
  * LATERAL correlated top-k-per-group, and the higher-order array
  * function family (transform / filter / exists / forall / aggregate /
  * zip_with) that the embedding and curation operators build on.
  *
  * All four are full DuckDB oracle rows. The higher-order query runs on
  * integer-quantized values so every fold is exact integer arithmetic —
  * the same engine-independence trick as q_cur_ann_int8 (a left fold of
  * doubles would be bit-stable per engine but not provably identical
  * across them).
  */
object ReshapeQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  /** SQL-text queries run via [[Q.sqlRun]] — the component under test is
    * Spark's own parse/decorrelate of the text, not a hand-built plan. */
  private def sqlRun(tables: String*)(sql: String => String): (SparkSession, String) => DataFrame =
    Q.sqlRun("rs", tables: _*)(sql)

  val all: Seq[Q] = Seq(

    // --- PIVOT: long -> wide conditional aggregation -----------------------
    Q("q_pivot",
      s"""SELECT o_orderpriority,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_f,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS total_o,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS total_p
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // RelationalGroupedDataset.pivot with EXPLICIT values: no
      // distinct-values pre-query, so the plan is a single two-phase hash
      // aggregate whose partial rows carry one conditional sum per pivot
      // value — identical shuffle volume to the unpivoted groupBy. At
      // 100 TB the rule is exactly this: enumerate the pivot domain up
      // front (it's schema, not data) or pay a full extra scan to
      // discover it. Decimal-exact sums per Qh.
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(Qh.dsum(col("o_totalprice")))
        .withColumnRenamed("F", "total_f")
        .withColumnRenamed("O", "total_o")
        .withColumnRenamed("P", "total_p")
        .orderBy("o_orderpriority")
    },

    // --- UNPIVOT: wide -> long melt ----------------------------------------
    Q("q_unpivot",
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |    ${Qh.sqlDsum("l_quantity")} AS sum_qty,
         |    ${Qh.sqlDsum("l_extendedprice")} AS sum_price,
         |    ${Qh.sqlDsum("l_discount")} AS sum_disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, measure, value FROM (
         |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
         |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
         |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a)
         |ORDER BY l_returnflag, measure""".stripMargin) { (s, d) =>
      // Dataset.unpivot (SQL UNPIVOT / melt): the inverse reshape, one
      // (measure, value) row per measure column. Spark expands it to a
      // local generate over the aggregated frame — the melt happens
      // AFTER aggregation (3 rows/flag), so the fact table never
      // re-shuffles; melting before aggregating would triple the shuffle
      // for the same answer. Measure order is part of the contract —
      // ORDER BY normalizes it for both engines.
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          Qh.dsum(col("l_quantity")).as("sum_qty"),
          Qh.dsum(col("l_extendedprice")).as("sum_price"),
          Qh.dsum(col("l_discount")).as("sum_disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    },

    // --- LATERAL correlated top-k per group --------------------------------
    Q("q_join_lateral",
      """SELECT n_name, c_name, c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2)
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)(
      sqlRun("nation", "customer") { p =>
        s"""SELECT n_name, c_name, c_acctbal
           |FROM ${p}nation, LATERAL (
           |  SELECT c_name, c_acctbal FROM ${p}customer
           |  WHERE c_nationkey = n_nationkey
           |  ORDER BY c_acctbal DESC, c_name LIMIT 2)
           |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin
      }),
      // ^ LATERAL (top-2 customers per nation): the naive reading is a
      // correlated subquery per outer row. Catalyst's DecorrelateInnerQuery
      // lowers the ORDER BY..LIMIT into a rank-over-partition on the inner
      // side and the lateral into ONE equi join — the 100 TB shape (one
      // window + one join keyed on nationkey), not |nation| point queries.
      // Same SQL text runs on DuckDB as the oracle.

    // --- table-generating functions (the UDTF surface) ----------------------
    Q("q_fn_generators",
      """SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 20),
        |     LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i)
        |ORDER BY doc_id, pos, tok""".stripMargin) { (s, d) =>
      // Generator/UDTF surface (SURVEY §2.10 — the reference has no
      // generator concept at all; Spark's Generate node is the native
      // one): posexplode turns each document into (ordinal, token) rows
      // WITH position — the ordinality-preserving flatten every
      // tokenizer pipeline needs. Generate is map-side streaming (rows
      // produced and consumed inside one whole-stage-codegen pass, never
      // buffered per doc); the oracle spells the same thing with a
      // LATERAL positional unnest.
      t(s, d, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .orderBy("doc_id", "pos", "tok")
    },

    // --- higher-order array functions ---------------------------------------
    Q("q_fn_higher_order",
      """WITH e AS (SELECT vec_id,
        |    [CAST(FLOOR(x * 1000) AS BIGINT) for x in CAST(embedding AS DOUBLE[])] AS qv
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(list_filter(qv, x -> x > 0)) AS INT) AS n_pos,
        |  CAST(COALESCE(list_sum(list_filter(qv, x -> x > 0)), 0) AS BIGINT) AS sum_pos,
        |  (len(list_filter(qv, x -> abs(x) > 900)) > 0) AS has_big,
        |  (len(list_filter(qv, x -> abs(x) <= 1000)) = len(qv)) AS all_small,
        |  CAST(list_sum([qv[i] * list_reverse(qv)[i] for i in range(1, len(qv) + 1)]) AS BIGINT) AS rev_dot,
        |  CAST(list_sort(qv)[1] AS BIGINT) AS min_q
        |FROM e ORDER BY vec_id""".stripMargin) { (s, d) =>
      // The whole higher-order family over one quantized vector column:
      // transform (quantize), filter + size (count), filter + aggregate
      // (conditional fold), exists / forall (quantified predicates),
      // zip_with + aggregate (paired fold), sort_array + element_at
      // (order statistic). Every op is row-local — zero shuffle beyond
      // the output sort — and codegen'd; this is the fallback layer when
      // a per-row array computation has no dedicated primitive (the
      // dedicated codegen'd DotProduct exists because profiled hot loops
      // earn one, q_cur_ann_int8). Quantizing to BIGINT first makes the
      // folds exact integer math, hence hash-identical across engines.
      val qv = expr("transform(cast(embedding as array<double>), x -> CAST(floor(x * 1000) AS BIGINT))")
      t(s, d, "embeddings")
        .select(col("vec_id"), qv.as("qv"))
        .select(
          col("vec_id"),
          size(expr("filter(qv, x -> x > 0)")).cast("int").as("n_pos"),
          coalesce(expr("aggregate(filter(qv, x -> x > 0), 0L, (a, x) -> a + x)"), lit(0L))
            .as("sum_pos"),
          expr("exists(qv, x -> abs(x) > 900)").as("has_big"),
          expr("forall(qv, x -> abs(x) <= 1000)").as("all_small"),
          expr("aggregate(zip_with(qv, reverse(qv), (a, b) -> a * b), 0L, (a, x) -> a + x)")
            .as("rev_dot"),
          element_at(sort_array(col("qv")), 1).as("min_q"))
        .orderBy("vec_id")
    }
  )
}
