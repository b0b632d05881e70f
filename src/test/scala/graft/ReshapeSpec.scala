package graft

import org.apache.spark.sql.functions._

/** Reshape-operator semantics, verified against independent Scala
  * reimplementations on collected sf0.001 data (the DuckDB oracle pins
  * engine parity at the gate; these pin the INTENDED semantics — pivot
  * cell = conditional sum, melt inverse, lateral = per-group top-k,
  * higher-order folds = Scala folds). */
class ReshapeSpec extends GraftSuite {

  test("q_pivot cells equal per-(priority, status) conditional sums") {
    val got = SparkEntry.queries("q_pivot")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val rows = Tables.df(spark, sf, "orders")
      .select("o_orderpriority", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    def cell(pri: String, st: String): Double =
      rows.filter(r => r._1 == pri && r._2 == st)
        .map(r => BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    assert(got.nonEmpty)
    got.foreach { case (pri, (f, o, p)) =>
      assert(f == cell(pri, "F") && o == cell(pri, "O") && p == cell(pri, "P"), pri)
    }
  }

  test("q_unpivot is the exact melt of the wide aggregate (3 rows per flag)") {
    val long = SparkEntry.queries("q_unpivot")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wide = Tables.df(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(queries.Qh.dsum(col("l_quantity")).as("sum_qty"),
        queries.Qh.dsum(col("l_extendedprice")).as("sum_price"),
        queries.Qh.dsum(col("l_discount")).as("sum_disc"))
      .collect()
    assert(long.size == wide.length * 3)
    wide.foreach { r =>
      val flag = r.getString(0)
      assert(long((flag, "sum_qty")) == r.getDouble(1), flag)
      assert(long((flag, "sum_price")) == r.getDouble(2), flag)
      assert(long((flag, "sum_disc")) == r.getDouble(3), flag)
    }
  }

  test("q_join_lateral returns exactly the top-2 customers per nation") {
    val got = SparkEntry.queries("q_join_lateral")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val custs = Tables.df(spark, sf, "customer")
      .select("c_nationkey", "c_name", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val nations = Tables.df(spark, sf, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val expect = custs.groupBy(_._1).toSeq.flatMap { case (nk, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(2).map(r => (nations(nk), r._2, r._3))
    }.sortBy(r => (r._1, -r._3, r._2))
    assert(got.toSeq == expect)
    assert(got.nonEmpty)
  }

  test("q_fn_generators is the ordinality-preserving flatten") {
    val got = SparkEntry.queries("q_fn_generators")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val expect = Tables.df(spark, sf, "documents")
      .filter(col("doc_id") < 20).select("doc_id", "text").collect()
      .flatMap { r =>
        r.getString(1).split(" ", -1).zipWithIndex.map { case (tok, i) =>
          (r.getLong(0), i, tok)
        }
      }
      .sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq == expect.toSeq)
    assert(got.nonEmpty)
  }

  test("q_fn_higher_order columns equal Scala folds over the quantized arrays") {
    val got = SparkEntry.queries("q_fn_higher_order")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getLong(5), r.getLong(6)))
      .toMap
    val vecs = Tables.df(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).map(x => math.floor(x * 1000).toLong))
    assert(vecs.nonEmpty && got.size == vecs.length)
    vecs.foreach { case (id, qv) =>
      val pos = qv.filter(_ > 0)
      val expect = (
        pos.length,
        pos.sum,
        qv.exists(x => math.abs(x) > 900),
        qv.forall(x => math.abs(x) <= 1000),
        qv.zip(qv.reverse).map { case (a, b) => a * b }.sum,
        qv.min)
      assert(got(id) == expect, s"vec $id")
    }
  }
}
