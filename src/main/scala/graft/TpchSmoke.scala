package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H scale smoke: run all 22 query shapes on a derived ~multX
  * corpus (facts replicated with offset order keys, dimensions
  * untouched — referential integrity preserved, so every join fans out
  * exactly multX and results stay semantically valid), recording
  * per-query wall-clock. The point is the SCALING SHAPE, not absolute
  * speed: a query whose plan survives 100 TB grows ~linearly from the
  * sf0.1 bench numbers here; a super-linear query has a hidden
  * quadratic (unbounded fan-out, driver materialization) this smoke
  * exists to catch. Evidence lands in BASELINE.md's scale-smoke
  * section; not part of the driver gate.
  *
  * Usage: TpchSmoke <sfDir> [mult]   (default mult 10)
  */
object TpchSmoke {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(master = s"local[$cpus]", appName = "graft-tpch-smoke")
    val dir = s"/tmp/graft_smoke_tpch/${new java.io.File(sfDir).getName}_x$mult"

    // dims copied verbatim; facts replicated with copy-offset order keys
    // (o_custkey/l_partkey/l_suppkey untouched: each customer simply owns
    // mult× orders — the join fan-out is the point of the smoke)
    val dims = Seq("region", "nation", "customer", "supplier", "part")
    dims.foreach { t =>
      if (!new java.io.File(s"$dir/$t.parquet", "_SUCCESS").exists())
        Tables.df(spark, sfDir, t)
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    }
    if (!new java.io.File(s"$dir/orders.parquet", "_SUCCESS").exists()) {
      val o = Tables.df(spark, sfDir, "orders")
      val maxOk = o.agg(max("o_orderkey")).head().getLong(0) + 1
      o.crossJoin(spark.range(mult).toDF("copy"))
        .withColumn("o_orderkey", col("o_orderkey") + col("copy") * maxOk)
        .drop("copy")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
      val l = Tables.df(spark, sfDir, "lineitem")
      l.crossJoin(spark.range(mult).toDF("copy"))
        .withColumn("l_orderkey", col("l_orderkey") + col("copy") * maxOk)
        .drop("copy")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    }
    val nL = spark.read.parquet(s"$dir/lineitem.parquet").count()
    val nO = spark.read.parquet(s"$dir/orders.parquet").count()
    println(s"TPCH-SMOKE corpus: $nL lineitem, $nO orders (x$mult of $sfDir) at $dir")

    val names = "q1_pricing_summary" +: (2 to 22).map(i => s"q_tpch_q$i")
    // warm-up (JIT/codegen) on the flagship, like Bench
    SparkEntry.queries(names.head)(spark, dir)
      .write.format("noop").mode(SaveMode.Overwrite).save()
    val results = names.map { n =>
      val (_, t) = time(SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode(SaveMode.Overwrite).save())
      println(f"TPCH-SMOKE $n%-20s ${t}%6.2fs")
      n -> t
    }
    val total = results.map(_._2).sum
    println(f"TPCH-SMOKE total ${total}%.1fs over ${results.size} queries")
    // per-group rank trim over the ×mult lineitem — the known
    // low-cardinality caveat (3 groups → 3-way parallel sort) measured,
    // not asserted
    val (_, tTrim) = time(SparkEntry.queries("q_agg_trimmed")(spark, dir)
      .write.format("noop").mode(SaveMode.Overwrite).save())
    println(f"TPCH-SMOKE q_agg_trimmed      ${tTrim}%6.2fs")
    spark.stop()
  }
}
