package graft

import org.apache.spark.sql.SparkSession

/** Planning-vs-execution profile: where does each catalog query's
  * wall-clock go — Catalyst (parse/analyze/optimize/plan) or data work?
  *
  * At small SF roughly half the suite's time is per-query fixed cost
  * (BASELINE.md thread-scaling note); this main makes that split
  * measurable so a perf reading can tell Catalyst overhead (constant —
  * amortizes to noise at 100 TB) from execution time (scales with
  * data). Per query, after a warm-up run that materializes any derived
  * caches/tables/indexes:
  *
  *   - `build` = wall time to construct the DataFrame and force
  *     `queryExecution.executedPlan` (analysis + optimization + physical
  *     planning; for catalog-backed queries also their create-once
  *     existence checks);
  *   - `catalyst` = the sum of Spark's own `QueryPlanningTracker`
  *     phases (analysis/optimization/planning) for that plan;
  *   - `exec` = wall time of the noop-sink execution (includes the write
  *     command's re-planning, so `build`+`exec` slightly double-counts
  *     Catalyst — the split is a bound, not an audit).
  *
  * Prints one JSON line per family plus a total, for BASELINE.md.
  */
object PlanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftMetrics.register(spark)

    def family(n: String): String = n.split("_").take(2).mkString("_")

    final case class P(build: Double, catalyst: Double, exec: Double)
    def profile(name: String): Option[P] =
      try {
        // warm-up materializes derived caches / catalog tables / indexes
        // and JITs the query body, so the measured pass is steady-state
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan // force full Catalyst pipeline
        val t1 = System.nanoTime()
        val catalystMs = df.queryExecution.tracker.phases.values.map(_.durationMs).sum
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        Some(P((t1 - t0) / 1e9, catalystMs / 1e3, (t2 - t1) / 1e9))
      } catch {
        case e: Throwable =>
          System.err.println(s"[planprofile] $name FAILED: ${e.getMessage}")
          None
      }

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.catalog.map(_.name).filter(n => only.forall(_.contains(n)))
    require(names.nonEmpty,
      s"SPARK_GRAFT_BENCH_ONLY=${only.map(_.mkString(",")).getOrElse("")} matches no catalog query")
    profile(names.head) // session warm-up

    val rows = names.flatMap(n => profile(n).map(n -> _))
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val byFam = rows.groupBy { case (n, _) => family(n) }.toSeq.sortBy(_._1)
    byFam.foreach { case (f, rs) =>
      val b = rs.map(_._2.build).sum; val c = rs.map(_._2.catalyst).sum
      val e = rs.map(_._2.exec).sum
      println(s"""{"family":"$f","n":${rs.size},"build_s":${num(b)},"catalyst_s":${num(c)},"exec_s":${num(e)},"plan_pct":${num(100 * b / (b + e))}}""")
    }
    val b = rows.map(_._2.build).sum; val c = rows.map(_._2.catalyst).sum
    val e = rows.map(_._2.exec).sum
    println(s"""{"family":"TOTAL","n":${rows.size},"build_s":${num(b)},"catalyst_s":${num(c)},"exec_s":${num(e)},"plan_pct":${num(100 * b / (b + e))}}""")
    spark.stop()
  }
}
