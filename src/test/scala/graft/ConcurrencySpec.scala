package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent execution against one SparkSession: catalog queries and
  * multi-tenant sessions must not corrupt shared state (conf writes in
  * Tables.df, temp-view registration, job maps) when raced — the
  * reference serves many Flight SQL tenants over one scheduler, so the
  * Spark analog is many threads over one session. */
class ConcurrencySpec extends GraftSuite {

  test("catalog queries race safely on one session") {
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val names = Seq("q1_pricing_summary", "q_fn_json", "q_events_sessionize",
        "q_join_inner_agg", "q_text_stats", "q_topk", "q_dedup_exact", "q_fn_math")
      val futures = names.map(n => Future {
        n -> SparkEntry.queries(n)(spark, sf).count()
      })
      val counts = Await.result(Future.sequence(futures), 5.minutes).toMap
      assert(counts.values.forall(_ > 0), counts.toString)
      // determinism under concurrency: rerun two of them serially
      assert(SparkEntry.queries("q1_pricing_summary")(spark, sf).count() ==
        counts("q1_pricing_summary"))
      assert(SparkEntry.queries("q_dedup_exact")(spark, sf).count() ==
        counts("q_dedup_exact"))
    } finally pool.shutdown()
  }

  test("concurrent first-use of derived-source caches materializes once, correctly") {
    // The /tmp source caches and the bucketed tables are one-time
    // check-then-write materializations serialized behind a lock; race
    // four threads on their FIRST use (fresh cache dir via a throwaway
    // version is not possible — instead race the queries themselves,
    // which exercises the lock when caches are cold and the reads when
    // warm) and require identical results.
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val names = Seq("q_csv_scan", "q_bucketed_join", "q_avro_scan", "q_listing_scan",
        "q_ann_pq", "q_ann_ivfpq", "q_ann_ivfpq_upsert", // the ANN index builds share the same lock
        // round-8 materializations: Morton layout, LSH bands index,
        // nested/evolving parquet derivations
        "q_zorder_scan", "q_dedup_incremental", "q_nested_prune", "q_schema_evolution")
      val futures = (0 until 2).flatMap(_ => names).map(n => Future {
        n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).mkString("|")
      })
      val results = Await.result(Future.sequence(futures), 5.minutes)
      // both racers of each query saw the same rows
      results.groupBy(_._1).foreach { case (n, rs) =>
        assert(rs.map(_._2).distinct.size == 1, s"$n diverged under race")
      }
    } finally pool.shutdown()
  }

  test("parallel tenant sessions stay isolated") {
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val parent = new Engine(spark)
      val futures = (0 until 4).map { i =>
        Future {
          val tenant = parent.newSession()
          tenant.createView(s"tenant_view", tenant.sql(s"SELECT $i AS tenant_id"))
          // each tenant sees ITS OWN view under the same name
          tenant.sql("SELECT tenant_id FROM tenant_view").head().getInt(0)
        }
      }
      val ids = Await.result(Future.sequence(futures), 2.minutes)
      assert(ids.sorted == Seq(0, 1, 2, 3), ids.toString)
    } finally pool.shutdown()
  }
}
