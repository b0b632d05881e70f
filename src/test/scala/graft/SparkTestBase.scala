package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the
  * suite wall-time dominated by the queries, not session startup).
  *
  * `spark` transparently rebuilds if the active session was stopped —
  * a suite that needs its own SparkContext (e.g. SchedulerSpec's
  * `local[2,2]` retry master; Spark allows one context per JVM) must
  * call `reset()` first and again when done. */
object SparkTestBase {
  private var _spark: SparkSession = _

  def spark: SparkSession = synchronized {
    if (_spark == null || _spark.sparkContext.isStopped) _spark = build()
    _spark
  }

  /** Stop and discard the shared session (next `spark` call rebuilds). */
  def reset(): Unit = synchronized {
    if (_spark != null) {
      if (!_spark.sparkContext.isStopped) _spark.stop()
      _spark = null
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  private def build(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      // Graft's TypedImperativeAggregates (bounded_min_pairs/set, the
      // sketches) all carry BOUNDED per-group state by design (the caps
      // convention) — with Spark's default 128-key limit their partial
      // aggregation falls back to SORT-based after the first 128 groups,
      // turning a map-side k-reduction into a sort of the whole input
      // stream (the mutual-NN sf10 candidate stream: ~1.4G rows, the
      // round-15 decade wall). 2^17 keys x the designed worst ~600 B
      // state is ~75 MB per task — inside the execution budget — while
      // genuinely unbounded-cardinality groupings (gram postings) still
      // fall back past the threshold as they should.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Targeted test-log hygiene (round-12 ADVICE #8): two categories of
    // EXPECTED warnings drowned real ones in `sbt test` stderr (round-12
    // count: 934 WindowExec "no partition defined" lines on the
    // documented metadata-sized frames — k-row model grids, certified
    // scalar rollups — whose single-partition shape PlanShapeSpec pins
    // deliberately; 71 ResolveWriteToStream temp-checkpoint notices from
    // StreamingSpec's intentionally-ephemeral sinks). Silence exactly
    // those two loggers, TEST sessions only — Bench/Verify keep them.
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Configurator.setLevel("org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
    Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream", Level.ERROR)
    GraftMetrics.register(s)
    s
  }

  val sf: String = "/root/testdata/sf0.001"
}

abstract class GraftSuite extends AnyFunSuite {
  def spark: SparkSession = SparkTestBase.spark
  def sf: String = SparkTestBase.sf
}
