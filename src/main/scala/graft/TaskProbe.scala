package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
object TaskProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q_graph_lpa")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class Agg(var n: Int = 0, var run: Long = 0, var cpu: Long = 0, var deser: Long = 0,
      var resSer: Long = 0, var gc: Long = 0, var shufWT: Long = 0, var fetchWait: Long = 0,
      var sched: Long = 0, var launch2finish: Long = 0)
    val agg = new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics; if (m == null) return
        val a = agg.computeIfAbsent(e.stageId, _ => Agg())
        a.synchronized {
          a.n += 1; a.run += m.executorRunTime; a.cpu += m.executorCpuTime/1000000L
          a.deser += m.executorDeserializeTime; a.resSer += m.resultSerializationTime
          a.gc += m.jvmGCTime; a.shufWT += m.shuffleWriteMetrics.writeTime/1000000L
          a.fetchWait += m.shuffleReadMetrics.fetchWaitTime
          a.launch2finish += (e.taskInfo.finishTime - e.taskInfo.launchTime)
        }
      }
    })
    // warm-up
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    agg.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"wall ${(System.nanoTime()-t0)/1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    val rows = agg.asScala.toSeq.sortBy(-_._2.run)
    println(f"${"stage"}%6s ${"n"}%4s ${"run"}%7s ${"cpu"}%7s ${"deser"}%6s ${"gc"}%6s ${"shufWT"}%7s ${"fetchW"}%7s ${"l2f"}%7s")
    for ((id, a) <- rows.take(12))
      println(f"$id%6d ${a.n}%4d ${a.run}%7d ${a.cpu}%7d ${a.deser}%6d ${a.gc}%6d ${a.shufWT}%7d ${a.fetchWait}%7d ${a.launch2finish}%7d")
    val t = rows.map(_._2)
    println(f"TOTAL n=${t.map(_.n).sum} run=${t.map(_.run).sum} cpu=${t.map(_.cpu).sum} deser=${t.map(_.deser).sum} gc=${t.map(_.gc).sum} shufWT=${t.map(_.shufWT).sum} fetchW=${t.map(_.fetchWait).sum} l2f=${t.map(_.launch2finish).sum}")
    spark.stop()
  }
}
