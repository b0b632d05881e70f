package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit utility: prints the formatted physical plan of catalog
  * queries. Usage: Explain <sfDir> [queryName ...] (default: a headline
  * subset). */
object Explain {
  def main(args: Array[String]): Unit = {
    // --exec: run the query first, then print the FINAL adaptive plan —
    // AQE stamps [codegen id :] only on the executed plan, so this is
    // the only way to audit WholeStageCodegen coverage from the CLI
    val exec = args.contains("--exec")
    val rest = args.filterNot(_ == "--exec")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.length > 1) rest.drop(1).toSeq
      else Seq("q1_pricing_summary", "q_join_inner_agg", "q_dedup_minhash",
        "q_ann_bruteforce", "q_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // noop sink, not collect(): AQE finalization only needs the plan to
      // EXECUTE — materializing the full frame on the driver can OOM it
      // for large results where the bench's noop write of the same plan
      // would not (round-15 ADVICE).
      if (exec) df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
