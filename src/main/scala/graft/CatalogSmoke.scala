package graft

/** Generic ×M scale smoke: run named catalog queries against the shared
  * derived corpus ([[Smoke.ensureCorpus]] — ×M exact-copy documents, ×V
  * jittered vectors, ×M distinct-user events) and report wall-clock +
  * output rows. Complements the fixed suites in [[Smoke]]/[[GraphSmoke]]
  * without re-measuring them: new operators get their BASELINE.md smoke
  * row from here.
  *
  * Usage: CatalogSmoke <sfDir> <docMult> <vecMult> <query> [query ...]
  */
object CatalogSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val docMult = args(1).toInt
    val vecMult = args(2).toInt
    val names = args.drop(3).toSeq
    require(names.nonEmpty, "no query names given")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(master = s"local[$cpus]", appName = "graft-catalog-smoke")
    val dir = s"/tmp/graft_smoke/${new java.io.File(sfDir).getName}_d${docMult}_v$vecMult"
    Smoke.ensureCorpus(spark, sfDir, dir, docMult, vecMult)
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"SMOKE $n: $wall%.1fs ($rows rows)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
