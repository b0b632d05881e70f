package graft

import scala.concurrent.ExecutionContext.Implicits.global

/** Engine session-surface tests: external tables, views, prepared
  * statements, parameterized SQL, multi-tenant sessions, job lifecycle
  * (reference flight_sql.rs session/prepared semantics + REST jobs API,
  * api/handlers.rs:61-274). */
class EngineSpec extends GraftSuite {
  private lazy val engine = new Engine(spark)

  test("createExternalTable registers a queryable parquet view") {
    engine.createExternalTable("t_nation", s"$sf/nation.parquet")
    assert(engine.sql("SELECT count(*) AS n FROM t_nation").head().getLong(0) == 25)
  }

  test("createExternalTable reads csv with delimiter options") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    engine.table("t_nation").write.mode("overwrite")
      .option("delimiter", "|").csv(dir)
    engine.createExternalTable("t_nation_csv", dir, format = "csv",
      options = Map("delimiter" -> "|"),
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "n_nationkey INT, n_name STRING, n_regionkey INT")))
    assert(engine.sql("SELECT count(*) AS n FROM t_nation_csv").head().getLong(0) == 25)
  }

  test("csv corrupt-record modes: PERMISSIVE nulls, FAILFAST throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv")
    java.nio.file.Files.write(dir.resolve("data.csv"),
      "1|alpha\n2|beta\nnot_a_number|gamma\n3|delta\n".getBytes)
    val schema = "id INT, name STRING"
    val permissive = spark.read.schema(schema)
      .option("delimiter", "|").option("mode", "PERMISSIVE")
      .csv(dir.toString)
    assert(permissive.count() == 4)
    assert(permissive.filter("id IS NULL").count() == 1) // bad row -> null
    val failfast = spark.read.schema(schema)
      .option("delimiter", "|").option("mode", "FAILFAST")
      .csv(dir.toString)
    intercept[org.apache.spark.SparkException](failfast.collect())
  }

  test("views create/drop") {
    engine.createView("v_small", engine.sql("SELECT 1 AS one"))
    assert(engine.sql("SELECT * FROM v_small").count() == 1)
    assert(engine.dropView("v_small"))
  }

  test("prepared statements: plan once, execute, close") {
    val h = engine.prepare("SELECT n_regionkey, count(*) AS n FROM t_nation GROUP BY 1")
    assert(engine.executePrepared(h).count() == 5)
    engine.closePrepared(h)
    intercept[RuntimeException](engine.executePrepared(h))
  }

  test("prepared statements bind different parameters per execution") {
    val h = engine.prepare("SELECT count(*) AS n FROM t_nation WHERE n_regionkey = :rk")
    assert(engine.executePrepared(h, Map[String, Any]("rk" -> 2)).head().getLong(0) == 5)
    assert(engine.executePrepared(h, Map[String, Any]("rk" -> 99)).head().getLong(0) == 0)
    // positional form on the same prepare-once/bind-many path
    val hp = engine.prepare("SELECT count(*) AS n FROM t_nation WHERE n_regionkey = ?")
    assert(engine.executePrepared(hp, Seq[Any](3)).head().getLong(0) == 5)
    engine.closePrepared(h); engine.closePrepared(hp)
    intercept[RuntimeException](engine.executePrepared(h, Map[String, Any]("rk" -> 2)))
    // a syntax error still fails at prepare time, not first execute
    intercept[Exception](engine.prepare("SELEKT broken"))
  }

  test("explainAnalyze annotates the executed plan with runtime metrics") {
    engine.createExternalTable("t_nation_ea", s"$sf/nation.parquet")
    val report = engine.explainAnalyze(
      engine.sql("SELECT n_regionkey, count(*) AS n FROM t_nation_ea GROUP BY n_regionkey"))
    assert(report.contains("HashAggregate"), report)
    // per-operator row counts surfaced post-execution (the reference's
    // stage-metrics REST payload analog)
    assert(report.contains("numOutputRows="), report)
    assert(report.contains("Scan"), report)
  }

  test("parameterized sql (reference PrepareNode placeholders)") {
    val df = engine.sql("SELECT count(*) AS n FROM t_nation WHERE n_regionkey = :rk",
      Map("rk" -> 2))
    assert(df.head().getLong(0) == 5)
    // positional form (the reference's numbered-placeholder analog)
    val df2 = engine.sql(
      "SELECT count(*) AS n FROM t_nation WHERE n_regionkey = ? OR n_regionkey = ?",
      Seq(2, 3))
    assert(df2.head().getLong(0) == 10)
  }

  test("newSession isolates temp views but shares data access") {
    val child = engine.newSession()
    child.createView("only_child", child.sql("SELECT 42 AS v"))
    assert(child.sql("SELECT * FROM only_child").count() == 1)
    intercept[Exception](engine.sql("SELECT * FROM only_child").collect())
  }

  test("global external tables are visible across sessions (global_temp)") {
    engine.createExternalTable("nation_shared", s"$sf/nation.parquet", global = true)
    val child = engine.newSession()
    assert(child.sql("SELECT count(*) AS n FROM global_temp.nation_shared")
      .head().getLong(0) == 25)
  }

  test("job submit reaches Finished with row count") {
    val id = engine.submitJob(engine.sql("SELECT * FROM t_nation"))
    var tries = 0
    while (engine.jobStatus(id).contains(engine.Running) && tries < 100) {
      Thread.sleep(100); tries += 1
    }
    assert(engine.jobStatus(id).contains(engine.Finished(25)))
  }

  test("a capped run exposes nonzero drop counters through the jobs API") {
    // Round-16 verdict item #7: the no-silent-caps observe() metrics
    // (stderr lines via GraftMetrics) are also queryable per job. Force
    // real truncation: an LSH bucket cap of 2 on the gate corpus drops
    // ids from every oversized band bucket.
    val capped = graft.queries.PipelineQueries.minhashPairs(spark, sf, bucketCap = 2)
    val id = engine.submitJob(capped)
    var tries = 0
    while (engine.jobStatus(id).contains(engine.Running) && tries < 600) {
      Thread.sleep(100); tries += 1
    }
    assert(engine.jobStatus(id).exists(_.isInstanceOf[engine.Finished]),
      s"capped job did not finish: ${engine.jobStatus(id)}")
    val m = engine.jobMetrics(id)
    assert(m.getOrElse("graft_lsh_bucket_cap.dropped_ids", 0L) > 0L,
      s"expected nonzero dropped_ids through the jobs API, got $m")
    assert(m.getOrElse("graft_lsh_bucket_cap.oversized_buckets", 0L) > 0L, m.toString)
    // an uncapped job publishes nothing
    val id2 = engine.submitJob(engine.sql("SELECT * FROM t_nation"))
    tries = 0
    while (engine.jobStatus(id2).contains(engine.Running) && tries < 100) {
      Thread.sleep(100); tries += 1
    }
    assert(engine.jobMetrics(id2).isEmpty)
  }

  test("jobProgress reports stage/task counts for a job group") {
    val slow = engine.sql(
      "SELECT count(*) FROM (SELECT java_method('java.lang.Thread', 'sleep', 30L) FROM t_nation)")
    val id = engine.submitJob(slow)
    var progress = Seq.empty[(Int, Int, Int)]
    var tries = 0
    while (engine.jobStatus(id).contains(engine.Running) && tries < 200) {
      val p = engine.jobProgress(id)
      if (p.nonEmpty) progress = p
      Thread.sleep(20); tries += 1
    }
    assert(engine.jobStatus(id).contains(engine.Finished(1)))
    // stages observed while running have sane task counts
    progress.foreach { case (_, numTasks, completed) =>
      assert(numTasks >= 1 && completed <= numTasks)
    }
  }

  test("cancel of unknown or finished jobs is a no-op") {
    assert(!engine.cancelJob("nope123"))
    val id = engine.submitJob(engine.sql("SELECT 1 AS one"))
    var tries = 0
    while (engine.jobStatus(id).contains(engine.Running) && tries < 100) {
      Thread.sleep(100); tries += 1
    }
    val st = engine.jobStatus(id)
    assert(!engine.cancelJob(id)) // terminal — must not be overwritten
    assert(engine.jobStatus(id) == st)
  }

  test("database namespaces: create, 2-part reference, drop") {
    engine.createDatabase("graft_db")
    assert(engine.listDatabases().contains("graft_db"))
    engine.sql("CREATE TABLE graft_db.t1 USING parquet AS SELECT 1 AS x")
    assert(engine.sql("SELECT x FROM graft_db.t1").head().getInt(0) == 1)
    engine.dropDatabase("graft_db")
    assert(!engine.listDatabases().contains("graft_db"))
  }

  test("cacheTable makes subsequent scans read from memory") {
    engine.createExternalTable("t_nation_cache", s"$sf/nation.parquet")
    try {
      engine.cacheTable("t_nation_cache")
      assert(engine.isCached("t_nation_cache"))
      engine.sql("SELECT count(*) FROM t_nation_cache").collect() // materialize
      val plan = engine.explain(engine.table("t_nation_cache"))
      assert(plan.contains("InMemoryTableScan") || plan.contains("InMemoryRelation"), plan)
    } finally {
      engine.uncacheTable("t_nation_cache")
      assert(!engine.isCached("t_nation_cache"))
    }
  }

  test("analyze computes column statistics usable by the CBO") {
    engine.sql("CREATE TABLE graft_stats_t USING parquet AS SELECT * FROM t_nation")
    try {
      engine.analyze("graft_stats_t", Seq("n_regionkey"))
      val desc = engine.sql("DESCRIBE EXTENDED graft_stats_t n_regionkey")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc("distinct_count") == "5", desc.toString)
      assert(desc("max") == "4")
    } finally engine.sql("DROP TABLE IF EXISTS graft_stats_t")
  }

  test("the reference's own Q1 SQL text runs unchanged through engine.sql") {
    // Verbatim from reference README.md:42 (DataFusion dialect) — the
    // end-to-end slice SURVEY §7.1 prescribes: external table + the
    // golden-output query, through the SQL front-end.
    engine.createExternalTable("lineitem", s"$sf/lineitem.parquet")
    val rows = engine.sql(
      "select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty, " +
        "sum(l_extendedprice) as sum_base_price, " +
        "sum(l_extendedprice * (1 - l_discount)) as sum_disc_price, " +
        "sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge, " +
        "avg(l_quantity) as avg_qty, avg(l_extendedprice) as avg_price, " +
        "avg(l_discount) as avg_disc, count(*) as count_order " +
        "from lineitem where  l_shipdate <= date '1998-09-02' " +
        "group by  l_returnflag, l_linestatus " +
        "order by   l_returnflag,  l_linestatus").collect()
    // same data as the catalog's q1 (decimal-exact) — float sums agree
    // to well under a cent on this scale
    val exact = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length == exact.length)
    rows.zip(exact).foreach { case (r, e) =>
      assert(r.getString(0) == e.getString(0) && r.getString(1) == e.getString(1))
      assert(math.abs(r.getDouble(2) - e.getDouble(2)) < 0.01) // sum_qty
      assert(math.abs(r.getDouble(3) - e.getDouble(3)) < 0.01) // sum_base_price
      assert(r.getLong(9) == e.getLong(9))                     // count_order
    }
  }

  test("object-store config smoke: fs.s3a.* plumbs through; missing connector fails loudly") {
    // No object store exists in this sandbox (reference claims S3/HDFS,
    // README.md:86) — what CAN be pinned is that (a) fs.s3a.* settings
    // reach the Hadoop configuration every scan uses, so a deployment
    // with hadoop-aws on the classpath needs config only, and (b) with
    // the connector absent, an s3a:// read fails with the unknown-scheme
    // error naming s3a — never a silent empty result.
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.endpoint", "http://localhost:9000")
    try {
      assert(spark.sessionState.newHadoopConf().get("fs.s3a.endpoint")
        == "http://localhost:9000")
      val e = intercept[Exception](
        engine.createExternalTable("s3_t", "s3a://bucket/path"))
      val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
      assert(msg.toLowerCase.contains("s3a"), msg)
    } finally hc.unset("fs.s3a.endpoint")
  }

  test("object-store wire path: s3a resolves to S3AFileSystem when hadoop-aws is present") {
    // The one gap the sandbox cannot close (no hadoop-aws jar): the
    // actual scheme->connector wire. This test self-activates on the
    // first jar-bearing environment — it proves the session's Hadoop
    // conf hands an s3a:// path to a real S3AFileSystem instance (the
    // exact hop the config smoke above cannot reach) with zero new
    // work there, and cancels loudly (not passes) here. Reflection
    // only: naming the class statically would not compile sandbox-side.
    val s3aClass = scala.util.Try(Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"))
    assume(s3aClass.isSuccess,
      "hadoop-aws absent in this sandbox; activates automatically where it is present")
    val hc = spark.sessionState.newHadoopConf()
    // dummy static credentials + endpoint: S3AFileSystem.initialize
    // resolves credentials and builds its client without a network
    // round-trip, so instantiation succeeds with no real bucket
    hc.set("fs.s3a.access.key", "wire-test")
    hc.set("fs.s3a.secret.key", "wire-test")
    hc.set("fs.s3a.endpoint", "http://localhost:9000")
    hc.set("fs.s3a.path.style.access", "true")
    val fs = new org.apache.hadoop.fs.Path("s3a://graft-wire-test/x").getFileSystem(hc)
    assert(s3aClass.get.isInstance(fs),
      s"s3a scheme resolved to ${fs.getClass.getName}, not S3AFileSystem")
  }

  test("object-store wire proof without a connector jar: mock:// scheme " +
      "serves sinks, partition discovery, external tables, and queries") {
    // The s3a wire test above self-gates on hadoop-aws; this one needs
    // nothing external: register a second REAL FileSystem scheme
    // (mock:// -> local disk, graft.sources.MockStoreFileSystem) and push
    // a full write -> external table -> partition-pruned query round trip
    // through it. Every engine layer above the connector (fs.<scheme>.impl
    // resolution, the output committer, file listing, Hive-style partition
    // discovery) runs the exact path an s3a:// URI takes — the scheme hop
    // is proven pluggable; only the connector jar itself stays external
    // (reference path validation by URI scheme, state/mod.rs:289-324).
    import graft.sources.MockStoreFileSystem
    MockStoreFileSystem.install(spark)
    val hc = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path("mock:///tmp/x").getFileSystem(hc)
    assert(fs.isInstanceOf[MockStoreFileSystem], fs.getClass.getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_mock_store").toString
    val loc = s"mock://$dir/nation" // dir is absolute -> mock:///...
    engine.createExternalTable("mock_src_nation", s"$sf/nation.parquet")
    engine.table("mock_src_nation").write.mode("overwrite")
      .partitionBy("n_regionkey").parquet(loc)
    // the bytes really landed under the local backing dir, Hive-partitioned
    assert(new java.io.File(s"$dir/nation").listFiles()
      .exists(_.getName.startsWith("n_regionkey=")), s"no partition dirs under $dir/nation")
    engine.createExternalTable("mock_nation", loc)
    val got = engine.sql(
      "SELECT n_name FROM mock_nation WHERE n_regionkey = 2 ORDER BY n_name")
      .collect().map(_.getString(0)).toSeq
    val want = engine.sql(
      "SELECT n_name FROM mock_src_nation WHERE n_regionkey = 2 ORDER BY n_name")
      .collect().map(_.getString(0)).toSeq
    assert(got == want && got.size == 5, s"got=$got want=$want")
  }

  test("explain returns the formatted physical plan") {
    val p = engine.explain(engine.sql("SELECT count(*) FROM t_nation"))
    assert(p.contains("Physical Plan"))
    assert(p.contains("HashAggregate"))
  }

  test("PipelineRunner: a failed stage resumes without recomputing its predecessors") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val docs = Tables.df(spark, sf, "documents")
    val stage1Runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val filterStage = (df: org.apache.spark.sql.DataFrame) => {
      stage1Runs.incrementAndGet()
      df.filter(col("n_chars") >= 100)
    }
    val tokenStage = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("n_tokens", size(split(col("text"), " ")))
    val boom = (_: org.apache.spark.sql.DataFrame) =>
      throw new RuntimeException("injected stage failure")
    val rollup = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("lang").agg(count(lit(1)).as("n"), sum("n_tokens").as("tok"))

    // first attempt dies in stage 3 — stages 1-2 are already committed
    val e = intercept[RuntimeException] {
      PipelineRunner.run(spark, root, docs,
        Seq("filter" -> filterStage, "tokens" -> tokenStage, "rollup" -> boom))
    }
    assert(e.getMessage.contains("injected"))
    assert(stage1Runs.get() == 1)

    // retry with the fixed stage: 1-2 load from their checkpoints (the
    // stage-1 closure must NOT run again), only the repaired stage runs
    val (out, report) = PipelineRunner.run(spark, root, docs,
      Seq("filter" -> filterStage, "tokens" -> tokenStage, "rollup" -> rollup))
    assert(report.loaded == Seq("filter", "tokens") && report.computed == Seq("rollup"))
    assert(stage1Runs.get() == 1, "resume must not re-execute committed stages")

    // result equals the same transforms composed directly
    val direct = rollup(tokenStage(filterStage(docs)))
      .orderBy("lang").collect().map(_.toString).toSeq
    assert(out.orderBy("lang").collect().map(_.toString).toSeq == direct)

    // a fully-committed pipeline is pure resume
    val (_, again) = PipelineRunner.run(spark, root, docs,
      Seq("filter" -> filterStage, "tokens" -> tokenStage, "rollup" -> rollup))
    assert(again.computed.isEmpty && again.loaded.size == 3)
  }

  test("PipelineRunner: concurrent runs on a shared root serialize per stage") {
    import org.apache.spark.sql.functions._
    // Unserialized, both runs see the marker missing and race the same
    // output directory; the per-root lock must make one run compute and
    // the other pure-load.
    val root = java.nio.file.Files.createTempDirectory("graft_pipe_race").toString
    val docs = Tables.df(spark, sf, "documents")
    val stageRuns = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = Seq(
      "tokens" -> ((df: org.apache.spark.sql.DataFrame) => {
        stageRuns.incrementAndGet()
        df.withColumn("n_tokens", size(split(col("text"), " ")))
      }),
      "rollup" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.groupBy("lang").agg(count(lit(1)).as("n"))))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = (1 to 2).map(_ => Future(PipelineRunner.run(spark, root, docs, stages)._2))
    val reports = Await.result(Future.sequence(runs), 120.seconds)
    assert(stageRuns.get() == 1, s"stage closure ran ${stageRuns.get()} times under the lock")
    assert(reports.map(_.computed.size).sum == 2 && reports.map(_.loaded.size).sum == 2,
      s"expected one computing run and one loading run: $reports")
  }
}
