ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ballistamvpspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Shuffle/spill local dir on RAM-backed storage when available
  // (round 17, guide §2.1: "local disk bandwidth for shuffle files can
  // be the tighter limit on machines with slow disks — check both").
  // This box's virtual disk charges ~100-400 ms PER MAP TASK just to
  // create/commit the (often near-empty) shuffle file pair — measured
  // 67 s of shuffle-write time against 10 s of CPU on one query, and a
  // 12-query mixed bench read 43.8 s on disk vs 26.6 s on tmpfs. The
  // production analog is provisioning fast local storage for shuffle.
  // SPARK_LOCAL_DIRS still takes precedence over spark.local.dir (Spark
  // semantics), so decade-scale runs whose spill exceeds RAM can point
  // back at disk with SPARK_LOCAL_DIRS=/tmp.
  s"-Dspark.local.dir=${
    if (new java.io.File("/dev/shm").canWrite) "/dev/shm/graft_spark_local"
    else sys.props("java.io.tmpdir")}",
  // Disable the bypass-merge shuffle writer (round 17, guide §2.1): with
  // ≤200 reducers it opens one file PER REDUCER per map task — at the
  // gate's 32 reducers that was ~26 ms of file churn per task, 24 s of
  // the 35 s task time on one 917-task query, 1000× the sort-writer's
  // 0.02 s. Routing everything through the serialized sort writer
  // (UnsafeShuffleWriter) is exactly what every >200-reducer production
  // shuffle does anyway, so this is scale-neutral by construction.
  "-Dspark.shuffle.sort.bypassMergeThreshold=1",
  // 16g default (round 17, guide §5): local[32] runs 32 concurrent tasks
  // in ONE heap — at 8g the execution pool guaranteed ~72 MB/task and the
  // heavy co-run queries paid seconds of GC (heavy-subset bench 23.8 s at
  // 8g vs 21.6 s at 16g on a 128 GiB box). Parameterized: a cluster
  // deployment sizes executors instead, and SPARK_DRIVER_MEM still
  // overrides for constrained boxes.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
