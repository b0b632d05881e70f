package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's external-table catalog surface
  * (`CREATE EXTERNAL TABLE ... STORED AS PARQUET LOCATION ...`,
  * reference README.md:34, datafusion.proto:99-115): a table is a
  * file-backed parquet relation registered under a bare name. Schemas are
  * self-described by parquet footers; Catalyst gets filter/column pushdown
  * and partition pruning for free on these scans.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  /** Non-TPC-H driver tables: `events` (streaming-ish), `documents` +
    * `embeddings` (training-data pipeline ops). */
  val extra: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extra

  /** Read one table. Single parquet file today; at 100 TB this would be a
    * directory of many files — `spark.read.parquet` handles both, splitting
    * by `spark.sql.files.maxPartitionBytes`, so no code change at scale.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read it as raw nanos and convert to a micros
    * TIMESTAMP_NTZ (the same truncation DuckDB applies), so downstream
    * queries see a normal timestamp column. */
  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))
            .cast("timestamp_ntz"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (idempotent), so both the
    * DataFrame API and `spark.sql` can address them by bare name. */
  def register(spark: SparkSession, dir: String): Unit =
    all.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
