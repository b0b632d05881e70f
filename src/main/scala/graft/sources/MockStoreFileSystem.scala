package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.SparkSession

/** A non-`file` Hadoop FileSystem scheme (`mock://`) backed by the local
  * disk — the object-store seam made testable without a connector jar.
  *
  * The reference validates and serves object-store paths by URI scheme
  * (reference state/mod.rs:289-324; README.md:86 claims S3/HDFS); on the
  * Spark side the equivalent contract is "any registered
  * `org.apache.hadoop.fs.FileSystem` serves scans, sinks, and external
  * tables through its scheme". The sandbox ships no hadoop-aws jar, so
  * the s3a:// wire test self-gates (EngineSpec) — this class closes the
  * remaining gap by registering a REAL second scheme and proving the
  * engine is scheme-agnostic end-to-end: `mock:///p` resolves through
  * `fs.mock.impl`, reads and writes land at local path `/p`, and every
  * layer above (DataSource resolution, partition discovery, committers)
  * exercises exactly the code path an `s3a://` URI would take. Extending
  * [[RawLocalFileSystem]] (not the checksummed LocalFileSystem) keeps
  * directory listings free of `.crc` side files, like a real object
  * store.
  */
class MockStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = MockStoreFileSystem.NAME
}

object MockStoreFileSystem {
  val NAME: URI = URI.create("mock:///")

  /** Register the scheme on a Hadoop configuration. Disables the
    * FileSystem CACHE for the scheme so a re-registered configuration
    * (fresh test, new session) never serves a stale instance. */
  def install(conf: Configuration): Unit = {
    conf.set("fs.mock.impl", classOf[MockStoreFileSystem].getName)
    conf.set("fs.mock.impl.disable.cache", "true")
  }

  /** Register on a session's underlying context configuration (Hadoop
    * confs derive from it; scheme registration is additive and inert for
    * other schemes, so context scope is safe). */
  def install(spark: SparkSession): Unit =
    install(spark.sparkContext.hadoopConfiguration)
}
