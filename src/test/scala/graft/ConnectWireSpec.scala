package graft

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.BigIntVector
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.connect.proto
import org.apache.spark.sql.connect.service.SparkConnectService
import org.scalatest.BeforeAndAfterAll
import org.sparkproject.connect.grpc.ManagedChannelBuilder

import java.io.ByteArrayInputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.UUID

/** Second wire surface: the gRPC front-end. The reference's endpoint is
  * Arrow Flight SQL over gRPC (flight_sql.rs:445-499 — ExecutePlan-style
  * RPCs streaming Arrow record batches back); Spark's native analog is
  * Spark Connect, whose ExecutePlan RPC likewise streams Arrow IPC
  * batches. This suite mounts the Connect service on the engine's
  * SparkContext and drives a REAL gRPC round trip: a protobuf
  * `ExecutePlanRequest` carrying SQL goes over a TCP socket, and the
  * Arrow batches that come back are decoded with the stock Arrow IPC
  * reader — proving wire framing, plan dispatch into the engine
  * session, and Arrow result encoding end-to-end. (The full JVM Connect
  * *client* library ships as a separate-classpath artifact — it
  * deliberately duplicates org.apache.spark.sql entry points, so it can
  * never sit next to the engine in one JVM; the raw-stub client here is
  * classpath-clean and exercises the same server path.) */
class ConnectWireSpec extends GraftSuite with BeforeAndAfterAll {

  private var port: Int = _
  private var started = false

  override def beforeAll(): Unit = {
    super.beforeAll()
    port = { val s = new ServerSocket(0); try s.getLocalPort finally s.close() }
    // SparkEnv.get.conf is the context's live SparkConf (SparkContext.conf
    // itself is private[spark]); the Connect service reads the binding port
    // from it at start()
    org.apache.spark.SparkEnv.get.conf.set("spark.connect.grpc.binding.port", port.toString)
    SparkConnectService.start(spark.sparkContext)
    started = true
    val deadline = System.nanoTime() + 30e9.toLong
    var up = false
    while (!up && System.nanoTime() < deadline) {
      try { new Socket(InetAddress.getLoopbackAddress, port).close(); up = true }
      catch { case _: java.io.IOException => Thread.sleep(200) }
    }
    assert(up, s"connect service not listening on $port")
  }

  override def afterAll(): Unit = {
    try if (started) SparkConnectService.stop(None, None)
    finally super.afterAll()
  }

  /** Execute SQL over the wire, return the BIGINT values of column 0
    * across all streamed Arrow batches. */
  private def executeLongs(sql: String): Seq[Long] = {
    val channel = ManagedChannelBuilder
      .forAddress("127.0.0.1", port).usePlaintext().build()
    try {
      val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
      val req = proto.ExecutePlanRequest.newBuilder()
        .setSessionId(UUID.randomUUID().toString)
        .setUserContext(proto.UserContext.newBuilder().setUserId("graft"))
        .setPlan(proto.Plan.newBuilder().setRoot(proto.Relation.newBuilder()
          .setSql(proto.SQL.newBuilder().setQuery(sql))))
        .build()
      val out = Seq.newBuilder[Long]
      val allocator = new RootAllocator(Long.MaxValue)
      try {
        val it = stub.executePlan(req)
        while (it.hasNext) {
          val resp = it.next()
          if (resp.hasArrowBatch) {
            val reader = new ArrowStreamReader(
              new ByteArrayInputStream(resp.getArrowBatch.getData.toByteArray), allocator)
            try {
              while (reader.loadNextBatch()) {
                val root = reader.getVectorSchemaRoot
                val v = root.getVector(0).asInstanceOf[BigIntVector]
                (0 until root.getRowCount).foreach(i => out += v.get(i))
              }
            } finally reader.close()
          }
        }
      } finally allocator.close()
      out.result()
    } finally channel.shutdownNow()
  }

  test("gRPC ExecutePlan round trip: SQL in, Arrow batches out") {
    assert(executeLongs("SELECT CAST(41 + 1 AS BIGINT) AS v") == Seq(42L))
  }

  test("remote plan runs against the engine's real tables") {
    val sql = s"SELECT COUNT(*) FROM parquet.`$sf/orders.parquet`"
    val local = spark.sql(sql).collect().head.getLong(0)
    assert(local > 0 && executeLongs(sql) == Seq(local))
  }
}
