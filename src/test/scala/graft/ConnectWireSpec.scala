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
    spark.sparkContext // force the lazy shared session so SparkEnv exists
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
    * across all streamed Arrow batches. `sessionId` keys the server-side
    * session holder — reusing one id reuses its temp views and conf,
    * exactly like a connected client. */
  private def executeLongs(sql: String, sessionId: String = UUID.randomUUID().toString): Seq[Long] = {
    val channel = ManagedChannelBuilder
      .forAddress("127.0.0.1", port).usePlaintext().build()
    try {
      val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
      val req = proto.ExecutePlanRequest.newBuilder()
        .setSessionId(sessionId)
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
                // DDL results are zero-column batches — nothing to read
                if (!root.getFieldVectors.isEmpty) {
                  val v = root.getVector(0).asInstanceOf[BigIntVector]
                  (0 until root.getRowCount).foreach(i => out += v.get(i))
                }
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

  test("Connect sessions are isolated: one session's temp view is invisible to another") {
    // the WireSpec per-connection-isolation contract, carried by the
    // second wire surface too (round-13 verdict item #7): session state
    // (temp views) binds to the Connect session id, not the shared
    // SparkContext
    val a = UUID.randomUUID().toString
    val b = UUID.randomUUID().toString
    executeLongs("CREATE OR REPLACE TEMPORARY VIEW cw_iso AS SELECT CAST(7 AS BIGINT) AS v", a)
    assert(executeLongs("SELECT v FROM cw_iso", a) == Seq(7L),
      "temp view must resolve in its own session across RPCs")
    val e = intercept[Exception](executeLongs("SELECT v FROM cw_iso", b))
    assert(String.valueOf(e.getMessage).toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      String.valueOf(e.getMessage).contains("cw_iso"),
      s"expected session B to not see session A's view, got: $e")
    // and the engine's own session never sees either
    assert(!spark.catalog.tableExists("cw_iso"))
  }

  test("full catalog result parity through the Connect wire") {
    // Round-14 verdict #5: close the last "only ever produced
    // in-process" asterisk. Every catalog query's frame registers as a
    // GLOBAL temp view (cross-session on the shared context, carrying
    // the full analyzed plan — custom Catalyst expressions included),
    // so `SELECT ... FROM global_temp.x` arriving over gRPC re-executes
    // the complete logical plan inside the server-side Connect session.
    // Parity = the canonical result hash (row count + order-insensitive
    // xor of per-row xxhash64 over every column; order-insensitive
    // because ORDER BY is presentation, not content) computed by the
    // SAME SQL in-process and through the wire. One shared Connect
    // session for the sweep, like a real connected client.
    val sid = UUID.randomUUID().toString
    val hsql = "SELECT xxhash64(CAST(count(*) AS STRING), " +
      "CAST(coalesce(bit_xor(xxhash64(*)), CAST(0 AS BIGINT)) AS STRING)) AS h " +
      "FROM global_temp.cw_parity"
    // Round-15 verdict #5 (suite time-box): the full 288-query sweep is a
    // round-close gate, not an inner-loop check — it alone doubled the
    // suite wall (11m46s → 21m03s). Default: a deterministic 1-in-9
    // stride sample (~32 queries, fixed offset so the set is stable
    // across runs and spans every family file). GRAFT_CONNECT_FULL=1
    // restores the full sweep; tools/round_close.sh sets it.
    val sweep =
      if (sys.env.get("GRAFT_CONNECT_FULL").contains("1")) SparkEntry.catalog
      else SparkEntry.catalog.zipWithIndex.collect { case (q, i) if i % 9 == 4 => q }
    val mismatches = Seq.newBuilder[String]
    var n = 0
    for (q <- sweep) {
      try {
        val df = SparkEntry.queries(q.name)(spark, sf)
        df.createOrReplaceGlobalTempView("cw_parity")
        val local = spark.sql(hsql).collect().head.getLong(0)
        val wire = executeLongs(hsql, sid)
        if (wire != Seq(local))
          mismatches += s"${q.name}: local=$local wire=$wire"
        n += 1
      } finally {
        // bench-style checkpoint hygiene: nothing live references the
        // query's persisted blocks once both hashes are computed
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.catalog.dropGlobalTempView("cw_parity")
    val bad = mismatches.result()
    assert(bad.isEmpty, s"${bad.size}/$n catalog queries diverged over Connect:\n" +
      bad.mkString("\n"))
    assert(n == sweep.size && sweep.nonEmpty)
    // Round-16 ADVICE: the once-per-round FULL sweep leaves a machine-
    // checkable completion marker, so tools/round_close.sh can VERIFY
    // the gate ran instead of trusting a comment.
    if (sys.env.get("GRAFT_CONNECT_FULL").contains("1")) {
      val f = new java.io.File("target/connect-full-sweep.json")
      val w = new java.io.FileWriter(f)
      try w.write(s"""{"epochMillis": ${System.currentTimeMillis()}, "n": $n}""")
      finally w.close()
    }
  }

  test("mid-query cancellation over Connect: Interrupt kills the running job, session stays usable") {
    val sid = UUID.randomUUID().toString
    val slow = "SELECT COUNT(*) FROM range(2000000000) a CROSS JOIN range(64) b " +
      "WHERE (a.id * 2654435761) % 97 = 3"
    @volatile var outcome: Option[Throwable] = None
    val runner = new Thread(() => {
      outcome = try { executeLongs(slow, sid); None }
      catch { case t: Throwable => Some(t) }
    })
    val before = spark.sparkContext.statusTracker.getActiveJobIds().toSet
    runner.start()
    // wait until the remote query's job is actually running on the
    // shared context, so the interrupt is genuinely mid-query. This is
    // best-effort under sbt's parallel suites (ANOTHER suite's job on
    // the shared context can trip the change detector first), so the
    // interrupt below additionally RETRIES until the server reports an
    // interrupted operation id — a one-shot interrupt racing the RPC's
    // arrival at the server read 0 ids and flaked a full-suite run.
    val deadline = System.nanoTime() + 30e9.toLong
    while (spark.sparkContext.statusTracker.getActiveJobIds().toSet == before &&
      System.nanoTime() < deadline) Thread.sleep(100)
    assert(spark.sparkContext.statusTracker.getActiveJobIds().toSet != before,
      "remote query never started a job")

    val channel = ManagedChannelBuilder
      .forAddress("127.0.0.1", port).usePlaintext().build()
    try {
      val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
      var interrupted = 0
      val iDeadline = System.nanoTime() + 30e9.toLong
      while (interrupted == 0 && runner.isAlive && System.nanoTime() < iDeadline) {
        val resp = stub.interrupt(proto.InterruptRequest.newBuilder()
          .setSessionId(sid)
          .setUserContext(proto.UserContext.newBuilder().setUserId("graft"))
          .setInterruptType(proto.InterruptRequest.InterruptType.INTERRUPT_TYPE_ALL)
          .build())
        interrupted = resp.getInterruptedIdsCount
        if (interrupted == 0) Thread.sleep(200)
      }
      // distinguish the two zero-id exits (round-14 advice): the loop
      // also ends when the runner dies first — i.e. the driven query
      // completed or failed before any interrupt RPC landed, a fixture
      // problem (query too fast), not an interrupt-semantics failure.
      assert(interrupted >= 1,
        if (!runner.isAlive)
          s"query terminated before any interrupt landed (outcome=$outcome) — " +
            "the driven query must run long enough to be interrupted"
        else "interrupt must report the cancelled operation id")
    } finally channel.shutdownNow()

    runner.join(60000)
    assert(!runner.isAlive, "cancelled query's stream never terminated")
    assert(outcome.isDefined,
      "expected the interrupted ExecutePlan stream to fail, not return a result")
    // the session survives the cancellation: a fresh query on the SAME
    // session id runs to completion
    assert(executeLongs("SELECT CAST(5 AS BIGINT)", sid) == Seq(5L))
  }
}
