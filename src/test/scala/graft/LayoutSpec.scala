package graft

import graft.functions.ZOrder
import graft.queries.SourceQueries
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Z-order layout evidence (q_zorder_scan): the pruning argument is made
  * from parquet FOOTERS — deterministic, no timing — by counting row
  * groups whose (user_id, ts) min/max box intersects a query box, on the
  * Z-ordered layout vs the time-sorted strawman written by the same code
  * path. Runs at sf0.01 so the layouts have enough row groups (~32) for
  * the counts to mean something.
  */
class LayoutSpec extends GraftSuite {

  private val sf01 = "/root/testdata/sf0.01"

  test("zkey interleaves bits (model equivalence)") {
    def model(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))).reduce(_ | _)
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L), (1L, 2L)) ++
      Seq.fill(50)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = spark.createDataFrame(cases).toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zkey(col("x"), col("y"), 8).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == model(r.getLong(0), r.getLong(1), 8),
        s"zkey(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // z-order locality sanity: the curve visits a 2^k-aligned square
    // before leaving it — both dims halve the code range
    assert(model(3, 3, 8) == 15 && model(4, 0, 8) == 32)
  }

  /** (user_id min/max, ts min/max micros) per row group of a layout dir. */
  private def rowGroupBoxes(dir: String): Seq[(Long, Long, Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet")).toSeq.flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.getPath), conf))
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val byName = b.getColumns.asScala.map(c => c.getPath.toDotString -> c.getStatistics).toMap
        def lg(n: String, min: Boolean): Long = {
          val s = byName(n)
          (if (min) s.genericGetMin else s.genericGetMax).asInstanceOf[java.lang.Long].longValue
        }
        (lg("user_id", true), lg("user_id", false), lg("ts", true), lg("ts", false))
      } finally r.close()
    }
  }

  private def overlapping(boxes: Seq[(Long, Long, Long, Long)],
      uLo: Long, uHi: Long, tLo: Long, tHi: Long): Int =
    boxes.count { case (umin, umax, tmin, tmax) =>
      umin <= uHi && umax >= uLo && tmin < tHi && tmax >= tLo
    }

  test("z-order layout prunes row groups on both dimensions; time-sorted cannot") {
    val zBoxes = rowGroupBoxes(SourceQueries.zorderedEvents(spark, sf01))
    val tBoxes = rowGroupBoxes(SourceQueries.tsSortedEvents(spark, sf01))
    assert(zBoxes.size >= 16 && tBoxes.size >= 16, s"too few row groups: ${zBoxes.size}/${tBoxes.size}")

    def micros(iso: String): Long =
      java.time.LocalDateTime.parse(iso).toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

    // Box A — the catalog query's 2-D box: both layouts prune (time is
    // selective), z-order at least as well.
    val (tLo, tHi) = (micros("2024-01-10T00:00:00"), micros("2024-01-12T00:00:00"))
    val zA = overlapping(zBoxes, 10, 19, tLo, tHi)
    val tA = overlapping(tBoxes, 10, 19, tLo, tHi)

    // Box B — selective ONLY in the non-sort dimension (10 of ~150
    // users, all of time): the time-sorted layout must scan every row
    // group; the z-curve confines the user range to a fraction of them.
    val (allLo, allHi) = (micros("2024-01-01T00:00:00"), micros("2024-02-01T00:00:00"))
    val zB = overlapping(zBoxes, 10, 19, allLo, allHi)
    val tB = overlapping(tBoxes, 10, 19, allLo, allHi)

    info(s"boxA z=$zA/${zBoxes.size} tsorted=$tA/${tBoxes.size}; boxB z=$zB tsorted=$tB")
    assert(zA > 0 && zA <= tA, s"2-D box: z-order ($zA) should prune at least as well as time-sort ($tA)")
    assert(tB >= tBoxes.size * 9 / 10, s"time-sorted layout should scan ~all row groups for a user-only box, got $tB/${tBoxes.size}")
    assert(zB <= zBoxes.size / 2, s"z-order should prune a user-only box to <=half the row groups, got $zB/${zBoxes.size}")
  }

  test("ZOrder.bucket refuses domains whose scaling overflows long arithmetic") {
    // (v - lo) * 2^bits is exact long math; a millisecond-epoch domain
    // spanning years with bits near 31 would overflow into NEGATIVE
    // buckets and silently degenerate the layout — must fail loudly.
    val wide = intercept[IllegalArgumentException] {
      ZOrder.bucket(col("v"), 0L, Long.MaxValue / 2, 31)
    }
    assert(wide.getMessage.contains("overflows"), wide.getMessage)
    intercept[IllegalArgumentException] { ZOrder.bucket(col("v"), 10L, 9L, 8) }
    intercept[IllegalArgumentException] { ZOrder.bucket(col("v"), 0L, 100L, 0) }
    // the widest legal domain at each extreme still buckets correctly
    val lim = Long.MaxValue >> 31
    val df = spark.range(1).select(
      ZOrder.bucket(lit(0L), 0L, lim - 1, 31).as("b_lo"),
      ZOrder.bucket(lit(lim - 1), 0L, lim - 1, 31).as("b_hi"))
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) >= 0L && r.getLong(1) < (1L << 31),
      r.toString)
  }

  test("layout never changes results: zorder scan equals original-table scan") {
    val q = SparkEntry.queries("q_zorder_scan")
    val fromLayout = q(spark, sf01).collect().toSeq
    val fromOriginal = Tables.df(spark, sf01, "events")
      .filter(col("user_id").between(10, 19) &&
        col("ts") >= expr("timestamp_ntz'2024-01-10 00:00:00'") &&
        col("ts") < expr("timestamp_ntz'2024-01-12 00:00:00'"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), queries.Qh.dsum(col("value")).as("total"))
      .orderBy("event_type").collect().toSeq
    assert(fromLayout == fromOriginal)
  }
}
