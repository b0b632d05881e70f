package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Grouped top-k as a bounded-heap aggregate.
  *
  * The window spelling (`row_number() OVER (PARTITION BY g ORDER BY s
  * DESC) <= k`) shuffles and sorts EVERY row of the group; this
  * aggregator keeps only the current top-k (score, id) pairs in its
  * buffer, so the map-side partial pass reduces each partition to ≤ k
  * rows per group before the exchange — at 100 TB the shuffle carries
  * k·partitions·groups rows instead of the whole corpus. Chosen per the
  * preference order: composing an `Aggregator` (option b) expresses the
  * semantics fully, so no custom LogicalPlan/Strategy (option c) is
  * justified.
  *
  * Buffer layout: flat Array[Long] of (score-as-raw-bits, id) pairs,
  * sorted best-first. Scores travel as `doubleToRawLongBits` and ids as
  * plain longs — storing ids in a double would corrupt values ≥ 2^53
  * (64-bit hash/snowflake ids are routine at scale). NaN scores rank
  * greatest (matching ORDER BY ... DESC in both Spark and DuckDB).
  * Ties break toward the smaller id (deterministic — the same tiebreak
  * the catalog's window queries use).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[Long], Seq[(Double, Long)]] {
  require(k > 0)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], in: (Double, Long)): Array[Long] =
    insert(buf, java.lang.Double.doubleToRawLongBits(in._1), in._2)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    var i = 0
    while (i + 1 < b.length) { out = insert(out, b(i), b(i + 1)); i += 2 }
    out
  }

  override def finish(buf: Array[Long]): Seq[(Double, Long)] =
    buf.grouped(2)
      .map(p => (java.lang.Double.longBitsToDouble(p(0)), p(1)))
      .toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  /** Insert keeping the array sorted best-first, ≤ k pairs. */
  private def insert(buf: Array[Long], scoreBits: Long, id: Long): Array[Long] = {
    val n = buf.length / 2
    val score = java.lang.Double.longBitsToDouble(scoreBits)
    def better(idx: Int): Boolean = {
      // java.lang.Double.compare orders NaN above all values
      val c = java.lang.Double.compare(score, java.lang.Double.longBitsToDouble(buf(2 * idx)))
      c > 0 || (c == 0 && id < buf(2 * idx + 1))
    }
    // full and worse than the current tail → drop
    if (n == k && !better(n - 1)) return buf
    val m = math.min(n + 1, k)
    val out = new Array[Long](2 * m)
    var pos = 0
    while (pos < n && !better(pos)) pos += 1
    System.arraycopy(buf, 0, out, 0, 2 * pos)
    if (pos < m) {
      out(2 * pos) = scoreBits
      out(2 * pos + 1) = id
      val remaining = math.min(n - pos, m - pos - 1)
      if (remaining > 0)
        System.arraycopy(buf, 2 * pos, out, 2 * (pos + 1), 2 * remaining)
    }
    out
  }
}
