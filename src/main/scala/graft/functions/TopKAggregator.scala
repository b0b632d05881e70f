package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
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
  * Buffer/result layout: flat Array[Double] of (score, id) pairs,
  * sorted best-first; ties break toward the smaller id (deterministic —
  * the same tiebreak the catalog's window queries use).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[Double], Array[Double]] {
  require(k > 0)

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], in: (Double, Long)): Array[Double] =
    insert(buf, in._1, in._2.toDouble)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var out = a
    var i = 0
    while (i + 1 < b.length) { out = insert(out, b(i), b(i + 1)); i += 2 }
    out
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  /** Insert (score, id) keeping the array sorted best-first, ≤ k pairs.
    * NaN ranks greatest (matching ORDER BY ... DESC in both Spark and
    * DuckDB, so the aggregator stays result-equal to the window form
    * even on degenerate scores). */
  private def insert(buf: Array[Double], score: Double, id: Double): Array[Double] = {
    val n = buf.length / 2
    def better(s: Double, i: Double, idx: Int): Boolean = {
      val b = buf(2 * idx)
      // java.lang.Double.compare orders NaN above all values
      val c = java.lang.Double.compare(s, b)
      c > 0 || (c == 0 && i < buf(2 * idx + 1))
    }
    // full and worse than the current tail → drop
    if (n == k && !better(score, id, n - 1)) return buf
    val m = math.min(n + 1, k)
    val out = new Array[Double](2 * m)
    // find insertion point
    var pos = 0
    while (pos < n && !better(score, id, pos)) pos += 1
    System.arraycopy(buf, 0, out, 0, 2 * pos)
    if (pos < m) {
      out(2 * pos) = score
      out(2 * pos + 1) = id
      val remaining = math.min(n - pos, m - pos - 1)
      if (remaining > 0)
        System.arraycopy(buf, 2 * pos, out, 2 * (pos + 1), 2 * remaining)
    }
    out
  }
}
