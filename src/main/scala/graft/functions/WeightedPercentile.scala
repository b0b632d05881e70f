package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** APPROX_PERCENTILE_CONT_WITH_WEIGHT (reference datafusion.proto:545) —
  * the one aggregate Spark has no built-in for (percentile_approx is
  * unweighted). Implemented as a typed `Aggregator` (the reference's
  * UDAF slot, datafusion.proto:558-562) over a bounded centroid sketch:
  *
  * The buffer is a flat Array[Double] of (value, weight) pairs. When it
  * exceeds `maxPairs` centroids it is compressed by sorting on value and
  * merging adjacent centroids into their weighted means — a simplified
  * t-digest. Memory is O(maxPairs) per group regardless of input size
  * and merge is associative/commutative, so the partial/final split
  * across a 1000-executor shuffle is safe; accuracy is asserted in
  * ScalaTest against an exact weighted percentile.
  *
  * Input: (value, weight); weight <= 0 rows are ignored.
  */
class WeightedPercentile(p: Double, maxPairs: Int = 2048)
    extends Aggregator[(Double, Double), Array[Double], Double] {
  require(p >= 0 && p <= 1, s"percentile must be in [0,1], got $p")

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], in: (Double, Double)): Array[Double] = {
    val (v, w) = in
    if (w <= 0 || v.isNaN) buf
    else maybeCompress(append(buf, v, w))
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length + b.length)
    System.arraycopy(a, 0, out, 0, a.length)
    System.arraycopy(b, 0, out, a.length, b.length)
    maybeCompress(out)
  }

  override def finish(buf: Array[Double]): Double = {
    if (buf.isEmpty) return Double.NaN
    val pairs = sortedPairs(buf)
    val total = pairs.iterator.map(_._2).sum
    val target = p * total
    // walk cumulative weight; interpolate between centroid midpoints
    var cum = 0.0
    var i = 0
    while (i < pairs.length) {
      val (v, w) = pairs(i)
      if (cum + w >= target) {
        if (i == 0) return v
        val (pv, pw) = pairs(i - 1)
        // linear interpolation between the two centroids weighted by how
        // far into this centroid's mass the target falls
        val frac = if (w == 0) 0.0 else (target - cum) / w
        return pv + (v - pv) * math.min(1.0, math.max(0.0, frac))
      }
      cum += w
      i += 1
    }
    pairs.last._1
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  private def append(buf: Array[Double], v: Double, w: Double): Array[Double] = {
    val out = new Array[Double](buf.length + 2)
    System.arraycopy(buf, 0, out, 0, buf.length)
    out(buf.length) = v
    out(buf.length + 1) = w
    out
  }

  private def maybeCompress(buf: Array[Double]): Array[Double] =
    if (buf.length / 2 <= maxPairs) buf
    else {
      val pairs = sortedPairs(buf)
      // merge adjacent centroid pairs → half the count
      val out = new Array[Double]((pairs.length + 1) / 2 * 2)
      var i = 0
      var j = 0
      while (i + 1 < pairs.length) {
        val (v1, w1) = pairs(i); val (v2, w2) = pairs(i + 1)
        val w = w1 + w2
        out(j) = if (w == 0) (v1 + v2) / 2 else (v1 * w1 + v2 * w2) / w
        out(j + 1) = w
        i += 2; j += 2
      }
      if (i < pairs.length) { out(j) = pairs(i)._1; out(j + 1) = pairs(i)._2 }
      out
    }

  private def sortedPairs(buf: Array[Double]): Array[(Double, Double)] = {
    val n = buf.length / 2
    val pairs = new Array[(Double, Double)](n)
    var i = 0
    while (i < n) { pairs(i) = (buf(2 * i), buf(2 * i + 1)); i += 1 }
    scala.util.Sorting.stableSort(pairs, (a: (Double, Double), b: (Double, Double)) => a._1 < b._1)
    pairs
  }
}
