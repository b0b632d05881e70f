package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** APPROX_PERCENTILE_CONT_WITH_WEIGHT (reference datafusion.proto:545) —
  * the one aggregate Spark has no built-in for (percentile_approx is
  * unweighted). Implemented as a typed `Aggregator` (the reference's
  * UDAF slot, datafusion.proto:558-562) over a bounded centroid sketch.
  *
  * Buffer layout: `buf(0)` = pair count n, then n (value, weight) pairs
  * in slots 1..2n — length-prefixed so `reduce` appends in place with
  * amortized doubling (a fresh copy per row would be O(n²) per group;
  * Spark's typed-aggregate path keeps the deserialized object between
  * rows, so in-place mutation is the intended pattern). When n exceeds
  * `maxPairs` the buffer is compressed by sorting on value and merging
  * adjacent centroids into weighted means — a simplified t-digest.
  * Memory is O(maxPairs) per group regardless of input size and merge is
  * associative/commutative, so the partial/final split across a
  * 1000-executor shuffle is safe; accuracy is asserted in ScalaTest
  * against an exact weighted percentile.
  *
  * Input: (value, weight); weight <= 0 and NaN rows are ignored.
  */
class WeightedPercentile(p: Double, maxPairs: Int = 2048)
    extends Aggregator[(Double, Double), Array[Double], Double] {
  require(p >= 0 && p <= 1, s"percentile must be in [0,1], got $p")

  override def zero: Array[Double] = {
    val buf = new Array[Double](1 + 2 * 16)
    buf(0) = 0
    buf
  }

  override def reduce(buf: Array[Double], in: (Double, Double)): Array[Double] = {
    val (v, w) = in
    // !(w > 0) also drops NaN weights (NaN <= 0 is false but NaN > 0 is
    // too) — one NaN weight would otherwise poison the group's total
    if (!(w > 0) || v.isNaN) return buf
    val n = buf(0).toInt
    val target = if (n >= maxPairs) compress(buf) else ensureRoom(buf, n + 1)
    val m = target(0).toInt
    target(1 + 2 * m) = v
    target(2 + 2 * m) = w
    target(0) = m + 1
    target
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val na = a(0).toInt; val nb = b(0).toInt
    val out = new Array[Double](1 + 2 * (na + nb))
    out(0) = na + nb
    System.arraycopy(a, 1, out, 1, 2 * na)
    System.arraycopy(b, 1, out, 1 + 2 * na, 2 * nb)
    if (na + nb > maxPairs) compress(out) else out
  }

  override def finish(buf: Array[Double]): Double = {
    val pairs = sortedPairs(buf)
    if (pairs.isEmpty) return Double.NaN
    val total = pairs.iterator.map(_._2).sum
    val target = p * total
    // walk cumulative weight; interpolate between centroid midpoints
    var cum = 0.0
    var i = 0
    while (i < pairs.length) {
      val (v, w) = pairs(i)
      if (cum + w >= target) {
        if (i == 0) return v
        val (pv, _) = pairs(i - 1)
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

  /** Grow (doubling) if `need` pairs don't fit; returns the array to use. */
  private def ensureRoom(buf: Array[Double], need: Int): Array[Double] =
    if (1 + 2 * need <= buf.length) buf
    else {
      val out = new Array[Double](math.max(1 + 2 * need, buf.length * 2))
      System.arraycopy(buf, 0, out, 0, 1 + 2 * buf(0).toInt)
      out
    }

  /** Sort by value, merge adjacent centroid pairs → at most half. */
  private def compress(buf: Array[Double]): Array[Double] = {
    val pairs = sortedPairs(buf)
    val out = new Array[Double](math.max(buf.length, 1 + 2 * maxPairs))
    var i = 0
    var j = 1
    var m = 0
    while (i + 1 < pairs.length) {
      val (v1, w1) = pairs(i); val (v2, w2) = pairs(i + 1)
      val w = w1 + w2
      out(j) = if (w == 0) (v1 + v2) / 2 else (v1 * w1 + v2 * w2) / w
      out(j + 1) = w
      i += 2; j += 2; m += 1
    }
    if (i < pairs.length) { out(j) = pairs(i)._1; out(j + 1) = pairs(i)._2; m += 1 }
    out(0) = m
    out
  }

  private def sortedPairs(buf: Array[Double]): Array[(Double, Double)] = {
    val n = buf(0).toInt
    val pairs = new Array[(Double, Double)](n)
    var i = 0
    while (i < n) { pairs(i) = (buf(1 + 2 * i), buf(2 + 2 * i)); i += 1 }
    scala.util.Sorting.stableSort(pairs, (a: (Double, Double), b: (Double, Double)) => a._1 < b._1)
    pairs
  }
}
