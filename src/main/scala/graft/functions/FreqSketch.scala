package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.immutable.HashMap

/** Misra-Gries heavy-hitters sketch as a mergeable aggregate.
  *
  * Finds every item whose true frequency exceeds N/(m+1) in one pass with
  * O(m) memory per partial — the scale path for "top terms of a 100 TB
  * corpus", where the naive `groupBy(token).count` shuffles one row per
  * DISTINCT token (trillions of keys for n-grams) while this shuffles one
  * m-entry map per map-side partial. Guarantees (Misra-Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS'12):
  *
  *   - estimate(t) ≤ true(t)                        (never over-counts)
  *   - true(t) − estimate(t) ≤ N/(m+1)              (N = total items fed,
  *     preserved under arbitrary merge trees — proven in FunctionsSpec)
  *   - hence every t with true(t) > N/(m+1) is present in the summary.
  *
  * The candidate SET is therefore deterministic-superset of the heavy
  * items regardless of partition layout or merge order (estimates
  * themselves may vary by merge order, so queries wanting exact counts
  * re-count the candidates in a second pass — see q_text_heavy_hitters).
  *
  * reduce: count if tracked; insert if room; else decrement all (the
  * O(m) decrement amortizes — each hit of that branch pays for m prior
  * inserts). merge: sum counts, then subtract the (m+1)-th largest count
  * from all and drop ≤0 — the standard MG merge.
  */
class FreqSketch(m: Int)
    extends Aggregator[String, HashMap[String, Long], Map[String, Long]] {
  require(m > 0)

  override def zero: HashMap[String, Long] = HashMap.empty

  override def reduce(buf: HashMap[String, Long], t: String): HashMap[String, Long] =
    buf.get(t) match {
      case Some(c) => buf.updated(t, c + 1)
      case None if buf.size < m => buf.updated(t, 1L)
      case None =>
        // decrement-all: drop zeros; the new item is "cancelled" against
        // one unit of every tracked item (classic MG step)
        buf.iterator.foldLeft(HashMap.empty[String, Long]) { case (acc, (k, c)) =>
          if (c > 1) acc.updated(k, c - 1) else acc
        }
    }

  override def merge(a: HashMap[String, Long], b: HashMap[String, Long]): HashMap[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= m) sum
    else {
      // subtract the (m+1)-th largest count, keep strictly-positive
      val counts = sum.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val kth = counts(counts.length - 1 - m)
      sum.iterator.foldLeft(HashMap.empty[String, Long]) { case (acc, (k, c)) =>
        if (c > kth) acc.updated(k, c - kth) else acc
      }
    }
  }

  override def finish(buf: HashMap[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[HashMap[String, Long]] =
    ExpressionEncoder[HashMap[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
