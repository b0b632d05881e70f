package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types._

/** Aggregation state: the `used` lexicographically-smallest distinct
  * (d, id) pairs seen, interleaved [d0, id0, d1, id1, …], ascending. */
final class MinPairsBuf(var arr: Array[Long], var used: Int)

/** Bounded top-k-nearest aggregate: the `k` smallest (d, id) pairs of a
  * group by (d ASC, id ASC) — the exact semantics of
  * `row_number() OVER (PARTITION BY g ORDER BY d, id) <= k`, without
  * the window's group-wide shuffle-and-sort.
  *
  * Purpose: exact per-vector k-NN reduction over candidate-pair streams
  * whose size is data-geometry-dependent (the mutual-NN generator's
  * pass-2 re-probe approaches n² per side when distance concentration
  * defeats the triangle bounds — the sf10 decade corpus OOM'd the 8g
  * context materializing it through a window). As a
  * [[TypedImperativeAggregate]] the partial state is ≤ k pairs per
  * group per partition, map-side combined — the candidate stream is
  * consumed and discarded task-locally, and the exchange carries
  * k·groups·partitions rows instead of the stream. Bounded min-k is
  * associative, so top-k over a union equals top-k over the unions'
  * top-k frames — the property the two-pass caller composes on.
  *
  * Exact duplicates ((d, id) equal) dedupe — the same candidate pair
  * reached via both probe directions must not occupy two of the k
  * slots. Same-id-different-d inputs do NOT dedupe, which is correct
  * only when d is a pure function of (group, id), as a distance is.
  * Same native-imperative choice as [[BoundedMinSet]] (a `udaf()`
  * encoder round-trip measured ~1.3× there).
  */
case class BoundedMinPairs(
    d: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinPairsBuf]
  // ImplicitCast (not just Expects): int distances/ids coerce to the
  // bigint contract instead of failing analysis — the numeric-aggregate
  // convention (round-14 advice)
  with ImplicitCastInputTypes with BinaryLike[Expression] {
  require(k > 0)

  override def left: Expression = d
  override def right: Expression = id
  override def inputTypes: Seq[SqlShims.ADT] = Seq(LongType, LongType)

  override def createAggregationBuffer(): MinPairsBuf =
    new MinPairsBuf(new Array[Long](2 * math.min(k, 4)), 0)

  // Bound-reference fast path: by update() time the children are bound
  // to input ordinals, and the generic eval() path boxes two Longs per
  // row. Reading the primitives straight off the row is strictly less
  // work on the billion-row candidate streams this aggregate consumes
  // (measured neutral at the sf10 decade — the JIT largely elides the
  // boxes — but the allocation-free path costs nothing and does not
  // depend on escape analysis holding). eval() remains the fallback
  // for non-reference children.
  @transient private lazy val dRef = d match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == LongType => b
    case _ => null
  }
  @transient private lazy val idRef = id match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == LongType => b
    case _ => null
  }

  override def update(buf: MinPairsBuf, input: InternalRow): MinPairsBuf = {
    if (dRef != null && idRef != null) {
      if (!input.isNullAt(dRef.ordinal) && !input.isNullAt(idRef.ordinal))
        insert(buf, input.getLong(dRef.ordinal), input.getLong(idRef.ordinal))
    } else {
      val dv = d.eval(input)
      val iv = id.eval(input)
      if (dv != null && iv != null)
        insert(buf, dv.asInstanceOf[Long], iv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: MinPairsBuf, b: MinPairsBuf): MinPairsBuf = {
    var i = 0
    while (i < b.used) { insert(a, b.arr(2 * i), b.arr(2 * i + 1)); i += 1 }
    a
  }

  override def eval(buf: MinPairsBuf): Any = {
    val rows = new Array[Any](buf.used)
    var i = 0
    while (i < buf.used) {
      rows(i) = new GenericInternalRow(Array[Any](buf.arr(2 * i), buf.arr(2 * i + 1)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MinPairsBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.used)
    bb.putInt(buf.used)
    var i = 0
    while (i < 2 * buf.used) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinPairsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val used = bb.getInt()
    val arr = new Array[Long](math.max(2 * used, 2))
    var i = 0
    while (i < 2 * used) { arr(i) = bb.getLong(); i += 1 }
    new MinPairsBuf(arr, used)
  }

  /** Insert into the lexicographically-ascending pair prefix; dedupe
    * exact (d, id); drop anything landing past `k`. */
  private[graft] def insert(buf: MinPairsBuf, dv: Long, iv: Long): Unit = {
    // binary search over (d, id) pairs
    var lo = 0
    var hi = buf.used - 1
    var pos = -1
    while (pos < 0 && lo <= hi) {
      val mid = (lo + hi) >>> 1
      val md = buf.arr(2 * mid); val mi = buf.arr(2 * mid + 1)
      val c = if (md != dv) java.lang.Long.compare(md, dv)
              else java.lang.Long.compare(mi, iv)
      if (c == 0) return // exact duplicate
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    pos = lo
    if (pos >= k) return // full and pair larger than the kept tail
    if (buf.used == buf.arr.length / 2 && buf.used < k) // grow (≤ k)
      buf.arr = java.util.Arrays.copyOf(buf.arr, math.min(2 * k, buf.arr.length * 2))
    val newUsed = math.min(buf.used + 1, k)
    System.arraycopy(buf.arr, 2 * pos, buf.arr, 2 * pos + 2,
      2 * math.min(buf.used - pos, newUsed - pos - 1))
    buf.arr(2 * pos) = dv
    buf.arr(2 * pos + 1) = iv
    buf.used = newUsed
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("o", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_min_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedMinPairs =
    copy(d = newLeft, id = newRight)
}

object BoundedMinPairs {
  /** DataFrame-API handle: `bounded_min_pairs(d, id, k)` aggregate —
    * array<struct<d, o>> of the group's k smallest (d, id) pairs,
    * ascending. */
  def bounded_min_pairs(d: Column, id: Column, k: Int): Column =
    SqlShims.column(
      BoundedMinPairs(SqlShims.expression(d), SqlShims.expression(id), k)
        .toAggregateExpression())
}
