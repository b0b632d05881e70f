package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types._

/** Aggregation state: the `used` smallest distinct ids seen (ascending,
  * ≤ cap) plus the TRUE row count, so callers can account for what the
  * cap dropped. Primitive array — no boxing on the hot path. */
final class BoundedSetBuf(var ids: Array[Long], var used: Int, var total: Long)

/** Bounded distinct-set aggregate: `struct(ids, n)` where `ids` is the
  * `cap` smallest distinct longs of the group and `n` the group's true
  * row count.
  *
  * Purpose: LSH candidate buckets. `collect_set` puts an ENTIRE group
  * into one aggregation row — for bucket materialization that is
  * unbounded: one boilerplate mega-bucket (millions of near-identical
  * pages that survive exact dedup) is a single-row OOM before pair
  * expansion even starts. This aggregate bounds the group at the MAP
  * side — partial buffers never exceed `cap` ids, so the shuffle carries
  * ≤ cap longs per bucket per partition, not the bucket. Keeping the
  * smallest ids (not a sample) makes the capped result deterministic and
  * engine-independent — identical to
  * `slice(sort_array(collect_set(id)), 1, cap)` whenever the bucket
  * fits, which is what keeps the DuckDB oracle exact on the gate corpus.
  *
  * Implemented as a native [[TypedImperativeAggregate]] (the same
  * machinery as Spark's own `collect_set`) rather than a Scala
  * `Aggregator`: `udaf()`'s per-row encoder round-trip measured ~1.3×
  * on q_dedup_minhash; this version reads the input with a primitive
  * `getLong` and mutates a long[] in place.
  */
case class BoundedMinSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedSetBuf]
  with ExpectsInputTypes with UnaryLike[Expression] {
  require(cap > 0)

  // update() reads the child with an unchecked Long cast; declaring the
  // input type turns a mistyped child (e.g. an Int column) into a clear
  // analysis-time error instead of a runtime ClassCastException.
  override def inputTypes: Seq[SqlShims.ADT] = Seq(LongType)

  override def createAggregationBuffer(): BoundedSetBuf =
    new BoundedSetBuf(new Array[Long](math.min(cap, 8)), 0, 0L)

  override def update(buf: BoundedSetBuf, input: InternalRow): BoundedSetBuf = {
    val v = child.eval(input)
    if (v != null) {
      buf.total += 1L
      insert(buf, v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: BoundedSetBuf, b: BoundedSetBuf): BoundedSetBuf = {
    var i = 0
    while (i < b.used) { insert(a, b.ids(i)); i += 1 }
    a.total += b.total
    a
  }

  override def eval(buf: BoundedSetBuf): Any =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(java.util.Arrays.copyOf(buf.ids, buf.used)), buf.total))

  override def serialize(buf: BoundedSetBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * buf.used)
    bb.putLong(buf.total).putInt(buf.used)
    var i = 0
    while (i < buf.used) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedSetBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val total = bb.getLong()
    val used = bb.getInt()
    val ids = new Array[Long](math.max(used, 1))
    var i = 0
    while (i < used) { ids(i) = bb.getLong(); i += 1 }
    new BoundedSetBuf(ids, used, total)
  }

  /** Insert into the ascending-sorted prefix ids[0, used); dedupe; drop
    * anything that would land past `cap`. */
  private[graft] def insert(buf: BoundedSetBuf, id: Long): Unit = {
    var pos = java.util.Arrays.binarySearch(buf.ids, 0, buf.used, id)
    if (pos >= 0) return // already present
    pos = -pos - 1
    if (pos >= cap) return // full and id larger than the kept tail
    if (buf.used == buf.ids.length && buf.used < cap) // grow (≤ cap)
      buf.ids = java.util.Arrays.copyOf(buf.ids, math.min(cap, buf.ids.length * 2))
    val newUsed = math.min(buf.used + 1, cap)
    System.arraycopy(buf.ids, pos, buf.ids, pos + 1,
      math.min(buf.used - pos, newUsed - pos - 1))
    buf.ids(pos) = id
    buf.used = newUsed
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_min_set"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedMinSet =
    copy(child = newChild)
}

object BoundedMinSet {
  /** DataFrame-API handle: `bounded_min_set(col, cap)` aggregate. */
  def bounded_min_set(c: Column, cap: Int): Column =
    SqlShims.column(BoundedMinSet(SqlShims.expression(c), cap).toAggregateExpression())
}
