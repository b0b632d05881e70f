package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All ordered position pairs (ids[a], ids[b]), a < b, of a long array —
  * the bucket-pair enumeration of the LSH/ssjoin candidate generators
  * (minhash bands, ngram/sweep postings, edit-distance blocks).
  *
  * A custom codegen'd Catalyst expression for the same reason as
  * [[WordNgrams]]: the
  * `flatten(transform(sequence(0, n-2), a -> transform(sequence(a+1,
  * n-1), b -> struct(...))))` spelling is THREE nested interpreted
  * higher-order functions allocating two index arrays, per-element
  * lambda frames and an intermediate array-of-arrays per ROW, and it
  * breaks the WholeStageCodegen span of every candidate-enumeration
  * stage. This emits the (n·(n−1))/2 pair structs in one primitive
  * loop, in the same (a, b) lexicographic order.
  *
  * Null array → null; null ELEMENTS pass through as null struct fields
  * (element_at semantics) — the callers' id arrays are non-null by
  * construction (BoundedMinSet output), so this is defensive only.
  */
case class OrderedPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("i", LongType), StructField("j", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_ordered_pairs"

  protected override def nullSafeEval(ids: Any): Any =
    OrderedPairs.compute(ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ids =>
      s"${ev.value} = graft.functions.OrderedPairs.compute($ids);")

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  /** Shared by interpreted and codegen paths. */
  def compute(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var a = 0
    while (a < n - 1) {
      val ia: Any = if (ids.isNullAt(a)) null else java.lang.Long.valueOf(ids.getLong(a))
      var b = a + 1
      while (b < n) {
        val jb: Any = if (ids.isNullAt(b)) null else java.lang.Long.valueOf(ids.getLong(b))
        out(k) = new GenericInternalRow(Array[Any](ia, jb)): InternalRow
        k += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }

  def ordered_pairs(ids: Column): Column =
    SqlShims.column(OrderedPairs(SqlShims.expression(ids)))
}
