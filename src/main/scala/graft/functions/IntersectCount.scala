package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |a ∩ b| for two long arrays (distinct elements) — the exact-Jaccard
  * verification hot path of q_dedup_ngram_jaccard.
  *
  * Why not `size(array_intersect(a, b))` + `size(array_union(a, b))`:
  * those materialize the intersection AND union arrays per candidate
  * pair only to take their sizes, and CollapseProject makes the filter
  * and the projection each evaluate them. This expression computes the
  * COUNT in one hash-probe pass with zero allocation beyond one reused
  * set, and the union size is then arithmetic:
  * |a ∪ b| = |a| + |b| − |a ∩ b| (both inputs hold distinct elements —
  * guaranteed here by array_distinct in the shingler).
  *
  * Same preference-order rationale as [[DotProduct]]: custom codegen'd
  * `Expression` over HOFs over UDFs.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[SqlShims.ADT] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_count"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Shared by interpreted and codegen paths. Probes the smaller side's
    * hash set with the larger side; inputs are distinct-element arrays. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    val set = new java.util.HashSet[Long](math.max(4, (n / 0.75).toInt))
    var i = 0
    while (i < n) { set.add(small.getLong(i)); i += 1 }
    var c = 0
    val m = big.numElements()
    i = 0
    while (i < m) { if (set.contains(big.getLong(i))) c += 1; i += 1 }
    c
  }

  def intersect_count(a: Column, b: Column): Column =
    SqlShims.column(IntersectCount(SqlShims.expression(a), SqlShims.expression(b)))
}
