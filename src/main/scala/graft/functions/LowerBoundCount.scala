package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Count of array elements strictly below a probe value — the
  * groupedPrefix slice-id computation (pid = #equi-depth bounds < ord).
  *
  * A custom codegen'd Catalyst expression for the same reason as
  * [[DotProduct]]: the `size(filter(bnds, b -> b < ord))` spelling is an
  * interpreted higher-order function that allocates a lambda frame per
  * element — evaluated once per row per consumer of the prefix machinery
  * (two corpus passes), it breaks the WholeStageCodegen span and burns
  * CPU on pure interpretation overhead. This is a primitive loop inside
  * codegen. A LINEAR scan by design, not a binary search: the result
  * must equal the filter-count for ANY array contents (correctness of
  * the prefix sum needs only monotonicity of the bucketing, and a
  * sortedness assumption here would silently misbucket if a future
  * caller passed unsorted bounds).
  *
  * Nulls: null if either side is null; null ELEMENTS do not count
  * (`null < v` is not true — same as the filter spelling).
  */
case class LowerBoundCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lower_bound_count"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    LowerBoundCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LowerBoundCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LowerBoundCount =
    copy(left = newLeft, right = newRight)
}

object LowerBoundCount {
  /** Shared by interpreted and codegen paths. */
  def count(bounds: ArrayData, v: Double): Int = {
    val n = bounds.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!bounds.isNullAt(i) && bounds.getDouble(i) < v) c += 1
      i += 1
    }
    c
  }

  def lower_bound_count(bounds: Column, v: Column): Column =
    SqlShims.column(LowerBoundCount(SqlShims.expression(bounds), SqlShims.expression(v)))
}
