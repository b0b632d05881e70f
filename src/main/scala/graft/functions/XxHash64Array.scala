package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Element-wise xxhash64 of a string array — the shingle-hashing step of
  * the ssjoin/minhash family (`transform(sh, x -> xxhash64(x))`).
  *
  * A custom codegen'd Catalyst expression for the same reason as
  * [[WordNgrams]] / [[OrderedPairs]]: the transform spelling evaluates
  * an interpreted lambda per ELEMENT (~60 per doc, several passes per
  * query) and breaks the WholeStageCodegen span. This is one primitive
  * loop through [[XxHash64Function]] — the exact function the built-in
  * `xxhash64(string)` evaluates with, same default seed 42, so hashes
  * are bit-identical to the HOF spelling (pinned in FunctionsSpec).
  *
  * Null array → null; a null ELEMENT hashes to the seed-fold identity
  * exactly as `xxhash64(NULL)` does in the transform spelling (the
  * built-in returns the running seed for null input — here the seed
  * itself). Caller arrays are non-null-element by construction. */
case class XxHash64Array(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_xxhash64_array"

  protected override def nullSafeEval(a: Any): Any =
    XxHash64Array.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.XxHash64Array.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): XxHash64Array =
    copy(child = newChild)
}

object XxHash64Array {
  private val Seed = 42L

  /** Shared by interpreted and codegen paths. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) Seed
        else XxHash64Function.hash(a.getUTF8String(i), StringType, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  def xxhash64_array(a: Column): Column =
    SqlShims.column(XxHash64Array(SqlShims.expression(a)))
}
