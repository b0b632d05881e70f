package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash `h = (h*31 + byte) mod 1e9+7` over a string's
  * bytes — the document-fingerprinting primitive.
  *
  * A native Catalyst expression with `doGenCode` (not a UDF, not a
  * higher-order `aggregate(sequence(...))` fold): the HOF formulation is
  * interpreted per character (~0.8 ms/doc measured), while this compiles
  * into the WholeStageCodegen loop at ~1 byte/ns. Same preference order
  * the reference's scalar functions get from DataFusion's vectorized
  * kernels (reference datafusion.proto:448-522).
  *
  * For ASCII text this equals the SQL/DuckDB spelling
  * `fold over ascii(text[i])`, which is what the oracle replicates.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[SqlShims.ADT] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  protected override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 1000000007L

  /** Shared by interpreted and codegen paths. */
  def hash(s: UTF8String): Long = {
    var h = 0L
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      h = (h * 31 + (s.getByte(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  /** Column-level entry point. */
  def rolling_hash(c: Column): Column =
    SqlShims.column(RollingHash(SqlShims.expression(c)))
}
