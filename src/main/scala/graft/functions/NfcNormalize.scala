package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass a text
  * pipeline runs BEFORE hashing/dedup so that visually-identical strings
  * ("é" vs "e"+U+0301) hash identically. A native Catalyst expression
  * with `doGenCode` (the RollingHash convention — not a UDF), wrapping
  * `java.text.Normalizer`; semantics match DuckDB's `nfc_normalize`,
  * which is what the oracle runs (both implement Unicode canonical
  * composition, so outputs are byte-identical).
  *
  * The quick-check fast path matters at scale: `isNormalized` scans
  * without allocating, and NFC-clean text (virtually all real corpora
  * row-wise) returns the INPUT UTF8String untouched — the normalize
  * allocation is paid only by rows that actually change.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[SqlShims.ADT] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by interpreted and codegen paths. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-level entry point. */
  def nfc_normalize(c: Column): Column =
    SqlShims.column(NfcNormalize(SqlShims.expression(c)))
}
