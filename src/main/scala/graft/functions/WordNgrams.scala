package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined word n-grams of a token array — the shared
  * shingling primitive of the decontamination family
  * (contaminationPairs / bloomDecontam / datasheet's contamination
  * panel).
  *
  * A custom codegen'd Catalyst expression for the same reason as
  * [[DotProduct]] and [[LowerBoundCount]]: the
  * `array_distinct(transform(sequence(0, size(w) - n), i ->
  * concat_ws(' ', w[i+1], ..., w[i+n])))` spelling is THREE nested
  * interpreted higher-order functions that allocate a sequence array, a
  * per-element lambda frame, and an intermediate gram array per ROW —
  * and break the WholeStageCodegen span of every scan stage that
  * shingles the corpus (Profile on the curation composites showed those
  * stages GC-heavy at low CPU efficiency). This does one primitive loop
  * per row inside codegen, deduplicating through a LinkedHashSet so the
  * output order is first-occurrence — exactly `array_distinct`'s.
  *
  * Exact-equality contract with the HOF spelling (pinned in
  * FunctionSpec): null words are SKIPPED inside a gram (concat_ws
  * semantics), a null array yields null, and inputs are guarded by the
  * callers' `size(w) >= n` filter exactly as before (below n tokens
  * this returns the empty array).
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  protected override def nullSafeEval(w: Any, n: Any): Any =
    WordNgrams.compute(w.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, n) =>
      s"${ev.value} = graft.functions.WordNgrams.compute($w, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}

object WordNgrams {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted and codegen paths. */
  def compute(w: ArrayData, n: Int): ArrayData = {
    val sz = w.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= sz - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (w.isNullAt(i + j)) null else w.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*)): Unit
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  def word_ngrams(w: Column, n: Column): Column =
    SqlShims.column(WordNgrams(SqlShims.expression(w), SqlShims.expression(n)))
}
