package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints of a token array: rolling-hash every word
  * 3-gram, take the minimum of every full 4-window of consecutive gram
  * hashes, return the sorted distinct minima — the
  * [[graft.queries.PipelineQueries.winnowFps]] selection collapsed into
  * one codegen loop.
  *
  * Replaces (bit-identically — pinned in FunctionsSpec) the spelling
  *   gs  = transform(sequence(0, size(w)-3), i -> rolling_hash(concat_ws(' ', w[i+1..i+3])))
  *   fps = array_sort(array_distinct(transform(sequence(1, size(gs)-3), j -> array_min(slice(gs, j, 4)))))
  * which evaluates TWO interpreted lambdas per element and builds the
  * gram string just to hash it; here each gram hash streams the word
  * bytes (plus the single 0x20 separator concat_ws inserts) straight
  * through [[RollingHash]]'s fold without materializing the gram.
  * Callers guard size(w) >= 6 (so at least one full window exists);
  * below that this returns the empty array. Null words cannot occur
  * (split() output) — a null word is skipped with its separator,
  * matching concat_ws.
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  protected override def nullSafeEval(w: Any): Any =
    WinnowFps.compute(w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.WinnowFps.compute($w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  private final val Gram = 3 // words per shingle
  private final val Win = 4  // grams per winnowing window

  private def hashGram(w: ArrayData, start: Int): Long = {
    var h = 0L
    var seen = false
    var j = 0
    while (j < Gram) {
      if (!w.isNullAt(start + j)) {
        if (seen) h = (h * 31 + 0x20) % RollingHash.Mod // the ' ' separator
        val s: UTF8String = w.getUTF8String(start + j)
        val n = s.numBytes()
        var i = 0
        while (i < n) {
          h = (h * 31 + (s.getByte(i) & 0xff)) % RollingHash.Mod
          i += 1
        }
        seen = true
      }
      j += 1
    }
    h
  }

  /** Shared by interpreted and codegen paths. */
  def compute(w: ArrayData): ArrayData = {
    val nw = w.numElements()
    val ng = nw - Gram + 1 // gram count
    if (ng < Win) return new GenericArrayData(Array.emptyLongArray)
    val gs = new Array[Long](ng)
    var i = 0
    while (i < ng) { gs(i) = hashGram(w, i); i += 1 }
    val mins = new Array[Long](ng - Win + 1)
    var j = 0
    while (j <= ng - Win) {
      var m = gs(j)
      var k = 1
      while (k < Win) { if (gs(j + k) < m) m = gs(j + k); k += 1 }
      mins(j) = m
      j += 1
    }
    java.util.Arrays.sort(mins)
    var uniq = 0
    var p = 0
    while (p < mins.length) {
      if (uniq == 0 || mins(p) != mins(uniq - 1)) { mins(uniq) = mins(p); uniq += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, uniq))
  }

  def winnow_fps(w: Column): Column =
    SqlShims.column(WinnowFps(SqlShims.expression(w)))
}
