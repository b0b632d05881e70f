package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave for multi-dimensional data layout.
  *
  * Writing a table sorted by `zkey(a, b)` co-clusters rows that are close
  * in BOTH dimensions, so every parquet row group covers a small (a, b)
  * box and a 2-D selective predicate prunes row groups on both columns —
  * a single-column sort can only ever prune on that one column. This is
  * the standard multi-dimensional clustering technique of large table
  * formats; at 100 TB it is the difference between reading ~box-fraction
  * of the table and reading every row group that matches one dimension.
  *
  * Pure bit arithmetic over built-in expressions — stays inside
  * WholeStageCodegen, no UDF, usable at write time (where layout is
  * decided) and costing nothing at read time.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative int columns:
    * bit i of `x` lands at position 2i+1, bit i of `y` at 2i. Inputs
    * must already be bucketed to [0, 2^bits). */
  def zkey(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Scale `v` from [lo, hi] into an integer bucket in [0, 2^bits).
    *
    * The scaling multiplies `(v - lo) * 2^bits` in exact long
    * arithmetic (floating the scale would let a double rounding flip a
    * bucket boundary), so the domain width is bounded at construction:
    * a width near 2^63-bits — e.g. millisecond epochs spanning years
    * with bits near 31 — would overflow to NEGATIVE buckets and
    * silently degenerate the whole layout. Callers with wider domains
    * pre-shift/pre-divide the column (a coarser unit loses nothing:
    * sub-bucket resolution is invisible to the z-key anyway). */
  def bucket(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    require(hi >= lo, s"empty domain: [$lo, $hi]")
    val width = hi - lo + 1 // lo <= hi, so no overflow here
    require(width <= (Long.MaxValue >> bits),
      s"domain width $width * 2^$bits overflows long arithmetic; " +
        "rescale the column to a coarser unit first")
    floor(((v - lit(lo)) * lit(1L << bits)) / lit(width)).cast("long")
  }
}
