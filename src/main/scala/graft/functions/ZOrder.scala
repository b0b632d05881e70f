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

  /** Scale `v` from [lo, hi] into an integer bucket in [0, 2^bits). */
  def bucket(v: Column, lo: Long, hi: Long, bits: Int): Column =
    floor(((v - lit(lo)) * lit(1L << bits)) / lit(hi - lo + 1)).cast("long")
}
