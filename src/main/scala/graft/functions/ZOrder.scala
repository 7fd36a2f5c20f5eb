package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding as plain codegen'd Column algebra —
  * the space-filling-curve half of multi-dimensional data clustering
  * (Delta `OPTIMIZE ZORDER BY`, Iceberg `rewrite_data_files` sort
  * orders). Sorting a table by `zValue(x, y)` makes files cover tight
  * rectangles of (x, y) space, so per-file [min, max] zone maps prune
  * range predicates on EITHER column — a single-column sort can only
  * serve its own column.
  *
  * Everything here is shift/mask integer algebra over built-in
  * expressions (no UDF, stays inside whole-stage codegen, and has an
  * exact integer-ops twin in any SQL engine for oracle checks).
  */
object ZOrder {

  /** Spreads the low 31 bits of a non-negative long so bit i lands at
    * position 2i (the classic binary-magic-numbers dilation, unrolled
    * as five shift-or-mask rounds).
    */
  private[graft] def spreadBits(c: Column): Column = {
    def step(x: Column, shift: Int, mask: Long): Column =
      (x.bitwiseOR(shiftleft(x, shift))).bitwiseAND(lit(mask))
    val x0 = c.bitwiseAND(lit(0x7FFFFFFFL))
    val x1 = step(x0, 16, 0x0000FFFF0000FFFFL)
    val x2 = step(x1, 8, 0x00FF00FF00FF00FFL)
    val x3 = step(x2, 4, 0x0F0F0F0F0F0F0F0FL)
    val x4 = step(x3, 2, 0x3333333333333333L)
    step(x4, 1, 0x5555555555555555L)
  }

  /** The Z-value of a point: bits of `x` and `y` interleaved
    * (x at even positions, y at odd). Domain: the low 31 bits of each
    * input — the result occupies 62 bits and is always non-negative,
    * so it sorts correctly as a signed long. Callers with wider or
    * negative domains map to ranks or offsets first (which is what a
    * table-layout clustering pass should do anyway: curve locality
    * cares about order, not magnitude).
    */
  def zValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))
}
