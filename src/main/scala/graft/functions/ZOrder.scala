package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton / Z-order curve key for TWO-dimensional data clustering —
  * what `Lakehouse.clusteredWrite` on a single key cannot give: sorting
  * by the interleaved key makes every output file a rectangular TILE of
  * the (a, b) key plane, so parquet row-group min/max stats are narrow
  * in BOTH dimensions and a pushed range predicate on EITHER column
  * prunes most row groups (Delta/Iceberg `ZORDER BY`). Single-key
  * clustering gives perfect skipping on the sort key and none on the
  * other; the Z-curve trades a little of the first for locality on
  * both — the right layout when a 100 TB fact is range-queried by two
  * independent keys (e.g. order id and part id, or date and customer).
  *
  * `zOrder2(a, b, bits)` interleaves the low `bits` bits of two
  * non-negative longs: a's bit i lands at position 2i, b's at 2i+1.
  * The expression is `bits` unrolled codegen'd shift/and/or primitives
  * — exact integer arithmetic, whole-stage-codegen friendly, and
  * reproducible bit-for-bit in ANSI SQL (see [[zOrder2Sql]], used by
  * the q92 oracle). bits ≤ 31 keeps the result in a positive int64.
  * Values ≥ 2^bits alias onto the grid (only the low bits are read);
  * size `bits` to the column domain.
  */
object ZOrder {

  def zOrder2(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** DuckDB twin of [[zOrder2]] over SQL expressions `a` and `b` —
    * the same unrolled interleave, fully parenthesized. */
  def zOrder2Sql(a: String, b: String, bits: Int = 21): String =
    (0 until bits).map { i =>
      s"((($a) & ${1L << i}) << $i) | ((($b) & ${1L << i}) << ${i + 1})"
    }.mkString("(", " | ", ")")
}
