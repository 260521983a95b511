package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton / Z-order curve key for multi-dimensional data clustering —
  * what `Lakehouse.clusteredWrite` on a single key cannot give: sorting
  * by the interleaved key makes every output file a rectangular TILE of
  * the key space, so parquet row-group min/max stats are narrow in
  * EVERY dimension and a pushed range predicate on ANY key column
  * prunes most row groups (Delta/Iceberg `ZORDER BY`). Single-key
  * clustering gives perfect skipping on the sort key and none on the
  * others; the Z-curve trades a little of the first for locality on
  * all — the right layout when a 100 TB fact is range-queried by
  * independent keys (e.g. order id, part id, supplier id).
  *
  * `zOrderN(cols, bits)` interleaves the low `bits` bits of n
  * non-negative longs: column j's bit i lands at position i·n + j.
  * The expression is n·bits unrolled codegen'd shift/and/or primitives
  * — exact integer arithmetic, whole-stage-codegen friendly, and
  * reproducible bit-for-bit in ANSI SQL (see [[zOrderNSql]], used by
  * the q92/q92n oracles). n·bits ≤ 63 keeps the result in a positive
  * int64. Values ≥ 2^bits alias onto the grid (only the low bits are
  * read); size `bits` to the widest column domain. [[zOrder2]] is the
  * two-column form with the historical (a even, b odd) bit layout —
  * identical to `zOrderN(Seq(a, b), bits)`.
  */
object ZOrder {

  def zOrderN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"zOrderN needs at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need 1 <= bits and n*bits <= 63, got n=$n bits=$bits")
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(c.bitwiseAND(lit(1L << i)), i * (n - 1) + j))
      }
    }
  }

  def zOrder2(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    zOrderN(Seq(a, b), bits)
  }

  /** DuckDB twin of [[zOrderN]] over SQL expressions — the same
    * unrolled interleave, fully parenthesized. */
  def zOrderNSql(exprs: Seq[String], bits: Int): String = {
    val n = exprs.size
    require(n >= 2 && bits >= 1 && n * bits <= 63,
      s"need n >= 2, 1 <= bits, n*bits <= 63, got n=$n bits=$bits")
    exprs.zipWithIndex.flatMap { case (e, j) =>
      (0 until bits).map { i =>
        s"((($e) & ${1L << i}) << ${i * (n - 1) + j})"
      }
    }.mkString("(", " | ", ")")
  }

  /** DuckDB twin of [[zOrder2]]. */
  def zOrder2Sql(a: String, b: String, bits: Int = 21): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    zOrderNSql(Seq(a, b), bits)
  }
}
