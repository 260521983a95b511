package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: point p ∈ [lo, hi] — the other
  * join Spark lacks natively (build-contract example alongside as-of).
  * The naive formulation is an inequality join, which Catalyst can only
  * execute as a broadcast-nested-loop (O(|points|·|ranges|) compares) —
  * fine for a handful of ranges, fatal at scale.
  *
  * The scale form bins the domain: each point lands in one fixed-width
  * bin (a shift — exact on non-negative longs), each range EXPLODES to
  * the bins it covers, and the join becomes a plain equi-join on the
  * bin id followed by the exact containment filter. Cost:
  * |points| + Σ(range width / bin width) join rows — linear, shuffled
  * on bin (AQE handles hot bins). Bin width (2^binShift) trades
  * replication of ranges against bin selectivity; pick it near the
  * median range width.
  *
  * Domain: non-negative longs (epoch times; an arithmetic shift on
  * negatives would floor to a different bin than integer division).
  */
object RangeJoin {

  /** Naive inequality form — the semantic reference (and still the
    * right plan when `ranges` is broadcast-tiny). */
  def naive(points: DataFrame, pCol: String,
            ranges: DataFrame, loCol: String, hiCol: String): DataFrame =
    points.join(ranges, col(pCol) >= col(loCol) && col(pCol) <= col(hiCol), "inner")

  /** Binned equi-join form — identical result set (RangeJoinSpec pins
    * the equivalence, boundaries included). */
  def binned(points: DataFrame, pCol: String,
             ranges: DataFrame, loCol: String, hiCol: String,
             binShift: Int): DataFrame = {
    val pb = points.withColumn("__bin", shiftright(col(pCol), binShift))
    val rb = ranges.withColumn("__bin",
      explode(sequence(shiftright(col(loCol), binShift),
        shiftright(col(hiCol), binShift))))
    pb.join(rb, Seq("__bin"), "inner")
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }
}
