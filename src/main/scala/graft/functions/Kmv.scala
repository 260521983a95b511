package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values, "bottom-k") distinct-value sketches —
  * Bar-Yossef et al. (RANDOM'02) counting, Beyer et al. (SIGMOD'07)
  * unbiased estimation and multi-set algebra.
  *
  * Where the HLL tier (q30) is probabilistic-output (rows-only by
  * design), KMV here is built to HASH-GATE: the hash is the house
  * md5-h60 family truncated to 40 bits, the sketch is the exact
  * bottom-k of the distinct hash set (a total order both engines
  * agree on), and the estimator ((k−1)·2⁴⁰) ⁄ h₍ₖ₎ is INTEGER floor
  * division — every byte of the "approximate" answer is deterministic
  * and replayable in the DuckDB oracle. The estimate is still an
  * estimate of the true cardinality (that's the sketch contract); what
  * is exact is the computation.
  *
  * Why KMV at 100 TB: the sketch is mergeable (union = bottom-k of
  * sketch union — associative, partial-aggregatable) and supports SET
  * ALGEBRA that HLL fundamentally cannot do well: keep the k smallest
  * of A∪B, observe which of those members lie in both sets, and
  * ρ·n̂_union estimates |A∩B| (Beyer et al. §4). That turns
  * multi-billion-row distinct-intersection questions ("how many users
  * both viewed and purchased") into k-row arithmetic.
  *
  * Scale shape: per set, one map-side-combined distinct over the hash
  * column, then `sort.limit(k)` — Spark plans TakeOrdered: each
  * partition keeps its own k smallest, the driver merges P·k values.
  * Nothing corpus-sized moves. 40-bit hashes keep every product in the
  * estimator ((k−1)·2⁴⁰ ≤ 2⁴⁶ for k ≤ 64) far inside exact int64.
  */
object Kmv {

  val R40: Long = 1L << 40

  /** 40-bit hash: the house h60 truncated by shift (floor ÷ 2²⁰) —
    * exact and identical in both engines. `c` must be a string column
    * (hash is over UTF-8 bytes, the Hashes contract). */
  def h40(c: Column): Column = shiftright(Hashes.h60(c), 20)

  /** DuckDB twin of [[h40]] over SQL string expression `e`. */
  def h40Sql(e: String): String = s"(${Hashes.h60Sql(e)} // 1048576)"

  /** The sketch: bottom-k of the DISTINCT values of hash column
    * `hCol`. TakeOrdered — per-partition top-k, k·P to the driver. */
  def sketch(hashes: DataFrame, hCol: String, k: Int): DataFrame =
    hashes.select(col(hCol)).distinct().orderBy(col(hCol)).limit(k)

  /** Per-GROUP sketches: bottom-k of the distinct hashes within each
    * `grpCol` value. A single window over the group key would sort
    * each group's ENTIRE distinct-hash set in one task — a skew wall
    * when one group holds 10⁸ members at 100 TB — so this runs the
    * mergeable-aggregate shape instead: phase 1 takes bottom-k within
    * (group, salt) buckets (salt = h mod `salts`, deterministic, so
    * both phases replay bit-for-bit), phase 2 takes bottom-k of the
    * ≤ salts·k survivors per group. Identical output to the direct
    * window (every member of a group's global bottom-k is also in its
    * bucket's bottom-k), but the heavy sort parallelizes `salts`-wide
    * and the group-key shuffle carries ≤ salts·k rows per group, never
    * the membership. Because bottom-k is mergeable set algebra,
    * `groupSketch(standing ∪ arriving)` IS the incremental sketch
    * update — the property the streaming maintenance op leans on. */
  def groupSketch(hashes: DataFrame, grpCol: String, hCol: String,
                  k: Int, salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col(grpCol), pmod(col(hCol), lit(salts.toLong)))
      .orderBy(col(hCol))
    val w2 = Window.partitionBy(grpCol).orderBy(col(hCol))
    hashes.select(col(grpCol), col(hCol)).distinct()
      .withColumn("g_rn", row_number().over(w1))
      .filter(col("g_rn") <= k)
      .withColumn("g_rn", row_number().over(w2))
      .filter(col("g_rn") <= k).drop("g_rn")
  }

  /** Distinct-count estimates per group from a [[groupSketch]] table:
    * (grpCol, distinct_est). */
  def groupEstimates(sk: DataFrame, grpCol: String, hCol: String,
                     k: Int): DataFrame =
    sk.groupBy(col(grpCol))
      .agg(count(col(hCol)).as("g_cnt"), max(col(hCol)).as("g_kth"))
      .selectExpr(grpCol, estimateExpr("g_cnt", "g_kth", k) + " AS distinct_est")

  /** 1-row (cnt, kth) summary of a sketch: how many values it holds
    * and the largest (= h₍ₖ₎ when saturated). */
  def summary(sk: DataFrame, hCol: String): DataFrame =
    sk.agg(count(col(hCol)).as("g_cnt"), max(col(hCol)).as("g_kth"))

  /** The estimator as a Spark SQL fragment over named columns: exact
    * count while the sketch is unsaturated (|S| < k ⇒ the sketch IS
    * the set), else (k−1)·2⁴⁰ div h₍ₖ₎ — integer floor division.
    * String twins (`div` vs `//`) because the two engines spell
    * integer division differently; the arithmetic is identical. */
  def estimateExpr(cnt: String, kth: String, k: Int): String =
    s"CASE WHEN $cnt < $k THEN $cnt ELSE ${(k - 1).toLong * R40}L div $kth END"

  /** DuckDB twin of [[estimateExpr]]. */
  def estimateSql(cnt: String, kth: String, k: Int): String =
    s"CASE WHEN $cnt < $k THEN $cnt ELSE ${(k - 1).toLong * R40} // $kth END"
}
