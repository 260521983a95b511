package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine hashes for the oracle-gated dedup/fingerprint family.
  *
  * Production paths default to xxhash64 (one codegen'd primitive op);
  * these md5-derived forms exist because BOTH engines (Spark and the
  * DuckDB oracle) define md5 over UTF-8 bytes identically, so every
  * query built on them is verifiable bit-for-bit by the driver's gate.
  *
  *  - `hex15(c)` = first 15 hex chars of md5(c) — a fixed-width
  *    lowercase string whose lexicographic order equals its numeric
  *    order, so `min` aggregates (MinHash) work on it directly with no
  *    integer parse at all;
  *  - `h60(c)`   = the same 15 hex chars as a 60-bit long. 60 bits fit
  *    a SIGNED int64 on both engines — a full 64-bit unsigned parse
  *    would overflow Spark 4's ANSI-mode cast for half of all inputs.
  */
object Hashes {
  def hex15(c: Column): Column = substring(md5(c.cast(BinaryType)), 1, 15)

  def h60(c: Column): Column = conv(hex15(c), 16, 10).cast(LongType)

  /** DuckDB twin of `hex15` over SQL expression `e`. */
  def hex15Sql(e: String): String = s"substr(md5($e), 1, 15)"

  /** DuckDB parse of a 15-hex-char string expression `x` into BIGINT —
    * the oracle-side `h60`. A fragment (not a full md5 call) so callers
    * can hash once into a list and parse inside a lambda without
    * recomputing the md5 per hex digit; `g`-prefixed lambda variables
    * avoid capture collisions when nested inside an outer lambda. */
  def hexToLongSql(x: String): String =
    s"list_reduce(list_transform(range(1,16), gi -> CAST(strpos('0123456789abcdef', ($x)[gi]) - 1 AS BIGINT)), (ga, gd) -> ga * 16 + gd)"

  /** DuckDB twin of `h60` over SQL expression `e`. */
  def h60Sql(e: String): String = hexToLongSql(hex15Sql(e))

  /** 31-bit affine seeded family over ONE md5-derived gram hash:
    * x = h60(gram) % P31, then seed i's value is (a_i·x + b_i) % P31
    * with P31 = 2³¹−1 (Mersenne prime). One md5 per gram instead of one
    * per (seed, gram) — k× less hashing in the MinHash scan — and every
    * product stays under 2⁶² so the arithmetic is exact int64 on both
    * engines (no ANSI overflow). The constants are themselves
    * md5-derived (a_i nonzero), precomputed here so the SQL twin can
    * inline them as plain literals. */
  val P31: Long = 2147483647L

  private def jvmH60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  def affineA(i: Int): Long = 1L + jvmH60(s"a|$i") % (P31 - 1)
  def affineB(i: Int): Long = jvmH60(s"b|$i") % P31

  /** DuckDB list of h60 token hashes for the tokens-of-text idiom. */
  def tokenH60ListSql(textExpr: String): String =
    s"list_transform(list_transform(string_split(trim($textExpr), ' '), gt -> ${hex15Sql("gt")}), gx -> ${hexToLongSql("gx")})"
}
