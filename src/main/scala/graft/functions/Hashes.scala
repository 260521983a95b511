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

  /** DuckDB list of h60 token hashes for the tokens-of-text idiom. */
  def tokenH60ListSql(textExpr: String): String =
    s"list_transform(list_transform(string_split(trim($textExpr), ' '), gt -> ${hex15Sql("gt")}), gx -> ${hexToLongSql("gx")})"
}
