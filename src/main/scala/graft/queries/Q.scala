package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark plan plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/types must line up exactly — the driver sorts
  * columns by name and hash-compares values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Cache key for per-JVM artifact dirs (the q148Dirs pattern): the
    * fixture dir PLUS the max mtime under it, so a fixture regenerated
    * at the same path within one JVM session invalidates the cached
    * index instead of serving stale postings/lists against a fresh
    * oracle (the r11 q152 stale-cache seam). */
  def dataStamp(dir: String): String = {
    def maxMtime(f: java.io.File): Long = {
      val children = Option(f.listFiles).getOrElse(Array.empty[java.io.File])
      (f.lastModified +: children.map(maxMtime).toSeq).max
    }
    s"$dir@${maxMtime(new java.io.File(dir))}"
  }
}
