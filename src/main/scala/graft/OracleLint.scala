package graft

/** Static lint over the DuckDB oracle SQL for the r10 failure class:
  * DuckDB's `SUM` over an integer column returns HUGEINT (128-bit),
  * which the driver's canonicalizer coerces to float64 while the Spark
  * side emits int64 — a hash mismatch on value-identical outputs
  * (q126, round 10). The house convention is to wrap every SUM whose
  * value REACHES THE FINAL SELECT in `CAST(... AS BIGINT)`; SUMs that
  * stay internal (comparison operands, intermediate CTE arithmetic that
  * is cast later) are fine uncast.
  *
  * The check is lineage-lite: collect every alias bound to an uncast
  * `SUM(...) [OVER ...] AS alias` anywhere in the statement, then flag
  * (a) any uncast SUM sitting directly in the final SELECT's emission
  * list, and (b) any collected alias that the final SELECT emits
  * without a surrounding CAST. Paren-matching scanner, not regex, so
  * nested calls (`SUM(CASE WHEN ... END)`, `SUM(len(x))`) parse.
  */
object OracleLint {

  /** All violations in one oracle statement; empty = clean. */
  def check(name: String, sql: String): Seq[String] = {
    val s = sql
    val lower = s.toLowerCase
    // ---- collect every SUM( occurrence with its span and context ----
    case class SumSite(start: Int, end: Int, castWrapped: Boolean, alias: Option[String])
    val sites = scala.collection.mutable.ListBuffer[SumSite]()
    var i = lower.indexOf("sum(")
    while (i >= 0) {
      val wordBoundary = i == 0 || !isIdentChar(lower.charAt(i - 1))
      if (wordBoundary) {
        // matching close paren of the SUM argument list
        var depth = 0; var j = i + 3; var end = -1
        while (j < s.length && end < 0) {
          s.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (end >= 0) {
          var k = skipWs(s, end + 1)
          // optional OVER (...) or OVER winname
          if (lower.startsWith("over", k)) {
            k = skipWs(s, k + 4)
            if (k < s.length && s.charAt(k) == '(') {
              var d = 0; var m = k
              while (m < s.length && (d != 0 || m == k)) {
                s.charAt(m) match {
                  case '(' => d += 1
                  case ')' => d -= 1
                  case _ =>
                }
                m += 1
              }
              k = skipWs(s, m)
            } else { // named window: OVER fr
              while (k < s.length && isIdentChar(s.charAt(k))) k += 1
              k = skipWs(s, k)
            }
          }
          val alias =
            if (lower.startsWith("as", k) && k + 2 < s.length && !isIdentChar(lower.charAt(k + 2))) {
              val a0 = skipWs(s, k + 2)
              var a1 = a0
              while (a1 < s.length && isIdentChar(s.charAt(a1))) a1 += 1
              if (a1 > a0) Some(s.substring(a0, a1).toLowerCase) else None
            } else None
          // cast-wrapped iff the trimmed text immediately before ends with "cast("
          val before = lower.substring(0, i).reverse.dropWhile(_.isWhitespace).reverse
          sites += SumSite(i, end, before.endsWith("cast("), alias)
        }
      }
      i = lower.indexOf("sum(", i + 1)
    }
    // ---- final SELECT emission list (last TOP-LEVEL SELECT..FROM) ----
    // paren-depth-0 scan: `lastIndexOf` alone would land on a subquery
    // in the final FROM clause and lint ITS emission list instead
    val selStart = {
      var depth = 0; var j = 0; var found = -1
      while (j < s.length) {
        s.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
            if (depth == 0 && lower.startsWith("select", j) &&
                (j == 0 || !isIdentChar(lower.charAt(j - 1))) &&
                (j + 6 >= s.length || !isIdentChar(lower.charAt(j + 6)))) found = j
        }
        j += 1
      }
      found
    }
    if (selStart < 0) return Seq(s"$name: no SELECT found")
    val fromIdx = {
      // first top-level FROM after the final SELECT
      var depth = 0; var j = selStart; var found = -1
      while (j < s.length && found < 0) {
        s.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
            if (depth == 0 && lower.startsWith("from", j) &&
                (j == 0 || !isIdentChar(lower.charAt(j - 1))) &&
                (j + 4 >= s.length || !isIdentChar(lower.charAt(j + 4)))) found = j
        }
        j += 1
      }
      if (found < 0) s.length else found
    }
    val emission = lower.substring(selStart, fromIdx)
    val out = scala.collection.mutable.ListBuffer[String]()
    // (a) uncast SUM directly in the final emission list
    sites.filter(st => st.start >= selStart && st.start < fromIdx && !st.castWrapped)
      .foreach { st =>
        out += s"$name: uncast SUM emitted by the final SELECT at offset ${st.start} " +
          "(DuckDB returns HUGEINT; wrap in CAST(... AS BIGINT))"
      }
    // (b) an uncast-SUM alias emitted bare by the final SELECT
    val hugeAliases = sites.filter(st => !st.castWrapped && st.start < selStart)
      .flatMap(_.alias).toSet
    for (a <- hugeAliases.toSeq.sorted) {
      var p = emission.indexOf(a)
      var flagged = false
      while (p >= 0 && !flagged) {
        val bs = p == 0 || !isIdentChar(emission.charAt(p - 1))
        val be = p + a.length >= emission.length || !isIdentChar(emission.charAt(p + a.length))
        // an occurrence right after AS is the OUTPUT name of some other
        // (possibly cast) expression, not a value reference — skip it
        val prevWord = emission.substring(0, p).reverse.dropWhile(_.isWhitespace)
        val isOutputName = prevWord.startsWith("sa") &&
          (prevWord.length == 2 || !isIdentChar(prevWord.charAt(2)))
        if (bs && be && !isOutputName) {
          // inside a CAST(...) anywhere up the open-paren chain is fine
          val castWrapped = {
            var depth = 0; var q = p - 1; var wrapped = false
            while (q >= 0 && !wrapped) {
              emission.charAt(q) match {
                case ')' => depth += 1
                case '(' =>
                  if (depth == 0) {
                    val before = emission.substring(0, q).reverse.dropWhile(_.isWhitespace).reverse
                    if (before.endsWith("cast")) wrapped = true
                    // keep climbing: an enclosing fn(...) may itself sit in a CAST
                  } else depth -= 1
                case _ =>
              }
              q -= 1
            }
            wrapped
          }
          if (!castWrapped) {
            out += s"$name: final SELECT emits '$a' (an uncast SUM alias) without a CAST " +
              "(DuckDB returns HUGEINT; CAST at the SUM site or at emission)"
            flagged = true
          }
        }
        p = emission.indexOf(a, p + 1)
      }
    }
    out.toList
  }

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
  private def skipWs(s: String, from: Int): Int = {
    var k = from
    while (k < s.length && s.charAt(k).isWhitespace) k += 1
    k
  }

  /** Lint every registered oracle; returns all violations. */
  def checkRegistry(): Seq[String] =
    SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (n, sql) => check(n, sql) }
}
