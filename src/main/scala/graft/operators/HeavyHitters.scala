package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** EXACT frequent items ("heavy hitters") in two bounded-memory passes —
  * the Misra–Gries summary (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS'12) as candidate
  * generation, then an exact recount of the ≤ k candidates.
  *
  * Why not just `groupBy(v).count().filter(cnt·m > n)`? That shuffle
  * carries one row PER DISTINCT VALUE per partition — at 100 TB with a
  * high-cardinality key (URLs, user agents, query strings) the exchange
  * and the final hash aggregate are sized by the vocabulary, which is
  * exactly what a frequent-items query doesn't need. Here pass 1's
  * partial buffers are capped at k counters each (the MG invariant), so
  * the exchange carries ≤ partitions·k rows whatever the cardinality,
  * and pass 2 recounts only the ≤ k survivors by an `isin` filter that
  * reaches the scan. CMS (q77) answers the same question
  * probabilistically against a candidate stream; this operator is the
  * DETERMINISTIC exact tier — no hash collisions, no δ, final output
  * provably equal to the brute-force GROUP BY/HAVING (which is
  * therefore the DuckDB oracle).
  *
  * MG guarantee used: after processing n items with k counters, every
  * value's stored count underestimates its true frequency by at most
  * n/(k+1) — each decrement (or merge-time cut) destroys k+1 counts at
  * once, so at most n/(k+1) such events occur. Hence any value with
  * true frequency > n/(k+1) has a positive stored count and SURVIVES
  * into the candidate set. With k = m, every value with share > 1/m is
  * a candidate; the exact recount then removes false positives, so the
  * result is exactly the > n/m set. The merge (sum counters, subtract
  * the (k+1)-th largest, drop non-positive) preserves the bound —
  * Agarwal et al. Thm 1 — which is what makes the Aggregator safe under
  * partial aggregation and AQE re-planning.
  */
object HeavyHitters {

  /** The MG merge: sum counters; if more than k survive, subtract the
    * (k+1)-th largest count from everyone and drop the non-positive —
    * ≤ k remain, and the per-value underestimate grows by exactly the
    * cut (Agarwal et al. Thm 1). Exposed for the streaming maintenance
    * path ([[graft.streaming.Events.mgSummaryMaintainBatch]]), where
    * the standing artifact and the arriving batch's summary merge the
    * same way the Aggregator's partial buffers do. */
  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long],
                             k: Int): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (x, c)) =>
      acc.updated(x, acc.getOrElse(x, 0L) + c) }
    if (combined.size <= k) combined
    else {
      val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
      combined.flatMap { case (x, c) =>
        if (c > cut) Some(x -> (c - cut)) else None }
    }
  }

  /** MG summary aggregator: buffer = OUT = (bounded counter map, exact
    * total row count). The map never exceeds k entries; reduce's
    * decrement-all path is amortized O(1) per row (each decrement
    * consumes a prior increment). */
  private[graft] final class MgSummary(k: Int)
      extends Aggregator[String, (Map[String, Long], Long),
                         (Map[String, Long], Long)] {
    def zero: (Map[String, Long], Long) = (Map.empty, 0L)

    def reduce(b: (Map[String, Long], Long),
               v: String): (Map[String, Long], Long) = {
      val (m, n) = b
      val upd =
        if (m.contains(v)) m.updated(v, m(v) + 1L)
        else if (m.size < k) m.updated(v, 1L)
        else m.flatMap { case (x, c) =>
          if (c > 1L) Some(x -> (c - 1L)) else None }
      (upd, n + 1L)
    }

    def merge(a: (Map[String, Long], Long),
              b: (Map[String, Long], Long)): (Map[String, Long], Long) =
      (mgMerge(a._1, b._1, k), a._2 + b._2)

    def finish(r: (Map[String, Long], Long)): (Map[String, Long], Long) = r

    def bufferEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** One-scan MG summary of non-null `valueCol` values: (bounded
    * counter map — ≤ m entries, each counter an underestimate by at
    * most n/(m+1) — , exact row count n). */
  private[graft] def summarize(df: DataFrame, valueCol: String,
                               m: Int): (Map[String, Long], Long) = {
    require(m >= 1, s"threshold denominator m must be >= 1, got $m")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull).as[String]
      .select(new MgSummary(m).toColumn).head()
  }

  /** All values of `valueCol` occurring MORE than n/m times (n = number
    * of non-null rows), with their EXACT counts. Output: (`valueCol`
    * STRING, `cnt` LONG). Two passes over `df`; memory bounded by m
    * counters per partial buffer regardless of value cardinality. */
  def exactOverThreshold(df: DataFrame, valueCol: String, m: Int): DataFrame = {
    val vals = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
    // pass 1: MG candidates + exact n in ONE scan. The collect is a
    // single (≤ m counters, long) row by construction — candidate sets
    // are driver-bounded the way the k-means|| rounds·l sets are.
    val (candMap, n) = summarize(df, valueCol, m)
    val cands = candMap.keys.toSeq.sorted
    // pass 2: exact recount of candidates only; `isin` over ≤ m
    // literals stays in codegen and pushes to the scan
    if (cands.isEmpty) {
      vals.groupBy(col("v").as(valueCol)).agg(count(lit(1)).as("cnt"))
        .filter(lit(false))
    } else {
      vals.filter(col("v").isin(cands: _*))
        .groupBy(col("v").as(valueCol)).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(m.toLong) > lit(n))
    }
  }
}
