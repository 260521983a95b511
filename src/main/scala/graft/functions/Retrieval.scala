package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Lexical retrieval scoring — the keyword-ranking half of a
  * retrieval/curation pipeline (the embedding half is Similarity).
  * The reference's BI layer ranks products by aggregates
  * (`gold_transfrom.py:64-69`, README.md:60-63 top-20 dashboard); a
  * training-data pipeline ranks *documents* against a query — same
  * agg-then-top-k shape, different scoring function.
  */
object Retrieval {

  /** BM25 per-document scores for a fixed bag of query terms.
    *
    * Oracle-exactness discipline (the q75 rule): ALL aggregation is
    * integer — per-doc term frequencies via conditional sums, doc
    * length, and the corpus stats row (N, total tokens, per-term df) —
    * and the score is ONE fixed-shape per-row double expression over
    * those integers, summed in written term order, so engine and
    * DuckDB oracle agree bit-for-bit. The idf is the rational
    * Robertson form (N − df + ½)/(df + ½) WITHOUT the log: ln goes
    * through libm and differs by 1 ulp between engines (observed —
    * see q41's note), and the log is a per-term monotone reshaping
    * that changes no ordering a spec pins.
    *
    * Scale shape: one token explode → one integer groupBy(doc) with
    * the term tfs folded into the same aggregate (no per-term join,
    * no second pass over tokens); the corpus stats reduce to a single
    * broadcast row. Nothing here is a window — callers wanting top-k
    * should `orderBy(score).limit(k)` (TakeOrdered, no
    * single-partition exchange), as q102 does.
    *
    * Output: (idCol, score) — one row per input document.
    */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be distinct and non-empty")
    val toks = df.select(col(idCol), explode(Text.tokens(col(textCol))).as("token"))
    val perDocAggs = count(lit(1)).as("dl") +:
      terms.map(t => sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    val perDoc = toks.groupBy(col(idCol)).agg(perDocAggs.head, perDocAggs.tail: _*)
    val statAggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_total")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("t_total").cast(DoubleType) / col("n_docs").cast(DoubleType)
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast(DoubleType)
      val dfT = col(s"df_$t").cast(DoubleType)
      val idf = (col("n_docs").cast(DoubleType) - dfT + lit(0.5)) / (dfT + lit(0.5))
      idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast(DoubleType) / avgdl)))
    }
    perDoc.crossJoin(broadcast(stats))
      .select(col(idCol), terms.map(termScore).reduce(_ + _).as("score"))
  }
}
