package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered FUNNEL analysis — "how many sessions reached view → click →
  * purchase, in order?" — the conversion table behind every e-commerce
  * dashboard (the reference's BI layer ranks products and revenue,
  * gold_transfrom.py:64-69; the funnel is the step those dashboards
  * ask for next). Semantics: a key (e.g. a session) reaches stage i
  * iff it has a stage-i event STRICTLY ordered after the event that
  * completed stage i−1. The frontier is computed greedily (earliest
  * completion of each prefix); greedy-earliest is exchange-optimal, so
  * "reaches stage i" is well-defined regardless of which chain a user
  * might pick.
  *
  * Scale shape: stage 1 is one integer aggregate over the (filtered)
  * event scan; each later stage is an equi-join of a type-filtered
  * event slice against the PREVIOUS frontier — both sides keyed and
  * shuffled on the same `keyCols`, and the frontier only shrinks as
  * stages progress. No windows, no per-key explosion; at 100 TB every
  * stage is one shuffle on the session key with map-side-combined
  * mins.
  *
  * Plan-reuse contract: the stage branches are INDEPENDENT subtrees
  * over `df`, and Catalyst does not common-subexpression a DataFrame.
  * [[stageFrontiers]] alone re-evaluates `df` n times (stage n's plan
  * embeds one fresh scan per stage), but [[stageCounts]] UNIONS the
  * whole frontier prefix-chain — stage i's count branch contains all i
  * of its frontier scans, so `df` is evaluated a TRIANGULAR
  * n·(n+1)/2 times (6 scans for 3 stages), not n. When `df` is itself
  * expensive (a sessionizer window over the raw event log, as in
  * q150), `persist()` it before calling — the caller owns that
  * lifecycle — or every stage's count re-derives the whole chain.
  */
object Funnel {

  /** Per-key frontier of each stage prefix: element i is a DataFrame
    * of (keyCols…, frontier) holding, for every key that reaches
    * stage i+1, the `orderCol` of its earliest chain completion. */
  def stageFrontiers(df: DataFrame, keyCols: Seq[String], orderCol: String,
                     typeCol: String, stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "empty funnel")
    val keys = keyCols.map(col)
    val first = df.filter(col(typeCol) === stages.head)
      .groupBy(keys: _*).agg(min(col(orderCol)).as("frontier"))
    stages.drop(1).scanLeft(first) { (prev, stage) =>
      df.filter(col(typeCol) === stage)
        .join(prev.withColumnRenamed("frontier", "__prev"), keyCols)
        .filter(col(orderCol) > col("__prev"))
        .groupBy(keys: _*).agg(min(col(orderCol)).as("frontier"))
    }
  }

  /** The funnel table itself: one row per stage with the number of
    * keys whose ordered chain reaches it (stage numbering 1-based,
    * counts necessarily non-increasing). */
  def stageCounts(df: DataFrame, keyCols: Seq[String], orderCol: String,
                  typeCol: String, stages: Seq[String]): DataFrame =
    stageFrontiers(df, keyCols, orderCol, typeCol, stages).zipWithIndex
      .map { case (f, i) =>
        f.agg(count(lit(1)).as("n_keys"))
          .select(lit((i + 1).toLong).as("stage"), col("n_keys"))
      }
      .reduce(_ unionByName _)
}
