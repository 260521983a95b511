package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch data-quality constraint gate — the CHECK-constraint /
  * expectations layer (Delta `ALTER TABLE ADD CONSTRAINT`, dbt tests,
  * Great-Expectations shape) and the batch twin of the streaming
  * dead-letter path (`Events.parseWithDeadLetter`): rows violating any
  * named rule are routed to a quarantine side with the list of rules
  * they broke, instead of failing the job or silently polluting silver.
  *
  * Semantics follow the SQL standard for CHECK: a constraint is
  * violated only when it evaluates to FALSE — NULL passes (unknown is
  * not a violation). That matters for rules over nullable columns:
  * `price < cap` on a NULL price passes; add an explicit `IS NOT NULL`
  * rule when null itself is the defect.
  *
  * Everything is one scalar projection + one filter per side — scan
  * speed, zero shuffle, prunable; at 100 TB the gate costs one pass and
  * the quarantine side is typically small enough to broadcast into
  * whatever triage query follows.
  */
object Quality {

  /** Per-row comma-joined names of violated rules, in rule order;
    * empty string = row passes every rule. */
  def violations(rules: Seq[(String, Column)]): Column =
    concat_ws(",", rules.map { case (name, c) =>
      when(not(coalesce(c, lit(true))), lit(name))
    }: _*)

  /** Split into (valid, quarantined-with-violations). The two sides
    * partition the input: every row lands in exactly one. */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val flagged = df.withColumn("_violations", violations(rules))
    (flagged.filter(col("_violations") === "").drop("_violations"),
      flagged.filter(col("_violations") =!= ""))
  }
}
