package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join via the SymSpell
  * deletion-neighborhood prune (Garbe's symmetric delete algorithm;
  * the same candidate-generation idea as FastSS, Bocek et al. 2007).
  *
  * Completeness argument (why the prune is LOSSLESS for ED ≤ 1, so the
  * quadratic `levenshtein` join can be the oracle): let
  * D(w) = {w} ∪ {w with one character deleted}. For any two distinct
  * strings a, b with lev(a, b) ≤ 1:
  *  - substitution at position i → deleting position i from both gives
  *    the same string ∈ D(a) ∩ D(b);
  *  - insertion/deletion → the shorter string is itself a one-char
  *    deletion of the longer, and every string is in its own D.
  * So every qualifying pair shares a deletion variant, and the
  * variant equi-join generates every true pair (plus false candidates
  * that the exact `levenshtein` verify then removes — the
  * candidates-then-verify discipline of the LSH and prefix-filter
  * joins, q51/q178).
  *
  * Scale shape: |D(w)| = len(w)+1, so the variant relation is a
  * MAP-ONLY O(n·len) expansion of the distinct-string relation; the
  * join is an equi-join on the variant key whose group sizes are
  * bounded by how many strings share a deletion (alphabet-bounded in
  * practice), never the O(n²) pair space. The exact verify runs only
  * on candidates. At 100 TB this is one distinct, one explode, one
  * equi-join — and the verify cost is proportional to TRUE-ish pairs,
  * not all pairs.
  */
object FuzzyJoin {

  /** Distinct unordered pairs (a < b) of values of `strCol` with
    * Levenshtein distance ≤ 1. Output columns: (`w_a`, `w_b`). */
  def ed1Pairs(df: DataFrame, strCol: String): DataFrame = {
    val v = df.select(col(strCol).as("w")).filter(col("w").isNotNull).distinct()
    // D(w): the string itself plus each single-deletion variant —
    // substr is 1-based; deleting position i keeps [1, i-1] ++ [i+1, len].
    val variants = v.select(col("w"), explode(concat(
      array(col("w")),
      transform(sequence(lit(1), length(col("w"))), i =>
        concat(col("w").substr(lit(1), i - 1),
          col("w").substr(i + 1, length(col("w")) - i))))).as("g_var"))
    val cand = variants.select(col("w").as("w_a"), col("g_var"))
      .join(variants.select(col("w").as("w_b"), col("g_var")), Seq("g_var"))
      .filter(col("w_a") < col("w_b"))
      .select("w_a", "w_b").distinct()
    cand.filter(levenshtein(col("w_a"), col("w_b")) <= 1)
  }
}
