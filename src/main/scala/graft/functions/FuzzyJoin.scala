package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join via the position-keyed
  * deletion-neighborhood prune (FastSS, Bocek et al. 2007 — the
  * positional refinement of Garbe's SymSpell symmetric delete).
  *
  * Completeness argument (why the prune is LOSSLESS for ED ≤ 1, so the
  * quadratic `levenshtein` join can be the oracle): for any two
  * distinct strings a, b with lev(a, b) ≤ 1, the single edit is either
  *  - a substitution at position i → deleting position i from BOTH
  *    gives the same string at the SAME position — caught by the
  *    (variant, position) self-join; or
  *  - an insertion/deletion → the shorter string IS a one-character
  *    deletion of the longer — caught by the (variant = full string)
  *    join.
  * So every qualifying pair appears in one of the two joins (plus rare
  * coincidental candidates that the exact ED ≤ 1 verify removes — the
  * candidates-then-verify discipline of the LSH and prefix-filter
  * joins, q51/q178).
  *
  * Scale shape: |deletions(w)| = len(w), so the variant relation is a
  * MAP-ONLY O(n·len) expansion of the distinct-string relation; both
  * joins are equi-joins whose group sizes are bounded by how many
  * strings share a deletion AT A GIVEN POSITION (alphabet-bounded),
  * never the O(n²) pair space — and the positional key means a run of
  * k identical characters contributes ONE match per true pair, not k².
  * The exact verify runs only on candidates, with the O(n) single-pass
  * [[graft.plans.WithinEd1]] threshold check, not the O(n·m)
  * `levenshtein` DP. At 100 TB this is one distinct, one posexplode,
  * two equi-joins — and the verify cost is proportional to true-ish
  * pairs, not all pairs.
  */
object FuzzyJoin {

  /** Distinct unordered pairs (a < b) of values of `strCol` with
    * Levenshtein distance ≤ 1. Output columns: (`w_a`, `w_b`). */
  def ed1Pairs(df: DataFrame, strCol: String): DataFrame =
    pairs(df.select(col(strCol).as("w")).filter(col("w").isNotNull).distinct())
      .select("w_a", "w_b")

  /** BLOCKED ED ≤ 1 pairs — the record-linkage shape: only strings
    * sharing `blockCol` (nation, zip prefix, soundex bucket, …) can
    * match, and the block key rides IN the deletion-variant equi-join
    * keys rather than post-filtering the global candidate set. That is
    * the difference between "fuzzy-join the planet" and "fuzzy-join
    * each block": candidate group sizes are bounded per block, a skewed
    * hot name in one country never meets the same name elsewhere, and
    * the block column prunes exactly like a join key because it IS one.
    * Output columns: (`blk`, `w_a`, `w_b`), distinct, w_a < w_b. */
  def ed1PairsBlocked(df: DataFrame, strCol: String,
                      blockCol: String): DataFrame =
    pairs(df.select(col(blockCol).as("blk"), col(strCol).as("w"))
            .filter(col("w").isNotNull && col("blk").isNotNull).distinct(),
          blocked = true)

  /** BLOCKED ED ≤ 2 pairs — the symmetric-delete prune one threshold
    * up. Completeness (why the quadratic `levenshtein ≤ 2` join can be
    * the oracle): take an optimal edit script for lev(a, b) = d ≤ 2
    * with s substitutions, i insertions and e deletions (s+i+e = d).
    * Deleting from `a` the substituted + deleted positions (s+e ≤ d)
    * and from `b` the substituted + inserted positions (s+i ≤ d)
    * leaves exactly the script's matched positions — the SAME string
    * on both sides. So every qualifying pair shares a variant with
    * ≤ 2 deletions per side, and the (block, variant) equi-join over
    * the depth-≤2 deletion neighborhood is lossless; the banded
    * [[graft.plans.WithinEd2]] O(5n) verify removes coincidentals.
    *
    * Scale shape: |variants(w)| = 1 + L + L(L−1)/2 per distinct
    * string (distinct-deduped per word, so repeated-character runs
    * collapse), i.e. the index is O(n·L²) MAP-ONLY rows; the join is
    * an equi-join whose group sizes are bounded per (block, variant).
    * True pairs surface once per shared variant — `distinct()` runs
    * BEFORE the verify so each candidate pair is checked once, not
    * O(L) times. At ED 2 there is no positional refinement with a
    * 2-case closed form (the deleted-position sets interact), so the
    * candidate volume is the price of the threshold; `maxVariantDf`
    * is the production knob if a corpus concentrates.
    *
    * `maxVariantDf` caps the hot-variant blowup (the same treatment as
    * [[Dedup]]'s gram df caps): a (block, variant) group shared by k
    * strings emits k·(k−1)/2 candidate rows, so one mass-duplicated
    * name turns the equi-join quadratic in its multiplicity. Groups
    * with df > cap are dropped from the index, bounding every group's
    * fan-out at cap²/2. Unlike the ED ≤ 1 positional prune this IS
    * lossy under concentration: a pair is lost only if EVERY variant
    * it shares is hot — which happens exactly in the mass-near-
    * duplicate clusters the cap exists to bound (their pairs are the
    * quadratic mass; recall on pairs outside the hot cluster is
    * untouched, pinned by spec). With the default (no cap) the prune
    * is lossless per the completeness argument above; production
    * corpora with adversarial concentration set cap ≫ honest per-
    * (block, variant) multiplicity — the df histogram (q254's
    * discipline) tells you where honest ends.
    * Output columns: (`blk`, `w_a`, `w_b`), distinct, w_a < w_b. */
  def ed2PairsBlocked(df: DataFrame, strCol: String, blockCol: String,
                      maxVariantDf: Long = Long.MaxValue): DataFrame = {
    val v = df.select(col(blockCol).as("blk"), col(strCol).as("w"))
      .filter(col("w").isNotNull && col("blk").isNotNull).distinct()
    val L = length(col("w"))
    // depth-1 deletions (guarded: sequence() descends when stop <
    // start, so empty strings must short-circuit)
    val d1 = when(L >= 1, transform(sequence(lit(1), L), i =>
      concat(col("w").substr(lit(1), i - 1),
        col("w").substr(i + 1, L - i))))
      .otherwise(array())
    // depth-2 deletions at ORIGINAL positions i < j: keep
    // [1,i-1] ++ [i+1,j-1] ++ [j+1,L]
    val d2 = when(L >= 2, flatten(transform(sequence(lit(1), L - 1), i =>
      transform(sequence(i + 1, L), j =>
        concat(col("w").substr(lit(1), i - 1),
          col("w").substr(i + 1, j - i - 1),
          col("w").substr(j + 1, L - j))))))
      .otherwise(array())
    // join on the variant's 64-bit hash, not the variant STRING: the
    // O(n·L²) index is sort-merge-joined, and 8-byte long keys sort
    // and compare ~3× cheaper than ~20-byte strings (probe at sf1.0
    // names: join-count 153 s on string keys → hash keys cut the
    // shuffle row width and the comparator cost). Hash collisions are
    // HARMLESS here — they only add candidates, and the exact
    // [[graft.plans.WithinEd2]] verify removes them like any other
    // coincidental (the candidates-then-verify contract absorbs the
    // collision probability instead of paying for exactness in the
    // join key).
    val idx0 = v.select(col("blk"), col("w"), explode(
      array_distinct(concat(array(col("w")), d1, d2))).as("g_var"))
      .select(col("blk"), col("w"), xxhash64(col("g_var")).as("g_vh"))
    // hot-variant df cap: one window count over the SAME (blk, g_vh)
    // key the self-join shuffles on — the count reuses the join's
    // partitioning, so the cap costs a sort, not an extra shuffle.
    // Rows are distinct (w, variant) per string (array_distinct), so
    // count(*) per group IS the variant's string-df.
    val idx = if (maxVariantDf == Long.MaxValue) idx0
      else idx0
        .withColumn("g_df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("blk", "g_vh")))
        .filter(col("g_df") <= maxVariantDf).drop("g_df")
    // MERGE hint (r14, found at the 20× scale probe): Catalyst's
    // static size estimate of the index is the pre-explode scan — the
    // L²-fold posexplode blowup is invisible to it — so it happily
    // planned BroadcastHashJoin and tried to build the WHOLE variant
    // index as a broadcast table (~90 M rows at 20× names; driver
    // OOM). A self-join of two identically-huge exploded sides is
    // never broadcastable; pin sort-merge.
    idx.select(col("blk"), col("w").as("w_a"), col("g_vh")).hint("shuffle_merge")
      .join(idx.select(col("blk"), col("w").as("w_b"), col("g_vh"))
        .hint("shuffle_merge"), Seq("blk", "g_vh"))
      // verify BEFORE the distinct: the O(5n) kernel per duplicate
      // candidate row is cheaper than shuffling the coincidental
      // candidates into the dedup (measured 18.3 s → 11.4 s at sf0.1
      // customer names when the orders swapped)
      .filter(col("w_a") < col("w_b") &&
        graft.plans.NativeExpressions.withinEd2(col("w_a"), col("w_b")))
      .select("blk", "w_a", "w_b").distinct()
  }

  /** Shared FastSS kernel over a distinct relation `v` with columns
    * (`w`) or (`blk`, `w`); when `blocked`, `blk` joins alongside every
    * variant key. */
  private def pairs(v: DataFrame, blocked: Boolean = false): DataFrame = {
    val blk = if (blocked) Seq("blk") else Seq.empty[String]
    // Single-deletion variants WITH their deletion position (FastSS
    // keys on position; plain SymSpell drops it) — substr is 1-based;
    // deleting position i keeps [1, i-1] ++ [i+1, len].
    val dels = v.select(blk.map(col) :+ col("w") :+ posexplode(
      transform(sequence(lit(1), length(col("w"))), i =>
        concat(col("w").substr(lit(1), i - 1),
          col("w").substr(i + 1, length(col("w")) - i)))): _*)
      .toDF(blk ++ Seq("w", "g_pos", "g_var"): _*)
    // The FastSS ED ≤ 1 case split (exact, per the completeness
    // argument above):
    //  - substitution at i  ⇔ del_i(a) = del_i(b), SAME position —
    //    keying the self-join on (variant, position) instead of the
    //    bare variant string kills both quadratic blowups the bare key
    //    suffers: cross-position collisions (del_i(a) = del_j(b), i≠j
    //    ⇒ ED 2 false candidates) and the k² duplicate-pair copies a
    //    run of k identical characters emits (all k deletions of the
    //    run give the same STRING but distinct positions, so the
    //    positional key matches each true pair exactly once).
    //  - insertion/deletion ⇔ the shorter string IS a deletion variant
    //    of the longer: one (variant = full-string) equi-join.
    // Measured at sf1.0 customer names: candidate rows 9.8M → ~2.7M
    // (≈ the true-pair count), q189 wall 76 s → 15 s with the
    // [[graft.plans.WithinEd1]] O(n) verify replacing the O(n·m)
    // `levenshtein` DP (that swap alone was 54 s → 24 s).
    // MERGE hints (r14, found at the 20× scale probe on the ED ≤ 2
    // sibling): Catalyst's static size estimate of the deletion-
    // variant relation is the pre-explode scan, so past ~10× names it
    // planned BroadcastHashJoin and built the O(n·L) variant relation
    // as a broadcast table — a latent driver OOM that the ED ≤ 2
    // kernel (O(n·L²)) actually hit. Both the variant self-join and
    // the variant-vs-names join scale with the corpus on BOTH sides;
    // pin sort-merge.
    val subs = dels.select(blk.map(col) :+ col("w").as("w_a") :+
        col("g_pos") :+ col("g_var"): _*).hint("shuffle_merge")
      .join(dels.select(blk.map(col) :+ col("w").as("w_b") :+
        col("g_pos") :+ col("g_var"): _*).hint("shuffle_merge"),
        blk ++ Seq("g_var", "g_pos"))
      .select((blk ++ Seq("w_a", "w_b")).map(col): _*)
    val shortSide = v.select(blk.map(b => col(b).as(s"g_b_$b")) :+
      col("w").as("g_short"): _*)
    val insDelCond = blk.map(b => col(b) === col(s"g_b_$b"))
      .foldLeft(col("g_var") === col("g_short"))(_ && _)
    val insDel = dels.select(blk.map(col) :+ col("w").as("g_long") :+
        col("g_var"): _*).hint("shuffle_merge")
      .join(shortSide.hint("shuffle_merge"), insDelCond)
      .select(blk.map(col) :+
        least(col("g_long"), col("g_short")).as("w_a") :+
        greatest(col("g_long"), col("g_short")).as("w_b"): _*)
    subs.union(insDel)
      .filter(col("w_a") < col("w_b") &&
        graft.plans.NativeExpressions.withinEd1(col("w_a"), col("w_b")))
      .distinct()
  }
}
