package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Implicit-feedback ALS (Hu, Koren & Volinsky, ICDM 2008) in
  * FIXED-POINT arithmetic — the offline producer for the reference's
  * `recommend:offline:{id}` serving seam
  * (/root/reference/scripts/spark_jobs/streaming_flow.py:145-147 READS
  * those Redis lists; nothing in the reference writes them — this
  * closes the loop: offline factors → top-k lists → KV store → the
  * U1 rerank).
  *
  * Math: preference p_ui = 1 on observed (user, item) pairs,
  * confidence c_ui = 1 + α·cnt_ui. Each half-round solves the ridge
  * normal equations with the classic gram decomposition
  *   A_u = YᵀY + α Σ_{i∈S_u} c_ui·y_i y_iᵀ + λI,
  *   b_u = Σ_{i∈S_u} (1 + α·c_ui)·y_i,
  * where YᵀY is ONE global f×f aggregate shared by every user (the
  * only driver-sized object in the algorithm) and the per-user terms
  * touch only that user's items.
  *
  * FIXED-POINT determinism (the q162 integer-quantization discipline
  * applied to a whole trainer): factors live on the 1/S grid as
  * BIGINTs (S = 2¹²), so every aggregate in every round — the gram,
  * A_u, b_u — is an INTEGER sum: exact, overflow-audited, and
  * associative, which makes the distributed fold order irrelevant and
  * the whole multi-round trainer replayable bit-for-bit by the DuckDB
  * oracle (no ordered-fold crutch, no rows-only concession). The 2×2
  * solve per user is closed-form over doubles: the int→double casts
  * are exact (all magnitudes ≤ 2⁴⁷ < 2⁵³ — see the audit below), and
  * the remaining expression tree is fixed-shape IEEE mult/sub/div,
  * identical on both engines; the result is clamped to [−8, 8] and
  * floored back onto the grid. Rank is fixed at 2 — the closed-form
  * inverse keeps the solve SQL-expressible; the PLAN is
  * rank-independent (swap the 2×2 adjugate for a per-group Cholesky
  * at f = 16 and nothing about the shuffles changes).
  *
  * Scale shape (the 100 TB story): each half-round is one global f²
  * aggregate (tree-reduced to a single row, broadcast back), one
  * equi-join of ratings with the fixed side's factors (shuffle keyed
  * on that side's id), and one groupBy on the solved side's id —
  * O(rounds·|ratings|) shuffle total, factors never leave the
  * cluster, no windows, no driver loop beyond the round counter.
  *
  * Overflow audit (α = 40, |factor| ≤ 8 ⇒ |F| ≤ 2¹⁵):
  * per-item product ≤ 2³⁰; gram ≤ |items|·2³⁰ (int64-safe to ~8M
  * items — beyond that, lift the sums to DECIMAL(38,0), same plan);
  * per-user A terms ≤ α·cnt·2³⁰·|S_u|; b ≤ (1+α·cnt)·2¹⁵·|S_u|;
  * rec score ≤ 2·2³⁰ — all comfortably inside int64 for any real
  * basket profile, and Spark 4's ANSI mode would fail loudly, not
  * wrap, if a pathological corpus broke the audit.
  */
object Als {

  /** Fixed-point scale: factors are stored as value·S longs. */
  val S = 4096L
  /** Confidence slope α (Hu et al. use 40). */
  val Alpha = 40L
  /** λ·S² for the ridge diagonal — λ = 1/8 exactly (2²⁴/8 = 2²¹). */
  val LambdaS2: Long = S * S / 8

  private def initF(idCol: Column, j: Int): Column =
    pmod(Hashes.h60(concat(lit(s"als|$j|"), idCol.cast("string"))),
      lit(S / 8)) + lit(1L)

  /** One half-round: solve `out`-side factors given `in`-side factors
    * `bf` (columns: id, f0, f1). `ratings` columns: (user, item, cnt).
    */
  private def solveSide(ratings: DataFrame, bf: DataFrame,
                        outCol: String, inCol: String): DataFrame = {
    val gram = bf.agg(
      sum(col("f0") * col("f0")).as("g00"),
      sum(col("f0") * col("f1")).as("g01"),
      sum(col("f1") * col("f1")).as("g11"))
    val conf = lit(1L) + lit(Alpha) * col("cnt")
    val j = ratings.join(bf.withColumnRenamed("id", inCol), inCol)
    val agg = j.groupBy(col(outCol).as("id")).agg(
      sum(lit(Alpha) * col("cnt") * col("f0") * col("f0")).as("c00"),
      sum(lit(Alpha) * col("cnt") * col("f0") * col("f1")).as("c01"),
      sum(lit(Alpha) * col("cnt") * col("f1") * col("f1")).as("c11"),
      sum(conf * col("f0")).as("b0"),
      sum(conf * col("f1")).as("b1"))
    // closed-form 2×2 ridge solve in doubles; x_real = S·(A⁻¹b) since
    // A carries scale S² and b scale S
    val solved = agg.crossJoin(broadcast(gram)).select(col("id"),
      (col("g00") + col("c00") + lit(LambdaS2)).cast("double").as("a00"),
      (col("g01") + col("c01")).cast("double").as("a01"),
      (col("g11") + col("c11") + lit(LambdaS2)).cast("double").as("a11"),
      col("b0").cast("double").as("db0"), col("b1").cast("double").as("db1"))
    def q(x: Column): Column =
      floor(least(greatest(x, lit(-8.0)), lit(8.0)) * lit(S.toDouble)).cast("long")
    solved.select(col("id"),
      q((lit(S.toDouble) * (col("a11") * col("db0") - col("a01") * col("db1")))
        / (col("a00") * col("a11") - col("a01") * col("a01"))).as("f0"),
      q((lit(S.toDouble) * (col("a00") * col("db1") - col("a01") * col("db0")))
        / (col("a00") * col("a11") - col("a01") * col("a01"))).as("f1"))
  }

  /** Train `rounds` full ALS rounds over `ratings` (user, item, cnt).
    * Returns (userFactors, itemFactors), each (id, f0, f1) with f on
    * the 1/S fixed-point grid as longs. Item factors initialize from
    * the keyed md5 hash (oracle-replayable); users solve first.
    * Each round's factor tables are staged to JVM-scoped parquet —
    * lineage stays one round deep and nothing returns persisted (the
    * TempDirs iterative-operator discipline). */
  def implicitAls(ratings: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    var itemF = graft.pipeline.TempDirs.spillParquet(
      ratings.select(col("item").as("id")).distinct()
        .select(col("id"), initF(col("id"), 0).as("f0"), initF(col("id"), 1).as("f1")),
      "graft_als_i0_")
    var userF: DataFrame = null
    (1 to rounds).foreach { t =>
      userF = graft.pipeline.TempDirs.spillParquet(
        solveSide(ratings, itemF, "user", "item"), s"graft_als_u${t}_")
      itemF = graft.pipeline.TempDirs.spillParquet(
        solveSide(ratings, userF, "item", "user"), s"graft_als_i${t}_")
    }
    (userF, itemF)
  }

  /** Top-`k` unseen-item recommendations for `queryUsers` (a
    * contract-small user set — the crossJoin against the catalog is
    * |queryUsers|·|items|; the full-base production path is ANN over
    * the item factors, which q154 serves). Scores are exact int64
    * dot products on the S² grid, so ranking ties break on item id
    * deterministically. */
  def recommend(userF: DataFrame, itemF: DataFrame, ratings: DataFrame,
                queryUsers: DataFrame, k: Int): DataFrame = {
    val qf = userF.join(queryUsers.select(col("id")), Seq("id"))
      .select(col("id").as("user"), col("f0").as("x0"), col("f1").as("x1"))
    val scored = itemF.select(col("id").as("item"), col("f0"), col("f1"))
      .crossJoin(broadcast(qf))
      .select(col("user"), col("item"),
        (col("x0") * col("f0") + col("x1") * col("f1")).as("score"))
      .join(ratings.select("user", "item"), Seq("user", "item"), "left_anti")
    Relational.topNPerGroup(
      scored.select(col("user"), col("item"), col("score")),
      k, Seq(col("user")), col("score"), col("item"))
      .select(col("user"), col("rank").as("pos"), col("item"), col("score"))
  }
}
