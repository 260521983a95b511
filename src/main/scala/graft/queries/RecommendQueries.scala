package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashes
import graft.operators.Als

/** The offline recommendation tier (r12 verdict item 4): the
  * reference's streaming re-ranker consumes `recommend:offline:{id}`
  * lists (streaming_flow.py:145-147) that nothing produces — this
  * module trains the producer ([[Als]], fixed-point implicit ALS) and
  * registers both its halves under the full DuckDB hash gate: the
  * oracle replays init → 3 alternating rounds of integer-exact normal
  * equations + closed-form solves → scoring, bit-for-bit. The
  * end-to-end seam (factors → top-k → KV store → U1 rerank) is pinned
  * in AlsSpec.
  */
object RecommendQueries {

  private val Rounds = 3

  /** Shared oracle CTE chain: ratings from orders ⋈ lineitem, hashed
    * item-factor init, then `Rounds` alternating user/item solves.
    * Mirrors [[Als.solveSide]]'s expression tree exactly — integer
    * sums are associative (no ordered-fold crutch needed) and the 2×2
    * solve is a fixed-shape IEEE tree over exact int→double casts. */
  private def alsCtesSql: String = {
    val A = Als.Alpha; val L = Als.LambdaS2; val S = Als.S
    def init(j: Int) =
      s"${Hashes.h60Sql(s"'als|$j|' || CAST(item AS VARCHAR)")} % ${S / 8} + 1"
    def gram(name: String, src: String) =
      s"""$name AS (
         |  SELECT CAST(SUM(f0*f0) AS BIGINT) AS g00,
         |         CAST(SUM(f0*f1) AS BIGINT) AS g01,
         |         CAST(SUM(f1*f1) AS BIGINT) AS g11 FROM $src)""".stripMargin
    def aggs(name: String, src: String, outKey: String, inKey: String) =
      s"""$name AS (
         |  SELECT r.$outKey AS id,
         |         CAST(SUM($A*cnt*f0*f0) AS BIGINT) AS c00,
         |         CAST(SUM($A*cnt*f0*f1) AS BIGINT) AS c01,
         |         CAST(SUM($A*cnt*f1*f1) AS BIGINT) AS c11,
         |         CAST(SUM((1 + $A*cnt)*f0) AS BIGINT) AS b0,
         |         CAST(SUM((1 + $A*cnt)*f1) AS BIGINT) AS b1
         |  FROM r JOIN $src f ON f.id = r.$inKey GROUP BY 1)""".stripMargin
    def q(x: String) =
      s"CAST(floor(LEAST(GREATEST($x, -8.0), 8.0) * $S.0) AS BIGINT)"
    def solve(name: String, aggRel: String, gramRel: String) =
      s"""$name AS (
         |  SELECT id,
         |         ${q(s"($S.0 * (a11*db0 - a01*db1)) / (a00*a11 - a01*a01)")} AS f0,
         |         ${q(s"($S.0 * (a00*db1 - a01*db0)) / (a00*a11 - a01*a01)")} AS f1
         |  FROM (SELECT id,
         |               CAST(g00 + c00 + $L AS DOUBLE) AS a00,
         |               CAST(g01 + c01 AS DOUBLE) AS a01,
         |               CAST(g11 + c11 + $L AS DOUBLE) AS a11,
         |               CAST(b0 AS DOUBLE) AS db0,
         |               CAST(b1 AS DOUBLE) AS db1
         |        FROM $aggRel, $gramRel))""".stripMargin
    val rounds = (1 to Rounds).map { t =>
      Seq(
        gram(s"ug$t", s"itemf${t - 1}"),
        aggs(s"ua$t", s"itemf${t - 1}", "usr", "item"),
        solve(s"userf$t", s"ua$t", s"ug$t"),
        gram(s"ig$t", s"userf$t"),
        aggs(s"ia$t", s"userf$t", "item", "usr"),
        solve(s"itemf$t", s"ia$t", s"ig$t")).mkString(",\n")
    }.mkString(",\n")
    s"""WITH r AS (
       |  SELECT o.o_custkey AS usr, l.l_partkey AS item,
       |         CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2),
       |itemf0 AS (
       |  SELECT item AS id, ${init(0)} AS f0, ${init(1)} AS f1
       |  FROM (SELECT DISTINCT item FROM r)),
       |$rounds""".stripMargin
  }

  private def ratings(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
      .agg(count(lit(1)).as("cnt"))

  /** One trained factor pair per (JVM, fixture stamp) — q219 and q220
    * share the training run (the q136Dirs artifact-cache pattern);
    * the cached values are the spilled parquet paths. */
  private val alsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def factors(s: org.apache.spark.sql.SparkSession,
                      d: String): (org.apache.spark.sql.DataFrame,
                                   org.apache.spark.sql.DataFrame) = {
    val (u, i) = alsCache.computeIfAbsent(Q.dataStamp(d), _ => {
      val (uf, if_) = Als.implicitAls(ratings(s, d), Rounds)
      val ud = graft.pipeline.TempDirs.scoped("graft_als_uf_")
      val id = graft.pipeline.TempDirs.scoped("graft_als_if_")
      uf.write.mode("overwrite").parquet(s"$ud/data")
      if_.write.mode("overwrite").parquet(s"$id/data")
      (s"$ud/data", s"$id/data")
    })
    (s.read.parquet(u), s.read.parquet(i))
  }

  /** q219 — the trained ITEM factors after 3 fixed-point ALS rounds
    * ([[Als.implicitAls]]): the offline model itself under the hash
    * gate — the oracle replays every round exactly, so a single bit
    * of drift anywhere in init, gram, per-user aggregation, or the
    * closed-form solves fails the gate. */
  val q219 = Q("q219_als_item_factors",
    s"""$alsCtesSql
       |SELECT id AS item, f0, f1 FROM itemf$Rounds""".stripMargin) { (s, d) =>
    val (_, itemF) = factors(s, d)
    itemF.select(col("id").as("item"), col("f0"), col("f1"))
  }

  /** q220 — the `recommend:offline:{id}` lists: top-10 UNSEEN items
    * per query user (o_custkey < 50 — the contract-small serving set;
    * the full-base path is ANN over item factors, q154's job), scored
    * as exact int64 dot products on the S² grid so ranking replays
    * deterministically. [[Als.recommend]]. */
  val q220 = Q("q220_als_recommend",
    s"""$alsCtesSql,
       |qf AS (SELECT id, f0 AS x0, f1 AS x1 FROM userf$Rounds WHERE id < 50),
       |sc AS (
       |  SELECT q.id AS usr, i.id AS item, q.x0*i.f0 + q.x1*i.f1 AS score
       |  FROM qf q CROSS JOIN itemf$Rounds i
       |  WHERE NOT EXISTS (SELECT 1 FROM r
       |                    WHERE r.usr = q.id AND r.item = i.id))
       |SELECT usr AS user_id, pos, item, score FROM (
       |  SELECT usr, item, score,
       |         row_number() OVER (PARTITION BY usr
       |                            ORDER BY score DESC, item) AS pos
       |  FROM sc) WHERE pos <= 10""".stripMargin) { (s, d) =>
    val (userF, itemF) = factors(s, d)
    val r = ratings(s, d)
    Als.recommend(userF, itemF, r.select("user", "item"),
        userF.filter(col("id") < 50).select(col("id")), k = 10)
      .select(col("user").as("user_id"), col("pos"), col("item"), col("score"))
  }

  val all: Seq[Q] = Seq(q219, q220)
}
