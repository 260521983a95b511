package graft.queries

import org.apache.spark.sql.functions._
import graft.{Cols, Tables}
import graft.operators.Skew
import graft.pipeline.Lakehouse

/** The two scale-mitigation operators under the oracle gate: both must
  * be RESULT-IDENTICAL to the plain join they replace (that is their
  * whole contract), so the oracle is simply the plain-join SQL.
  */
object ScaleQueries {

  /** q54 — two-sided salted equi-join ≡ plain join: the hot-key
    * mitigation for joins AQE's skew splitting can't absorb. The salt
    * spreads each key over 8 partitions; aggregating the joined result
    * proves every (large, small) pair met exactly once. */
  val q54 = Q("q54_salted_join",
    """SELECT l_suppkey, s_name, COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val large = Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice")
    val small = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    Skew.saltedEquiJoin(large, small, "l_suppkey", salts = 8)
      .groupBy("l_suppkey", "s_name")
      .agg(count(lit(1)).as("n_items"),
        Cols.dsum(col("l_extendedprice")).as("total_price"))
  }

  /** q55 — bucketed co-located join ≡ plain join: both sides written
    * bucketed on the join key (the layout that removes the J1 shuffle;
    * ScaleOpsSpec asserts the zero-exchange plan, this puts the VALUES
    * under the gate). The only shuffle left is the small post-join
    * aggregate. */
  val q55 = Q("q55_bucketed_join",
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1""".stripMargin) { (s, d) =>
    Lakehouse.writeBucketed(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
      "graft_q55_orders", "o_orderkey", buckets = 8)
    Lakehouse.writeBucketed(
      Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice")),
      "graft_q55_lineitem", "o_orderkey", buckets = 8)
    Lakehouse.bucketedJoin(s, "graft_q55_orders", "graft_q55_lineitem", "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        Cols.dsum(col("l_extendedprice")).as("total_price"))
  }

  val all: Seq[Q] = Seq(q54, q55)
}
