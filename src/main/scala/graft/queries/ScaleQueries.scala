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

  /** q63 — binned range join under the oracle: 100 overlapping time
    * windows (derived in-plan from the event-time span — no collect)
    * joined to every event by containment, then a per-window rollup.
    * The oracle is the plain inequality join; the Spark side runs the
    * binned equi-join form (`RangeJoin.binned`), so the oracle also
    * proves binned ≡ naive on real data. Times are µs on both sides:
    * DuckDB's parquet reader truncates ns timestamps to µs, so the
    * shared domain is `ts div 1000` ↔ `epoch_us(ts)`. */
  val q63 = Q("q63_range_join",
    """WITH e AS (SELECT event_id, epoch_us(ts) AS tus FROM events),
      |mm AS (SELECT min(tus) AS tmin, max(tus) AS tmax FROM e),
      |r AS (SELECT CAST(r_id AS INT) AS r_id,
      |             tmin + r_id * ((tmax - tmin) // 100) AS lo,
      |             tmin + (r_id + 2) * ((tmax - tmin) // 100) AS hi
      |      FROM mm, (SELECT unnest(range(0, 100)) AS r_id))
      |SELECT r.r_id, COUNT(*) AS n_events,
      |       min(e.tus) AS first_ts, max(e.tus) AS last_ts
      |FROM e JOIN r ON e.tus >= r.lo AND e.tus <= r.hi
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("event_id"), expr("ts div 1000").as("tus"))
    val ranges = ev.agg(min("tus").as("tmin"), max("tus").as("tmax"))
      .select(explode(sequence(lit(0), lit(99))).as("r_id"),
        col("tmin"), col("tmax"))
      .select(col("r_id"),
        (col("tmin") + col("r_id") * expr("(tmax - tmin) div 100")).as("lo"),
        (col("tmin") + (col("r_id") + 2) * expr("(tmax - tmin) div 100")).as("hi"))
    graft.operators.RangeJoin
      .binned(ev, "tus", ranges, "lo", "hi", binShift = 34)
      .groupBy("r_id")
      .agg(count(lit(1)).as("n_events"),
        min("tus").as("first_ts"), max("tus").as("last_ts"))
  }

  /** q92 — Z-order (Morton) key under the gate: the exact interleave
    * `Lakehouse.clusteredWrite` sorts by for 2D data skipping
    * (ScaleOpsSpec proves the tiling from the parquet footers; this
    * pins the key arithmetic itself bit-for-bit against DuckDB's
    * integer shift/and/or). 21 bits per dimension covers both key
    * domains at every test scale factor. */
  val q92 = Q("q92_zorder_key", {
    val z = graft.functions.ZOrder.zOrder2Sql("l_orderkey", "l_partkey", 21)
    s"""SELECT l_orderkey, l_partkey, $z AS zkey
       |FROM lineitem""".stripMargin
  }) { (s, d) =>
    Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"),
      graft.functions.ZOrder.zOrder2(col("l_orderkey"), col("l_partkey"), 21).as("zkey"))
  }

  /** q92n — the n-dimensional generalization of q92: three keys
    * interleaved (order, part, supplier — the `ZORDER BY (a, b, c)`
    * layout for a fact range-queried by any of the three), 21 bits
    * each = 63 bits, still a positive int64. Same bit-for-bit oracle
    * discipline; the 3-col row-group tiling proof is in ScaleOpsSpec. */
  val q92n = Q("q92n_zorder3_key", {
    val z = graft.functions.ZOrder
      .zOrderNSql(Seq("l_orderkey", "l_partkey", "l_suppkey"), 21)
    s"""SELECT l_orderkey, l_partkey, l_suppkey, $z AS zkey
       |FROM lineitem""".stripMargin
  }) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      graft.functions.ZOrder.zOrderN(
        Seq(col("l_orderkey"), col("l_partkey"), col("l_suppkey")), 21).as("zkey"))
  }

  /** q123 — Bloom-filter pre-join ≡ plain join (q54/q55's contract for
    * the third shuffle-reduction technique): lineitem (probe, the big
    * side) joins only the ~20 % of orders that are URGENT, so the
    * build-side key Bloom drops ~80 % of probe rows at the scan, before
    * the join shuffle ([[graft.operators.Relational.bloomPreJoin]] —
    * false positives are corrected by the join itself, which is why the
    * oracle is simply the plain join, and the pruning effectiveness is
    * pinned separately in RelationalSpec). The post-join rollup keeps
    * the gated output small; decimal-sum house discipline. */
  val q123 = Q("q123_bloom_prejoin",
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val items = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice")
    graft.operators.Relational
      .bloomPreJoin(items, "l_orderkey", urgent, "o_orderkey",
        expectedItems = 50000L, fpp = 0.01) // sized for sf0.1's ~30k urgent keys; ~60 KB of bits
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        Cols.dsum(col("l_extendedprice")).as("total_price"))
  }

  val all: Seq[Q] = Seq(q54, q55, q63, q92, q92n, q123)
}
