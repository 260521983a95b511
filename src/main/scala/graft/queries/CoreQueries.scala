package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{Cols, Tables}
import graft.Cols._
import graft.operators.Relational

/** The relational core: every operator family from SURVEY.md §2.1-2.8
  * as a registered query with a DuckDB oracle.
  *
  * Conventions for oracle bit-parity (see graft.Cols):
  *  - money/measure sums go through DECIMAL(18,2), cast back to double;
  *  - averages are one double division of exact operands;
  *  - `year(...)` is cast to INT on the DuckDB side (DuckDB yields BIGINT);
  *  - every ranked output carries an explicit deterministic tiebreak;
  *  - raw nanosecond event timestamps are never emitted (Spark truncates
  *    to microseconds; DuckDB keeps ns) — recency ordering uses
  *    `event_id`, which is monotone in `ts` in the generated data.
  */
object CoreQueries {

  /** q01 — TPC-H-Q1-shaped pricing summary: scan → filter → multi-key
    * hash aggregate (partial+final around one exchange). Mirrors the
    * reference's gold aggregate shape (gold_transfrom.py:64-69) on the
    * widest fact table. */
  val q01 = Q("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit(java.time.LocalDateTime.parse("2000-12-01T00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  /** q02 — the flagship gold monthly-sales pipeline (silver fact build +
    * gold aggregate, silver_clean_transform.py:102-106 →
    * gold_transfrom.py:59-70): inner fact join, positivity guards,
    * year/month derivation, dim enrich, multi-key aggregate. The part
    * join carries NO broadcast hint: part SCALES with the corpus
    * (unlike nation/region's fixed 25/5 rows), so the planner decides —
    * auto-broadcast at gate scale, shuffle join at 100 TB (the
    * PlanAudit unbounded-hint rule). */
  val q02 = Q("q02_monthly_sales",
    """SELECT CAST(year(o.o_orderdate) AS INT) AS year,
      |       CAST(month(o.o_orderdate) AS INT) AS month,
      |       l.l_partkey AS product_id, p.p_name AS product_name, p.p_brand AS brand,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_quantity,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
      |  COUNT(*) AS num_purchases
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
      |GROUP BY 1, 2, 3, 4, 5""".stripMargin) { (s, d) =>
    val fact = Tables.orders(s, d).withColumnRenamed("o_orderkey", "l_orderkey")
      .join(Tables.lineitem(s, d), Seq("l_orderkey"), "inner")
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .withColumn("year", year(col("o_orderdate")))
      .withColumn("month", month(col("o_orderdate")))
    fact.withColumnRenamed("l_partkey", "p_partkey")
      .join(Tables.part(s, d), Seq("p_partkey"), "left")
      .groupBy(col("year"), col("month"), col("p_partkey").as("product_id"),
        col("p_name").as("product_name"), col("p_brand").as("brand"))
      .agg(
        dsum(col("l_quantity")).as("total_quantity"),
        dsumProd(col("l_quantity"), col("l_extendedprice")).as("total_sales"),
        count(lit(1)).as("num_purchases"))
  }

  /** q03 — J3 dim-enrich chain: supplier → nation → region, both dims
    * broadcast (silver_clean_transform.py:72 shape). */
  val q03 = Q("q03_dim_enrich",
    """SELECT s.s_suppkey, s.s_name, s.s_acctbal,
      |       n.n_name AS nation_name, r.r_name AS region_name
      |FROM supplier s
      |LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin) { (s, d) =>
    Relational.dimEnrich(
        Relational.dimEnrich(Tables.supplier(s, d), Tables.nation(s, d)
          .withColumnRenamed("n_nationkey", "s_nationkey"), "s_nationkey"),
        Tables.region(s, d).withColumnRenamed("r_regionkey", "n_regionkey"), "n_regionkey")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name").as("nation_name"), col("r_name").as("region_name"))
  }

  /** q04 — J2 left-semi: lineitems of recent orders
    * (bronze_batch_load.py:83-87 semantics, Spark-first LEFT SEMI form). */
  val q04 = Q("q04_semi_join",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderdate > TIMESTAMP '2001-01-01 00:00:00')""".stripMargin) { (s, d) =>
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") > lit(java.time.LocalDateTime.parse("2001-01-01T00:00:00")))
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Relational.semiJoin(Tables.lineitem(s, d), recent, "l_orderkey")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
  }

  /** q05 — A1+P9 incremental high-watermark load: probe max(order_date)
    * over the 'F' slice, then strictly-greater filter
    * (bronze_batch_load.py:61-67). The probe collects ONE row to the
    * driver — the same control-flow the reference uses. */
  val q05 = Q("q05_watermark_incremental",
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders
      |                     WHERE o_orderdate <= TIMESTAMP '2000-06-01 00:00:00')""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    // the probe slice simulates "what the sink already holds": everything
    // up to a cutoff; the increment is then strictly after the max of it
    val wm = graft.pipeline.Medallion.highWatermark(
      orders.filter(col("o_orderdate") <=
        lit(java.time.LocalDateTime.parse("2000-06-01T00:00:00"))), "o_orderdate")
    graft.pipeline.Medallion.incrementalSlice(orders, "o_orderdate", wm)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
  }

  /** q06 — A4 deterministic dedup: latest event per user via
    * row_number()==1 (the testable variant of dropDuplicates,
    * silver_clean_transform.py:74,88 + SURVEY §7.4). */
  val q06 = Q("q06_latest_event_per_user",
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
    Relational.latestPerKey(Tables.events(s, d), "user_id", col("event_id"))
      .select("user_id", "event_id", "event_type", "value")
  }

  /** q07 — scalar-function battery (P1/P10/P11 + §2.8): lower/trim
    * normalization, concat_ws full-name intent (the reference's `+` on
    * columns NULLs out, silver_clean_transform.py:90 — we implement the
    * intent per SURVEY §2.8), between-guard. */
  val q07 = Q("q07_customer_conform",
    """SELECT c_custkey,
      |       lower(trim(c_name)) AS name_norm,
      |       concat_ws(' ', trim(c_mktsegment), trim(c_name)) AS full_name,
      |       lower(c_mktsegment) AS segment,
      |       c_acctbal
      |FROM customer
      |WHERE c_name IS NOT NULL AND c_acctbal BETWEEN -999.99 AND 9999.99""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_name").isNotNull && col("c_acctbal").between(-999.99, 9999.99))
      .select(col("c_custkey"),
        lower(trim(col("c_name"))).as("name_norm"),
        concat_ws(" ", trim(col("c_mktsegment")), trim(col("c_name"))).as("full_name"),
        lower(col("c_mktsegment")).as("segment"),
        col("c_acctbal"))
  }

  /** q08 — W3 dashboard top-20 products by sales: aggregate first, then
    * a row_number window over the (small) aggregated set — the window
    * never sees the fact table, so the single-partition sort is bounded
    * by |parts|, not |lineitem|. */
  val q08 = Q("q08_top_parts",
    """SELECT * FROM (
      |  SELECT l_partkey,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
      |         row_number() OVER (
      |           ORDER BY CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) DESC,
      |                    l_partkey) AS rank
      |  FROM lineitem GROUP BY l_partkey) WHERE rank <= 20""".stripMargin) { (s, d) =>
    val agg = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(dsumProd(col("l_quantity"), col("l_extendedprice")).as("total_sales"))
    Relational.topN(agg, 20, col("total_sales"), col("l_partkey"))
  }

  /** q09 — top-3 suppliers per nation by discounted revenue: 3-way join
    * (fact ⨝ supplier ⨝ broadcast nation) then per-group window on the
    * aggregated set. Only nation keeps the hint (25 rows at every SF);
    * supplier SCALES with the corpus, so its join is left to the
    * planner — the q02/q75 unbounded-hint rule. */
  val q09 = Q("q09_top_suppliers_per_nation",
    """SELECT * FROM (
      |  SELECT n.n_name AS nation_name, s.s_suppkey, s.s_name,
      |         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |         row_number() OVER (PARTITION BY n.n_name
      |           ORDER BY CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) DESC,
      |                    s.s_suppkey) AS rank
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY 1, 2, 3) WHERE rank <= 3""".stripMargin) { (s, d) =>
    val enriched = Tables.lineitem(s, d)
      .withColumnRenamed("l_suppkey", "s_suppkey")
      .join(Tables.supplier(s, d), Seq("s_suppkey"), "inner")
      .withColumnRenamed("s_nationkey", "n_nationkey")
      .join(broadcast(Tables.nation(s, d)), Seq("n_nationkey"), "inner")
    val agg = enriched.groupBy(col("n_name").as("nation_name"), col("s_suppkey"), col("s_name"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
        .cast(DoubleType).as("revenue"))
    Relational.topNPerGroup(agg, 3, Seq(col("nation_name")), col("revenue"), col("s_suppkey"))
  }

  /** q10 — A3-shaped review/event summary: count, exact distinct users,
    * exact sum and deterministic average per event type. */
  val q10 = Q("q10_event_type_stats",
    """SELECT event_type, COUNT(*) AS n_events,
      |       COUNT(DISTINCT user_id) AS n_users,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("total_value"),
        davg(col("value")).as("avg_value"))
  }

  /** q11 — order-priority rollup with exact distinct (A5 + countDistinct). */
  val q11 = Q("q11_order_priority_counts",
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |       COUNT(DISTINCT o_custkey) AS n_customers,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d).groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        dsum(col("o_totalprice")).as("total_price"))
  }

  /** q12 — W2 bounded per-user recency window (Redis LPUSH+LTRIM 0 49
    * semantics in batch form): 50 most recent events per user. */
  val q12 = Q("q12_bounded_recent_events",
    """SELECT user_id, rn, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events) WHERE rn <= 50""".stripMargin) { (s, d) =>
    Relational.boundedRecentPerKey(Tables.events(s, d), "user_id", 50, col("event_id"))
      .select("user_id", "rn", "event_id", "event_type")
  }

  /** q13 — U1/W1 rerank as a relational plan: order-preserving dedup of
    * per-user recommendation candidates with priority classes
    * (cart='purchase' > views='view' > offline='click', mirroring
    * streaming_flow.py:68-84), truncated at 10. Recency uses event_id
    * (monotone in ts) to avoid ns-vs-µs timestamp comparisons. */
  val q13 = Q("q13_rerank_top10",
    """WITH e AS (
      |  SELECT user_id,
      |         CAST(floor(value) AS INT) % 97 AS item_id,
      |         CASE event_type WHEN 'purchase' THEN 1 WHEN 'view' THEN 2 ELSE 3 END AS class,
      |         event_id
      |  FROM events WHERE event_type IN ('purchase','view','click')),
      |best AS (
      |  SELECT user_id, item_id, class, max(event_id) AS recency,
      |         row_number() OVER (PARTITION BY user_id, item_id ORDER BY class) AS cr
      |  FROM e GROUP BY user_id, item_id, class)
      |SELECT user_id, pos, item_id FROM (
      |  SELECT user_id, item_id,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY class, recency DESC, item_id) AS pos
      |  FROM best WHERE cr = 1) WHERE pos <= 10""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "view", "click"))
      .select(col("user_id"),
        (floor(col("value")).cast(IntegerType) % 97).as("item_id"),
        when(col("event_type") === "purchase", 1)
          .when(col("event_type") === "view", 2).otherwise(3).as("class"),
        col("event_id"))
    val best = e.groupBy("user_id", "item_id", "class")
      .agg(max("event_id").as("recency"))
      .withColumn("cr", row_number().over(
        Window.partitionBy("user_id", "item_id").orderBy("class")))
      .filter(col("cr") === 1)
    best.withColumn("pos", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("class"), col("recency").desc, col("item_id"))))
      .filter(col("pos") <= 10)
      .select("user_id", "pos", "item_id")
  }

  /** q14 — set operations (beyond the reference surface, SURVEY §2.7):
    * nation-key sets of suppliers vs customers via EXCEPT / INTERSECT,
    * tagged and unioned. */
  val q14 = Q("q14_set_ops",
    """SELECT 'supplier_only' AS tag, k FROM (
      |  SELECT DISTINCT s_nationkey AS k FROM supplier
      |  EXCEPT SELECT DISTINCT c_nationkey AS k FROM customer)
      |UNION ALL
      |SELECT 'both' AS tag, k FROM (
      |  SELECT DISTINCT s_nationkey AS k FROM supplier
      |  INTERSECT SELECT DISTINCT c_nationkey AS k FROM customer)""".stripMargin) { (s, d) =>
    val sup = Tables.supplier(s, d).select(col("s_nationkey").as("k")).distinct()
    val cus = Tables.customer(s, d).select(col("c_nationkey").as("k")).distinct()
    sup.except(cus).select(lit("supplier_only").as("tag"), col("k"))
      .unionAll(sup.intersect(cus).select(lit("both").as("tag"), col("k")))
  }

  /** q33 — left-anti join (NOT EXISTS): customers with no URGENT order.
    * Rounds out the join surface (inner/left/semi/anti). */
  val q33 = Q("q33_anti_join",
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .withColumnRenamed("c_custkey", "o_custkey")
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
        Seq("o_custkey"), "left_anti")
      .select(col("o_custkey").as("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** q34 — ROLLUP (year, month) over order totals: the dashboard
    * subtotal surface (monthly, yearly, grand total in one pass —
    * partial aggregation handles all grouping sets in a single
    * shuffle). */
  val q34 = Q("q34_rollup",
    """SELECT CAST(year(o_orderdate) AS INT) AS year,
      |       CAST(month(o_orderdate) AS INT) AS month,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY ROLLUP(1, 2)""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .withColumn("year", year(col("o_orderdate")))
      .withColumn("month", month(col("o_orderdate")))
      .rollup("year", "month")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
  }

  /** q35 — CUBE (orderstatus, orderpriority): all 4 grouping sets. */
  val q35 = Q("q35_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
      |FROM orders GROUP BY CUBE(1, 2)""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q33, q34, q35)
}
