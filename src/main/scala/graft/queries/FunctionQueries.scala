package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Cols, Tables}

/** Scalar-function battery and subquery shapes beyond the reference's
  * own usage — the "a user of the reference could run every query they
  * run today, and the ones their BI tool generates" surface. */
object FunctionQueries {

  /** q41 — string/date/math scalar battery over customers+orders.
    * Cross-engine notes: substring is 1-based in both; DuckDB
    * `instr` == Spark `instr`; datediff argument ORDER differs
    * (Spark datediff(end, start) == DuckDB datediff('day', start, end));
    * DuckDB dayofweek is Sunday=0 where Spark is Sunday=1 (+1 in the
    * oracle);
    * IEEE sqrt/ln/power are bit-identical; round() is avoided (half-up
    * vs half-even). */
  val q41 = Q("q41_scalar_battery",
    """SELECT c_custkey,
      |       substring(c_name, 1, 8) AS name_prefix,
      |       replace(c_name, 'Customer', 'C') AS name_short,
      |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_id,
      |       instr(c_name, '#') AS hash_pos,
      |       length(c_mktsegment) AS seg_len,
      |       abs(c_acctbal) AS abs_bal,
      |       sqrt(abs(c_acctbal)) AS sqrt_bal,
      |       CAST(c_acctbal AS DOUBLE) * CAST(c_acctbal AS DOUBLE) AS bal_sq
      |FROM customer""".stripMargin) { (s, d) =>
    // ln/exp/pow go through libm and can differ by 1 ulp between
    // engines (observed on ln) — the battery sticks to IEEE-defined
    // ops (abs, sqrt, multiply), which are bit-identical.
    Tables.customer(s, d).select(
      col("c_custkey"),
      substring(col("c_name"), 1, 8).as("name_prefix"),
      regexp_replace(col("c_name"), "Customer", "C").as("name_short"),
      lpad(col("c_custkey").cast("string"), 10, "0").as("padded_id"),
      instr(col("c_name"), "#").cast("long").as("hash_pos"),
      length(col("c_mktsegment")).cast("long").as("seg_len"),
      abs(col("c_acctbal")).as("abs_bal"),
      sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
      (col("c_acctbal") * col("c_acctbal")).as("bal_sq"))
  }

  /** q42 — date-function battery: truncation, day arithmetic, extract,
    * last_day. All integer/date-typed outputs → precision-safe. */
  val q42 = Q("q42_date_battery",
    """SELECT o_orderkey,
      |       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |       CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_95,
      |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |       CAST(quarter(o_orderdate) AS INT) AS qtr,
      |       last_day(CAST(o_orderdate AS DATE)) AS month_end
      |FROM orders WHERE o_orderkey < 1000""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") < 1000).select(
      col("o_orderkey"),
      date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
      datediff(col("o_orderdate"),
        lit(java.time.LocalDateTime.parse("1995-01-01T00:00:00"))).as("days_since_95"),
      dayofweek(col("o_orderdate")).as("dow"),
      quarter(col("o_orderdate")).as("qtr"),
      last_day(col("o_orderdate").cast("date")).as("month_end"))
  }

  /** q43 — correlated subquery shapes (Catalyst decorrelation, SURVEY
    * §4 "not exercised" in the reference): customers whose balance
    * beats their nation's average, with the nation average alongside.
    * (Customers, not suppliers: at sf0.001 every supplier nation is a
    * singleton, which makes the result trivially empty.) Expressed
    * relationally in Spark (the decorrelated plan), as a correlated
    * scalar subquery in the oracle. */
  val q43 = Q("q43_correlated_subquery",
    """SELECT c_custkey, c_name, c_acctbal,
      |       (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |        FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) AS nation_avg
      |FROM customer c
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val navg = cust.groupBy(col("c_nationkey"))
      .agg(Cols.davg(col("c_acctbal")).as("nation_avg"))
    cust.join(broadcast(navg), Seq("c_nationkey"), "inner")
      .filter(col("c_acctbal") > col("nation_avg"))
      .select("c_custkey", "c_name", "c_acctbal", "nation_avg")
  }

  /** q44 — array aggregation surface: per-nation sorted supplier list.
    * collect_list is order-nondeterministic after a shuffle, so the
    * canonical form is sort_array first; the list is emitted string-
    * joined because list-valued cells don't sort/hash portably in the
    * compare harness. */
  val q44 = Q("q44_array_agg",
    """SELECT n_nationkey,
      |       array_to_string(list(s_suppkey ORDER BY s_suppkey), ',') AS suppliers,
      |       COUNT(*) AS n_suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_nationkey""".stripMargin) { (s, d) =>
    Tables.supplier(s, d).withColumnRenamed("s_nationkey", "n_nationkey")
      .join(broadcast(Tables.nation(s, d)), Seq("n_nationkey"), "inner")
      .groupBy("n_nationkey")
      .agg(
        concat_ws(",", sort_array(collect_list(col("s_suppkey")))).as("suppliers"),
        count(lit(1)).as("n_suppliers"))
  }

  /** q45 — sampling surface for training-data pipelines: uniform 10%
    * plus per-stratum (mktsegment) stratified rates, both by KEYED HASH
    * (md5-derived `Hashes.h60` of a salted key) rather than a PRNG.
    * Hash sampling is the 100 TB form: the decision is a pure function
    * of the row key, so samples are reproducible across engines, runs,
    * retries and re-partitioning (a seeded PRNG sample changes under
    * any repartition), and membership is auditable per row — which also
    * makes the whole query oracle-able bit-for-bit. The engine-seeded
    * `.sample`/`.sampleBy` API surface stays pinned in SamplingSpec. */
  val q45 = Q("q45_sampling", {
    import graft.functions.Hashes.h60Sql
    val rateCase =
      """CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 50 WHEN 'BUILDING' THEN 20
        |            WHEN 'FURNITURE' THEN 10 WHEN 'HOUSEHOLD' THEN 10
        |            WHEN 'MACHINERY' THEN 5 ELSE 0 END""".stripMargin
    s"""WITH c AS (SELECT c_custkey, c_mktsegment,
       |                  CAST(c_custkey AS VARCHAR) AS ck FROM customer)
       |SELECT c_custkey, 'uniform' AS method FROM c
       |WHERE ${h60Sql("'u|' || ck")} % 10 = 0
       |UNION ALL
       |SELECT c_custkey, 'stratified' AS method FROM c
       |WHERE ${h60Sql("'s|' || ck")} % 100 < $rateCase""".stripMargin
  }) { (s, d) =>
    import graft.functions.Hashes
    val c = Tables.customer(s, d)
    val ck = col("c_custkey").cast(StringType)
    val uniform = c
      .filter(pmod(Hashes.h60(concat(lit("u|"), ck)), lit(10L)) === 0L)
      .select(col("c_custkey"), lit("uniform").as("method"))
    val rate = when(col("c_mktsegment") === "AUTOMOBILE", 50L)
      .when(col("c_mktsegment") === "BUILDING", 20L)
      .when(col("c_mktsegment") === "FURNITURE", 10L)
      .when(col("c_mktsegment") === "HOUSEHOLD", 10L)
      .when(col("c_mktsegment") === "MACHINERY", 5L)
      .otherwise(0L)
    val stratified = c
      .filter(pmod(Hashes.h60(concat(lit("s|"), ck)), lit(100L)) < rate)
      .select(col("c_custkey"), lit("stratified").as("method"))
    uniform.unionAll(stratified)
  }

  /** q46 — null-handling battery: coalesce / nullif / safe casting.
    * ANSI-safe `try_cast` (NULL instead of error on bad input) is the
    * ingestion-pipeline workhorse; DuckDB TRY_CAST matches. */
  val q46 = Q("q46_null_handling",
    """SELECT o_orderkey,
      |       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
      |       nullif(o_orderpriority, '4-NOT SPECIFIED') AS priority_or_null,
      |       TRY_CAST(o_orderpriority AS INT) AS bad_cast_null,
      |       TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority_num,
      |       CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_nn
      |FROM orders WHERE o_orderkey < 500""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") < 500).select(
      col("o_orderkey"),
      coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_norm"),
      nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")).as("priority_or_null"),
      col("o_orderpriority").try_cast(IntegerType).as("bad_cast_null"),
      substring(col("o_orderpriority"), 1, 1).try_cast(IntegerType).as("priority_num"),
      when(col("o_totalprice").isNull, -1.0).otherwise(col("o_totalprice")).as("price_nn"))
  }

  /** q47 — the SQL-string entry path (the Dremio/Superset BI surface of
    * the reference, README.md:34-35): ONE dialect-neutral SQL string
    * executed verbatim by BOTH engines — `spark.sql` over registered
    * temp views on the Spark side, the identical text as the DuckDB
    * oracle. parse → analyze → optimize → execute in one call. */
  private val sharedSql =
    """SELECT o_orderpriority,
      |       CAST(year(o_orderdate) AS INT) AS year,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY o_orderpriority, CAST(year(o_orderdate) AS INT)""".stripMargin

  val q47 = Q("q47_sql_entry", sharedSql) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(sharedSql)
  }

  /** q48 — AS-OF join (point-in-time lookup): each event matched to the
    * user's most recent order at-or-before the event. Spark has no
    * native as-of join — `Relational.asOfJoin` composes it from a
    * union + one keyed window (single shuffle); DuckDB oracles it with
    * its native ASOF LEFT JOIN. Times are epoch-micros integers on both
    * sides; orders are deduped to one per (customer, time) first (as-of
    * is otherwise ambiguous). */
  val q48 = Q("q48_asof_join",
    """WITH r AS (
      |  SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS t,
      |         max(o_orderkey) AS matched_orderkey
      |  FROM orders GROUP BY 1, 2),
      |l AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events)
      |SELECT l.event_id, l.user_id, r.matched_orderkey
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.t""".stripMargin) { (s, d) =>
    val l = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("t"))
    val r = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"))
      .agg(max(col("o_orderkey")).as("matched_orderkey"))
    graft.operators.Relational.asOfJoin(l, "t", r, "t", "user_id", Seq("matched_orderkey"))
      .select("event_id", "user_id", "matched_orderkey")
  }

  private val asofOracle =
    """WITH r AS (
      |  SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS t,
      |         max(o_orderkey) AS matched_orderkey
      |  FROM orders GROUP BY 1, 2),
      |l AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events)
      |SELECT l.event_id, l.user_id, r.matched_orderkey
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.t""".stripMargin

  /** q49 — the same as-of lookup through the NATIVE custom operator
    * (plans.AsOfJoinExec — LogicalPlan + Strategy + SparkPlan injected
    * via GraftExtensions), oracled directly against DuckDB's native
    * ASOF LEFT JOIN. q48 covers the composed form; q49 puts the custom
    * physical operator itself under the correctness gate. */
  val q49 = Q("q49_asof_native", asofOracle) { (s, d) =>
    val l = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("t"))
    val r = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"))
      .agg(max(col("o_orderkey")).as("matched_orderkey"))
    graft.plans.AsOfJoinNative(l, "t", r, "t", "user_id", Seq("matched_orderkey"))
      .select("event_id", "user_id", "matched_orderkey")
  }

  /** q61 — exact COUNT(DISTINCT) per group: the exact twin of q30's
    * HLL estimate, under the hash gate (the estimator itself can't be —
    * engines' sketches differ). At 100 TB exact distinct doubles the
    * shuffle (expand + two-phase agg); q30 is the default, this is the
    * audit query. */
  val q61 = Q("q61_exact_distinct",
    """SELECT event_type,
      |       COUNT(DISTINCT user_id) AS exact_users,
      |       COUNT(*) AS n_events
      |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
  }

  /** q62 — fuzzy/string battery: edit distance (the similarity-join
    * scalar), reverse/translate/repeat/ascii/split_part — all
    * cross-engine-identical classic definitions, all scan-speed. */
  val q62 = Q("q62_fuzzy_battery",
    """SELECT p_partkey,
      |       levenshtein(p_name, p_type) AS lev_name_type,
      |       levenshtein(p_brand, p_type) AS lev_brand_type,
      |       reverse(p_brand) AS brand_rev,
      |       translate(p_brand, '#', '-') AS brand_norm,
      |       repeat(substring(p_brand, 1, 2), 2) AS brand_rep,
      |       ascii(p_name) AS first_char,
      |       split_part(p_type, ' ', 1) AS type_head
      |FROM part""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      levenshtein(col("p_name"), col("p_type")).as("lev_name_type"),
      levenshtein(col("p_brand"), col("p_type")).as("lev_brand_type"),
      reverse(col("p_brand")).as("brand_rev"),
      translate(col("p_brand"), "#", "-").as("brand_norm"),
      repeat(substring(col("p_brand"), 1, 2), 2).as("brand_rep"),
      ascii(col("p_name")).as("first_char"),
      split_part(col("p_type"), lit(" "), lit(1)).as("type_head"))
  }

  /** q64 — GROUPING SETS + GROUPING() (the BI slice beyond q34's
    * ROLLUP / q35's CUBE: arbitrary grouping combinations in one
    * pass). One dialect-neutral SQL string executed verbatim by both
    * engines, like q47. */
  private val groupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  val q64 = Q("q64_grouping_sets", groupingSetsSql) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(groupingSetsSql)
  }

  /** q65 — EXISTS / NOT EXISTS correlated subqueries (Catalyst
    * decorrelates both into semi/anti joins; q43 covers the scalar
    * form). Shared SQL string, both engines verbatim. */
  private val existsSql =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F'
      |                    AND o2.o_totalprice < 1000)""".stripMargin

  val q65 = Q("q65_exists_subqueries", existsSql) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(existsSql)
  }

  /** q80 — error-safe function battery: the `try_` family that keeps a
    * 100 TB job from dying on one malformed row under ANSI mode (this
    * engine runs ANSI on). Spark's try_divide/try_cast/try_element_at
    * produce NULL where the strict forms raise; the oracle expresses
    * the same semantics portably (NULLIF-guarded division, TRY_CAST,
    * DuckDB's out-of-range subscript ⇒ NULL). */
  val q80 = Q("q80_try_battery",
    """SELECT e.event_id,
      |       CAST(e.event_id AS DOUBLE) / NULLIF(e.event_id % 2, 0) AS safe_div,
      |       TRY_CAST(e.event_type AS INT) AS bad_int,
      |       string_split(trim(e.event_type), '_')[9] AS no_elem,
      |       COALESCE(TRY_CAST(e.event_type AS INT), -1) AS defaulted
      |FROM events e""".stripMargin) { (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      expr("try_divide(event_id, event_id % 2)").as("safe_div"),
      expr("try_cast(event_type AS INT)").as("bad_int"),
      expr("try_element_at(split(trim(event_type), '_'), 9)").as("no_elem"),
      coalesce(expr("try_cast(event_type AS INT)"), lit(-1)).as("defaulted"))
  }

  /** q81 — higher-order-function battery over the token arrays:
    * filter / exists / forall / aggregate / sort+slice+join, each
    * mirrored by its DuckDB list_* twin. These are the codegen'd
    * array primitives every per-document transformation in this engine
    * composes from (and the lambda-bind discipline from Text.ngrams
    * applies: the token array is bound once). */
  val q81 = Q("q81_hof_battery",
    """WITH t0 AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents)
      |SELECT doc_id,
      |       CAST(len(list_filter(t, x -> len(x) > 4)) AS INT) AS n_long,
      |       CAST(list_contains(t, 'spark') AS INT) AS has_spark,
      |       CAST(len(list_filter(t, x -> len(x) > 20)) = 0 AS INT) AS all_short,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                   list_transform(t, x -> len(x))), (a, b) -> a + b) AS char_sum,
      |       array_to_string(list_sort(t)[1:3], ',') AS first3
      |FROM t0""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val out = Tables.documents(s, d).select(col("doc_id"),
      element_at(transform(array(Text.tokens(col("text"))), t => struct(
        size(filter(t, x => length(x) > 4)).as("n_long"),
        exists(t, x => x === "spark").cast(IntegerType).as("has_spark"),
        forall(t, x => length(x) <= 20).cast(IntegerType).as("all_short"),
        aggregate(t, lit(0L), (a, x) => a + length(x)).as("char_sum"),
        array_join(slice(sort_array(t), 1, 3), ",").as("first3"))), 1).as("u"))
    out.select(col("doc_id"), col("u.n_long"), col("u.has_spark"),
      col("u.all_short"), col("u.char_sum"), col("u.first3"))
  }

  val all: Seq[Q] = Seq(q41, q42, q43, q44, q45, q46, q47, q48, q49,
    q61, q62, q64, q65, q80, q81)
}
