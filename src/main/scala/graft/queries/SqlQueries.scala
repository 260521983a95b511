package graft.queries

import graft.Tables

/** The ad-hoc SQL / BI surface (r12 verdict item 5; SURVEY §3.3's 4th
  * entry point — the reference exposes its gold tables to
  * Dremio/Superset as plain SQL): these queries are executed as ONE
  * SQL TEXT via `spark.sql` over [[Tables.registerAll]]'s view
  * registry, and the SAME text, verbatim, is the DuckDB oracle — the
  * strongest possible statement that an analyst's ANSI SQL runs
  * unchanged on the engine. Dialect discipline for verbatim
  * portability: `STRING` (both engines alias it), `year()/month()`,
  * ordinal GROUP BY, exact integer-cents money (the Cols.dsum decimal
  * discipline inlined as SQL), `CAST(SUM(...) AS BIGINT)` to close the
  * HUGEINT seam, windows only over already-aggregated subqueries, and
  * every float produced by a single IEEE division of exact integers.
  */
object SqlQueries {

  /** One self-contained verbatim-portable statement per entry. */
  private def sqlQ(name: String, text: String) =
    Q(name, text) { (s, d) => Tables.registerAll(s, d); s.sql(text) }

  /** q221 — the GOLD DASHBOARD as one statement: monthly sales,
    * top-20 parts by revenue, and per-brand revenue share (the three
    * widgets of the reference's dashboard tier — gold_dashboard
    * aggregates — stacked as tagged sections of one result, the
    * classic single-query BI feed). */
  val q221 = sqlQ("q221_sql_dashboard",
    """WITH rev AS (
      |  SELECT o.o_orderdate AS od, l.l_partkey AS pk,
      |         CAST(CAST(l.l_quantity AS DECIMAL(18,2))
      |              * CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
      |monthly AS (
      |  SELECT CAST(year(od) * 100 + month(od) AS BIGINT) AS k,
      |         CAST(SUM(cents) AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM rev GROUP BY 1),
      |partrev AS (
      |  SELECT pk AS k, CAST(SUM(cents) AS BIGINT) AS v,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM rev GROUP BY 1),
      |topparts AS (
      |  SELECT k, v, n FROM (
      |    SELECT k, v, n, row_number() OVER (ORDER BY v DESC, k) AS rn
      |    FROM partrev) t WHERE rn <= 20),
      |brand AS (
      |  SELECT p.p_brand AS k_str, CAST(SUM(r.cents) AS BIGINT) AS v,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM rev r JOIN part p ON p.p_partkey = r.pk GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev)
      |SELECT 'monthly_sales' AS section, k, CAST(NULL AS STRING) AS k_str,
      |       v, n, CAST(NULL AS DOUBLE) AS share
      |FROM monthly
      |UNION ALL
      |SELECT 'top20_parts', k, CAST(NULL AS STRING), v, n, CAST(NULL AS DOUBLE)
      |FROM topparts
      |UNION ALL
      |SELECT 'brand_share', CAST(NULL AS BIGINT), k_str, v, n,
      |       CAST(v AS DOUBLE) / CAST(t AS DOUBLE)
      |FROM brand, tot""".stripMargin)

  /** q222 — windowed ranking through the SQL text surface: top-3
    * suppliers by account balance per nation (q09's shape as analyst
    * SQL — window over a join, deterministic tiebreak). */
  val q222 = sqlQ("q222_sql_top_suppliers",
    """SELECT n_name, s_name, s_acctbal, balrank FROM (
      |  SELECT n.n_name, s.s_name, s.s_acctbal,
      |         row_number() OVER (PARTITION BY n.n_name
      |                            ORDER BY s.s_acctbal DESC, s.s_suppkey) AS balrank
      |  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey) t
      |WHERE balrank <= 3""".stripMargin)

  /** q223 — the BI seam over the EVENTS stream table: daily active
    * users and purchase conversion in plain analyst SQL. This is the
    * one SQL-surface query whose oracle is NOT the verbatim text: the
    * analyst writes against [[Tables.registerAll]]'s NORMALIZED view
    * (ts is always epoch-nanos int64, whatever physical layout the
    * producer shipped — exactly the seam the registry exists to
    * solve), while the DuckDB oracle reads the raw parquet and must
    * normalize itself (`epoch_ns`). The day key is the day-start
    * nanosecond via `-`/`%` only — integer DIVISION is the one
    * operator the dialects spell differently (`div` vs `//`);
    * subtraction and modulo are portable and exact. */
  val q223 = {
    val body =
      """SELECT ts - (ts % 86400000000000) AS day_start_ns,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        |FROM ev
        |GROUP BY 1""".stripMargin
    Q("q223_sql_daily_events",
      s"""WITH ev AS (SELECT epoch_ns(ts) AS ts, user_id, event_type FROM events)
         |$body""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(s"WITH ev AS (SELECT ts, user_id, event_type FROM events)\n$body")
    }
  }

  /** q226 — GROUPING SETS with GROUPING() provenance flags, verbatim
    * SQL: the (year, status) lattice — both-keys cells, each marginal,
    * and the grand total — in ONE statement, the multi-level dashboard
    * rollup an analyst writes instead of four UNION'd aggregates. The
    * q34/q35 forms cover ROLLUP/CUBE through the Dataset API; this is
    * the arbitrary-lattice SQL spelling, and GROUPING() disambiguates
    * a real NULL key from a rolled-up one (both engines emit NULL for
    * non-grouped cells). Scale shape: Spark plans one Expand (4 copies
    * of each input row, map-side) into one hash aggregate — a single
    * shuffle whatever the lattice size. */
  val q226 = sqlQ("q226_sql_grouping_sets",
    """WITH o AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus AS status,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders)
      |SELECT yr, status,
      |       CAST(GROUPING(yr) AS BIGINT) AS g_yr,
      |       CAST(GROUPING(status) AS BIGINT) AS g_status,
      |       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM o
      |GROUP BY GROUPING SETS ((yr, status), (yr), (status), ())""".stripMargin)

  val all: Seq[Q] = Seq(q221, q222, q223, q226)
}
