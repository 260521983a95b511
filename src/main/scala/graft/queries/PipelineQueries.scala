package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{AtomicTable, Medallion}

/** The medallion pipeline itself under the correctness gate: q50 runs
  * bronze → silver → gold through the REAL write paths — partitioned
  * parquet append for bronze, `AtomicTable` versioned-pointer replace
  * for silver and gold (merge-schema on for gold, as the reference
  * configures it) — on a scratch directory and returns the gold table
  * as read back from disk
  * — so the oracle verifies the materialized pipeline end-to-end
  * (write-path schema drift, partition-column round-trips and the
  * transform semantics all sit inside the hash compare), not just the
  * in-memory plan fragments PipelineSpec covers.
  *
  * Reference shape: bronze_batch_load.py (incremental partitioned
  * append) → silver_clean_transform.py:102-106 (fact join + positivity
  * guards) → gold_transfrom.py:59-75 (product-grain sales summary,
  * createOrReplace partitioned by year).
  */
object PipelineQueries {

  val q50 = Q("q50_medallion_pipeline",
    """SELECT CAST(year(o_orderdate) AS INT) AS year,
      |       CAST(month(o_orderdate) AS INT) AS month,
      |       l_partkey, p_brand,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_quantity,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
      |       COUNT(*) AS num_purchases
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |LEFT JOIN part ON p_partkey = l_partkey
      |WHERE l_quantity > 0 AND l_extendedprice > 0
      |GROUP BY 1, 2, 3, 4""".stripMargin) { (s, d) =>
    val tmp = graft.pipeline.TempDirs.scoped("graft_medallion_")
    // bronze: incremental load into an empty sink = the full-load branch.
    // Partition granularity is year/month here: this is a multi-year
    // BACKFILL, and day-grain hive partitioning of a backfill produces
    // thousands of directories (the reference's daily grain fits its
    // daily increments — PipelineSpec covers that path).
    val bronzePath = s"$tmp/bronze_orders"
    Medallion.bronzeIncrementalLoad(s, Tables.orders(s, d), bronzePath,
      "o_orderdate", java.sql.Date.valueOf("1998-12-01"), Seq("year", "month"))
    // silver: conform the purchase fact (join + positivity guards),
    // atomic full replace (versioned dir + pointer commit)
    val items = Tables.lineitem(s, d).withColumnRenamed("l_orderkey", "o_orderkey")
    val silver = Medallion.silverPurchaseFact(
      s.read.parquet(bronzePath), items, "o_orderkey", "l_quantity", "l_extendedprice")
    val silverPath = s"$tmp/silver_purchases"
    AtomicTable.replace(silver, silverPath)
    // gold: product-grain sales summary enriched with the part dim,
    // atomic partitioned replace by year (merge-schema on, as the
    // reference's gold writes configure it)
    val dim = Tables.part(s, d)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val gold = Medallion.goldSalesSummary(
      AtomicTable.read(s, silverPath), dim, "l_partkey",
      "o_orderdate", "l_quantity", "l_extendedprice", Seq("p_brand"))
    val goldPath = s"$tmp/gold_sales"
    AtomicTable.replace(gold, goldPath, mergeSchema = true, partitionCols = Seq("year"))
    AtomicTable.read(s, goldPath)
  }

  /** q59 — atomic MERGE-style upsert under the gate: seed the table
    * with every customer, upsert a delta that bumps every 10th
    * customer's balance, read the committed snapshot back. The oracle
    * is the closed-form CASE over the raw table — matched keys must
    * show the delta, unmatched keys the original, nothing lost. */
  val q59 = Q("q59_atomic_upsert",
    """SELECT c_custkey, c_name, c_mktsegment,
      |       CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000.0
      |            ELSE c_acctbal END AS balance
      |FROM customer""".stripMargin) { (s, d) =>
    val tmp = graft.pipeline.TempDirs.scoped("graft_upsert_")
    val base = Tables.customer(s, d).select(
      col("c_custkey"), col("c_name"), col("c_mktsegment"),
      col("c_acctbal").as("balance"))
    AtomicTable.replace(base, tmp)
    val delta = base.filter(col("c_custkey") % 10 === 0)
      .withColumn("balance", col("balance") + 1000.0)
    AtomicTable.upsert(delta, tmp, "c_custkey")
    AtomicTable.read(s, tmp)
  }

  /** q87 — small-file COMPACTION under the gate: seed the table as 64
    * deliberately tiny files (the state a streaming sink leaves behind),
    * run `AtomicTable.compact`, read the committed result back. The
    * oracle is the plain source projection — hash-green proves the
    * rewrite moved bytes without changing a single value, which is the
    * entire contract of a table-maintenance service. CompactionSpec
    * (AtomicTableSpec) separately pins the file-count mechanics. */
  val q87 = Q("q87_compacted_table",
    """SELECT c_custkey, c_name, c_mktsegment, c_acctbal AS balance
      |FROM customer""".stripMargin) { (s, d) =>
    val tmp = graft.pipeline.TempDirs.scoped("graft_compact_")
    val base = Tables.customer(s, d).select(
      col("c_custkey"), col("c_name"), col("c_mktsegment"),
      col("c_acctbal").as("balance"))
    AtomicTable.replace(base.repartition(64), tmp)
    AtomicTable.compact(s, tmp, targetBytes = 1L << 30)
    AtomicTable.read(s, tmp)
  }

  /** q88 — CHANGE DATA FEED between two committed versions: v1 = every
    * customer, v2 = deletes (key % 7 = 0), updates (+1000 on key % 10 =
    * 0 of the survivors) and inserts (key % 13 = 0 cloned to key +
    * 1 000 000). `AtomicTable.diff` must tag exactly those rows —
    * unchanged customers may not appear — and carry before/after
    * values. The oracle is the closed form over the raw table. */
  val q88 = Q("q88_version_diff",
    """SELECT c_custkey, 'delete' AS change_type,
      |       c_acctbal AS balance_before, CAST(NULL AS DOUBLE) AS balance_after
      |FROM customer WHERE c_custkey % 7 = 0
      |UNION ALL
      |SELECT c_custkey, 'update', c_acctbal, c_acctbal + 1000.0
      |FROM customer WHERE c_custkey % 7 <> 0 AND c_custkey % 10 = 0
      |UNION ALL
      |SELECT c_custkey + 1000000, 'insert', CAST(NULL AS DOUBLE), c_acctbal + 5000.0
      |FROM customer WHERE c_custkey % 13 = 0""".stripMargin) { (s, d) =>
    val tmp = graft.pipeline.TempDirs.scoped("graft_cdc_")
    val base = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal").as("balance"))
    val v1 = AtomicTable.replace(base, tmp)
    val next = base.filter(col("c_custkey") % 7 =!= 0)
      .withColumn("balance",
        when(col("c_custkey") % 10 === 0, col("balance") + 1000.0)
          .otherwise(col("balance")))
      .unionByName(base.filter(col("c_custkey") % 13 === 0).select(
        (col("c_custkey") + 1000000L).as("c_custkey"),
        (col("balance") + 5000.0).as("balance")))
    val v2 = AtomicTable.replace(next, tmp)
    AtomicTable.diff(s, tmp, v1, v2, Seq("c_custkey"))
      .select(col("c_custkey"), col("change_type"),
        col("balance_before"), col("balance_after"))
  }

  /** q91 — range-CLUSTERED rewrite under the gate (CLUSTER BY / Z-ORDER
    * table service): scramble the fact, `Lakehouse.clusteredWrite` it
    * by order key, read back. Hash-green = the physical re-layout moved
    * every row and changed none; ScaleOpsSpec separately proves the
    * row-group stats become disjoint (the data-skipping property the
    * layout exists for). */
  val q91 = Q("q91_clustered_table",
    """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
      |FROM lineitem""".stripMargin) { (s, d) =>
    val tmp = graft.pipeline.TempDirs.scoped("graft_cluster_")
    val fact = graft.Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    graft.pipeline.Lakehouse.clusteredWrite(
      fact.orderBy(hash(col("l_orderkey"), col("l_partkey"))),
      tmp, Seq("l_orderkey"), numFiles = 8)
    s.read.parquet(tmp)
  }

  /** q93 — constraint gate under the oracle: every order tagged with
    * the exact rules it violates (CHECK semantics: FALSE violates,
    * NULL passes — pinned by QualitySpec), quarantine = non-empty
    * violation list. The oracle recomputes each rule as a CASE and
    * concat_ws — both engines skip NULLs in concat_ws, so the joined
    * violation string is bit-comparable. */
  val q93 = Q("q93_constraint_gate",
    """SELECT o_orderkey,
      |       concat_ws(',',
      |         CASE WHEN NOT COALESCE(o_totalprice > 0, TRUE) THEN 'positive_price' END,
      |         CASE WHEN NOT COALESCE(o_totalprice < 400000, TRUE) THEN 'price_cap' END,
      |         CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'), TRUE) THEN 'valid_status' END,
      |         CASE WHEN NOT COALESCE(o_orderdate >= DATE '1992-01-01', TRUE) THEN 'date_floor' END
      |       ) AS violations
      |FROM orders""".stripMargin) { (s, d) =>
    import graft.pipeline.Quality
    val rules = Seq(
      "positive_price" -> (col("o_totalprice") > 0),
      "price_cap" -> (col("o_totalprice") < 400000),
      "valid_status" -> col("o_orderstatus").isInCollection(Seq("O", "F", "P")),
      "date_floor" -> (col("o_orderdate") >= lit(java.sql.Date.valueOf("1992-01-01"))))
    Tables.orders(s, d).select(col("o_orderkey"),
      Quality.violations(rules).as("violations"))
  }

  /** q95 — RESTORE under the gate: commit the good snapshot, commit a
    * corrupting overwrite, roll the pointer back, read. Hash-green
    * against the plain source projection proves rollback re-publishes
    * the prior version exactly — one pointer rename, no data rewrite
    * (the spec pins the marker/pointer mechanics). */
  val q95 = Q("q95_restore",
    """SELECT c_custkey, c_acctbal AS balance FROM customer""".stripMargin) { (s, d) =>
    val tmp = graft.pipeline.TempDirs.scoped("graft_restore_")
    val base = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal").as("balance"))
    val good = AtomicTable.replace(base, tmp)
    AtomicTable.replace(base.withColumn("balance", lit(0.0)), tmp)
    AtomicTable.rollback(s, tmp, good)
    AtomicTable.read(s, tmp)
  }

  /** q96 — one-pass column profile of the customer table (the
    * data-catalog summary service): row/null/exact-distinct counts per
    * column, numeric min/max as doubles. The oracle recomputes each
    * column's row as a UNION ALL — exact distincts on both sides, so
    * the whole profile is hash-comparable. */
  val q96 = Q("q96_table_profile", {
    def num(c: String) =
      s"""SELECT '$c' AS column, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls, COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_value, CAST(MAX($c) AS DOUBLE) AS max_value
         |FROM customer""".stripMargin
    def str(c: String) =
      s"""SELECT '$c', COUNT(*), COUNT(*) - COUNT($c), COUNT(DISTINCT $c),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM customer""".stripMargin
    Seq(num("c_custkey"), str("c_name"), num("c_nationkey"),
      num("c_acctbal"), str("c_mktsegment")).mkString("\nUNION ALL\n")
  }) { (s, d) =>
    graft.pipeline.Profile.profile(Tables.customer(s, d))
  }

  /** q98 — CDC-driven INCREMENTAL VIEW MAINTENANCE: maintain a
    * per-customer gold aggregate from `AtomicTable.diff` rows alone,
    * never rescanning the base. Delta algebra: every CDC row
    * contributes −(before) to its old group and +(after) to its new
    * group — deletes have no after side, inserts no before side, and
    * an update that MIGRATES groups (customer re-keyed here) is
    * handled by exactly the same two terms. Sums ride DECIMAL(18,2)
    * through the merge (decimal addition is associative, so
    * incremental ≡ recompute bit-for-bit; q73 pins the same property
    * for partial-agg merge). The oracle recomputes the gold from the
    * v2 closed form directly — hash-green means a 100 TB gold can be
    * maintained from the day's CDC rows, at CDC cost, not base cost. */
  val q98 = Q("q98_cdc_incremental_gold",
    """WITH v2 AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 20 = 0 THEN o_custkey + 1000000
      |              ELSE o_custkey END AS cust,
      |         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100.0
      |              ELSE o_totalprice END AS price
      |  FROM orders WHERE o_orderkey % 13 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice + 50.0
      |  FROM orders WHERE o_orderkey % 17 = 0)
      |SELECT cust AS o_custkey, COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM v2 GROUP BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val money = DecimalType(18, 2)
    val tmp = graft.pipeline.TempDirs.scoped("graft_ivm_")
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("price"))
    val k = col("o_orderkey")
    // v2: deletes (%13), price updates (%10), group migrations (%20), inserts (%17)
    val next = base.filter(k % 13 =!= 0).select(k,
        when(k % 20 === 0, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")).as("o_custkey"),
        when(k % 10 === 0, col("price") + 100.0).otherwise(col("price")).as("price"))
      .unionByName(base.filter(k % 17 === 0).select(
        (k + 10000000L).as("o_orderkey"), col("o_custkey"),
        (col("price") + 50.0).as("price")))
    val v1 = AtomicTable.replace(base, tmp)
    val v2 = AtomicTable.replace(next, tmp)
    // the gold as of v1, sums kept in exact decimal for the merge
    val gold1 = s.read.parquet(s"$tmp/$v1").groupBy("o_custkey")
      .agg(count(lit(1)).as("n1"), sum(col("price").cast(money)).as("p1"))
    // CDC rows → ±group deltas (one explode, two terms per row)
    val cdc = AtomicTable.diff(s, tmp, v1, v2, Seq("o_orderkey"))
    val deltas = cdc.select(explode(array(
        struct(col("o_custkey_before").as("cust"), lit(-1L).as("dn"),
          (-col("price_before").cast(money)).as("dp")),
        struct(col("o_custkey_after").as("cust"), lit(1L).as("dn"),
          col("price_after").cast(money).as("dp")))).as("d"))
      .select(col("d.*")).filter(col("cust").isNotNull)
      .groupBy("cust").agg(sum("dn").as("dn"), sum("dp").as("dp"))
    // merge: gold2 = gold1 ⊕ deltas; groups whose count hits 0 vanish
    gold1.join(deltas, gold1("o_custkey") === deltas("cust"), "full_outer")
      .select(
        coalesce(gold1("o_custkey"), col("cust")).as("o_custkey"),
        (coalesce(col("n1"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("p1"), lit(0).cast(money)) +
          coalesce(col("dp"), lit(0).cast(money))).as("psum"))
      .filter(col("n_orders") > 0)
      .select(col("o_custkey"), col("n_orders"),
        col("psum").cast(org.apache.spark.sql.types.DoubleType).as("total_price"))
  }

  val all: Seq[Q] = Seq(q50, q59, q87, q88, q91, q93, q95, q96, q98)
}
