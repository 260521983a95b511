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
    val tmp = java.nio.file.Files.createTempDirectory("graft_medallion_").toString
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
    val tmp = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
    val base = Tables.customer(s, d).select(
      col("c_custkey"), col("c_name"), col("c_mktsegment"),
      col("c_acctbal").as("balance"))
    AtomicTable.replace(base, tmp)
    val delta = base.filter(col("c_custkey") % 10 === 0)
      .withColumn("balance", col("balance") + 1000.0)
    AtomicTable.upsert(delta, tmp, "c_custkey")
    AtomicTable.read(s, tmp)
  }

  val all: Seq[Q] = Seq(q50, q59)
}
