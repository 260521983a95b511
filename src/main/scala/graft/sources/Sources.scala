package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers covering the reference's ingest surface
  * (SURVEY §2.1), normalized to explicit schemas:
  *
  *  - S1 JDBC (bronze_batch_load.py:45-53) — thin config wrapper; the
  *    zero-egress build has no database, so the parquet tables stand in
  *    (Tables); kept so the production wiring is one option-set away.
  *  - S2/S3 parquet — Tables.
  *  - S5 CSV seed load (load_tables.py:112-123) — header + explicit
  *    schema, the COPY-FROM-CSV twin.
  *  - S6 JSONL replay (event_producer.py:23-63) — batch and streaming
  *    (file-source) forms of the same schema'd read; the streaming form
  *    feeds the Events.parse chain exactly like the Kafka source.
  */
object Sources {

  def jdbc(spark: SparkSession, url: String, table: String,
           user: String, password: String, driver: String = "org.postgresql.Driver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .option("driver", driver)
      .load()

  /** Partitioned JDBC scan — the form a 100 TB bronze ingest actually
    * needs: `numPartitions` concurrent range queries on an indexed
    * numeric column instead of one connection streaming the whole
    * table (the reference's single-reader `bronze_batch_load.py:45-53`
    * shape is the numPartitions=1 special case). Filters and column
    * pruning push into the generated SQL (`PushedFilters` on the scan
    * node), so a narrow filtered read ships narrow filtered rows.
    * End-to-end tested against embedded Derby in `JdbcSpec`. */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int, user: String, password: String,
                      driver: String = "org.postgresql.Driver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** JDBC write-back (serving-DB export tier). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                user: String, password: String, driver: String): Unit = {
    val props = new java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("driver", driver)
    df.write.mode("overwrite").jdbc(url, table, props)
  }

  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Streaming file source over a JSONL drop directory — the offline
    * twin of the Kafka replay producer. `maxFilesPerTrigger` bounds each
    * micro-batch the way Kafka's offset ranges do. */
  def jsonlStream(spark: SparkSession, dir: String, schema: StructType,
                  maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** ORC interchange tier: same columnar pushdown/pruning contract as
    * parquet (predicate pushdown, column pruning, vectorized read) for
    * pipelines whose upstream emits ORC. Write + read round-trip is
    * spec-pinned including pushed filters. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
