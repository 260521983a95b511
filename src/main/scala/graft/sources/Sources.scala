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
