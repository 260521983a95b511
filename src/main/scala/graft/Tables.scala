package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table registry over the driver-generated parquet star schema
  * (`/root/testdata/sf*`). Mirrors the reference's source layer
  * (reference `scripts/database/load_tables.py:23-75` defines the OLTP
  * tables; here the stand-ins are the TPC-H-ish tables from TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` scans so Catalyst predicate
  * pushdown / column pruning reach the parquet footers — at 100 TB these
  * scans are the dominant cost and must stay prunable.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** Events, with `ts` normalized to epoch-nanos long regardless of how
    * the producer wrote it. The engine-internal contract is int64
    * epoch-nanos (exact ordering/diff arithmetic, oracle-comparable via
    * DuckDB's `epoch_ns`), but the incoming parquet layout is not ours
    * to dictate: generators have shipped `ts` both as physical
    * timestamp[ns] (read as long under `legacy.parquet.nanosAsLong`)
    * and as timestamp[us] (read as TIMESTAMP_NTZ). The reference reads
    * whatever schema the footer declares (`bronze_batch_load.py:65,111`)
    * and so must we — a hard-coded layout assumption breaks the whole
    * session-window/as-of/range-join tier when the upstream writer
    * changes. Normalizing at the single read boundary keeps every
    * downstream plan layout-agnostic at zero cost (a scan-local
    * projection, fused into whole-stage codegen; pushdown on the other
    * columns is unaffected).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampType | TimestampNTZType =>
        // µs-precision timestamp → exact ns long. unix_micros needs
        // TimestampType; NTZ→TZ cast is identity ONLY under a UTC
        // session timezone (Sessions.scala sets it) — on any other
        // session the cast would silently shift every ts by the local
        // offset, so fail loudly instead of corrupting the column.
        val tz = s.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts timestamp→nanos normalization requires spark.sql.session.timeZone=UTC " +
            s"(got '$tz'); build the session via graft.Sessions or set the conf")
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported physical type $other (expected int64 epoch-nanos or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")

  /** Embeddings, with `embedding` normalized to `array<float>` — the
    * same footer-driven robustness as [[events]]: the ANN tier's native
    * kernel (`plans.DotProductF32`) and every cosine plan assume f32,
    * and a generator switching to float64 parquet must not break them.
    * A float64→float32 cast of values that ARE f32 (the usual case — a
    * writer that widened on output) is lossless; genuinely-f64
    * embeddings quantize to the engine's documented f32 contract, which
    * is what an ANN index does anyway. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case ArrayType(DoubleType, _) =>
        raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other =>
        throw new IllegalArgumentException(
          s"embeddings.embedding: unsupported type $other (expected array<float> or array<double>)")
    }
  }

  /** The BI / ad-hoc SQL seam (SURVEY §3.3's 4th entry point — the
    * reference exposes the lakehouse to Dremio/Superset as named
    * tables): register every corpus table as a session temp view under
    * its canonical name, normalization included (events.ts always
    * lands as epoch-nanos, embeddings as array<float>), so
    * `spark.sql(<analyst text>)` runs verbatim against the same
    * relations every programmatic query reads. Idempotent per session
    * (createOrReplaceTempView). */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region" -> region _, "nation" -> nation _, "customer" -> customer _,
      "supplier" -> supplier _, "part" -> part _, "orders" -> orders _,
      "lineitem" -> lineitem _, "events" -> events _,
      "documents" -> documents _, "embeddings" -> embeddings _)
      .foreach { case (name, f) =>
        val p = new java.io.File(s"$d/$name.parquet")
        if (p.exists()) f(s, d).createOrReplaceTempView(name)
      }
  }
}

/** Column helpers shared by every query.
  *
  * The central trick: money/measure aggregates go through
  * `DECIMAL(18,2)` sums and are cast back to `DOUBLE` at the end.
  * Decimal addition is exact and order-independent, so Spark (whatever
  * partial/final aggregation order AQE picks) and the DuckDB oracle
  * produce bit-identical doubles — plain `sum(double)` would differ in
  * the last ulp depending on reduction order and break hash comparison.
  */
object Cols {
  private val Money: DecimalType = DecimalType(18, 2)

  /** Exact, order-independent sum of a 2-decimal measure, as double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact sum of a product of two 2-decimal measures, as double. */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(Money) * b.cast(Money)).cast(DoubleType)

  /** Deterministic average: exact decimal sum, then ONE double division
    * (identical in Spark and DuckDB given identical operands). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** The events table's `ts` is int64 epoch-nanos (see Sessions —
    * Spark 4 reads ns parquet timestamps as long under
    * `legacy.parquet.nanosAsLong`). This converts to a microsecond
    * TimestampType column when calendar arithmetic is needed; keep the
    * raw long for ordering/diff arithmetic (exact, oracle-friendly).
    *
    * The ns→µs division goes through DECIMAL: Spark's `/` on longs is
    * DOUBLE division, and epoch-nanos (~1.7e18) exceed double's 2⁵³
    * exact-integer range, so `(c / 1000).cast(long)` lands ±1 µs off
    * the true value (observed — it broke q58's session bounds; q40
    * only survived because whole-hour buckets absorb it). Decimal
    * division is exact and the long cast truncates. */
  def nanosToTimestamp(c: Column): Column =
    timestamp_micros((c.cast(DecimalType(38, 0)) / 1000L).cast(LongType))
}
