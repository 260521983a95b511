package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 connector (the extension tier the reference's
  * JDBC/Kafka sources belong to — unreachable in this zero-egress
  * sandbox, so the connector machinery is demonstrated on a
  * deterministic synthetic event generator instead):
  *
  *   spark.read.format("graft.sources.SynthSource")
  *     .option("rows", n).option("parts", p).load()
  *
  * Real connector behaviors, not stubs:
  *  - `planInputPartitions` splits the id range into `parts` disjoint
  *    slices — the parallelism contract a JDBC partitioned read or a
  *    Kafka topic would provide;
  *  - `SupportsPushDownRequiredColumns`: the reader materializes ONLY
  *    the pruned columns (verified in SourcesSpec by inspecting the
  *    BatchScan's output attributes) — the column-pruning handshake
  *    every serious connector implements;
  *  - `SupportsPushDownFilters`: range/equality predicates on `id`
  *    narrow the GENERATED id range, so partition planning and the
  *    readers never touch filtered-out rows (the WHERE-into-JDBC /
  *    offset-range-into-Kafka behavior); unsupported filters are
  *    returned to Spark for post-scan evaluation, accepted ones are
  *    NOT re-evaluated — exactly the V2 contract;
  *  - rows are a pure function of the row id, so any slice is
  *    reproducible on retry (idempotent re-read, the property Spark
  *    assumes of batch sources);
  *  - `toMicroBatchStream` (STREAMING read half, the shape of the
  *    reference's Kafka source): offsets are positions in the id range,
  *    admission control caps each micro-batch at `batchrows` ids
  *    (`maxOffsetsPerTrigger`), `planInputPartitions(start, end)` slices
  *    each offset range like the batch path, and restart resumes from
  *    the checkpointed offset — `spark.readStream.format(...)` with the
  *    same options.
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "4").toInt,
      properties.getOrDefault("batchrows", "250").toLong)
}

object SynthSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("ts", LongType, nullable = false)))

  val EventTypes: Array[String] = Array("view", "click", "cart", "purchase", "review")

  /** One synthetic cell, purely from (row id, column name). */
  def cell(id: Long, col: String): Any = col match {
    case "id" => id
    case "user_id" => id % 1000L
    case "event_type" => UTF8String.fromString(EventTypes((id % 5L).toInt))
    case "value" => (id % 10000L) / 100.0
    case "ts" => 1704067200000000000L + id * 1000000L
  }
}

private class SynthTable(rows: Long, parts: Int, batchRows: Long)
    extends Table with SupportsRead {
  // batchrows == 0 would make latestOffset(start, limit) return start
  // forever: the stream never advances toward the AvailableNow fixed
  // point and spins on empty batches — reject at the option boundary
  require(batchRows > 0, s"batchrows must be positive, got $batchRows")
  override def name(): String = s"synth($rows rows, $parts parts)"
  override def schema(): StructType = SynthSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts, batchRows)
}

private class SynthScanBuilder(rows: Long, parts: Int, batchRows: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = SynthSource.Schema
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  private def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  /** `x + 1` for the exclusive-bound conversions, or None on Long
    * overflow — an accepted filter is NOT re-evaluated by Spark, so a
    * wrapped bound would silently return wrong rows (`id <=
    * Long.MaxValue` wrapping hi to MinValue = empty scan where "all"
    * is correct). Overflowing filters are rejected back to Spark
    * instead, which evaluates them post-scan — always correct. */
  private def incExact(x: Long): Option[Long] =
    try Some(Math.addExact(x, 1L)) catch { case _: ArithmeticException => None }

  /** Accept id-range predicates by narrowing [lo, hi); everything else
    * goes back to Spark. `IsNotNull(id)` is trivially satisfied (the
    * column is non-nullable) so it is accepted as a no-op. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val rejected = filters.filterNot {
      case GreaterThan("id", v) => asLong(v).flatMap(incExact).exists { x1 => lo = math.max(lo, x1); true }
      case GreaterThanOrEqual("id", v) => asLong(v).exists { x => lo = math.max(lo, x); true }
      case LessThan("id", v) => asLong(v).exists { x => hi = math.min(hi, x); true }
      case LessThanOrEqual("id", v) => asLong(v).flatMap(incExact).exists { x1 => hi = math.min(hi, x1); true }
      case EqualTo("id", v) => asLong(v).flatMap(incExact).exists { x1 => lo = math.max(lo, x1 - 1); hi = math.min(hi, x1); true }
      case IsNotNull("id") => true
      case _ => false
    }
    accepted = filters.diff(rejected)
    rejected
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new SynthScan(math.max(lo, 0L), math.min(hi, rows), parts, batchRows, required)
}

private case class SynthSlice(start: Long, end: Long) extends InputPartition

private object SynthScan {
  /** Shared by the batch and streaming paths: [lo, hi) into ≤`parts`
    * disjoint contiguous slices. */
  def slices(lo: Long, hi: Long, parts: Int): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    val per = math.max(1L, (span + parts - 1) / parts)
    (lo until hi by per).map(s => SynthSlice(s, math.min(s + per, hi))).toArray
  }
}

private class SynthScan(lo: Long, hi: Long, parts: Int, batchRows: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthScan range=[$lo,$hi) parts=$parts ReadSchema=${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = SynthScan.slices(lo, hi, parts)

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, parts, batchRows, required.fieldNames)
}

/** Offset = next unread id. Serialized as the bare number into the
  * checkpoint's offset log, so a restarted query resumes exactly where
  * the last committed batch ended (pinned in SourcesSpec). */
private case class SynthOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** The streaming read half: the Kafka-source shape — monotone offsets,
  * per-trigger admission control (`batchrows` ≈ maxOffsetsPerTrigger),
  * offset ranges planned into the same partition slices as the batch
  * scan, and a reader that regenerates any slice idempotently (what
  * Kafka gets from the broker log, this source gets from determinism).
  * `commit` is a no-op: nothing to release — data is a pure function of
  * the id, the property that also makes replay-on-recovery exact. */
private class SynthMicroBatchStream(lo: Long, hi: Long, parts: Int, batchRows: Long,
                                    cols: Array[String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // AvailableNow contract: freeze the end bound at query start so the
  // run drains to a fixed point; this source's range is immutable per
  // query, so `hi` already IS that fixed point — nothing to capture.
  // Without this marker Spark falls back to single-batch Trigger.Once
  // and ignores the admission-control limit entirely.
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def initialOffset(): Offset = SynthOffset(lo)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled entry point")
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthOffset].pos
    limit match {
      case mr: ReadMaxRows => SynthOffset(math.min(hi, s + mr.maxRows()))
      case _ => SynthOffset(hi)
    }
  }
  override def reportLatestOffset(): Offset = SynthOffset(hi)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    SynthScan.slices(start.asInstanceOf[SynthOffset].pos,
      end.asInstanceOf[SynthOffset].pos, parts)
  override def createReaderFactory(): PartitionReaderFactory = new SynthReaderFactory(cols)
  override def deserializeOffset(json: String): Offset = SynthOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class SynthReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[SynthSlice]
    new PartitionReader[InternalRow] {
      private var id = slice.start - 1
      override def next(): Boolean = { id += 1; id < slice.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toIndexedSeq.map(c => SynthSource.cell(id, c)))
      override def close(): Unit = ()
    }
  }
}
