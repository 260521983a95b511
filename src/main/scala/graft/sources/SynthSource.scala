package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
  *  - rows are a pure function of the row id, so any slice is
  *    reproducible on retry (idempotent re-read, the property Spark
  *    assumes of batch sources).
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "4").toInt)
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

private class SynthTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"synth($rows rows, $parts parts)"
  override def schema(): StructType = SynthSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

private class SynthScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SynthSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SynthScan(rows, parts, required)
}

private case class SynthSlice(start: Long, end: Long) extends InputPartition

private class SynthScan(rows: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthScan rows=$rows parts=$parts ReadSchema=${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0L until rows by per).map(s => SynthSlice(s, math.min(s + per, rows))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
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
