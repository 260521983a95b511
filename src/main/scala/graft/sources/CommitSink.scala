package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 connector surface ([[SynthSource]]
  * is the read half): a batch + streaming sink implementing the
  * TWO-PHASE COMMIT protocol every production connector (JDBC, Iceberg,
  * Kafka transactional) builds on —
  *
  *   task side:   each `DataWriter` writes its partition to a private
  *                temp file and returns a commit MESSAGE (path + row
  *                count); a failed/speculative task's `abort()` deletes
  *                only its own file;
  *   driver side: `BatchWrite.commit(messages)` publishes ONE manifest
  *                naming every task file (written temp-then-rename, the
  *                same atomic publish primitive as `AtomicTable`);
  *                `abort()` deletes all task files.
  *
  * Readers resolve manifests first, so a job is visible all-or-nothing:
  * no manifest ⇒ zero rows observed, however many task files were
  * written before the failure. Each job appends its own manifest —
  * concurrent writers cannot tear each other: manifests carry a random
  * UUID and task files are scoped by the job's `queryId`, so two
  * applications writing the same path never name the same file.
  *
  *   df.write.format("graft.sources.CommitSink")
  *     .option("path", dir).mode("append").save()
  *
  * The row codec is deliberately minimal (TSV of the supported atomic
  * types) — the PROTOCOL is the demonstration, and `SourcesSpec` pins
  * it: round-trip, append isolation, and all-or-nothing under an
  * injected task failure. At scale the codec would be parquet and the
  * manifest a catalog entry; the commit choreography is identical. */
class CommitSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException("CommitSink is write-only; schema comes from the dataframe")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CommitSinkTable(schema, properties.get("path"),
      Option(properties.get("failpartition")).map(_.toInt))
}

object CommitSink {
  /** Rows published by committed manifests only. Manifest resolution
    * goes through Hadoop `FileContext` (scheme-dispatched like
    * `AtomicTable`), so the read path works on any filesystem the
    * cluster mounts, not just `file:`. Tab-separated codec mirrors
    * [[CommitSinkWriter]]. */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String,
           schema: StructType): org.apache.spark.sql.DataFrame = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val ctx = org.apache.hadoop.fs.FileContext.getFileContext(
      dirPath.toUri, spark.sparkContext.hadoopConfiguration)
    val manifests =
      if (!ctx.util.exists(dirPath)) Array.empty[org.apache.hadoop.fs.Path]
      else ctx.util.listStatus(dirPath)
        .filter(_.getPath.getName.startsWith("manifest-")).map(_.getPath)
    val files = manifests.flatMap { m =>
      val in = ctx.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    }.filter(_.nonEmpty).toSeq
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).option("sep", "\t").csv(files: _*)
  }

  /** EPOCH publish for the streaming write half — the exactly-once
    * primitive: the manifest name is DETERMINISTIC per (queryId,
    * epochId), so a replayed epoch (driver restart re-running a batch
    * whose commit landed but whose offset-log entry didn't) targets the
    * SAME manifest and exactly one publisher can win it. The winner is
    * decided by a hard LINK of the synced temp onto the target — unlike
    * rename(2), which ATOMIC_MOVE maps to on POSIX and which silently
    * REPLACES an existing target, link(2) fails with EEXIST, so two
    * racing publishers (zombie old driver + restarted driver) cannot
    * both "succeed" with one manifest silently overwritten (the same
    * O_EXCL discipline as `AtomicTable.claimExclusive`). Returns true
    * iff THIS call published; on false the caller deletes its freshly
    * written (duplicate) task files — the committed manifest keeps
    * naming the originals. Durability matches the batch path: the temp
    * is written with SYNC before it becomes linkable.
    *
    * LOCAL-FILESYSTEM ONLY: this publish half (and the batch commit)
    * use java.nio, whose link/ATOMIC_MOVE guarantees exist only on a
    * local POSIX mount — deliberate asymmetry with `read()`, which
    * goes through Hadoop FileContext and works on any filesystem. A
    * distributed deployment would route publish through FileContext
    * CREATE-no-overwrite + rename (the `AtomicTable.commitPointer`
    * recipe); kept nio here because the exclusive-link fencing this
    * sink demonstrates has no FileContext equivalent. */
  def publishEpoch(path: String, queryId: String, epochId: Long,
                   taskFiles: Seq[String]): Boolean = {
    val target = java.nio.file.Paths.get(path, s"manifest-$queryId-$epochId")
    if (java.nio.file.Files.exists(target)) return false // fast path; the link is the real gate
    val tmp = java.nio.file.Paths.get(path,
      s".manifest-$queryId-$epochId.tmp.${java.util.UUID.randomUUID()}")
    java.nio.file.Files.createDirectories(tmp.getParent)
    java.nio.file.Files.write(tmp, taskFiles.mkString("\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.SYNC)
    def cleanupTmp(): Unit = // best-effort: NEVER after-the-fact fail a
      try java.nio.file.Files.deleteIfExists(tmp) // publish that already landed
      catch { case _: java.io.IOException => () }
    try {
      java.nio.file.Files.createLink(target, tmp)
      cleanupTmp()
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        cleanupTmp(); false
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
        // mount without hard links (vfat/some FUSE): fall back to the
        // rename publish — atomic but not exclusive (rename(2) silently
        // replaces), so the fast-path exists() above is the only replay
        // guard there; acceptable on a degraded fs, and both branches
        // still publish fully-synced bytes
        try {
          java.nio.file.Files.move(tmp, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException =>
          cleanupTmp(); false }
    }
  }
}

private class CommitSinkTable(schema0: StructType, path: String, failPartition: Option[Int])
    extends Table with SupportsWrite {
  override def name(): String = s"commit_sink($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new Write {
      override def toBatch: BatchWrite =
        new CommitSinkBatchWrite(info.schema(), path, info.queryId(), failPartition)
      override def toStreaming: StreamingWrite =
        new CommitSinkStreamingWrite(info.schema(), path, info.queryId(), failPartition)
    }
  }
}

private case class TaskFile(path: String, rows: Long) extends WriterCommitMessage

private class CommitSinkBatchWrite(schema: StructType, path: String, queryId: String,
                                   failPartition: Option[Int])
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CommitSinkWriterFactory(schema, path, queryId, failPartition)
  // the ONLY publish point: one manifest names every task file, written
  // temp-synced-then-atomic-rename (the same durability order as
  // AtomicTable.commitPointer: a crash after commit() returns must not
  // lose the manifest while the task files it names survive)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val body = messages.collect { case TaskFile(p, _) => p }.mkString("\n")
    val id = java.util.UUID.randomUUID().toString
    val tmp = java.nio.file.Paths.get(path, s".manifest-$id.tmp")
    java.nio.file.Files.createDirectories(tmp.getParent)
    java.nio.file.Files.write(tmp, body.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.SYNC)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path, s"manifest-$id"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TaskFile(p, _) => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))
      case _ => ()
    }
}

/** Streaming half of the two-phase commit: same task-side choreography
  * (private epoch-scoped temp file + commit message), but the driver
  * publishes via [[CommitSink.publishEpoch]] — deterministic manifest
  * per epoch, so Spark's replay-after-restart of an already-committed
  * epoch is absorbed idempotently (the duplicate task files are
  * deleted, the original manifest stands). This is the sink-side
  * exactly-once contract the reference's Kafka→bronze flow leans on
  * its parquet sink for (streaming_flow.py:122-131). */
private class CommitSinkStreamingWrite(schema: StructType, path: String, queryId: String,
                                       failPartition: Option[Int])
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new CommitSinkStreamingWriterFactory(schema, path, queryId, failPartition)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case TaskFile(p, _) => p }.toSeq
    if (!CommitSink.publishEpoch(path, queryId, epochId, files))
      files.foreach(f => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f)))
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TaskFile(p, _) => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))
      case _ => ()
    }
}

private class CommitSinkStreamingWriterFactory(schema: StructType, path: String,
                                               queryId: String, failPartition: Option[Int])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new CommitSinkWriter(schema, path, s"$queryId-$epochId", partitionId, taskId, failPartition)
}

private class CommitSinkWriterFactory(schema: StructType, path: String, queryId: String,
                                      failPartition: Option[Int])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CommitSinkWriter(schema, path, queryId, partitionId, taskId, failPartition)
}

private class CommitSinkWriter(schema: StructType, path: String, queryId: String,
                               partitionId: Int, taskId: Long, failPartition: Option[Int])
    extends DataWriter[InternalRow] {
  // three name scopes, all load-bearing: queryId so concurrent
  // applications cannot collide; (partitionId, taskId) for
  // debuggability; and a per-ATTEMPT random token because neither is
  // unique across a driver restart — a replayed streaming epoch reuses
  // the same queryId/epoch/partition ids AND a fresh SparkContext
  // restarts taskId at 0, so a name built only from those would
  // TRUNCATE the committed epoch's files and then delete them when the
  // replay's publish loses. The committed manifest tracks full paths,
  // so unique names cost nothing.
  private val file = java.nio.file.Paths.get(path,
    s"task-$queryId-$partitionId-$taskId-${java.util.UUID.randomUUID().toString.take(8)}.tsv")
  java.nio.file.Files.createDirectories(file.getParent)
  private val out = java.nio.file.Files.newBufferedWriter(file,
    java.nio.file.StandardOpenOption.CREATE_NEW,
    java.nio.file.StandardOpenOption.WRITE)
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    if (failPartition.contains(partitionId))
      throw new RuntimeException(s"injected failure in partition $partitionId")
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) ""
      else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case StringType => row.getUTF8String(i).toString
        case dt => throw new UnsupportedOperationException(s"codec: $dt")
      }
    }
    out.write(cells.mkString("\t")); out.write("\n"); n += 1
  }

  // task-side commit: durable file + message; nothing is visible until
  // the driver's manifest lands
  override def commit(): WriterCommitMessage = { out.close(); TaskFile(file.toString, n) }
  override def abort(): Unit = { out.close(); java.nio.file.Files.deleteIfExists(file) }
  override def close(): Unit = ()
}
