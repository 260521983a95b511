package graft

import java.nio.file.{Files, Paths, Path => JPath}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageTypeParser}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** The events.ts layout contract (VERDICT r8 item 5).
  *
  * The upstream generator has shipped `ts` in two physical layouts so
  * far — int64 timestamp[ns] (rounds 1-7) and timestamp[us] (round 8) —
  * and the engine must read whatever the footer declares, like the
  * reference does (`bronze_batch_load.py:65,111` infers schema per
  * file). `Tables.events` normalizes every layout to the engine-internal
  * epoch-nanos long at the read boundary; this suite pins that contract
  * by materializing the SAME events data in three layouts and asserting
  * (a) the normalized scan is identical and (b) the whole ts-arithmetic
  * query tier (sessionize / tumbling window / as-of / session window /
  * range join) resolves and agrees bit-for-bit on all of them.
  */
class EventsLayoutSpec extends SparkSpec {

  private val tsQueries = Seq(
    "q29_sessionize", "q40_tumbling_window", "q48_asof_join",
    "q49_asof_native", "q58_session_window", "q63_range_join")

  /** Copy every sf0.001 table file into a fresh dir, minus events. */
  private def cloneDir(tag: String): JPath = {
    val d = Files.createTempDirectory(s"events-layout-$tag")
    Files.list(Paths.get(sf)).forEach { p =>
      if (!p.getFileName.toString.startsWith("events"))
        Files.copy(p, d.resolve(p.getFileName))
    }
    d.toFile.deleteOnExit()
    d
  }

  /** Order-independent content checksum over all columns (decimal sum:
    * exact, and ANSI-safe where summing raw longs would overflow). */
  private def checksum(df: DataFrame): String =
    df.select(sum(xxhash64(df.columns.map(col): _*)
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
      .first().get(0).toString

  private lazy val reference: DataFrame = Tables.events(spark, sf)

  // Layout A: ts as timestamp[us] (TIMESTAMP_NTZ) — the round-8 layout.
  private lazy val microsDir: JPath = {
    val d = cloneDir("micros")
    reference
      .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast(TimestampNTZType))
      .coalesce(1)
      .write.parquet(d.resolve("events.parquet").toString)
    d
  }

  // Layout B: ts as a plain int64 of epoch-nanos (no logical type).
  private lazy val longDir: JPath = {
    val d = cloneDir("long")
    reference.coalesce(1).write.parquet(d.resolve("events.parquet").toString)
    d
  }

  // Layout C: ts as parquet TIMESTAMP(NANOS) — the rounds-1-7 layout,
  // unreachable from Spark's writer, so hand-written with parquet-java's
  // Group API. Read back under nanosAsLong it surfaces as long.
  private lazy val nanosDir: JPath = {
    val d = cloneDir("nanos")
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |  required int64 user_id;
        |  optional binary event_type (STRING);
        |  required double value;
        |  optional binary props (STRING);
        |}""".stripMargin)
    val out = new HPath(d.resolve("events.parquet").toString)
    val writer = ExampleParquetWriter.builder(out)
      .withType(schema)
      .withConf(new Configuration())
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(schema)
    reference.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect()
      .foreach { r =>
        val g = gf.newGroup()
          .append("event_id", r.getLong(0))
          .append("ts", r.getLong(1))
          .append("user_id", r.getLong(2))
          .append("value", r.getDouble(4))
        if (!r.isNullAt(3)) g.append("event_type", r.getString(3))
        if (!r.isNullAt(5)) g.append("props", r.getString(5))
        writer.write(g)
      }
    writer.close()
    d
  }

  private def layouts: Seq[(String, JPath)] =
    Seq("micros" -> microsDir, "long" -> longDir, "nanos" -> nanosDir)

  test("Tables.events normalizes every ts layout to identical epoch-nanos longs") {
    val refSum = checksum(reference)
    val refRows = reference.count()
    for ((tag, dir) <- layouts) {
      val got = Tables.events(spark, dir.toString)
      assert(got.schema("ts").dataType == LongType, s"layout $tag: ts not long")
      assert(got.count() == refRows, s"layout $tag: row count")
      assert(checksum(got) == refSum, s"layout $tag: content checksum")
    }
  }

  test("ts-arithmetic query tier resolves and agrees on all layouts") {
    for (q <- tsQueries) {
      val want = checksum(SparkEntry.queries(q)(spark, sf))
      for ((tag, dir) <- layouts) {
        val got = checksum(SparkEntry.queries(q)(spark, dir.toString))
        assert(got == want, s"$q differs on layout $tag")
      }
    }
  }

  test("embeddings.embedding normalizes array<double> parquet to the f32 contract") {
    val d = Files.createTempDirectory("emb-layout-f64")
    d.toFile.deleteOnExit()
    Files.list(Paths.get(sf)).forEach { p =>
      if (!p.getFileName.toString.startsWith("embeddings"))
        Files.copy(p, d.resolve(p.getFileName))
    }
    Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .coalesce(1)
      .write.parquet(d.resolve("embeddings.parquet").toString)
    val got = Tables.embeddings(spark, d.toString)
    assert(got.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true))
    // f32→f64→f32 is a lossless round trip, so the ANN tier must agree
    // bit-for-bit; q23 exercises the native f32 dot-product kernel
    val want = checksum(SparkEntry.queries("q23_cosine_topk")(spark, sf))
    assert(checksum(SparkEntry.queries("q23_cosine_topk")(spark, d.toString)) == want,
      "q23 differs on the float64 embedding layout")
  }
}
