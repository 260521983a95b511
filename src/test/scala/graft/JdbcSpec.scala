package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** S1 (JDBC bronze source, `bronze_batch_load.py:45-53`) end-to-end
  * against EMBEDDED DERBY — the JDBC engine already on Spark's
  * classpath for the Hive metastore — so the wiring is tested for
  * real, not just config-wrapped: scan, filter pushdown into the
  * generated SQL, partitioned parallel ingest, and write-back.
  * Postgres in production differs only by url + driver string. */
class JdbcSpec extends SparkSpec {

  private val Driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private lazy val dbUrl: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby_").toString
    System.setProperty("derby.system.home", dir)
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // quoted lowercase identifiers: Derby uppercases unquoted names,
      // and the Spark-side expectations are lowercase
      st.executeUpdate(
        """CREATE TABLE "seed" ("id" BIGINT NOT NULL, "name" VARCHAR(32), "bal" DOUBLE)""")
      val ins = conn.prepareStatement("""INSERT INTO "seed" VALUES (?, ?, ?)""")
      (0L until 100L).foreach { i =>
        ins.setLong(1, i); ins.setString(2, s"cust_$i"); ins.setDouble(3, i * 1.5)
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
    url
  }

  test("JDBC scan reads the table with schema and values intact") {
    val df = Sources.jdbc(spark, dbUrl, "\"seed\"", "app", "", Driver)
    assert(df.columns.toSeq === Seq("id", "name", "bal"))
    assert(df.count() === 100)
    val r = df.filter(col("id") === 7L).head()
    assert(r.getLong(0) === 7L && r.getString(1) === "cust_7" && r.getDouble(2) === 10.5)
  }

  test("filters push into the generated SQL, not a post-scan filter of the full table") {
    val df = Sources.jdbc(spark, dbUrl, "\"seed\"", "app", "", Driver)
      .filter(col("id") <= 9L).select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("9"),
      s"JDBC scan must carry the pushed filter:\n$plan")
    assert(df.count() === 10)
  }

  test("partitioned parallel ingest: numPartitions range queries, exactly-once rows") {
    val df = Sources.jdbcPartitioned(spark, dbUrl, "\"seed\"",
      partitionColumn = "\"id\"", lower = 0L, upper = 100L,
      numPartitions = 4, user = "app", password = "", driver = Driver)
    assert(df.rdd.getNumPartitions === 4,
      "partitioned read must open parallel range scans")
    // range predicates must tile: every row exactly once, none dropped
    assert(df.count() === 100)
    assert(df.agg(sum("id")).head().getLong(0) === (0L until 100L).sum)
  }

  test("write-back round-trip (serving-DB export tier)") {
    import spark.implicits._
    val out = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    Sources.writeJdbc(out, dbUrl, "export1", "app", "", Driver)
    val back = Sources.jdbc(spark, dbUrl, "export1", "app", "", Driver)
    assert(back.count() === 3)
    assert(back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("streaming gold -> JDBC dashboard snapshot: complete-mode aggregate lands per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    ms.addData(("p1", 2L), ("p2", 5L), ("p1", 3L))
    val agg = ms.toDF().toDF("product_id", "qty")
      .groupBy("product_id").agg(sum("qty").as("total_qty"))
    val q = agg.writeStream.outputMode("complete")
      .foreachBatch(graft.streaming.Events.jdbcSnapshotBatch(
        dbUrl, "dash1", "app", "", Driver) _)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // second wave: the snapshot overwrite must land the UPDATED totals,
    // not append to the old ones
    ms.addData(("p1", 10L))
    val q2 = agg.writeStream.outputMode("complete")
      .foreachBatch(graft.streaming.Events.jdbcSnapshotBatch(
        dbUrl, "dash1", "app", "", Driver) _)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val dash = Sources.jdbc(spark, dbUrl, "dash1", "app", "", Driver)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dash === Map("p1" -> 15L, "p2" -> 5L))
  }
}
