package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Scaling-sweep data generator: replicates the corpus tables of a
  * driver-provided scale factor k× into a local working directory, so
  * the heavy dedup/ANN/components tier can be measured at sf0.5/sf1.0
  * (the driver only ships sf ≤ 0.1) and the wall-time-vs-corpus-size
  * exponent FITTED instead of argued from plan shape.
  *
  * Replication model — k disjoint "shards" of the original corpus:
  *
  *  - `documents`: replica r keeps the text VERBATIM but suffixes every
  *    token with `~r` (replica 0 is byte-identical to the source).
  *    Token-remapping through a per-replica vocabulary makes replicas
  *    mutually disjoint at the gram/MinHash/SimHash level while
  *    preserving the intra-replica duplicate structure EXACTLY: every
  *    dup pair, gram df histogram, component and span of the original
  *    recurs once per replica, so total "semantic work" (candidate
  *    pairs, component edges, dup spans) scales ×k — the honest null
  *    model for measuring the ENGINE's exponent. Naive row duplication
  *    would instead make every doc a k-way exact dup and inflate pair
  *    counts ×k² BY CONSTRUCTION, drowning the engine signal in a
  *    workload artifact.
  *  - `embeddings`: replica r rotates each vector's dimensions by r
  *    positions (norm- and intra-replica-distance-preserving), so IVF
  *    partitions, PQ codebooks and top-k structure stay realistic while
  *    replicas don't collapse onto identical points.
  *  - ids offset by r · (max id + 1): dense, unique, order-preserving
  *    within a replica (q110/q117's lower-id-wins rule keeps its
  *    within-replica meaning).
  *  - every other table is copied verbatim (the heavy tier doesn't read
  *    them; copying keeps the directory a drop-in SPARK_GRAFT_SF_DIR).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <k>
  */
object ScaleUp {
  private def suffixTokens(text: org.apache.spark.sql.Column, r: Int) =
    concat_ws(" ", transform(Text.tokens(text), t => concat(t, lit(s"~$r"))))

  /** `sharedPct` (0-100) leaves that percentage of docs UNSUFFIXED in
    * every replica — k byte-identical copies of each such doc, all
    * sharing one vocabulary. This is the SKEW stress the plain
    * replication cannot produce: the shared subset's gram document
    * frequencies grow ×k and its candidate-pair mass grows ×k²
    * (C(k,2) per shared doc at minimum), concentrating LSH/band
    * buckets exactly the way a scrape-heavy near-dup core does at
    * production scale. The df caps and band-width bounds are what
    * must absorb it — SCALING.md §skew records the measurement. */
  def scaleDocuments(docs: DataFrame, k: Int, sharedPct: Int = 0): DataFrame = {
    val idStep = docs.agg(max("doc_id")).first().getLong(0) + 1
    val shared = pmod(col("doc_id"), lit(100)) < lit(sharedPct)
    (0 until k).map { r =>
      val text =
        if (r == 0) col("text")
        else when(shared, col("text")).otherwise(suffixTokens(col("text"), r))
      docs.select(
        (col("doc_id") + lit(r * idStep)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_ unionAll _)
  }

  /** Events replica model (r11 item 7's ScaleUp gap — events used to
    * copy VERBATIM, so q150's funnel would have "scaled" over constant
    * input and was excluded from the sweep): replica r offsets user_id
    * and event_id by r·(max+1), so every user's event stream — gaps,
    * ordering, type mix — recurs once per replica and the
    * sessionize/funnel/as-of tier does honest ×k work. `ts` stays in
    * its source physical layout untouched (Tables.events normalizes
    * at read; the replicator must not impose a layout the generator
    * didn't). */
  def scaleEvents(ev: DataFrame, k: Int): DataFrame = {
    val userStep = ev.agg(max("user_id")).first().getLong(0) + 1
    val eventStep = ev.agg(max("event_id")).first().getLong(0) + 1
    (0 until k).map { r =>
      ev.withColumn("user_id", col("user_id") + lit(r * userStep))
        .withColumn("event_id", col("event_id") + lit(r * eventStep))
    }.reduce(_ unionAll _)
  }

  def scaleEmbeddings(emb: DataFrame, k: Int): DataFrame = {
    val idStep = emb.agg(max("vec_id")).first().getLong(0) + 1
    (0 until k).map { r =>
      val e = col("embedding")
      val rot =
        if (r == 0) e
        else concat(slice(e, lit(r + 1), size(e) - r), slice(e, lit(1), lit(r)))
      emb.select(
        (col("vec_id") + lit(r * idStep)).as("vec_id"),
        rot.as("embedding"),
        col("label"))
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleUp <srcDir> <dstDir> <k> [sharedPct]")
    val Array(src, dst, kStr) = args.take(3)
    val k = kStr.toInt
    val sharedPct = if (args.length == 4) args(3).toInt else 0
    val spark: SparkSession = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    scaleDocuments(Tables.documents(spark, src), k, sharedPct)
      .repartition(8).write.mode("overwrite").parquet(s"$dst/documents.parquet")
    scaleEmbeddings(Tables.embeddings(spark, src), k)
      .repartition(4).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    // raw read (not Tables.events): replicas keep the source ts layout
    scaleEvents(spark.read.parquet(s"$src/events.parquet"), k)
      .repartition(4).write.mode("overwrite").parquet(s"$dst/events.parquet")
    val others = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem")
    others.foreach { t =>
      val from = java.nio.file.Paths.get(s"$src/$t.parquet")
      val to = java.nio.file.Paths.get(s"$dst/$t.parquet")
      if (java.nio.file.Files.exists(from))
        java.nio.file.Files.copy(from, to,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val nd = spark.read.parquet(s"$dst/documents.parquet").count()
    val ne = spark.read.parquet(s"$dst/embeddings.parquet").count()
    println(s"SCALEUP k=$k documents=$nd embeddings=$ne dst=$dst")
    spark.stop()
  }
}
