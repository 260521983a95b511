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
  *  - relational tables (orders/lineitem/customer/part/supplier):
  *    k disjoint copies with foreign keys offset alongside their
  *    parents ([[scaleRelational]], round 13) — the lineitem
  *    co-purchase graph and the orders tier recur once per replica,
  *    so the graph-mining queries do honest ×k work.
  *  - nation/region copied verbatim (bounded dimension tables — 25/5
  *    rows at ANY corpus scale; replicating them would misstate the
  *    workload, and c_nationkey/s_nationkey keep referencing them).
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
  def scaleEvents(ev: DataFrame, k: Int,
                  userStepOverride: Option[Long] = None): DataFrame = {
    // userStepOverride (round 13): scaleRelational's shared customer
    // step, so events.user_id and c_custkey/o_custkey offset in
    // lockstep and cross-table joins stay within-replica consistent
    // across the whole scaled directory.
    val userStep = userStepOverride.getOrElse(
      ev.agg(max("user_id")).first().getLong(0) + 1)
    val eventStep = ev.agg(max("event_id")).first().getLong(0) + 1
    (0 until k).map { r =>
      ev.withColumn("user_id", col("user_id") + lit(r * userStep))
        .withColumn("event_id", col("event_id") + lit(r * eventStep))
    }.reduce(_ unionAll _)
  }

  /** Relational (orders/lineitem/customer/part/supplier) replica model
    * (r12 verdict item 1 — these tables used to copy VERBATIM, so the
    * lineitem co-purchase graph tier q177/q184/q188/q190/q206/q217 and
    * the orders tier q216/q218 had NO honest scaling rows): replica r
    * offsets every key by r·(max key + 1) — o_orderkey, l_orderkey,
    * p_partkey, s_suppkey each with their own step, and customer keys
    * with a step SHARED with [[scaleEvents]]'s user step
    * (max(user_id, c_custkey) + 1), so events.user_id ↔ c_custkey ↔
    * o_custkey joins stay consistent within a replica across the whole
    * directory. Foreign keys are offset with their parents, so each
    * replica is a complete, disjoint copy of the original relational
    * universe: the co-purchase graph recurs once per replica — degrees,
    * triangles, cores, and hop structure preserved exactly, total graph
    * work ×k, never the ×k² a naive row duplication would inject.
    * Nation/region stay verbatim (bounded dims; c_nationkey/s_nationkey
    * keep referencing them).
    *
    * Customer NAMES get the [[scaleDocuments]] vocabulary treatment:
    * replica r > 0 appends "~rr" (digit doubled) so intra-replica edit
    * distances are untouched (common suffix) while any cross-replica
    * pair differs in ≥ 2 positions — q189's ED ≤ 1 fuzzy join finds
    * exactly k copies of the original pair set, never a cross-replica
    * artifact pair. */
  def scaleRelational(spark: SparkSession, src: String, dst: String, k: Int): Unit = {
    val cust = spark.read.parquet(s"$src/customer.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val part = spark.read.parquet(s"$src/part.parquet")
    val supp = spark.read.parquet(s"$src/supplier.parquet")
    val ev = spark.read.parquet(s"$src/events.parquet")
    val custStep = math.max(
      cust.agg(max("c_custkey")).first().getLong(0),
      ev.agg(max("user_id")).first().getLong(0)) + 1
    val orderStep = ord.agg(max("o_orderkey")).first().getLong(0) + 1
    val partStep = part.agg(max("p_partkey")).first().getLong(0) + 1
    val suppStep = supp.agg(max("s_suppkey")).first().getLong(0) + 1
    def reps(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(r => f(df, r)).reduce(_ unionAll _)
    // pairwise edit distance between any two replica suffixes must
    // exceed the LARGEST fuzzy-join radius in the suite (ED ≤ 2,
    // q238), or same-base names couple across replicas and the pair
    // mass grows ×k² by construction — measured: the 2-char "~rr"
    // suffix put cross-replica same-name pairs at exactly ED 2 and
    // q238's sf0.5 wall jumped 6.5× on 5× data. Three repeated digits
    // ⇒ replica-vs-replica = 3 substitutions, base-vs-replica = 4
    // insertions: both radii stay replica-local.
    val nameSuffix = (r: Int) => lit(s"~$r$r$r")
    reps(cust) { (c, r) =>
      c.withColumn("c_custkey", col("c_custkey") + lit(r * custStep))
        .withColumn("c_name",
          if (r == 0) col("c_name") else concat(col("c_name"), nameSuffix(r)))
    }.repartition(4).write.mode("overwrite").parquet(s"$dst/customer.parquet")
    reps(ord) { (o, r) =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(r * orderStep))
        .withColumn("o_custkey", col("o_custkey") + lit(r * custStep))
    }.repartition(4).write.mode("overwrite").parquet(s"$dst/orders.parquet")
    reps(li) { (l, r) =>
      l.withColumn("l_orderkey", col("l_orderkey") + lit(r * orderStep))
        .withColumn("l_partkey", col("l_partkey") + lit(r * partStep))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * suppStep))
    }.repartition(8).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    reps(part) { (p, r) =>
      p.withColumn("p_partkey", col("p_partkey") + lit(r * partStep))
    }.repartition(4).write.mode("overwrite").parquet(s"$dst/part.parquet")
    reps(supp) { (sp, r) =>
      sp.withColumn("s_suppkey", col("s_suppkey") + lit(r * suppStep))
    }.repartition(4).write.mode("overwrite").parquet(s"$dst/supplier.parquet")
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
    // raw read (not Tables.events): replicas keep the source ts layout.
    // The user step is SHARED with scaleRelational's customer step so
    // user_id ↔ c_custkey ↔ o_custkey joins stay within-replica.
    val ev = spark.read.parquet(s"$src/events.parquet")
    val sharedUserStep = math.max(
      spark.read.parquet(s"$src/customer.parquet")
        .agg(max("c_custkey")).first().getLong(0),
      ev.agg(max("user_id")).first().getLong(0)) + 1
    scaleEvents(ev, k, Some(sharedUserStep))
      .repartition(4).write.mode("overwrite").parquet(s"$dst/events.parquet")
    scaleRelational(spark, src, dst, k)
    val others = Seq("region", "nation")
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
