package graft.operators

import org.apache.hadoop.fs.{FileContext, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INCREMENTAL entity resolution — q228's block → match → canonicalize
  * pipeline maintained under customer ARRIVALS without re-matching the
  * accumulated base against itself (the q180 contracted-label
  * discipline applied to the record-linkage tier), and — since r14 —
  * without REWRITING the accumulated state either:
  *
  *  - per batch, ED ≤ 1 match edges are generated only for pairs
  *    TOUCHING an arrival: the arrivals' deletion variants probe the
  *    union's variants through the same (block, variant, position)
  *    FastSS equi-joins as [[graft.functions.FuzzyJoin]] — the probe
  *    side is |batch|·L rows, never |base|·L (at 100 TB the standing
  *    side would be a bucketed persisted index, the q148 treatment;
  *    here it is recomputed map-only from the base scan);
  *  - new edges contract through the STANDING labels (arrivals label
  *    themselves), and a second CC runs over the contracted label
  *    graph only — bounded by touched components, not customers;
  *  - COMMITS ARE APPEND-ONLY (the lshDedupGateBatch dynamic-partition
  *    discipline): the batch's arrivals land as their own
  *    `_er_batch=<id>/` partition of the base table, and the labels
  *    table receives only the batch's DELTA — assignments that are new
  *    (the arrivals) or CHANGED (vertices of touched components whose
  *    canonical id moved) — as its own `_er_batch=<id>/` partition.
  *    Per-batch commit bytes are O(batch + touched), independent of
  *    standing-base size; B batches cost O(N) total write I/O, not
  *    O(B·N) as the pre-r14 full-rewrite commit did.
  *
  * Commit protocol: both partition writes are dynamic partition
  * overwrites of the batch's OWN partition (idempotent under replay),
  * and the commit point is an empty `_er_commit_<id>` marker created in
  * the labels dir AFTER both writes land. Readers resolve the highest
  * marker first and filter both tables to `_er_batch <=` that id, so a
  * writer that dies mid-partition leaves files no reader ever serves;
  * the replay overwrites them. Batch ids must be monotone (Structured
  * Streaming's foreachBatch contract), so marker-max implies every
  * partition at-or-below it is committed.
  *
  * Serving folds the label deltas latest-per-vertex (one window over
  * the labels table — O(assignments + deltas) read, the standard
  * base ⟕ delta merge-on-read). Read amplification grows with the
  * delta count until a compaction folds them — the same OPTIMIZE
  * discipline as [[graft.pipeline.AtomicTable.compact]]; the COMMIT
  * path never pays it.
  *
  * Labels are min-custkey canonical ids, and min-of-mins is the global
  * min, so the cross-batch fold reproduces EXACTLY the one-shot q228
  * fixpoint — q239 gates the 3-batch fold against q228's recursive-CTE
  * oracle verbatim.
  */
object IncrementalEr {

  private val BatchCol = "_er_batch"
  private val MarkerPrefix = "_er_commit_"

  private def baseDir(dir: String) = s"$dir/base"
  private def labelsDir(dir: String) = s"$dir/labels"

  private def fc(spark: SparkSession, dir: String): FileContext =
    FileContext.getFileContext(new Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)

  /** Highest committed batch id, if any batch has committed. */
  def lastCommitted(spark: SparkSession, dir: String): Option[Long] = {
    val ctx = fc(spark, dir)
    val p = new Path(labelsDir(dir))
    if (!ctx.util.exists(p)) None
    else {
      val ids = ctx.util.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(MarkerPrefix))
        .map(_.stripPrefix(MarkerPrefix).toLong)
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  private def touchMarker(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val nio = java.nio.file.Paths.get(
      new Path(labelsDir(dir), s"$MarkerPrefix$batchId").toUri.getPath)
    java.nio.file.Files.createDirectories(nio.getParent)
    try java.nio.file.Files.createFile(nio)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  /** Committed label assignments, one row per vertex: the latest delta
    * row per v across committed partitions (merge-on-read). A latest
    * row with NULL component is a [[forget]] tombstone — the vertex is
    * no longer assigned and drops out here. */
  private def currentLabels(spark: SparkSession, dir: String,
                            upTo: Long): DataFrame = {
    val w = Window.partitionBy("v").orderBy(col(BatchCol).desc)
    spark.read.parquet(labelsDir(dir))
      .filter(col(BatchCol) <= upTo)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("component").isNotNull)
      .select(col("v"), col("component"))
  }

  /** Deletion variants of `name` with position, custkey attached:
    * (blk, k, w, g_pos, g_var). */
  private def dels(df: DataFrame): DataFrame =
    df.select(col("blk"), col("k"), col("w"), posexplode(
      transform(sequence(lit(1), length(col("w"))), i =>
        concat(col("w").substr(lit(1), i - 1),
          col("w").substr(i + 1, length(col("w")) - i)))))
      .toDF("blk", "k", "w", "g_pos", "g_var")

  /** ED ≤ 1 custkey match edges (ka < kb) with ≥ one side in
    * `arrivals`; `union` must contain the arrivals. Includes lev = 0
    * (exact-name) pairs — entity resolution links same-name records
    * the strictly-unequal fuzzy kernel skips. */
  private[graft] def edgesTouching(arrivals: DataFrame,
                                   union: DataFrame): DataFrame = {
    // merge hints on every variant-carrying join side: the standing
    // union's deletion-variant relation is O(|base|·L) rows but
    // Catalyst's static estimate sees only the pre-explode scan, so
    // past the broadcast threshold's blind spot it would build the
    // whole thing as a broadcast table (the FuzzyJoin r14 lesson —
    // measured OOM on the ED ≤ 2 kernel at 20× names)
    val dA = dels(arrivals).hint("shuffle_merge")
    val dU = dels(union).hint("shuffle_merge")
    // substitutions: same (block, variant, position), ≥1 arrival side
    val subs = dA.select(col("blk"), col("k").as("ka"), col("w").as("wa"),
        col("g_pos"), col("g_var"))
      .join(dU.select(col("blk"), col("k").as("kb"), col("w").as("wb"),
        col("g_pos"), col("g_var")), Seq("blk", "g_var", "g_pos"))
      .select(col("ka"), col("wa"), col("kb"), col("wb"))
    // insert/delete: arrival-longer (its deletion IS a union string)
    // and arrival-shorter (a union deletion IS the arrival string)
    val longSide = dA.select(col("blk"), col("k").as("ka"),
        col("w").as("wa"), col("g_var"))
      .join(union.select(col("blk").as("g_b"), col("k").as("kb"),
        col("w").as("wb")).hint("shuffle_merge"),
        col("blk") === col("g_b") && col("g_var") === col("wb"))
      .select(col("ka"), col("wa"), col("kb"), col("wb"))
    val shortSide = dU.select(col("blk"), col("k").as("ka"),
        col("w").as("wa"), col("g_var"))
      .join(arrivals.select(col("blk").as("g_b"), col("k").as("kb"),
        col("w").as("wb")).hint("shuffle_merge"),
        col("blk") === col("g_b") && col("g_var") === col("wb"))
      .select(col("ka"), col("wa"), col("kb"), col("wb"))
    // exact-name twins (lev = 0)
    val exact = arrivals.select(col("blk"), col("w"), col("k").as("ka"),
        col("w").as("wa"))
      .join(union.select(col("blk"), col("w"), col("k").as("kb"),
        col("w").as("wb")), Seq("blk", "w"))
      .select(col("ka"), col("wa"), col("kb"), col("wb"))
    subs.unionAll(longSide).unionAll(shortSide).unionAll(exact)
      .filter(col("ka") =!= col("kb") &&
        graft.plans.NativeExpressions.withinEd1(col("wa"), col("wb")))
      .select(least(col("ka"), col("kb")).as("ea"),
        greatest(col("ka"), col("kb")).as("eb"))
      .distinct()
  }

  /** Fold one batch of NEW customers (c_custkey, c_name, c_nationkey)
    * into the standing base + labels. Commit cost is O(batch + touched
    * components) — the standing tables are read, never rewritten. */
  def maintainBatch(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val last = lastCommitted(spark, dir)
    if (last.exists(_ >= batchId)) return
    val arrivals = batch.select(col("c_custkey").cast("long").as("k"),
      col("c_name").as("w"), col("c_nationkey").as("blk"))
      .filter(col("w").isNotNull && col("blk").isNotNull).distinct()
    // standing state restricted to COMMITTED partitions: a crashed
    // prior attempt's partial partition (> last marker) is invisible
    // here and overwritten below
    val standingBase = last.map(up =>
      spark.read.parquet(baseDir(dir))
        .filter(col(BatchCol) <= up).select(col("blk"), col("k"), col("w")))
    val standingLabels = last.map(up => currentLabels(spark, dir, up))
    val union = standingBase.map(_.unionByName(arrivals)).getOrElse(arrivals)
    val newEdges = edgesTouching(arrivals, union)
    // current labels: standing ∪ self-labeled arrivals. GENUINELY-new
    // arrivals only on the self-label side: a re-observed custkey (a
    // record re-sent in a later batch) must keep its standing label,
    // not gain a second conflicting self-row — the anti-join is
    // O(batch) against the standing label read this fold already does
    val selfLabels = standingLabels match {
      case None => arrivals.select(col("k").as("v"), col("k").as("component"))
      case Some(prev) => arrivals.select(col("k").as("v"))
        .join(prev.select(col("v")), Seq("v"), "left_anti")
        .select(col("v"), col("v").as("component"))
    }
    val labels0 = standingLabels
      .map(_.unionByName(selfLabels)).getOrElse(selfLabels)
    // contract new edges through the current labels; CC over the label
    // graph only (touched components), then compose
    val contracted = newEdges
      .join(labels0.select(col("v").as("ea"), col("component").as("la")), Seq("ea"))
      .join(labels0.select(col("v").as("eb"), col("component").as("lb")), Seq("eb"))
      .filter(col("la") =!= col("lb"))
      .select(col("la").as("a"), col("lb").as("b")).distinct()
    val touched = contracted.select(col("a").as("component"))
      .unionAll(contracted.select(col("b").as("component"))).distinct()
    // an edge-free batch (no arrival matches anything) merges nothing —
    // and Components refuses empty relations (its convergence probe has
    // no fixpoint to find), so short-circuit the contraction
    val composed = if (contracted.isEmpty) labels0
      else {
        val merged = Components.connectedComponents(contracted, touched)
        labels0
          .join(merged.select(col("v").as("component"),
            col("component").as("g_new")), Seq("component"), "left")
          .select(col("v"),
            coalesce(col("g_new"), col("component")).as("component"))
      }
    // LABEL DELTA: assignments that are new (arrivals) or changed
    // (touched-component members whose canonical id moved) — the only
    // rows this batch commits
    val delta = standingLabels match {
      case None => composed
      case Some(prev) => composed
        .join(prev.select(col("v"), col("component").as("g_prev")),
          Seq("v"), "left")
        .filter(col("g_prev").isNull || col("g_prev") =!= col("component"))
        .select(col("v"), col("component"))
    }
    // append-only commits: each batch overwrites exactly its own
    // partition (replay-idempotent), marker creation is the commit point
    arrivals.withColumn(BatchCol, lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol).parquet(baseDir(dir))
    delta.withColumn(BatchCol, lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol).parquet(labelsDir(dir))
    touchMarker(spark, dir, batchId)
  }

  /** Right-to-be-forgotten on the ER artifact (the [[graft.functions
    * .TextIndex.forget]] / q164 compliance treatment for the
    * record-linkage tier): every record in `ids` disappears from the
    * base AND from the served assignment, and — the part plain
    * deletion gets wrong — the forgotten records' CLUSTERS are
    * recomputed over their remaining members, because removing a
    * vertex can both move a cluster's canonical id (the min custkey
    * may be the forgotten one) and SPLIT the cluster (the forgotten
    * record may be the only ED ≤ 1 bridge between two name groups).
    *
    * Cost is bounded by the forgotten records' components, never the
    * corpus: membership comes from one standing-label read, the
    * re-match runs the FastSS kernel over member rows only, and the
    * commits are the same append-only discipline as [[maintainBatch]]
    * — one label-delta partition (new member assignments + NULL
    * tombstones for the forgotten ids) plus a dynamic-partition
    * rewrite of exactly the base partitions holding a forgotten row
    * (a partition rewritten to empty is dropped). Both writes
    * localCheckpoint first: they read the same files they replace,
    * and cutting the lineage is what makes the self-overwrite safe.
    *
    * `batchId` continues the table's single monotone commit sequence
    * (same replay guard as maintainBatch); with a live stream, route
    * forgets through the stream or pause it — the usual serialize-
    * arrivals-per-table contract. Idempotent under replay AND under
    * crash-between-the-two-writes: the no-op test is membership in
    * the standing LABELS (still present until the delta commits), so
    * a retry after a completed base rewrite still commits the label
    * delta. A forgotten id later RE-ARRIVING via maintainBatch is a
    * genuinely new record (tombstones drop out of the standing read,
    * so it self-labels and matches fresh). */
  def forget(spark: SparkSession, dir: String, ids: DataFrame,
             batchId: Long): Unit = {
    val last = lastCommitted(spark, dir).getOrElse(return)
    if (last >= batchId) return
    val del = ids.select(col(ids.columns.head).cast("long").as("k")).distinct()
    val labels = currentLabels(spark, dir, last)
    val affectedIds = labels.join(del.select(col("k").as("v")), Seq("v"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (affectedIds.isEmpty) { affectedIds.unpersist(); return }
    val base0 = spark.read.parquet(baseDir(dir)).filter(col(BatchCol) <= last)
    // base partitions holding a forgotten row, rewritten without it
    val touchedParts = base0.join(del, Seq("k"), "left_semi")
      .select(col(BatchCol)).distinct()
    val rewritten = base0.join(touchedParts, Seq(BatchCol), "left_semi")
      .join(del, Seq("k"), "left_anti")
      .select(col("blk"), col("k"), col("w"), col(BatchCol))
      .localCheckpoint()
    // clusters touching a forgotten id: relabel their REMAINING
    // members from scratch — re-match (FastSS over members only) + CC
    val affected = affectedIds.select(col("component")).distinct()
    // remaining members and their re-match edges are consumed by the
    // emptiness probes AND the CC/delta below — localCheckpoint so the
    // FastSS chain runs once, not once per action (measured: the
    // probes re-running the whole chain tripled the forget pass)
    val remaining = labels.join(affected, Seq("component"), "left_semi")
      .join(del.select(col("k").as("v")), Seq("v"), "left_anti")
      .select(col("v"))
      .localCheckpoint()
    val memRel = base0.select(col("blk"), col("k"), col("w"))
      .join(remaining.select(col("v").as("k")), Seq("k"), "left_semi")
      .join(del, Seq("k"), "left_anti")
    val edges = edgesTouching(memRel, memRel).localCheckpoint()
    val newLabels =
      if (remaining.isEmpty || edges.isEmpty)
        remaining.select(col("v"), col("v").as("component"))
      else Components.connectedComponents(edges, remaining)
    val tombstones = affectedIds.select(col("v"),
      lit(null).cast("long").as("component"))
    val delta = newLabels.select(col("v"), col("component").cast("long"))
      .unionByName(tombstones)
      .withColumn(BatchCol, lit(batchId))
      .localCheckpoint()
    // a partition whose every row was forgotten is absent from the
    // rewrite (dynamic overwrite can't emit an empty partition) and
    // must be dropped; COLLECTED (≤ touched partitions — bounded by
    // the forget set) BEFORE any file mutation, because touchedParts'
    // lineage reads the pre-rewrite files
    // (partition-column values read back as INT — cast for the collect)
    val emptied = touchedParts
      .join(rewritten.select(col(BatchCol)).distinct(), Seq(BatchCol), "left_anti")
      .select(col(BatchCol).cast("long")).collect().map(_.getLong(0))
    // both relations are materialized off the files; mutate base first
    // (crash before the delta replays through the labels-presence test)
    rewritten.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol).parquet(baseDir(dir))
    val ctx = fc(spark, dir)
    emptied.foreach { b =>
      val p = new Path(baseDir(dir), s"$BatchCol=$b")
      if (ctx.util.exists(p)) ctx.delete(p, true)
    }
    // the manual directory drop bypasses the writer's own cache
    // refresh — invalidate the listing so later base scans re-list
    spark.catalog.refreshByPath(baseDir(dir))
    delta.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol).parquet(labelsDir(dir))
    touchMarker(spark, dir, batchId)
    Components.dropCheckpoint(rewritten)
    Components.dropCheckpoint(delta)
    Components.dropCheckpoint(remaining)
    Components.dropCheckpoint(edges)
    affectedIds.unpersist()
  }

  /** Current canonical assignment in q228's output shape:
    * (c_custkey, canonical_id, cluster_size) — served base ⟕ delta
    * (latest committed delta row per vertex). */
  def resolved(spark: SparkSession, dir: String): DataFrame = {
    val up = lastCommitted(spark, dir).getOrElse(
      throw new IllegalStateException(s"IncrementalEr at $dir has no committed batch"))
    currentLabels(spark, dir, up)
      .select(col("v").as("c_custkey"), col("component").as("canonical_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("canonical_id")).cast("long"))
  }
}
