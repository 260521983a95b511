package graft.pipeline

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Atomic `createOrReplace` + merge-schema table semantics over plain
  * parquet — the two Iceberg behaviors the reference's gold writes rely
  * on (`/root/reference/scripts/spark_jobs/gold_transfrom.py:71-75,90-94`
  * — `option("merge-schema","true")` + `createOrReplace()`;
  * `silver_clean_transform.py:77-79`), re-expressed as a minimal
  * single-table commit protocol (no Delta/Iceberg jars in this
  * environment):
  *
  *  - layout: `tableDir/v_00001/…` immutable version directories plus a
  *    one-line `tableDir/_current` pointer file naming the live version;
  *  - `replace` writes the NEW version directory completely, then
  *    commits by renaming a temp pointer over `_current`
  *    (`FileContext.rename(OVERWRITE)` — the same atomic-commit
  *    primitive Spark's own streaming checkpoint manager uses). Readers
  *    resolve the pointer first, so there is NO window where the table
  *    is absent or half-written: they see the old version until the
  *    one-file commit, the new version after;
  *  - `mergeSchema = true` evolves the table schema to the UNION of old
  *    and new: columns the new snapshot lacks survive as typed nulls
  *    (Iceberg's merge-schema-on-overwrite), columns it adds append;
  *  - old versions stay on disk (time travel / in-flight readers) until
  *    `vacuum`.
  *
  * At 100 TB the commit cost is unchanged — one pointer rename — and
  * version directories are written with whatever partitioning the
  * caller asks for; the protocol never rewrites or moves data files.
  *
  * Concurrency contract (asserted by `AtomicTableSpec`):
  *  - version NUMBERS are allocated exclusively: each writer claims its
  *    number by an atomic create-exclusive of a `_claim_v_NNNNN` marker,
  *    so racing writers never share a version directory (a shared
  *    directory would let one writer's Overwrite delete the other's
  *    in-flight files — the round-3 lost-update hazard);
  *  - the COMMIT point is the pointer rename, and the policy is
  *    last-rename-wins: racing `replace` calls both produce complete,
  *    durable version directories, and `_current` names whichever
  *    renamed last — readers always see one complete version, and the
  *    superseded version stays reachable by time travel;
  *  - `upsert` is read-modify-write: last-rename-wins means a racing
  *    upsert's delta can be absent from the winner's base. True OCC
  *    (failing the losing committer) needs a compare-and-swap primitive
  *    plain filesystems lack — it's exactly why Iceberg requires a
  *    catalog service. Serialize upserts per table externally (the
  *    reference does this implicitly: Airflow runs one job instance per
  *    table at a time).
  */
object AtomicTable {

  private val Pointer = "_current"
  private val CommitPrefix = "_commit_v_"

  private def fc(spark: SparkSession, dir: String): FileContext =
    FileContext.getFileContext(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)

  /** The live version directory name, if the table exists. */
  def currentVersion(spark: SparkSession, dir: String): Option[String] = {
    val ctx = fc(spark, dir)
    val p = new Path(dir, Pointer)
    if (!ctx.util.exists(p)) None
    else {
      val in = ctx.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Snapshot-isolated read of the live version. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"AtomicTable at $dir has no committed version"))
    spark.read.parquet(s"$dir/$v")
  }

  /** Time-travel read of a specific COMMITTED version (any directory
    * `versions` lists; superseded versions stay readable until
    * `vacuum`). Claimed-but-uncommitted directories — an in-flight
    * racing writer's partial parquet — are rejected rather than read. */
  def readVersion(spark: SparkSession, dir: String, version: String): DataFrame = {
    if (!versions(spark, dir).contains(version))
      throw new IllegalArgumentException(
        s"$version at $dir is not a committed version (in-flight or vacuumed)")
    spark.read.parquet(s"$dir/$version")
  }

  /** All COMMITTED version directories, oldest first. A version is
    * committed once its `_commit_v_NNNNN` marker lands (written after
    * the parquet write completes, before the pointer rename) — claimed
    * directories still being written never appear here, so time-travel
    * readers cannot observe a partial write. The live pointer's version
    * is always included (pre-marker tables stay readable). */
  def versions(spark: SparkSession, dir: String): Seq[String] = {
    val names = fc(spark, dir).util.listStatus(new Path(dir)).toSeq
      .map(_.getPath.getName)
    val committed = names.filter(_.startsWith(CommitPrefix))
      .map(_.stripPrefix("_commit_")).toSet ++ currentVersion(spark, dir)
    names.filter(n => n.startsWith("v_") && committed.contains(n)).sorted
  }

  /** Align `df` to the union of `old` and its own schema: old columns
    * first (original order, typed nulls where the new snapshot dropped
    * them), genuinely new columns appended. */
  private def alignToUnion(df: DataFrame, old: StructType): DataFrame = {
    val have = df.schema.fields.map(f => f.name).toSet
    val withMissing = old.fields.filterNot(f => have.contains(f.name))
      .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    val ordered = old.fieldNames.toSeq ++ df.schema.fieldNames.filterNot(old.fieldNames.contains)
    withMissing.select(ordered.map(col): _*)
  }

  /** Atomic create-exclusive of an empty marker file: true iff THIS
    * caller created it. On HDFS/object stores `create(overwrite=false)`
    * is atomic server-side; the local Hadoop shim (RawLocalFileSystem)
    * is check-then-act — a TOCTOU race — so `file:` paths route through
    * NIO's O_EXCL create, which is atomic at the POSIX layer. */
  private[graft] def claimExclusive(ctx: FileContext, p: Path): Boolean = {
    val scheme = Option(p.toUri.getScheme)
      .getOrElse(ctx.getDefaultFileSystem.getUri.getScheme)
    if (scheme == "file" || scheme == null) {
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        java.nio.file.Files.createDirectories(nio.getParent)
        java.nio.file.Files.createFile(nio)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        ctx.create(p, java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE),
          Options.CreateOpts.createParent()).close()
        true
      } catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    }
  }

  /** Atomic full replace. Returns the committed version name. */
  def replace(df: DataFrame, dir: String, mergeSchema: Boolean = false,
              partitionCols: Seq[String] = Nil): String = {
    val spark = df.sparkSession
    val cur = currentVersion(spark, dir)
    val out =
      if (mergeSchema && cur.isDefined) alignToUnion(df, read(spark, dir).schema)
      else df
    // exclusive version allocation: atomic create-exclusive of a claim
    // marker — exactly one writer wins each number, so racing writers
    // get distinct version directories (see the concurrency contract)
    val actx = fc(spark, dir)
    var n = cur.map(_.stripPrefix("v_").toInt).getOrElse(0) + 1
    var next: String = null
    while (next == null) {
      if (claimExclusive(actx, new Path(dir, f"_claim_v_$n%05d"))) next = f"v_$n%05d"
      else n += 1
    }
    // partitioned versions co-locate each hive partition into one task
    // (see Medallion.appendPartitioned: avoids tasks×partitions files)
    val laid = if (partitionCols.nonEmpty) out.repartition(partitionCols.map(col): _*) else out
    val w = laid.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$dir/$next")
    // durability marker: the version directory is complete from here on —
    // `versions`/`readVersion` admit it (time travel) and `vacuum` may
    // manage it. Created BEFORE the pointer rename so a version is never
    // live-but-unlisted; exclusive allocation means this create cannot race.
    claimExclusive(actx, new Path(dir, s"_commit_$next"))
    commitPointer(spark, dir, next)
    next
  }

  /** One-file commit: temp pointer fully written + flushed, then the
    * atomic overwrite-rename makes it the live pointer. The temp name
    * is PER-COMMIT-ATTEMPT (unique suffix): a shared `_current.tmp`
    * let two racing committers overwrite each other's in-flight temp
    * file — observed as a checksum-sidecar crash on the local fs, and
    * on any fs a writer could rename a temp carrying the OTHER
    * writer's content (racing replaces, or two rollbacks to the same
    * version). Last-rename-wins is unchanged; each committer now
    * renames only bytes it wrote itself. A writer that dies between
    * create and rename leaves one tiny `_current.tmp.*` file behind —
    * inert litter, never read.
    *
    * Like [[claimExclusive]], `file:` paths route through NIO: the
    * Hadoop local shim is ChecksumFs, whose rename moves the `.crc`
    * sidecar NON-atomically — two racing renames onto `_current`
    * collide on the sidecar (observed FileAlreadyExistsException under
    * a contended-commit hammer). POSIX rename(2) via NIO is atomic and
    * last-wins with no sidecar; HDFS/object stores have server-side
    * checksums and keep the FileContext path. */
  private def commitPointer(spark: SparkSession, dir: String, version: String): Unit = {
    val ctx = fc(spark, dir)
    val tmpName = s"$Pointer.tmp.${java.util.UUID.randomUUID()}"
    val dirPath = new Path(dir)
    val scheme = Option(dirPath.toUri.getScheme)
      .getOrElse(ctx.getDefaultFileSystem.getUri.getScheme)
    if (scheme == "file" || scheme == null) {
      val dirP = java.nio.file.Paths.get(dirPath.toUri.getPath)
      java.nio.file.Files.createDirectories(dirP)
      val tmpP = dirP.resolve(tmpName)
      java.nio.file.Files.write(tmpP, version.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.SYNC)
      // a sidecar left by a pre-NIO commit would describe the OLD
      // pointer bytes and fail ChecksumFs reads of the new ones;
      // dropped BEFORE the rename so no reader ever pairs the new
      // bytes with the stale checksum
      java.nio.file.Files.deleteIfExists(dirP.resolve(s".$Pointer.crc"))
      java.nio.file.Files.move(tmpP, dirP.resolve(Pointer),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val tmp = new Path(dir, tmpName)
      val os = ctx.create(tmp,
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
          org.apache.hadoop.fs.CreateFlag.OVERWRITE),
        Options.CreateOpts.createParent())
      try { os.write(version.getBytes("UTF-8")); os.hsync() } finally os.close()
      ctx.rename(tmp, new Path(dir, Pointer), Options.Rename.OVERWRITE)
    }
  }

  /** MERGE-style upsert: the next version = delta rows + current rows
    * whose key is absent from the delta (matched keys are replaced,
    * new keys insert, untouched rows carry over), committed atomically
    * like any other version — the `MERGE INTO` the reference's stack
    * gets from Iceberg, as a read-join-replace over the snapshot.
    * Rewriting the table per merge is the simple-and-correct form; a
    * 100 TB deployment partitions the table and merges only the
    * partitions the delta touches (the join is partition-prunable).
    * With `mergeSchema` the delta may add or drop columns (missing
    * sides null-fill via unionByName). */
  def upsert(delta: DataFrame, dir: String, keyCol: String,
             mergeSchema: Boolean = false): String =
    upsertKeys(delta, dir, Seq(keyCol), mergeSchema)

  /** Composite-key MERGE (the general form — real gold tables merge on
    * (year, month, product), not one column). */
  def upsertKeys(delta: DataFrame, dir: String, keyCols: Seq[String],
                 mergeSchema: Boolean = false): String = {
    val spark = delta.sparkSession
    val cur = read(spark, dir)
    val kept = cur.join(delta.select(keyCols.map(col): _*), keyCols, "left_anti")
    val next = kept.unionByName(delta, allowMissingColumns = mergeSchema)
    replace(next, dir)
  }

  /** Small-file compaction as a COMMITTED VERSION (the OPTIMIZE /
    * `rewrite_data_files` table service the reference would get from
    * Iceberg): read the live snapshot, rewrite it as ⌈bytes/target⌉
    * round-robin files, commit through the normal `replace` protocol.
    * Because compaction is just another version, it is safe to run
    * concurrently with readers (they hold the old pointer) and with
    * the vacuum janitor (which only touches committed, superseded
    * versions) — no stop-the-world window, which is the property that
    * matters when a 100 TB table accretes thousands of small streaming
    * files per hour. Hive-partitioned tables pass `partitionCols`:
    * the rewrite then routes through `replace`'s repartition-by-key
    * layout (one task per hive partition = one file per partition),
    * the right grain when partitions, not the table, are the unit of
    * fragmentation. Returns the new version name. */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20,
              partitionCols: Seq[String] = Nil): String = {
    val v = currentVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"AtomicTable at $dir has no committed version"))
    // rewrite the SAME snapshot that was resolved/sized: re-reading the
    // live pointer here would let a commit landing mid-compact make the
    // file count derive from a different version than the data
    if (partitionCols.nonEmpty) {
      replace(readVersion(spark, dir, v), dir, partitionCols = partitionCols)
    } else {
      val it = fc(spark, dir).util.listFiles(new Path(s"$dir/$v"), true)
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
      }
      val nFiles = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
      replace(readVersion(spark, dir, v).repartition(nFiles), dir)
    }
  }

  /** Change-data-feed between two committed versions (Delta's
    * `table_changes` / Iceberg's changelog scan): one full-outer join
    * on the key, one struct compare. Emits only changed rows, tagged
    * `insert` (key absent before), `delete` (key absent after), or
    * `update` (present in both, any value column differs — null-safe
    * compare), with every value column twice: `<col>_before` and
    * `<col>_after` (null on the absent side). Schema evolution between
    * the versions is handled like merge-schema: the value-column set is
    * the union, a column one side lacks reads as typed null there — so
    * adding a column surfaces as `update` rows only where real values
    * landed. The join shuffles on the key (partition-prunable when the
    * caller restricts both sides first); nothing is collected. */
  def diff(spark: SparkSession, dir: String, fromVersion: String,
           toVersion: String, keyCols: Seq[String]): DataFrame = {
    val before = readVersion(spark, dir, fromVersion)
    val after = readVersion(spark, dir, toVersion)
    val valCols = (before.columns ++ after.columns).distinct.toSeq
      .filterNot(keyCols.contains)
    def side(df: DataFrame, tag: String, present: String): DataFrame = {
      val have = df.columns.toSet
      val types = (before.schema ++ after.schema).map(f => f.name -> f.dataType).toMap
      df.select(keyCols.map(col) ++ valCols.map { c =>
        (if (have.contains(c)) col(c) else lit(null).cast(types(c))).as(s"${c}_$tag")
      }: _*).withColumn(present, lit(true))
    }
    val joined = side(before, "before", "_pb")
      .join(side(after, "after", "_pa"), keyCols, "full_outer")
    val bs = struct(valCols.map(c => col(s"${c}_before")): _*)
    val as_ = struct(valCols.map(c => col(s"${c}_after")): _*)
    joined
      .withColumn("change_type",
        when(col("_pb").isNull, "insert")
          .when(col("_pa").isNull, "delete")
          .when(!(bs <=> as_), "update"))
      .filter(col("change_type").isNotNull)
      .drop("_pb", "_pa")
  }

  /** Roll the live pointer back to an earlier COMMITTED version (Delta
    * RESTORE / Iceberg rollback): one atomic pointer rename, no data
    * movement — the bad version stays on disk (still time-travelable,
    * still vacuumable later) and in-flight readers of it are unharmed.
    * Only committed versions are valid targets; rolling back to an
    * in-flight claim would publish a partial write. The committed-check
    * and the pointer rename are two steps, so a concurrent `vacuum`
    * could delete the (superseded, non-live) target between them —
    * like `upsert`, rollback must be serialized against vacuum by the
    * caller; as a backstop the target directory is re-verified after
    * the rename and a torn publish fails loudly rather than leaving
    * every subsequent read to throw. */
  def rollback(spark: SparkSession, dir: String, version: String): Unit = {
    if (!versions(spark, dir).contains(version))
      throw new IllegalArgumentException(
        s"$version at $dir is not a committed version (in-flight or vacuumed)")
    commitPointer(spark, dir, version)
    if (!fc(spark, dir).util.exists(new Path(dir, version)))
      throw new IllegalStateException(
        s"rollback($dir, $version) raced a vacuum: the target directory was " +
          "deleted after the committed-check; the pointer now names a missing " +
          "version — serialize rollback against vacuum and roll forward/back")
  }

  /** Drop COMMITTED version directories except the newest `keep` (never
    * the live one). Only versions `versions()` lists are candidates: a
    * claimed-but-uncommitted directory belongs to an in-flight racing
    * writer and must survive — deleting it would tear that writer's
    * about-to-commit version out from under the pointer it is about to
    * rename. Vacuumed versions' `_claim_*`/`_commit_*` markers are
    * removed with them so the marker set never grows without bound.
    * Superseded versions written BEFORE the commit-marker protocol
    * (no `_commit_*` file) are indistinguishable from in-flight claims
    * and are deliberately left in place — deleting maybe-in-flight data
    * is the worse failure; remove them manually when upgrading.
    *
    * `minAgeMs` is the retention guard (Delta's
    * `deletedFileRetentionDuration`): a version whose commit marker is
    * younger than this survives regardless of `keep`, so a fast writer
    * churning versions cannot age out a snapshot a slow reader resolved
    * moments ago. Age comes from the `_commit_*` marker's mtime — the
    * instant the version became readable. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 1,
             minAgeMs: Long = 0L): Unit = {
    val ctx = fc(spark, dir)
    val live = currentVersion(spark, dir).toSet
    val now = System.currentTimeMillis()
    def oldEnough(v: String): Boolean = minAgeMs <= 0L || {
      val m = new Path(dir, s"_commit_$v")
      !ctx.util.exists(m) ||
        now - ctx.getFileStatus(m).getModificationTime >= minAgeMs
    }
    versions(spark, dir).dropRight(keep).filterNot(live.contains)
      .filter(oldEnough)
      .foreach { v =>
        ctx.delete(new Path(dir, v), true)
        Seq(s"_claim_$v", s"_commit_$v").foreach { m =>
          val p = new Path(dir, m)
          if (ctx.util.exists(p)) ctx.delete(p, false)
        }
      }
  }
}
