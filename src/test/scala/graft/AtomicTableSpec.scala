package graft

import graft.pipeline.AtomicTable

/** Atomic createOrReplace + merge-schema semantics (the Iceberg
  * behaviors of the reference's gold writes, over plain parquet). */
class AtomicTableSpec extends SparkSpec {
  import spark.implicits._

  test("replace is versioned and atomic; merge-schema unions on evolve; vacuum prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_").toString

    val v1 = AtomicTable.replace(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    assert(v1 === "v_00001")
    assert(AtomicTable.read(spark, dir).columns.toSeq === Seq("id", "name"))
    assert(AtomicTable.read(spark, dir).count() === 2)

    // evolve: the new snapshot drops `name` and adds `score`; merge-schema
    // keeps `name` in the table schema as a typed null
    val v2 = AtomicTable.replace(Seq((3L, 1.5)).toDF("id", "score"), dir, mergeSchema = true)
    assert(v2 === "v_00002")
    val t2 = AtomicTable.read(spark, dir)
    assert(t2.columns.toSeq === Seq("id", "name", "score"))
    val row = t2.collect().head
    assert(row.getLong(0) === 3L && row.isNullAt(1) && row.getDouble(2) === 1.5)

    // no reader window: the pointer is committed (no tmp left behind) and
    // the PREVIOUS version directory still exists for in-flight readers
    assert(AtomicTable.currentVersion(spark, dir) === Some("v_00002"))
    assert(!new java.io.File(s"$dir/_current.tmp").exists)
    assert(new java.io.File(s"$dir/v_00001").exists)

    AtomicTable.vacuum(spark, dir, keep = 1)
    assert(!new java.io.File(s"$dir/v_00001").exists)
    assert(new java.io.File(s"$dir/v_00002").exists)

    // partitioned replace composes with merge-schema
    AtomicTable.replace(Seq((4L, "x", 2024), (5L, "y", 2025)).toDF("id", "name", "year"),
      dir, mergeSchema = true, partitionCols = Seq("year"))
    val t3 = AtomicTable.read(spark, dir)
    assert(t3.count() === 2)
    assert(t3.columns.toSet === Set("id", "name", "score", "year"))
    assert(t3.filter(t3("score").isNotNull).count() === 0)
  }

  test("upsert: matched keys replaced, new keys inserted, others survive; atomic version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_up_").toString
    AtomicTable.replace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val ver = AtomicTable.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), dir, "id")
    assert(ver === "v_00002")
    val got = AtomicTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "B", 3L -> "c"))
    // the pre-upsert snapshot is still readable (time travel until vacuum)
    assert(AtomicTable.versions(spark, dir) === Seq("v_00001", "v_00002"))
    val v1 = AtomicTable.readVersion(spark, dir, "v_00001").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1 === Map(1L -> "a", 2L -> "b"))
  }

  test("composite-key upsert: (year, month) MERGE replaces matched cells only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_ck_").toString
    AtomicTable.replace(Seq((2025, 1, 10.0), (2025, 2, 20.0), (2026, 1, 30.0))
      .toDF("year", "month", "total"), dir)
    AtomicTable.upsertKeys(Seq((2025, 2, 99.0), (2026, 2, 40.0))
      .toDF("year", "month", "total"), dir, Seq("year", "month"))
    val got = AtomicTable.read(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got === Map((2025, 1) -> 10.0, (2025, 2) -> 99.0,
      (2026, 1) -> 30.0, (2026, 2) -> 40.0))
  }

  test("racing replaces: distinct versions, complete winner, no torn read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_race_").toString
    AtomicTable.replace(Seq((0L, "seed")).toDF("id", "tag"), dir)

    // two writers race from the same base version; exclusive claim
    // allocation must give them DISTINCT version directories, and the
    // last pointer rename wins — readers see exactly one writer's full
    // content, never a mix and never a partial directory
    val payloads = Map("A" -> (1L to 40L), "B" -> (100L to 160L))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val threads = payloads.map { case (tag, ids) =>
      new Thread(() => {
        val df = ids.map(i => (i, tag)).toDF("id", "tag")
        barrier.await()
        results.put(tag, AtomicTable.replace(df, dir))
      })
    }.toSeq
    threads.foreach(_.start()); threads.foreach(_.join())

    val vA = results.get("A"); val vB = results.get("B")
    assert(vA !== vB, "racing writers must never share a version directory")
    assert(Set(vA, vB) === Set("v_00002", "v_00003"))
    // both versions are complete and durable (loser reachable by time travel)
    payloads.foreach { case (tag, ids) =>
      val v = results.get(tag)
      val got = spark.read.parquet(s"$dir/$v").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === ids.toSeq, s"version $v of writer $tag must be complete")
    }
    // the live table is exactly ONE writer's content (last rename wins —
    // which writer that is depends on timing, but it's never a mix)
    val cur = AtomicTable.currentVersion(spark, dir)
    assert(cur === Some(vA) || cur === Some(vB))
    val winner = if (cur.contains(vA)) "A" else "B"
    val live = AtomicTable.read(spark, dir).collect().map(_.getString(1)).toSet
    assert(live === Set(winner), s"live table must be exactly the winner's content: $live")
    // successful commits leave no pointer-temp litter (each attempt's
    // temp is uniquely named and renamed away — a SHARED temp name let
    // racing committers tear each other's in-flight file)
    assert(!new java.io.File(dir).listFiles.exists(_.getName.startsWith("_current.tmp")),
      "no _current.tmp* litter after successful commits")
  }

  test("racing pointer commits never crash or tear (repeated contended rounds)") {
    // the shared-temp-pointer regression crashed roughly 1-in-N runs;
    // hammer the exact contention point (two pointer commits in the
    // same millisecond window) enough rounds to make recurrence loud
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_race2_").toString
    AtomicTable.replace(Seq((0L, 0L)).toDF("id", "v"), dir)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    for (round <- 1 to 8) {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val threads = (0 until 2).map { w =>
        new Thread(() => {
          try {
            val df = Seq((round.toLong, w.toLong)).toDF("id", "v")
            barrier.await()
            AtomicTable.replace(df, dir)
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
    }
    assert(failures.isEmpty, s"racing commits must not throw: ${failures.peek()}")
    // pointer still resolves to a complete, committed version
    assert(AtomicTable.read(spark, dir).count() === 1)
    assert(AtomicTable.versions(spark, dir).size === 17)
  }

  test("vacuum deletes only committed versions, cleans their markers, spares in-flight claims") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_vac_").toString
    AtomicTable.replace(Seq((1L, "a")).toDF("id", "v"), dir)
    AtomicTable.replace(Seq((2L, "b")).toDF("id", "v"), dir)
    AtomicTable.replace(Seq((3L, "c")).toDF("id", "v"), dir)

    // simulate an in-flight racing writer: claim marker + partial version
    // directory, NO commit marker yet — vacuum must not touch either
    assert(new java.io.File(s"$dir/_claim_v_00004").createNewFile())
    val partial = new java.io.File(s"$dir/v_00004")
    assert(partial.mkdir())
    assert(new java.io.File(partial, "part-00000-inflight.parquet").createNewFile())

    AtomicTable.vacuum(spark, dir, keep = 1)

    // committed superseded versions vacuumed, their markers cleaned with them
    assert(!new java.io.File(s"$dir/v_00001").exists)
    assert(!new java.io.File(s"$dir/v_00002").exists)
    assert(!new java.io.File(s"$dir/_commit_v_00001").exists)
    assert(!new java.io.File(s"$dir/_claim_v_00001").exists)
    assert(!new java.io.File(s"$dir/_commit_v_00002").exists)
    // the live version and its marker survive
    assert(new java.io.File(s"$dir/v_00003").exists)
    assert(new java.io.File(s"$dir/_commit_v_00003").exists)
    assert(AtomicTable.versions(spark, dir) === Seq("v_00003"))
    // the in-flight writer's claim and partial directory are untouched —
    // it can still complete its write and rename the pointer safely
    assert(partial.exists)
    assert(new java.io.File(s"$dir/_claim_v_00004").exists)
    // and a new writer still allocates past the outstanding claim
    val v5 = AtomicTable.replace(Seq((5L, "e")).toDF("id", "v"), dir)
    assert(v5 === "v_00005")
    assert(AtomicTable.versions(spark, dir) === Seq("v_00003", "v_00005"))
  }

  test("vacuum minAge: a young superseded version survives; aged out it goes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_age_").toString
    AtomicTable.replace(Seq((1L, "a")).toDF("id", "v"), dir)
    AtomicTable.replace(Seq((2L, "b")).toDF("id", "v"), dir)
    AtomicTable.replace(Seq((3L, "c")).toDF("id", "v"), dir)

    // both superseded versions committed moments ago — the retention
    // guard must spare them even though keep=1 marks them for deletion
    AtomicTable.vacuum(spark, dir, keep = 1, minAgeMs = 60_000L)
    assert(new java.io.File(s"$dir/v_00001").exists)
    assert(new java.io.File(s"$dir/v_00002").exists)
    assert(AtomicTable.versions(spark, dir) === Seq("v_00001", "v_00002", "v_00003"))
    // a slow reader that resolved v_00002 pre-vacuum still reads it whole
    assert(AtomicTable.readVersion(spark, dir, "v_00002").count() === 1)

    // age v_00001 past the bar (backdate its commit marker); v_00002 stays young
    val m1 = new java.io.File(s"$dir/_commit_v_00001")
    assert(m1.setLastModified(System.currentTimeMillis() - 120_000L))
    AtomicTable.vacuum(spark, dir, keep = 1, minAgeMs = 60_000L)
    assert(!new java.io.File(s"$dir/v_00001").exists)
    assert(new java.io.File(s"$dir/v_00002").exists)
    // minAgeMs = 0 (default) keeps today's count-only behavior
    AtomicTable.vacuum(spark, dir, keep = 1)
    assert(!new java.io.File(s"$dir/v_00002").exists)
    assert(AtomicTable.versions(spark, dir) === Seq("v_00003"))
  }

  test("pre-marker tables stay readable: the live pointer needs no commit marker") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_pre_").toString
    AtomicTable.replace(Seq((1L, "a")).toDF("id", "v"), dir)
    AtomicTable.replace(Seq((2L, "b")).toDF("id", "v"), dir)
    // simulate a table written before the commit-marker protocol
    assert(new java.io.File(s"$dir/_commit_v_00001").delete())
    assert(new java.io.File(s"$dir/_commit_v_00002").delete())
    // the live version is always listed and readable (upgrade path)...
    assert(AtomicTable.versions(spark, dir) === Seq("v_00002"))
    assert(AtomicTable.read(spark, dir).count() === 1)
    // ...while the marker-less superseded version is indistinguishable
    // from an in-flight claim: invisible to time travel AND left alone
    // by vacuum (deleting maybe-in-flight data is the worse failure)
    AtomicTable.vacuum(spark, dir, keep = 1)
    assert(new java.io.File(s"$dir/v_00001").exists)
  }

  test("time travel never reads a claimed-but-uncommitted directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_tt_").toString
    AtomicTable.replace(Seq((1L, "a")).toDF("id", "v"), dir)
    // an in-flight claim with a half-written directory must be invisible
    assert(new java.io.File(s"$dir/_claim_v_00002").createNewFile())
    assert(new java.io.File(s"$dir/v_00002").mkdir())
    assert(AtomicTable.versions(spark, dir) === Seq("v_00001"))
    intercept[IllegalArgumentException] {
      AtomicTable.readVersion(spark, dir, "v_00002")
    }
  }

  test("read of an uncommitted table fails loudly, not with a phantom empty table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_none_").toString
    intercept[IllegalStateException] { AtomicTable.read(spark, dir) }
  }

  private def parquetFiles(dir: String, v: String): Seq[java.io.File] =
    new java.io.File(s"$dir/$v").listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))

  test("compact: many small files become few, data identical, old version time-travels") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_cpt_").toString
    val df = spark.range(10000).selectExpr("id", "id % 7 AS grp")
    val v1 = AtomicTable.replace(df.repartition(64), dir)
    assert(parquetFiles(dir, v1).size === 64)
    // a huge target ⇒ everything fits one file
    val v2 = AtomicTable.compact(spark, dir, targetBytes = 1L << 30)
    assert(parquetFiles(dir, v2).size === 1)
    // a target sized to a third of the data ⇒ more than one, fewer than 64
    val total = parquetFiles(dir, v2).map(_.length).sum
    val v3 = AtomicTable.compact(spark, dir, targetBytes = math.max(1L, total / 3))
    val n3 = parquetFiles(dir, v3).size
    assert(n3 > 1 && n3 < 64, s"expected 1 < files < 64, got $n3")
    // data identical across every version; the pre-compaction snapshot
    // still time-travels (compaction is just another committed version)
    val sums = Seq(v1, v2, v3).map(v =>
      AtomicTable.readVersion(spark, dir, v).selectExpr("sum(id)", "count(*)").collect().head)
    assert(sums.distinct.size === 1)
    assert(AtomicTable.versions(spark, dir) === Seq(v1, v2, v3))
  }

  test("rollback re-points atomically; rejects in-flight claims; next replace allocates past the bad version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_rb_").toString
    val v1 = AtomicTable.replace(Seq((1L, "good")).toDF("id", "v"), dir)
    val v2 = AtomicTable.replace(Seq((1L, "bad")).toDF("id", "v"), dir)
    AtomicTable.rollback(spark, dir, v1)
    assert(AtomicTable.currentVersion(spark, dir) === Some(v1))
    assert(AtomicTable.read(spark, dir).collect().head.getString(1) === "good")
    // the bad version remains committed: still time-travelable
    assert(AtomicTable.versions(spark, dir) === Seq(v1, v2))
    // an in-flight claim is not a restorable target
    assert(new java.io.File(s"$dir/_claim_v_00003").createNewFile())
    intercept[IllegalArgumentException] { AtomicTable.rollback(spark, dir, "v_00003") }
    // a write after rollback must not collide with the superseded v2
    val v3 = AtomicTable.replace(Seq((1L, "fixed")).toDF("id", "v"), dir)
    assert(v3 === "v_00004")
    assert(AtomicTable.read(spark, dir).collect().head.getString(1) === "fixed")
  }

  test("diff: insert/update/delete tagged; unchanged rows absent; schema evolution reads as typed null") {
    val dir = java.nio.file.Files.createTempDirectory("graft_atomic_cdc_").toString
    val v1 = AtomicTable.replace(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "bal"), dir)
    // delete 3, update 2's bal, insert 4, leave 1 untouched
    val v2 = AtomicTable.replace(
      Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "d", 40.0)).toDF("id", "name", "bal"), dir)
    val d = AtomicTable.diff(spark, dir, v1, v2, Seq("id")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("change_type")).toMap
    assert(d === Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
    val upd = AtomicTable.diff(spark, dir, v1, v2, Seq("id"))
      .filter($"id" === 2L).collect().head
    assert(upd.getAs[Double]("bal_before") === 20.0 && upd.getAs[Double]("bal_after") === 25.0)
    // schema evolution: v3 adds `tier`; rows whose only change is a real
    // value in the new column surface as update, identical rows stay absent
    val v3 = AtomicTable.replace(
      Seq((1L, "a", 10.0, "gold"), (2L, "b", 25.0, null.asInstanceOf[String]))
        .toDF("id", "name", "bal", "tier"), dir, mergeSchema = true)
    val d2 = AtomicTable.diff(spark, dir, v2, v3, Seq("id")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("change_type")).toMap
    assert(d2 === Map(1L -> "update", 4L -> "delete"))
  }
}
