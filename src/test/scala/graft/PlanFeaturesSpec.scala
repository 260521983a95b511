package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Catalyst runtime-pruning features that matter at 100 TB, pinned so a
  * conf regression can't silently disable them:
  *
  *  - dynamic partition pruning (DPP): a selective dim filter becomes a
  *    runtime partition filter on the fact scan — the fact side reads
  *    only the partitions the dim survivors name. On a date/category-
  *    partitioned 100 TB table this is the difference between scanning
  *    a slice and scanning the table.
  *  - runtime bloom-filter join pruning: for a shuffle join with a
  *    selective build side, Spark injects a bloom filter of build-side
  *    keys into the probe scan, dropping non-joining rows BEFORE the
  *    shuffle (row-level analogue of DPP for non-partition keys).
  */
class PlanFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition pruning: dim filter becomes a runtime partition filter on the fact scan") {
    val dir = Files.createTempDirectory("graft_dpp_").toString
    (1 to 1000).map(i => (i.toLong, i % 10)).toDF("id", "cat")
      .write.partitionBy("cat").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // the dim must be a REAL source, not a LocalRelation: Catalyst
    // constant-folds filters over local data at optimize time, leaving
    // no selective predicate for the DPP rule to find
    (0 until 10).map(c => (c, s"name_$c")).toDF("cat", "name")
      .write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val joined = fact.join(broadcast(dim).filter($"name" === "name_3"), Seq("cat"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n$plan")
    assert(joined.count() === 100)
  }

  test("AQE skew join: an oversized shuffle partition is split at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one celebrity key holding ~90% of rows
      val skewed = spark.range(100000)
        .selectExpr("CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k",
          "repeat('x', 64) AS pad")
      val dim = spark.range(100000).selectExpr("id AS k", "id * 2 AS v")
      val joined = skewed.join(dim, "k").selectExpr("k", "v")
      // materialize THIS dataset's own plan (count() would execute a
      // separate aggregate query and leave this AQE plan non-final)
      assert(joined.collect().length === 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        s"expected AQE to mark and split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CBO: ANALYZE stats land as rowCount and cost-based reorder joins the tiny dim first") {
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // two 100k-row facts with fan-out 100 on the join key (their join
      // alone is a 10M-row intermediate) and a 10-row dim that cuts 99%
      spark.range(100000).selectExpr("id % 1000 AS k", "id AS a")
        .write.mode("overwrite").saveAsTable("cbo_fact1")
      spark.range(100000).selectExpr("id % 1000 AS k", "id AS b")
        .write.mode("overwrite").saveAsTable("cbo_fact2")
      spark.range(10).selectExpr("id AS k", "id AS dv")
        .write.mode("overwrite").saveAsTable("cbo_dim")
      Seq("cbo_fact1", "cbo_fact2", "cbo_dim").foreach(t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
      // 1) stats propagate: the catalog relation reports the exact rowCount
      assert(spark.table("cbo_fact1").queryExecution.optimizedPlan
        .stats.rowCount === Some(BigInt(100000)))
      // 2) the query is WRITTEN worst-first (fact1 ⋈ fact2, then dim);
      // the cost-based reorderer must move the dim into the innermost
      // join so the 10M-row intermediate never materializes
      val q = spark.sql(
        """SELECT count(*) AS n FROM cbo_fact1 f1
          |JOIN cbo_fact2 f2 ON f1.k = f2.k
          |JOIN cbo_dim d ON f1.k = d.k""".stripMargin)
      import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
      val joins = q.queryExecution.optimizedPlan.collect { case j: LJoin => j }
      val innermost = joins.filter(j =>
        j.children.forall(c => c.collect { case jj: LJoin => jj }.isEmpty))
      assert(innermost.nonEmpty && innermost.forall(_.toString.contains("cbo_dim")),
        s"expected the 10-row dim in the innermost join:\n${q.queryExecution.optimizedPlan}")
      // 3) reorder is purely physical: the count matches the no-CBO run
      val n = q.collect().head.getLong(0)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      assert(spark.sql(
        """SELECT count(*) AS n FROM cbo_fact1 f1
          |JOIN cbo_fact2 f2 ON f1.k = f2.k
          |JOIN cbo_dim d ON f1.k = d.k""".stripMargin).collect().head.getLong(0) === n)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      Seq("cbo_fact1", "cbo_fact2", "cbo_dim").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("runtime bloom-filter join pruning: selective build side injects might_contain into the probe") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local fixtures are far below the 10 GB production threshold —
      // drop the size gates so the injection logic itself is exercised
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      // must be a SHUFFLE join: a broadcast join already prunes via the
      // broadcast relation, so the rule skips it
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT")
        .select("o_orderkey")
      val items = Tables.lineitem(spark, sf)
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
      val joined = items.join(orders, Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the probe side:\n$plan")
      // and it is purely a pruning aid: results identical with it off
      val n = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(Tables.lineitem(spark, sf)
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
        .join(Tables.orders(spark, sf)
          .filter($"o_orderpriority" === "1-URGENT").select("o_orderkey"),
          Seq("o_orderkey")).count() === n)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("broadcast-hint audit: structural bound classifier, and no corpus-scaling hint in the dedup/vocab queries") {
    import graft.queries.{TrainingQueries => T}
    val docs = Tables.documents(spark, sf)
    // bounded shapes: top-k limit, scalar aggregate, grouped agg over a limit
    assert(PlanAudit.unboundedBroadcastHints(
      docs.join(broadcast(docs.limit(10)), Seq("doc_id"), "left_semi")).isEmpty)
    assert(PlanAudit.unboundedBroadcastHints(
      docs.crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))).isEmpty)
    assert(PlanAudit.unboundedBroadcastHints(
      docs.join(broadcast(docs.limit(10).groupBy("lang").count()), Seq("lang"))).isEmpty)
    // unbounded shapes the fixed round-7 flaws had: a grouped aggregate
    // over the corpus (q75's vocab), and a filtered corpus scan (q94's
    // canonical set — filters don't bound plan-shape cardinality)
    assert(PlanAudit.unboundedBroadcastHints(
      docs.join(broadcast(docs.groupBy("lang").count()), Seq("lang"))).nonEmpty)
    assert(PlanAudit.unboundedBroadcastHints(
      docs.join(broadcast(docs.filter($"doc_id" < 25).select("doc_id")),
        Seq("doc_id"), "left_anti")).nonEmpty)
    // the queries the round-7 audit flagged now carry NO unbounded hint
    for (q <- Seq(T.q94, T.q75, T.q107, T.q69, T.q76))
      assert(PlanAudit.unboundedBroadcastHints(q.fn(spark, sf)).isEmpty,
        s"${q.name} regressed to a corpus-scaling broadcast hint")
    // q71's bench-gram broadcast is structurally unbounded (a filtered
    // corpus scan) but domain-bounded — the documented allowlist case
    assert(PlanAudit.unboundedBroadcastHints(T.q71.fn(spark, sf)).nonEmpty)
    assert(PlanAudit.broadcastAllowlist.contains("q71_contamination"))
  }

  test("bloom pre-join (q123): the probe filter is pushed below the join, next to the scan") {
    val q = graft.queries.ScaleQueries.q123.fn(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.optimizedPlan
    // find the join, then require graft_bloom_contains among the PROBE
    // side's filters — i.e. pruning happens before rows reach the join
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty, s"no join in:\n$plan")
    val probeSide = joins.head.left.toString + joins.head.right.toString
    assert(probeSide.contains("graft_bloom_contains"),
      s"bloom predicate not below the join:\n$plan")
    // and the filter is in the same subtree as the lineitem relation,
    // directly over its scan (pushdown survived optimization)
    val underJoin = joins.head.children.find(_.toString.contains("graft_bloom_contains")).get
    assert(underJoin.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("graft_bloom_contains") => f
    }.nonEmpty)
  }
}
