package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.queries.CoreQueries

/** Per-operator unit tests for the relational core (SURVEY §5.2):
  * edge semantics the oracle compare can't isolate. */
class RelationalSpec extends SparkSpec {

  test("J2: left-semi ≡ reference's projected inner join (unique keys)") {
    val li = Tables.lineitem(spark, sf)
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") > lit(java.time.LocalDateTime.parse("2001-01-01T00:00")))
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val semi = Relational.semiJoin(li, recent, "l_orderkey")
    val inner = Relational.semiJoinViaInner(li, recent, "l_orderkey")
      .select(semi.columns.toIndexedSeq.map(col): _*)
    assert(semi.count() === inner.count())
    assert(semi.exceptAll(inner).isEmpty && inner.exceptAll(semi).isEmpty)
  }

  test("P9: watermark filter is strictly greater-than") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "t")
    val kept = pipeline.Medallion.incrementalSlice(df, "t", Some(2L)).collect()
    assert(kept.map(_.getString(0)).toSet === Set("c")) // row AT the watermark excluded
  }

  test("P11: between is inclusive on both ends") {
    import spark.implicits._
    val df = Seq(0, 1, 3, 5, 6).toDF("rating")
    assert(df.filter(col("rating").between(1, 5)).collect().map(_.getInt(0)).toSet === Set(1, 3, 5))
  }

  test("A4: latestPerKey keeps exactly one deterministic row per key") {
    import spark.implicits._
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only")).toDF("k", "v", "tag")
    val got = Relational.latestPerKey(df, "k", col("v")).collect()
      .map(r => (r.getInt(0), r.getString(2))).toMap
    assert(got === Map(1 -> "new", 2 -> "only"))
  }

  test("J3/J4: left enrich keeps unmatched fact rows with null dims") {
    import spark.implicits._
    val fact = Seq((1, "x"), (99, "y")).toDF("k", "payload")
    val dim = Seq((1, "dim1")).toDF("k", "name")
    val out = Relational.dimEnrich(fact, dim, "k").orderBy("k").collect()
    assert(out.length === 2 && out(1).isNullAt(2)) // key 99 survives, name null
  }

  test("W2: boundedRecentPerKey truncates at n with rn 1..n") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("u", i)).toDF("k", "t")
    val out = Relational.boundedRecentPerKey(df, "k", 3, col("t"))
    assert(out.count() === 3)
    assert(out.agg(max("rn")).head().getInt(0) === 3)
    assert(out.agg(max("t")).head().getInt(0) === 10) // most recent kept
  }

  test("rerank: cart beats views beats offline, dedup keeps best class, ≤10") {
    val out = CoreQueries.q13.fn(spark, sf)
    import spark.implicits._
    val byUser = out.groupBy("user_id").agg(
      count(lit(1)).as("n"), countDistinct(col("item_id")).as("d"),
      max("pos").as("maxpos"))
    assert(byUser.filter(col("n") > 10).isEmpty)          // truncation
    assert(byUser.filter(col("n") =!= col("d")).isEmpty)  // duplicate-free
    assert(byUser.filter(col("maxpos") =!= col("n")).isEmpty) // contiguous positions
  }

  test("full_name divergence pinned: reference's arithmetic '+' on strings vs concat_ws intent") {
    import spark.implicits._
    val df = Seq(("Ada", "Lovelace"), ("Solo", null)).toDF("first", "last")
    // The reference builds full_name with Python '+' on Columns
    // (silver_clean_transform.py:90), which is arithmetic Add over
    // strings — always NULL on its Spark 3.5 (non-ANSI). Under our
    // Spark 4 ANSI sessions the same mistake fails loudly instead:
    intercept[Exception] {
      df.select((col("first") + lit(" ") + col("last")).as("full_name")).collect()
    }
    // We implement the INTENT (SURVEY §2.8): concat_ws, which also
    // null-skips missing parts instead of nulling the whole name.
    val got = df.select(concat_ws(" ", trim(col("first")), trim(col("last"))))
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("Ada Lovelace", "Solo"))
  }

  test("as-of join: latest at-or-before match, equal-time inclusive, null when none") {
    import spark.implicits._
    val quotes = Seq( // key, t, px
      ("A", 10L, 100L), ("A", 20L, 200L), ("A", 30L, 300L),
      ("B", 15L, 150L)).toDF("k", "t", "px")
    val trades = Seq( // key, t, id
      ("A", 25L, 1L),  // between quotes 20 and 30 -> 200
      ("A", 20L, 2L),  // exactly at a quote -> inclusive -> 200
      ("A", 5L, 3L),   // before any quote -> null
      ("B", 99L, 4L),  // after the only quote -> 150
      ("C", 50L, 5L))  // key with no quotes -> null
      .toDF("k", "t", "id")
    val got = operators.Relational.asOfJoin(trades, "t", quotes, "t", "k", Seq("px"))
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 200L, 2L -> 200L, 3L -> -1L, 4L -> 150L, 5L -> -1L))
  }

  test("incremental load ≡ full load (property over a date split)") {
    val orders = Tables.orders(spark, sf)
    val cut = lit(java.time.LocalDateTime.parse("1999-01-01T00:00"))
    val base = orders.filter(col("o_orderdate") <= cut)
    val wm = pipeline.Medallion.highWatermark(base, "o_orderdate")
    val delta = pipeline.Medallion.incrementalSlice(orders, "o_orderdate", wm)
    assert(base.count() + delta.count() === orders.count())
    assert(base.unionAll(delta).exceptAll(orders).isEmpty)
  }

  test("gapFillDailyCounts: complete spine, zero-filled gaps, counts preserved") {
    import spark.implicits._
    val d = java.sql.Date.valueOf(_: String)
    val facts = Seq(
      ("a", d("2024-03-01")), ("a", d("2024-03-01")), ("a", d("2024-03-04")),
      ("b", d("2024-03-02")),
      ("b", d("2024-02-28")), ("b", d("2024-03-09"))) // outside [01, 05] — excluded
      .toDF("k", "day")
    val got = Relational.gapFillDailyCounts(facts, "k", "day",
      d("2024-03-01"), d("2024-03-05"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    // every key × every day in range, exactly once
    assert(got.size === 2 * 5)
    assert(got(("a", "2024-03-01")) === 2L) // duplicate rows counted
    assert(got(("a", "2024-03-04")) === 1L)
    assert(got(("b", "2024-03-02")) === 1L)
    // gaps are zero-filled, not absent
    assert(got(("a", "2024-03-02")) === 0L && got(("b", "2024-03-05")) === 0L)
    // in-range total is preserved
    assert(got.values.sum === 4L)
  }

  test("bloomPreJoin: result ≡ plain join (no false negatives survive, FPs corrected)") {
    val items = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val got = Relational.bloomPreJoin(items, "l_orderkey", urgent, "o_orderkey", 1000L)
      .select("l_orderkey", "l_extendedprice", "o_orderpriority")
    val want = items.join(urgent, items("l_orderkey") === urgent("o_orderkey"))
      .select("l_orderkey", "l_extendedprice", "o_orderpriority")
    assert(got.count() === want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("bloomPreJoin: probe side is actually pruned before the join") {
    // pin the MECHANISM, not just the result: the scan-side bloom filter
    // must drop (most) non-matching probe rows — at fpp=0.001 over this
    // fixture, survivors stay within 2% of the true match count
    val items = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bf = urgent.stat.bloomFilter("o_orderkey", 1000L, 0.001)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val survivors = items.filter(graft.plans.NativeExpressions
      .bloomContains(col("l_orderkey").cast("long"), bos.toByteArray)).count()
    val trueMatches = items.join(urgent,
      items("l_orderkey") === urgent("o_orderkey"), "left_semi").count()
    val total = items.count()
    assert(survivors >= trueMatches, "bloom must never drop a real match")
    assert(survivors <= trueMatches + (0.02 * total).toLong,
      s"pruning too weak: $survivors survivors vs $trueMatches matches of $total")
    assert(trueMatches < total, "fixture must make pruning observable")
  }

  test("bloomContains: null keys probe as null, never true") {
    import spark.implicits._
    val bf = Tables.orders(spark, sf).stat.bloomFilter("o_orderkey", 1000L, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val df = Seq[java.lang.Long](1L, null).toDF("k")
    val out = df.select(graft.plans.NativeExpressions
      .bloomContains(col("k").cast("long"), bos.toByteArray).as("hit")).collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
  }
}
