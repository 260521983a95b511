package graft

import org.apache.spark.sql.functions._

/** Sampling semantics for the training-data pipeline surface (q45). */
class SamplingSpec extends SparkSpec {

  test("seeded sample is deterministic across runs") {
    val c = Tables.customer(spark, sf)
    val a = c.sample(false, 0.1, 42).select("c_custkey").collect().map(_.getLong(0)).toSet
    val b = c.sample(false, 0.1, 42).select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty)
    // different seed samples differently
    val other = c.sample(false, 0.1, 43).select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(a !== other)
  }

  test("stratified sampleBy respects per-stratum fractions (loose bounds)") {
    val c = Tables.customer(spark, "/root/testdata/sf0.01") // 1500 rows, ~300/segment
    val fractions = Map("AUTOMOBILE" -> 0.5, "BUILDING" -> 0.1)
    val got = c.stat.sampleBy("c_mktsegment", fractions, 42L)
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = c.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // unlisted strata are dropped entirely
    assert(got.keySet === Set("AUTOMOBILE", "BUILDING"))
    val autoRate = got("AUTOMOBILE").toDouble / totals("AUTOMOBILE")
    val buildRate = got("BUILDING").toDouble / totals("BUILDING")
    assert(autoRate > 0.35 && autoRate < 0.65, s"auto=$autoRate")
    assert(buildRate > 0.02 && buildRate < 0.2, s"build=$buildRate")
  }

  test("approx_percentile (q82) tracks the exact percentiles (q38) within rank tolerance") {
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
    val exact = o.groupBy("o_orderstatus")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("m"),
        percentile(col("o_totalprice"), lit(0.9)).as("p"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = o.groupBy("o_orderstatus")
      .agg(approx_percentile(col("o_totalprice"), lit(0.5), lit(10000)).as("m"),
        approx_percentile(col("o_totalprice"), lit(0.9), lit(10000)).as("p"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    // accuracy=10000 ⇒ rank error ≤ n/10000; on these group sizes the
    // estimate should land within 2% of the exact VALUE
    approx.foreach { case (k, (m, p)) =>
      val (em, ep) = exact(k)
      assert(math.abs(m - em) / em < 0.02, s"$k median: $m vs $em")
      assert(math.abs(p - ep) / ep < 0.02, s"$k p90: $p vs $ep")
    }
  }

  test("token-budget fill (q126): budget respected, greedy-maximal, deterministic") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.queries.TrainingQueries.q126.fn(spark, dir).cache()
    // budget is never exceeded
    assert(out.filter(col("cum_tokens") > 800).isEmpty)
    // greedy maximality: for each source, the NEXT doc in hash order
    // (first one excluded) would have pushed the total past the budget
    val h = graft.functions.Hashes
      .h60(concat(lit("fill|"), col("doc_id").cast("string")))
    val ranked = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"),
        graft.functions.Text.tokenCount(col("text")).cast("long").as("n_tokens"), h.as("h"))
    val taken = out.groupBy("source")
      .agg(max(col("cum_tokens")).as("total"), count(lit(1)).as("n_taken"))
    val firstExcluded = ranked.join(out.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(min_by(col("n_tokens"), struct(col("h"), col("doc_id"))).as("next_tokens"))
    val joined = taken.join(firstExcluded, Seq("source")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val total = r.getLong(1); val next = r.getLong(3)
      assert(total + next > 800, s"${r.getString(0)}: $total + $next fits — fill not maximal")
    }
    // deterministic across runs
    val again = graft.queries.TrainingQueries.q126.fn(spark, dir)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("temperature mix (q131): keep rate tracks the rational target, flattens the head language") {
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val kept = graft.queries.TrainingQueries.q131.fn(spark, dir)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptN = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // recompute the exact rational keep probability per lang
    val toks = docs.select(col("lang"),
      graft.functions.Text.tokenCount(col("text")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("n_lang")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val isq = toks.view.mapValues(n => math.floor(math.sqrt(n.toDouble)).toLong).toMap
    val ssum = isq.values.sum
    val p = toks.map { case (l, n) =>
      l -> math.min(1.0, 15000.0 * isq(l) / (ssum.toDouble * n)) }
    // α=0.5 flattening: the head language keeps a LOWER fraction than the tail
    val rate = keptN.map { case (l, k) => l -> k.toDouble / total(l) }
    assert(p("en") < p("fr") && rate("en") < rate("fr"),
      s"temperature must flatten: en ${rate("en")} vs fr ${rate("fr")}")
    // measured keep rate within binomial noise of the exact target (3σ)
    p.foreach { case (l, pi) =>
      val n = total(l); val sd = math.sqrt(pi * (1 - pi) / n)
      assert(math.abs(rate(l) - pi) < 3 * sd + 0.02,
        s"$l: rate ${rate(l)} vs target $pi (n=$n)")
    }
  }

  test("sequence packing (q141): per-source offsets tile exactly, seq ids consistent, deterministic") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.queries.TrainingQueries.q141.fn(spark, dir).cache()
    // offsets per source are a gapless, non-overlapping tiling of
    // [0, total_tokens): sum of lengths == max end, min start == 0,
    // and no two docs overlap (distinct starts == docs and the sorted
    // layout is contiguous)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val sorted = docs.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"$src: first start != 0")
      sorted.sliding(2).foreach {
        case Array((_, _, n1, s1, _, _), (_, _, _, s2, _, _)) =>
          assert(s1 + n1 === s2, s"$src: gap or overlap at offset $s2")
        case _ =>
      }
      docs.foreach { case (_, _, n, s, fs, ls) =>
        assert(fs === s / 512 && ls === (s + n - 1) / 512,
          s"$src: seq ids inconsistent with offsets")
      }
    }
    // deterministic (keyed-hash order, not partition order)
    val again = graft.queries.TrainingQueries.q141.fn(spark, dir)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("sequence materialization (q145) is consistent with the packing map (q141)") {
    val dir = "/root/testdata/sf0.01"
    val seqs = graft.queries.TrainingQueries.q145.fn(spark, dir).cache()
    val map = graft.queries.TrainingQueries.q141.fn(spark, dir).cache()
    val rows = seqs.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // every sequence is exactly 512 tokens except each source's last
    rows.groupBy(_._1).foreach { case (src, ss) =>
      val lastId = ss.map(_._2).max
      ss.foreach { case (_, id, text, n) =>
        assert(n === text.split(" ").length, s"$src/$id: token count vs text")
        if (id != lastId) assert(n === 512L, s"$src/$id: interior sequence not full")
      }
      // seq ids are contiguous from 0
      assert(ss.map(_._2).sorted.toSeq === (0L to lastId).toSeq)
    }
    // the map's per-doc spans land inside the materialized sequences:
    // total tokens agree per source, and max last_seq == max seq_id
    val mapAgg = map.groupBy("source")
      .agg(sum("n_tokens").as("nt"), max("last_seq").as("ls"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.groupBy(_._1).foreach { case (src, ss) =>
      assert(ss.map(_._4).sum === mapAgg(src)._1, s"$src: token totals disagree")
      assert(ss.map(_._2).max === mapAgg(src)._2, s"$src: last sequence id disagrees")
    }
  }

  test("contamination overlap (q142): fraction bounds, and a verbatim reference copy scores 1.0") {
    import spark.implicits._
    // doc 8 is a verbatim copy of reference doc 0 (mod-7 split: 0 and
    // 7 are reference, 8/9 are corpus); doc 9 shares nothing
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (8L, "alpha beta gamma delta epsilon zeta"),
      (9L, "one two three four five six")).toDF("doc_id", "text")
    val grams = graft.functions.Dedup.shingles(docs, "doc_id", "text", 3)
    val ref = grams.filter(col("doc_id") % 7 === 0).select("gram").distinct()
    val cg = grams.filter(col("doc_id") % 7 =!= 0)
    val out = cg.join(ref.withColumn("in_ref", lit(1L)), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(when(col("in_ref").isNotNull, 1L).otherwise(0L)).as("o"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(8L)._1 === out(8L)._2 && out(8L)._1 === 4L) // 6 tokens -> 4 trigrams, all in ref
    assert(out(9L)._2 === 0L)
  }
}
