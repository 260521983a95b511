package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators re-expressed Spark-first.
  *
  * Each function is a pure `DataFrame => DataFrame` plan fragment; the
  * physical strategy (broadcast vs sort-merge, partial aggregation,
  * pushdown) is left to Catalyst + AQE, which is the whole point of
  * declaring these as logical plans instead of hand-scheduling them the
  * way the reference's imperative callers do.
  *
  * Reference call sites (all relative to /root/reference/):
  *  - inner fact join: scripts/spark_jobs/silver_clean_transform.py:103
  *  - semi join via projected inner join: scripts/spark_jobs/bronze_batch_load.py:83-87
  *  - left dim enrich: scripts/spark_jobs/silver_clean_transform.py:72
  *  - dropDuplicates: scripts/spark_jobs/silver_clean_transform.py:74,88
  */
object Relational {

  /** J1 — inner equi-join in USING-column form (single join column in
    * output), as `orders.join(order_items, "order_id", "inner")` at
    * silver_clean_transform.py:103. Both sides large → Catalyst picks
    * sort-merge / shuffled hash; at 100 TB this is the big shuffle, so
    * callers should pre-project columns (ColumnPruning does the rest).
    */
  def factJoin(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "inner")

  /** J2 — keep rows of `df` whose key appears in `keys`. The reference
    * spells this as an inner join against a projected single column
    * (bronze_batch_load.py:83-87), correct only because the key is unique
    * on the other side; the Spark-first form is LEFT SEMI, which never
    * duplicates and lets the planner broadcast the key set.
    */
  def semiJoin(df: DataFrame, keys: DataFrame, key: String): DataFrame =
    df.join(keys.select(key), Seq(key), "left_semi")

  /** The reference's literal formulation of J2, kept for the equivalence
    * test (bronze_batch_load.py:83-87). */
  def semiJoinViaInner(df: DataFrame, keys: DataFrame, key: String): DataFrame =
    df.join(keys.select(key).dropDuplicates(key), Seq(key), "inner")

  /** Bloom-filter pre-join — the shuffle reducer for a selective
    * big-to-big join, the technique Spark's own `InjectRuntimeFilter`
    * applies when statistics let it (and this operator applies when the
    * CALLER knows the selectivity Catalyst can't see). Three phases:
    *
    *  1. build: one pass over the build side's join keys aggregates a
    *     Bloom filter (`df.stat.bloomFilter` — Spark's public sketch;
    *     a distributed treeAggregate whose result is the filter's bit
    *     array, NOT the keys);
    *  2. probe: the serialized filter rides a codegen'd
    *     [[graft.plans.BloomContainsLong]] predicate that drops
    *     non-matching probe rows AT THE SCAN, before they are ever
    *     shuffled — no false negatives, so no matching row is lost;
    *  3. join: the standard equi-join on the survivors; Bloom false
    *     positives (rate `fpp`) are eliminated here, which is why the
    *     result is EXACTLY the plain join (q123's oracle proves it).
    *
    * 100 TB sizing: the filter is ~1.2·n·ln(1/fpp)/ln²2 bits — 1e8 build
    * keys at 1 % is ~120 MB, the practical ceiling for plan-shipped
    * state; beyond that, raise fpp (the join still corrects it) or fall
    * back to the shuffle join. The win is (1−selectivity)·|probe| rows
    * of shuffle I/O; at a 5 % match rate the big side's shuffle drops
    * 20×. Callers size `expectedItems` ≥ the true build-key count — an
    * undersized filter only raises fpp (correctness is unaffected). */
  def bloomPreJoin(probe: DataFrame, probeKey: String,
                   build: DataFrame, buildKey: String,
                   expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // Both keys MUST be integral: the probe path is a cast-to-long
    // codegen predicate, and stat.bloomFilter hashes a string build key
    // AS A STRING — the two hash spaces would disagree and the "exactly
    // the plain join" contract would break silently (dropped rows for
    // an uncastable probe key, arbitrary pruning otherwise). Fail loudly
    // instead; the filter itself is then built over the same
    // cast-to-long expression the probe uses.
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    for ((df, key, side) <- Seq((probe, probeKey, "probe"), (build, buildKey, "build"))) {
      val dt = df.schema(key).dataType
      require(integral(dt),
        s"bloomPreJoin $side key '$key' must be integral (byte/short/int/long), got $dt")
    }
    // Spark's stat.bloomFilter NPEs when the build side is EMPTY (its
    // internal aggregate yields null bytes) — and an empty increment is
    // a normal input, not an error (EdgeCasesSpec). An empty filter is
    // the correct algebra: it contains nothing, so the probe prunes to
    // zero rows and the join is empty, exactly like the plain join.
    val bf = try build.select(col(buildKey).cast("long").as(buildKey))
        .stat.bloomFilter(buildKey, expectedItems, fpp)
      catch { case _: NullPointerException =>
        org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp) }
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val pruned = probe.filter(
      graft.plans.NativeExpressions.bloomContains(col(probeKey).cast("long"), bos.toByteArray))
    pruned.join(build, pruned(probeKey) === build(buildKey), "inner")
  }

  /** J3/J4 — left-outer dim enrichment with an explicit broadcast hint:
    * dims (categories=13 rows, products=20k in the reference) must never
    * shuffle the fact side. AQE would usually get this right; the hint
    * makes it deterministic at 100 TB where stats may mislead.
    */
  def dimEnrich(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key), "left")

  /** A4 (deterministic form) — latest row per key. The reference's
    * `dropDuplicates(key)` keeps an arbitrary row; the testable variant
    * is `row_number() == 1` over (orderCols) desc. Single shuffle on
    * `key`, then a per-partition sort — no second pass.
    */
  def latestPerKey(df: DataFrame, key: String, orderCols: Column*): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W2 (batch form) — bounded per-key recency list: keep the `n` most
    * recent rows per key (the Redis `LPUSH`+`LTRIM 0 49` semantics at
    * streaming_flow.py:109-110), with the position exposed as `rn`.
    */
  def boundedRecentPerKey(df: DataFrame, key: String, n: Int, orderCols: Column*): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** W3 — global top-N with a deterministic total order (tie-broken by
    * `tieBreak` asc). Emits `rank`. The plan is agg → single-partition
    * window over the (small) aggregated set; the window input is the
    * aggregate output, never the fact table, so this survives scale-up.
    */
  def topN(aggregated: DataFrame, n: Int, measure: Column, tieBreak: Column): DataFrame = {
    val w = Window.orderBy(measure.desc, tieBreak.asc)
    aggregated.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }

  /** Top-N per group: rank within `partCols` by `measure` desc with a
    * deterministic tiebreak, keep `n`. */
  def topNPerGroup(df: DataFrame, n: Int, partCols: Seq[Column],
                   measure: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(measure.desc, tieBreak.asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }

  /** AS-OF join — for each left row, the single right row with the
    * largest `rightTime` ≤ `leftTime` within the same key (the
    * point-in-time lookup Spark lacks natively; preference tier (a)
    * from the build contract: composed from built-ins).
    *
    * Plan: tag both sides, UNION, one window pass per key ordered by
    * (time, right-before-left-on-ties) carrying the right payload
    * forward with `last(ignoreNulls)`, keep left rows. ONE shuffle on
    * the key + a per-partition sort — the same cost envelope as a
    * sort-merge join, and strictly better than the naive
    * inequality-join (which explodes to a range join).
    *
    * Requirements: `right` must be unique per (key, rightTime) —
    * deduplicate first or the match is ambiguous; times must be the
    * same integer unit on both sides (epoch micros recommended).
    * Left rows with no prior right row keep null payload.
    *
    * The payload travels as ONE struct per right row (not per-column):
    * `last(ignoreNulls)` over the struct then means exactly "no prior
    * right row". A per-column carry would skip a genuinely-NULL payload
    * value and resurrect an older row's value for that column —
    * diverging from true as-of semantics (and from the native exec /
    * DuckDB ASOF) on nullable payloads. One window expression instead
    * of |payload| is also the cheaper plan.
    */
  def asOfJoin(left: DataFrame, leftTime: String,
               right: DataFrame, rightTime: String,
               key: String, rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty,
      "asOfJoin needs at least one right payload column: an empty payload " +
        "struct has no analyzable carry (and matches nothing useful)")
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val lAligned = l.select(
      Seq(col(key), col("__t"), col("__side"), lit(null).as("__p")) ++
        left.columns.filterNot(_ == key).map(c => col(c).as(s"__l_$c")): _*)
    // null-key/time right rows can never be an as-of match (SQL equi
    // semantics: null ≠ null); left nulls need no guard — a null key
    // partitions only with (now-excluded) null-key right rows and a
    // null time sorts before every right row, so both carry no payload
    val r = right.filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
        Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
          struct(rightPayload.map(col): _*).as("__p")) ++
          left.columns.filterNot(_ == key).map(c => lit(null).as(s"__l_$c")): _*)
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc) // right sorts before left at equal t (<= semantics)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = lAligned.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(Seq(col(key)) ++
        left.columns.filterNot(_ == key).map(c => col(s"__l_$c").as(c)) ++
        rightPayload.map(c => col("__p").getField(c).as(c)): _*)
  }

  /** Temporal densification: per key, every day in [start, end] with
    * that day's row count, zero-filled where the fact has a gap — the
    * regular series dashboards chart and window functions step over.
    *
    * The spine is built by EXPLODING the day sequence onto the distinct
    * key set — an explode, never a cross join, so the plan carries no
    * nested-loop node and spine construction parallelizes over keys.
    * At 100 TB the spine is |keys|·days rows — tiny next to the fact —
    * and the left join back is an equi-join on (key, day) that
    * broadcasts whenever the spine is small. `dayCol` must already be
    * a date (cast timestamps first). Oracled as q85. */
  def gapFillDailyCounts(df: DataFrame, keyCol: String, dayCol: String,
                         start: java.sql.Date, end: java.sql.Date): DataFrame = {
    val spine = df.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(expr(s"sequence(date'$start', date'$end', interval 1 day)")).as(dayCol))
    val counts = df
      .filter(col(dayCol).between(lit(start), lit(end)))
      .groupBy(keyCol, dayCol).agg(count(lit(1)).as("n_rows"))
    spine.join(counts, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }
}
