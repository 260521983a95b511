package graft

import org.apache.spark.sql.functions._

/** [[ScaleUp.scaleRelational]] invariants — the null model behind the
  * graph-tier scaling rows (r12 verdict item 1). A broken replicator
  * would silently measure the wrong workload: verbatim copies measure
  * constant input, naive row duplication injects ×k² pair mass. The
  * honest model is k DISJOINT copies of the relational universe, and
  * these are the properties that make the measured exponent mean
  * "engine work per unit corpus".
  */
class ScaleUpSpec extends SparkSpec {

  test("scaleRelational: k disjoint relational universes — FKs hold, graph work ×k, names stay ED-disjoint") {
    val k = 3
    val dst = java.nio.file.Files.createTempDirectory("graft_scaleup_").toString
    ScaleUp.scaleRelational(spark, sf, dst, k)
    val li0 = Tables.lineitem(spark, sf)
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val ord = spark.read.parquet(s"$dst/orders.parquet")
    val part = spark.read.parquet(s"$dst/part.parquet")
    val cust = spark.read.parquet(s"$dst/customer.parquet")
    assert(li.count() === k * li0.count())
    assert(ord.count() === k * Tables.orders(spark, sf).count())

    // referential integrity WITHIN every replica: each replicated line
    // item still finds its (offset) order and part; each order its
    // customer — no dangling keys anywhere in the scaled directory
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").isEmpty)
    assert(li.join(part, li("l_partkey") === part("p_partkey"), "left_anti").isEmpty)
    assert(ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti").isEmpty)

    // the co-purchase graph recurs EXACTLY once per replica: distinct
    // co-ordered part pairs count ×k (disjoint copies — never the ×k²
    // a same-keyspace duplication would produce), and every edge stays
    // within one replica's part-key band
    def edges(l: org.apache.spark.sql.DataFrame) = {
      val op = l.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      op.select(col("o"), col("p").as("a"))
        .join(op.select(col("o"), col("p").as("b")), Seq("o"))
        .filter(col("a") < col("b")).select("a", "b").distinct()
    }
    val e0 = edges(li0.select("l_orderkey", "l_partkey")).count()
    val eK = edges(li.select("l_orderkey", "l_partkey"))
    assert(eK.count() === k * e0)
    val partStep = Tables.part(spark, sf).agg(max("p_partkey")).first().getLong(0) + 1
    assert(eK.filter(col("a").divide(partStep).cast("long") =!=
      col("b").divide(partStep).cast("long")).isEmpty,
      "a co-purchase edge crossed replica bands")

    // q189/q238's workload: replica suffixes ("~rrr") keep
    // intra-replica edit distances (common suffix) while any two
    // replica suffixes differ in 3 positions (base vs replica: 4
    // insertions), so BOTH fuzzy radii stay replica-local: the ED ≤ 1
    // pair set and the nation-blocked ED ≤ 2 pair set are each exactly
    // k copies of the base
    val p0 = graft.functions.FuzzyJoin.ed1Pairs(Tables.customer(spark, sf), "c_name").count()
    val pK = graft.functions.FuzzyJoin.ed1Pairs(cust, "c_name")
    assert(pK.count() === k * p0)
    val q0 = graft.functions.FuzzyJoin.ed2PairsBlocked(
      Tables.customer(spark, sf), "c_name", "c_nationkey").count()
    val qK = graft.functions.FuzzyJoin.ed2PairsBlocked(
      cust, "c_name", "c_nationkey").count()
    assert(qK === k * q0,
      s"ED<=2 pair set must be k copies of the base, got $qK vs $k*$q0")
    val custStep = math.max(
      Tables.customer(spark, sf).agg(max("c_custkey")).first().getLong(0),
      spark.read.parquet(s"$sf/events.parquet").agg(max("user_id")).first().getLong(0)) + 1
    // and the shared user/customer step keeps events ↔ customer joins
    // within-replica: every scaled event user resolves to a customer
    val ev = ScaleUp.scaleEvents(
      spark.read.parquet(s"$sf/events.parquet"), k, Some(custStep))
    assert(ev.join(cust, ev("user_id") === cust("c_custkey"), "left_anti").isEmpty,
      "scaled events.user_id must stay a c_custkey FK under the shared step")
  }
}
