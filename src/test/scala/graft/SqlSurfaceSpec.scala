package graft

import org.apache.spark.sql.functions._

/** The BI / ad-hoc SQL seam ([[Tables.registerAll]] + SqlQueries):
  * analyst text must hit the same optimized scan path as programmatic
  * plans — views are not allowed to cost anything. */
class SqlSurfaceSpec extends SparkSpec {

  test("registerAll: analyst SQL over the views pushes filters and prunes columns at the scan") {
    Tables.registerAll(spark, sf)
    val df = spark.sql(
      "SELECT l_partkey, l_quantity FROM lineitem WHERE l_quantity > 30")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30"),
      s"filter did not reach the parquet scan:\n${plan.take(1500)}")
    assert(plan.contains("ReadSchema: struct<l_partkey:bigint,l_quantity:"),
      s"projection did not prune the scan:\n${plan.take(1500)}")
  }

  test("registerAll: events view serves NORMALIZED ts (epoch-nanos long) to SQL text") {
    Tables.registerAll(spark, sf)
    val t = spark.sql("SELECT ts FROM events").schema("ts").dataType
    assert(t === org.apache.spark.sql.types.LongType, s"got $t")
    // and re-registering is idempotent (createOrReplace semantics)
    Tables.registerAll(spark, sf)
    assert(spark.sql("SELECT COUNT(*) FROM events").first().getLong(0) ===
      Tables.events(spark, sf).count())
  }
}
