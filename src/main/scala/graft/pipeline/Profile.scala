package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** One-pass column profiler — the ANALYZE / dbt-profile / data-catalog
  * summary every curation run wants before trusting a new table:
  * per column, row count, null count, exact distinct count, and
  * (numeric columns) min/max as doubles.
  *
  * Shape: ONE aggregate over the table computes every metric for every
  * column (multiple exact `countDistinct`s plan through Catalyst's
  * Expand — one scan, k-way row expansion), then the single result row
  * is exploded into one row per column. The scan cost is paid once
  * regardless of column count; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` to drop the Expand — same plan otherwise
  * (the exact form is kept here because the driver gate hash-compares
  * it against DuckDB).
  *
  * min/max are emitted ONLY for numeric columns (cast to double):
  * cross-engine string rendering of floats is not bit-stable, and a
  * profile row must be — string columns carry nulls there.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(count(c).as(s"${f.name}__nonnull"),
        countDistinct(c).as(s"${f.name}__distinct")) ++
        (if (f.dataType.isInstanceOf[NumericType])
          Seq(min(c).cast(DoubleType).as(s"${f.name}__min"),
            max(c).cast(DoubleType).as(s"${f.name}__max"))
        else Nil)
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val perCol = cols.map { f =>
      val numeric = f.dataType.isInstanceOf[NumericType]
      struct(
        lit(f.name).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"${f.name}__nonnull")).as("n_nulls"),
        col(s"${f.name}__distinct").as("n_distinct"),
        (if (numeric) col(s"${f.name}__min") else lit(null).cast(DoubleType)).as("min_value"),
        (if (numeric) col(s"${f.name}__max") else lit(null).cast(DoubleType)).as("max_value"))
    }
    row.select(explode(array(perCol.toIndexedSeq: _*)).as("p")).select($"p.*")
  }
}
