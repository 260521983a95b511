package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot keys that
  * AQE's skew-join splitting can't fully absorb (a single key larger
  * than one executor's memory).
  *
  * Classic two-sided salting: the skewed (large) side gets a random
  * salt in [0, salts); the small side is replicated `salts` times with
  * every salt value; the join key becomes (key, salt). The hot key's
  * rows spread over `salts` partitions at the cost of replicating the
  * small side — acceptable exactly when the small side is broadcast-
  * size-ish but the join itself can't broadcast (e.g. both sides too
  * wide, or outer-join shapes AQE won't convert).
  *
  * Semantics: identical to the plain inner equi-join (every pair meets
  * exactly once, because each large-side row carries ONE salt and the
  * small side covers ALL salts).
  */
object Skew {

  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     salts: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
