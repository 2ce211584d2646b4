package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §5). AQE's skew-join handles
  * sort-merge skew at runtime; explicit salting is the deterministic
  * fallback for severe producer hot keys (one segment receiving a large
  * share of a space's traffic — the same hot-partition problem the
  * reference's per-segment locks serialize on, see
  * `pebblekit/store_seglocks_test.go`).
  *
  * The left (large, skewed) side gets a random salt in [0, salt); the
  * right side is replicated `salt` times; the join key becomes
  * (key, salt) so one hot key spreads over `salt` reducers. Aggregations
  * instead use two-phase partial aggregation, which Spark does natively.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit spurious rows for the salt-replicated
    // right side (each unmatched replica survives independently)
    require(Set("inner", "left", "left_outer", "left_semi")(joinType),
      s"saltedJoin supports inner/left/left_semi joins, not $joinType")
    val saltedLeft = skewed.withColumn("__salt",
      (rand(seed = 7) * salt).cast("int"))
    val replicatedRight = other.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
