package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 physical-execution
  * posture; the 100 TB answer when one join key holds a double-digit
  * percentage of rows and AQE's skew-join split isn't available — e.g.
  * the shuffle partner is an aggregation, or the skew is in a
  * broadcast-ineligible dimension).
  *
  * Mechanics: the skewed (large, hot-keyed) side gets a random salt in
  * [0, saltFactor); the other side is exploded `saltFactor`× so every
  * (key, salt) bucket finds its match. Row multiplication is confined to
  * the *small* side; the hot key's rows spread over `saltFactor`
  * reducers instead of one.
  *
  * Semantics: identical to `left.join(right, keys, "inner")` — proven by
  * the equivalence test in SkewJoinSpec. Prefer AQE
  * (`spark.sql.adaptive.skewJoin`) when it applies; this is the explicit
  * form for when it doesn't.
  */
object SkewJoin {

  def saltedInnerJoin(skewed: DataFrame, other: DataFrame, key: String,
                      saltFactor: Int = 8): DataFrame = {
    val saltCol = "__graft_salt"
    val salted = skewed.withColumn(saltCol,
      (rand(seed = 42) * saltFactor).cast("int"))
    val exploded = other.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, saltCol), "inner").drop(saltCol)
  }
}
