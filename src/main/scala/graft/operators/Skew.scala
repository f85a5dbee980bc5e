package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4 / the 100 TB checklist).
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most cases at
  * runtime; `saltedJoin` is the explicit form for when the skew is known
  * up front (a handful of whale keys) or the join side can't be split by
  * AQE (e.g. a replicated build side that must stay broadcastable per salt).
  */
object Skew {

  /** Salted equi-join: the large (skewed) side scatters each row into one
    * of `salts` sub-keys via a deterministic hash of `saltBy`; the small
    * side replicates once per salt. The hot key's rows spread across
    * `salts` reducers instead of one.
    *
    * Semantics: equivalent to `large.join(small, key, joinType)` for
    * inner/left joins (every large row meets every matching small row
    * exactly once — the small side copy with the matching salt).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, saltBy: Column,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
