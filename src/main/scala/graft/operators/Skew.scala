package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * First line of defense at scale is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with our
  * sessions). Salting is the explicit fallback for pathologically hot keys
  * (e.g. a null-ish default key holding 10% of 100 TB) or for engines/modes
  * where AQE can't rewrite the join (e.g. streaming-static joins).
  */
object Skew {

  /** Salted inner equi-join: the skewed (large) side gets a random-but-
    * deterministic salt in [0, saltFactor); the small side is exploded
    * `saltFactor`× so every (key, salt) bucket finds its match. Result is
    * row-identical to `large.join(small, keys)` with the hot key's rows
    * spread over `saltFactor` tasks instead of one.
    *
    * The salt is derived from a hash of the large side's whole row content
    * (`xxhash64` over all columns), not `rand()`, so the plan stays
    * deterministic and retry-safe (a recomputed task re-salts identically).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    saltedLarge.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
