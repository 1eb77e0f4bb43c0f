package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-join salting: when one join key carries a disproportionate share
  * of the big side (a hot user, an empty-string key), a plain shuffled
  * join sends that key's entire volume to one task. Salting splits the
  * hot key across `salts` tasks: the big side gets a random-but-
  * deterministic salt per row; the small side is replicated once per
  * salt value. Complements AQE's skew-split (which only kicks in above
  * partition-size thresholds and can't split a single key).
  */
object Salting {

  /** Equi-join `big ⋈ small` on `key` with the big side salted `salts`
    * ways. Semantics identical to `big.join(small, key)`; cost is a
    * `salts`× replication of the (small) build side. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    // Replicating the small side is only sound when unmatched SMALL rows
    // are dropped: a right/full join would emit each unmatched small row
    // once per salt.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    // Deterministic spread: hash of the whole row modulo salts (row
    // identity, not the key — the point is to split a single hot key).
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig
      .join(explodedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
