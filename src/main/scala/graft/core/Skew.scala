package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join for hub keys.
  *
  * AQE's skew-join split handles most skew automatically (and the graph
  * algorithms sidestep it by broadcasting the vertex-sized state), but a
  * shuffle join against a dimension too big to broadcast with a few hub
  * keys still hot-spots one reducer. `saltedJoin` spreads each big-side
  * key over `salt` sub-partitions with a deterministic per-row salt and
  * replicates the small side across all of them — the classic two-sided
  * salting, expressed declaratively so Catalyst still plans the join.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salt` ways. Result equals
    * `big.join(small, key)` exactly; only the shuffle layout changes.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltCol = "__graft_salt"
    require(!big.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"column $saltCol already exists")
    // per-POSITION salt (monotonically_increasing_id is stable under task
    // retry: partition id + row index): identical duplicate rows spread
    // too, which a row-content hash cannot do
    val b = big.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val s = small
      .withColumn(saltCol, explode(sequence(lit(0L), lit(salt.toLong - 1))))
    b.join(s, Seq(key, saltCol)).drop(saltCol)
  }
}
