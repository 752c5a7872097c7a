package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution concentrates on few hot
  * keys (AQE's skew-join handles sort-merge spills at runtime; salting fixes
  * it structurally and also covers broadcast-ineligible dimension joins).
  *
  * The big side scatters each row into one of `salt` sub-keys via a
  * DETERMINISTIC expression over its own columns (never rand() — plans must
  * stay replayable and oracle-verifiable); the small side replicates `salt`
  * times. Join output is identical to the unsalted join.
  */
object Skew {

  /** Inner equi-join of `big` ⋈ `small` on `keys`, salted `salt` ways.
    * `saltExpr` must be a deterministic int expression over `big`'s columns
    * (e.g. `pmod(hash(col("some_col")), salt)`).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int, saltExpr: Column): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(saltExpr.cast("int"), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
