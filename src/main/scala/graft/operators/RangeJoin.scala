package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — pair each left row with every right interval
  * containing its value: `left.v ∈ [right.lo, right.hi]`, optionally
  * also equi-matched on keys. Spark has no native operator; a plain
  * inequality join degenerates to BroadcastNestedLoop/cartesian, the
  * classic scale-killer.
  *
  * Formulation: bin the value domain. The left side lands in the single
  * bin of its value; each right interval replicates to every bin it
  * overlaps (`ceil(length / binWidth) + 1` copies — bounded, chosen by
  * `binWidth`); an EQUI-join on (keys, bin) plus the exact between-filter
  * gives the result with no duplicates (a pair meets only in bin(v)).
  * One hash shuffle on (keys, bin); `binWidth` trades right-side
  * replication against per-bin match width, the standard knob of every
  * distributed interval join.
  */
object RangeJoin {

  /** `binWidth` must be positive; intervals with `lo > hi`, or non-finite
    * bounds/values, match nothing (as in SQL BETWEEN). Both bounds are
    * inclusive. Output = left columns ++ right columns.
    */
  def intervalJoin(
      left: DataFrame,
      vCol: Column,
      right: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def finite(c: Column) = c.isNotNull && !isnan(c.cast("double")) &&
      c.cast("double") =!= Double.PositiveInfinity && c.cast("double") =!= Double.NegativeInfinity
    def bin(c: Column) = floor(c.cast("double") / lit(binWidth)).cast("long")

    val l = left.filter(finite(vCol)).withColumn("__bin", bin(vCol))
    val r = right
      .filter(finite(col(loCol)) && finite(col(hiCol)) && col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))

    l.join(r, keyCols :+ "__bin")
      .filter(vCol >= col(loCol) && vCol <= col(hiCol))
      .drop("__bin")
  }
}
