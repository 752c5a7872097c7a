package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for every left row, the latest right row
  * with `right.ts <= left.ts` on the same key (the feature-lookup /
  * snapshot-enrichment join; DuckDB spells it ASOF JOIN, Spark has no
  * native operator).
  *
  * Formulation: tag and UNION the two sides, then one window per key
  * ordered by time carries the last right-side payload forward onto each
  * left row. This is the shape that survives scale: a single hash shuffle
  * on the key, no time-range pair explosion (a naive `l.ts >= r.ts`
  * inequality join is a per-key cross product that Catalyst can only
  * nested-loop), and skew bounded by the hottest key like any windowed
  * pipeline. Right rows sort BEFORE left rows at equal timestamps, so an
  * exactly-simultaneous snapshot matches (>= semantics, like ASOF JOIN);
  * duplicate right timestamps resolve deterministically to the largest
  * payload struct; a null left timestamp matches nothing.
  */
object AsofJoin {

  /** Left-join each `left` row to the latest `right` row at or before its
    * timestamp, per `keyCols`. `rightCols` are appended (null when no
    * right row precedes), renamed with `prefix` on collision; the matched
    * right timestamp is exposed as `<prefix><rightTs>`.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      prefix: String = ""): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    val outCols = (rightTs +: rightCols).map(c => c -> s"$prefix$c")
    outCols.map(_._2).foreach(n => require(!left.columns.contains(n),
      s"output column '$n' collides with a left column — set a prefix"))

    val rStruct = struct((rightTs +: rightCols).map(col): _*)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      .filter(col(rightTs).isNotNull)
      .select(keyCols.map(col) :+ col(rightTs).as("__ts") :+ rStruct.as("__r"): _*)
      .withColumn("__side", lit(0))

    // __r as the last sort key: duplicate right timestamps resolve to the
    // lexicographically largest payload — deterministic, engine-portable
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched: Column = last(col("__r"), ignoreNulls = true).over(w)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        outCols.map { case (src, out) => col(s"__m.$src").as(out) }: _*)
  }
}
