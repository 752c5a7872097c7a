package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-column data skipping — the
  * layout service behind Hudi's z-order clustering and Delta's OPTIMIZE
  * ZORDER BY. A linear sort gives parquet min/max pruning on ONE column;
  * interleaving the bits of several normalized columns gives every file a
  * bounded range on EACH of them, so selective filters on any clustered
  * column skip most files.
  *
  * Columns are normalized to `bits`-bit integers against their global
  * min/max (one tiny agg job — the same pass Delta's range-id sampling
  * does), then bit-interleaved with pure shift/and expressions: fully
  * codegen'd, no UDFs. Numeric, date, and timestamp columns are supported
  * (they cast to double); strings would need a rank pass and are rejected.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each normalized column:
    * out bit (i*n + j) = bit i of column j.
    */
  def interleave(normalized: Seq[Column], bits: Int): Column = {
    val n = normalized.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- normalized.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Normalize a numeric/temporal column to [0, 2^bits) against the given
    * min/max (constant fold once the stats are known).
    */
  private def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    val maxV = (1L << bits) - 1
    // nulls sort first (0), matching NULLS FIRST of an ascending sort
    coalesce(
      least(lit(maxV), greatest(lit(0L),
        ((c.cast("double") - lit(lo)) / lit(span) * lit(maxV.toDouble)).cast("long"))),
      lit(0L))
  }

  /** Append a `_zvalue` column interleaving `zCols`. One agg job computes
    * the global min/max per column; everything else is row-local.
    */
  def withZValue(df: DataFrame, zCols: Seq[String], bits: Int = 16): DataFrame = {
    require(zCols.nonEmpty, "z-order needs at least one column")
    zCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.DateType ||
        dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType,
        s"z-order column '$c' must be numeric or temporal, got $dt")
    }
    val statExprs = zCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__lo_$c"), max(col(c).cast("double")).as(s"__hi_$c")))
    val stats = df.agg(statExprs.head, statExprs.tail: _*).head()
    val normalized = zCols.zipWithIndex.map { case (c, i) =>
      normalize(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
    }
    df.withColumn("_zvalue", interleave(normalized, bits))
  }

  /** Rewrite `df` z-ordered: range-partition + sort by the interleaved
    * value, then drop it. The write-side shape for [[graft.table.KeyedTable.clusterZ]].
    */
  def layout(df: DataFrame, zCols: Seq[String], bits: Int = 16): DataFrame =
    withZValue(df, zCols, bits)
      .repartitionByRange(col("_zvalue"))
      .sortWithinPartitions("_zvalue")
      .drop("_zvalue")
}
