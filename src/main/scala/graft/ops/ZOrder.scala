package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) interleaving for multi-column data skipping — the
  * layout service behind Hudi's z-order clustering and Delta's OPTIMIZE
  * ZORDER BY. A linear sort gives parquet min/max pruning on ONE column;
  * interleaving the bits of several normalized columns gives every file a
  * bounded range on EACH of them, so selective filters on any clustered
  * column skip most files.
  *
  * Columns are normalized to per-column-bit integers against their global
  * min/max (one tiny agg job — the same pass Delta's range-id sampling
  * does), then bit-interleaved with pure shift/and expressions: fully
  * codegen'd, no UDFs. Numeric, date, and timestamp (with and without
  * zone) columns are supported; strings would need a rank pass and are
  * rejected. NaN values and all-null/all-NaN columns degrade to constant 0
  * (they cannot be ordered meaningfully anyway); the total interleaved
  * width is capped at 63 bits — per-column bits shrink automatically as
  * columns are added, so the sign bit is never touched.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each normalized column:
    * out bit (i*n + j) = bit i of column j. Callers must keep
    * `bits * n <= 63` ([[withZValue]] enforces it).
    */
  def interleave(normalized: Seq[Column], bits: Int): Column = {
    val n = normalized.size
    require(bits * n <= 63, s"interleave of $n columns x $bits bits exceeds a signed long")
    val terms = for {
      i <- 0 until bits
      (c, j) <- normalized.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** A sortable double view of a numeric/temporal column; NaN and ±Infinity
    * → null so a single bad value cannot poison the min/max stats or blow
    * the ANSI cast mid-rewrite (Inf/Inf = NaN, and casting either to long
    * throws under Spark's default ANSI mode).
    */
  private def asNum(c: Column, dt: DataType): Column = dt match {
    case _: NumericType =>
      val d = nanvl(c.cast("double"), lit(null))
      when(d === Double.PositiveInfinity || d === Double.NegativeInfinity, lit(null))
        .otherwise(d)
    case DateType => unix_date(c).cast("double")
    case TimestampType => c.cast("double")
    case TimestampNTZType => c.cast("timestamp").cast("double")
    case other => throw new IllegalArgumentException(
      s"z-order column must be numeric or temporal, got $other")
  }

  /** Normalize to [0, 2^bits): nulls (and NaN, mapped to null above) sort
    * first at 0, matching an ascending NULLS FIRST sort.
    */
  private def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    val maxV = (1L << bits) - 1
    coalesce(
      least(lit(maxV), greatest(lit(0L),
        ((c - lit(lo)) / lit(span) * lit(maxV.toDouble)).cast("long"))),
      lit(0L))
  }

  /** Append a `_zvalue` column interleaving `zCols`. One agg job computes
    * the global min/max per column; everything else is row-local. The
    * per-column bit width is `min(bits, 63 / n)` so the interleaved value
    * always fits a positive signed long.
    */
  def withZValue(df: DataFrame, zCols: Seq[String], bits: Int = 16): DataFrame = {
    require(zCols.nonEmpty, "z-order needs at least one column")
    require(zCols.size <= 63, s"cannot z-order ${zCols.size} columns (max 63)")
    val effBits = math.max(1, math.min(bits, 63 / zCols.size))
    val nums = zCols.map(c => asNum(col(c), df.schema(c).dataType))
    val statExprs = nums.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c).as(s"__lo_$i"), max(c).as(s"__hi_$i")) }
    val stats = df.agg(statExprs.head, statExprs.tail: _*).head()
    val normalized = nums.zipWithIndex.map { case (c, i) =>
      // all-null / all-NaN column: stats are null — degrade to constant 0
      if (stats.isNullAt(2 * i)) lit(0L)
      else normalize(c, stats.getDouble(2 * i), stats.getDouble(2 * i + 1), effBits)
    }
    df.withColumn("_zvalue", interleave(normalized, effBits))
  }

  /** Rewrite `df` z-ordered: range-partition + sort by (leadingKeys,
    * z-value), then drop the helper column — the write-side shape for
    * [[graft.table.KeyedTable.clusterZ]], where `leadingKeys` are the
    * table's partition columns.
    */
  def layout(df: DataFrame, zCols: Seq[String], leadingKeys: Seq[Column] = Nil,
      bits: Int = 16): DataFrame = {
    val keys = leadingKeys :+ col("_zvalue")
    withZValue(df, zCols, bits)
      .repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop("_zvalue")
  }
}
