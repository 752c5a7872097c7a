package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution profiling over grouped data — the corpus-stats pass a
  * pipeline runs to pick thresholds (length cutoffs, quality gates) before
  * filtering at scale.
  */
object Stats {

  /** Table profile: one row per requested column with row count, null
    * count, exact distinct count, and min/max rendered as strings (numerics
    * through DECIMAL so both engines print identically). The "what am I
    * looking at" pass before choosing filters — one aggregation job, no
    * collect; Spark plans the multi-distinct via Expand, still a single
    * scan of only the profiled columns.
    */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // intermediates are named by POSITION, not by the caller's label — a
    // label with a dot would otherwise parse as struct-field access on the
    // re-select and fail analysis
    val aggs = cols.zipWithIndex.flatMap { case ((_, c), i) => Seq(
      // coalesce: sum over ZERO rows is NULL — an empty table must profile
      // as 0 nulls, not null nulls (downstream getLong would NPE)
      coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$i"),
      countDistinct(c).as(s"__nd_$i"),
      min(c).cast("string").as(s"__min_$i"),
      max(c).cast("string").as(s"__max_$i"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(cols.zipWithIndex.map { case ((name, _), i) => struct(
        lit(name).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_value"),
        col(s"__max_$i").as("max_value"))
      }: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Exact per-group percentiles with EXPLICIT linear interpolation
    * (`v_lo + (v_hi − v_lo) · frac`, `h = (n−1)·p` — the same definition as
    * Spark `percentile` and DuckDB `quantile_cont`). Spelled out rather
    * than delegated to either engine's aggregate so both sides execute the
    * IDENTICAL double operations in the identical order — aggregate
    * internals are free to use `lo·(1−f) + hi·f`, which rounds differently
    * in the last ulp and would make cross-engine hash checks flaky.
    *
    * Shape: one window shuffle on the group key ranks the values; a
    * per-group count then two self-joins fetch the bracketing ranks —
    * O(|groups|·|ps|) probe rows, never a per-group sort on the driver.
    * Equal values make any tie order produce the same rank→value mapping,
    * so row_number needs no tiebreak.
    */
  def groupPercentiles(
      df: DataFrame, groupCol: Column, valueCol: Column,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "percentiles must be in [0,1]")
    val ranked = df.select(groupCol.as("grp"), valueCol.cast("double").as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("v").asc)))
    val probes = ranked.groupBy("grp").agg(max(col("rn")).as("n"))
      .select(col("grp"), col("n"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("h", (col("n") - 1).cast("double") * col("p"))
      .withColumn("lo", floor(col("h")).cast("long"))
      .withColumn("hi", ceil(col("h")).cast("long"))
    val loV = ranked.select(col("grp").as("__lg"), col("rn").as("__lrn"), col("v").as("v_lo"))
    val hiV = ranked.select(col("grp").as("__hg"), col("rn").as("__hrn"), col("v").as("v_hi"))
    probes
      .join(loV, col("grp") === col("__lg") && col("lo") + 1 === col("__lrn"))
      .join(hiV, col("grp") === col("__hg") && col("hi") + 1 === col("__hrn"))
      .select(col("grp"), col("p"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) * (col("h") - col("lo").cast("double")))
          .as("value"))
  }

  /** Approximate twin: Spark's `percentile_approx` (Greenwald-Khanna) with
    * a configurable accuracy. Sketch state is bounded (no per-group sort),
    * which is the variant that runs on a 100 TB column — the exact form
    * above is the oracle-checkable contract and the ground truth the spec
    * compares against.
    */
  def approxGroupPercentiles(
      df: DataFrame, groupCol: Column, valueCol: Column,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCol.as("grp"))
      .agg(percentile_approx(valueCol.cast("double"),
        array(ps.map(lit): _*), lit(accuracy)).as("values"))
      .select(col("grp"),
        explode(arrays_zip(array(ps.map(lit): _*).as("p"), col("values").as("value")))
          .as("pv"))
      .select(col("grp"), col("pv.p").as("p"), col("pv.value").as("value"))
}
