package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LM training (x59): concatenate the corpus in a
  * deterministic document order and cut it into fixed-capacity context
  * windows — the "concat-and-chunk" packing every GPT-style pretraining
  * pipeline runs, where documents straddle window boundaries instead of
  * wasting tail padding. Output is one row per (document × window it
  * overlaps): which slice of the document lands in which window.
  *
  * Scale shape — the global token offset is a PREFIX SUM over the doc
  * order, which naively needs a single-partition window (a 100 TB
  * scale-killer). Here it is the classic two-level distributed prefix sum:
  * range-partition by doc id, cumsum WITHIN each partition (bounded
  * window), lift each partition's total to the driver (one tiny collect,
  * #partitions rows) and broadcast the per-partition prefix offsets back.
  * The corpus never sees a global sort or a one-partition shuffle; the
  * narrow (doc_id, n_tokens) projection is pinned once (localCheckpoint)
  * so the offsets and the final pass observe the SAME range boundaries.
  */
object Packing {

  /** Pack documents (in ascending `idCol` order) into windows of `capacity`
    * tokens. `tokenCountOf` turns the text column into a per-doc token
    * count (whitespace by default; any learned counter — e.g.
    * [[Bpe.counterOf]] — plugs in). Returns
    * (doc_id, window_id, tok_from, tok_to): 1-based inclusive token
    * positions of the document's slice in that window; window_id is 0-based
    * over the packed corpus. Zero-token docs vanish (nothing to pack).
    */
  def packSequences(
      df: DataFrame, idCol: Column, textCol: Column, capacity: Long,
      tokenCountOf: Column => Column = t => size(split(t, "\\s+")).cast("long"))
      : DataFrame = {
    require(capacity > 0, "window capacity must be positive")
    val spark = df.sparkSession
    val counted = df
      .select(idCol.as("doc_id"), tokenCountOf(textCol).as("n"))
      .filter(col("n") > 0)
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("part", spark_partition_id())
      // pin the range boundaries: spark_partition_id is plan-dependent, and
      // the offsets collect below + the final pass must see the same ones
      .localCheckpoint()

    // per-partition totals -> exclusive prefix offsets (tiny: one row per
    // partition, not per doc)
    val totals = counted.groupBy("part").agg(sum("n").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (p, t) => val o = (p, acc); acc += t; o }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("part", "off")

    // ROWS frame, not the default RANGE frame: duplicate doc_ids must each
    // get their own cumulative sum (RANGE treats order-by peers as one frame
    // and their slices would overlap the same token range). The `n`
    // tie-break makes the tiling deterministic for distinct (id, n) pairs;
    // fully identical rows are interchangeable, so output is a fixed multiset.
    val w = Window.partitionBy("part").orderBy(col("doc_id"), col("n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .join(broadcast(offsetDf), Seq("part"))
      .withColumn("start", sum("n").over(w) - col("n") + col("off")) // global, 0-based
      .withColumn("window_id",
        explode(sequence(expr(s"start DIV ${capacity}L"),
          expr(s"(start + n - 1) DIV ${capacity}L"))))
      .select(col("doc_id"), col("window_id"),
        (greatest(lit(0L), col("window_id") * capacity - col("start")) + 1L)
          .as("tok_from"),
        least(col("n"), (col("window_id") + 1L) * capacity - col("start"))
          .as("tok_to"))
  }
}
