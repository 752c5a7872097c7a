package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hudi-style upsert merge (SURVEY §2.3 J4; reference declares the capability
  * at backend.py:24,48 and requires a precombine field throughout,
  * pyspark_script.py:299,133).
  *
  * Semantics (Hudi COPY_ON_WRITE upsert):
  *   1. Within the incoming batch, rows sharing a record key are deduplicated
  *      keeping the row with the greatest precombine value.
  *   2. The deduplicated batch is merged into the table: matched keys are
  *      replaced by the incoming row, unmatched table rows are kept,
  *      unmatched incoming rows are inserted.
  *
  * Plan shape: window dedup (one shuffle on key) + left_anti join + union.
  * left_anti + union beats a full_outer merge: no wide row resolution, and
  * both sides shuffle on the same key so AQE can co-locate them. At table
  * scale, [[graft.table.KeyedTable]] prunes the anti-join to only the
  * partitions the batch touches before delegating here (COW: untouched
  * partitions are never read or rewritten).
  */
object Upsert {

  /** Pure plan-level merge; `updates` must carry the same columns as `base`.
    * Ties on `precombine` within a key are broken deterministically by the
    * remaining columns (descending) so the merge is a pure function of its
    * inputs — Hudi leaves this unspecified, we pin it for testability.
    */
  def merge(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      precombine: String): DataFrame = {
    val tiebreak = updates.columns.filterNot(c => keys.contains(c) || c == precombine)
    val ordering = (col(precombine).desc +: tiebreak.map(col(_).desc)).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    val latest = updates
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .select(base.columns.map(col).toSeq: _*)
    base.join(latest, keys, "left_anti").unionByName(latest)
  }

  /** Batch-local dedup only (reference's intended dropDuplicates at
    * pyspark_script.py:265-268, O6) — exposed separately for bulk_insert
    * pre-processing. `partitionFields` scopes the dedup per partition path
    * (Hudi precombines per (recordKey, partitionPath) under the non-global
    * index): same-key rows destined for DIFFERENT partitions both survive.
    *
    * Ties on the precombine break deterministically by the remaining
    * ORDERABLE columns (descending), the same pinned convention as [[merge]]
    * — without it, matched-UPDATE merge images built from duplicate source
    * rows (which inherit the TARGET row's precombine, so ties are
    * guaranteed) would pick a nondeterministic winner. Unorderable columns
    * (maps) are skipped rather than failing analysis.
    */
  def dedupByKey(
      df: DataFrame,
      keys: Seq[String],
      precombine: String,
      partitionFields: Seq[String] = Nil): DataFrame = {
    val idCols = (keys ++ partitionFields).toSet + precombine
    val tiebreak = df.schema.fields.toSeq
      .filterNot(f => idCols.contains(f.name))
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(f => col(f.name).desc)
    val w = Window.partitionBy((keys ++ partitionFields).map(col): _*)
      .orderBy(col(precombine).desc +: tiebreak: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
