package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Corpus-curation operators a training-data pipeline runs after dedup:
  * deterministic sampling, per-group quotas, PII redaction. All pure Column
  * expressions over one scan — no UDFs, no shuffles except where the
  * semantics demand a per-group window.
  */
object Curation {

  /** Deterministic hash sampling: keep a row iff
    * `md5-hash(key) mod 100 < percent`. Unlike `df.sample`, the decision is
    * a pure function of the key — stable across runs, cluster layouts, and
    * engines (the DuckDB oracle reproduces it bit-for-bit), and a re-run
    * over grown data keeps every previously-sampled row. This is how large
    * pipelines carve eval slices. Zero shuffles: the predicate evaluates
    * inside the scan.
    */
  def hashSample(df: DataFrame, keyCol: Column, percent: Int): DataFrame =
    df.filter(pmod(Portable.hash60(keyCol), lit(100)) < percent)

  /** The matching DuckDB predicate fragment for oracle builders. */
  def hashSampleSql(keyExpr: String, percent: Int): String =
    s"(${Portable.sqlHash60(keyExpr)} % 100) < $percent"

  /** Per-group quota: keep at most `quota` rows per `groupCol`, picking by
    * `orderCols` (e.g. best-quality-first). One window shuffle on the group
    * key — the balanced-corpus primitive ("at most N docs per domain").
    * Group skew is the window partition's problem, not a join's: a hot group
    * costs one task sorting its rows, bounded by maxRecordsPerBatch spill.
    */
  def groupQuota(
      df: DataFrame, groupCol: Column, quota: Int, orderCols: Column*): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCols: _*)
    df.withColumn("__qrn", row_number().over(w))
      .filter(col("__qrn") <= quota)
      .drop("__qrn")
  }

  /** PII patterns shared by the Spark and DuckDB sides — RE2/Java-compatible
    * subset (no lookaround), so both engines match identically.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Count + redact emails and phone numbers in one projection: the
    * detect-and-scrub pass every public-text corpus runs before training.
    * Pure regexp expressions, evaluated inside the scan.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  def piiCounts(text: Column): (Column, Column) = (
    regexp_count(text, lit(EmailPattern)),
    regexp_count(text, lit(PhonePattern)))
}
