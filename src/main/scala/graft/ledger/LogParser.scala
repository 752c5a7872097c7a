package graft.ledger

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log-text mining (F5/F7) — the reference's cross-process log contract.
  * Count lines are regex-extracted (extract_record_counts_from_log,
  * app.py:320-321); error text is classified by prefix
  * (parse_error_log, app.py:296-305). All pure Column expressions.
  */
object LogParser {

  val InputCountPattern = "Total records in Input DataFrame: (\\d+)"
  val HudiCountPattern = "Total records in Hudi table: (\\d+)"

  /** Nullable extracted counts — regexp_extract returns "" on no-match,
    * which nullif turns back into the reference's None.
    */
  def inputCount(log: Column): Column =
    nullif(regexp_extract(log, InputCountPattern, 1), lit("")).cast("long")

  def hudiCount(log: Column): Column =
    nullif(regexp_extract(log, HudiCountPattern, 1), lit("")).cast("long")

  /** parse_error_log's prefix-classification chain, kept order-identical:
    * Configuration → Permission → Unsupported format → fallback. The first
    * line after the marker is surfaced, as in the reference's
    * split("\n")[0].
    */
  def errorMessage(log: Column): Column = {
    def after(marker: String): Column =
      trim(regexp_extract(log, java.util.regex.Pattern.quote(marker) + "\\s*([^\\n]*)", 1))
    when(log.contains("Configuration Error:"),
      concat(lit("Configuration Error: "), after("Configuration Error:")))
      .when(log.contains("Permission Denied:"),
        concat(lit("Access Permission Error: "), after("Permission Denied:")))
      .when(log.contains("Unsupported file format:"),
        lit("Unsupported File Format: Only .parquet and .orc files are supported."))
      .otherwise(lit("An Unexpected error occurred during Hudi table Bootstrap"))
  }

  /** Status payload construction (P6/F11, app.py:287-293): the struct the
    * WebSocket layer serializes, with counts mined from the log.
    */
  def statusPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(
      col("transaction_id"),
      col("status"),
      col("error_log"),
      when(col("status") === "FAILED", errorMessage(coalesce(col("error_log"), lit(""))))
        .otherwise(lit(null).cast("string")).as("error_message"),
      struct(
        inputCount(coalesce(col("error_log"), lit(""))).as("input_count"),
        hudiCount(coalesce(col("error_log"), lit(""))).as("hudi_count")
      ).as("record_counts"))).as("payload"))
}
