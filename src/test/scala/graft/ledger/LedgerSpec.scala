package graft.ledger

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LedgerSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val txns = Seq(
    (1L, "orders-1700000001", "SUCCESS", "{}", ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 10:05:00")), Some("app-1"),
      Some("Total records in Input DataFrame: 1500\nTotal records in Hudi table: 1500")),
    (2L, "orders-1700000002", "PENDING", "{}", ts("2024-01-02 09:00:00"), None, None, None),
    (3L, "lineitem-1700000003", "FAILED", "{}", ts("2024-01-03 12:00:00"), Some(ts("2024-01-03 12:01:00")), Some("app-3"),
      Some("Configuration Error: Key field 'nope' not found in schema.\nmore context")),
    (4L, "orders-1700000004", "PENDING", "{}", ts("2024-01-03 13:30:00"), None, None, None),
  ).toDF("id", "transaction_id", "status", "transaction_data", "start_time", "end_time", "app_id", "error_log")

  test("history: LIKE + date range + ORDER BY DESC compose") {
    val all = TransactionLedger.history(txns).select("id").as[Long].collect()
    assert(all.toSeq === Seq(4L, 3L, 2L, 1L)) // start_time desc

    val like = TransactionLedger.history(txns, search = Some("orders"))
      .select("id").as[Long].collect()
    assert(like.toSeq === Seq(4L, 2L, 1L))

    val ranged = TransactionLedger.history(txns,
      startDate = Some("2024-01-02"), endDate = Some("2024-01-02"))
      .select("id").as[Long].collect()
    assert(ranged.toSeq === Seq(2L)) // exclusive upper bound = end + 1 day
  }

  test("point lookup returns one row") {
    val r = TransactionLedger.lookup(txns, "lineitem-1700000003").collect()
    assert(r.length === 1 && r.head.getAs[Long]("id") === 3L)
  }

  test("runaway sweep fails only PENDING rows older than the timeout") {
    val now = lit("2024-01-03 14:00:00").cast("timestamp")
    val swept = TransactionLedger.sweepRunaways(txns, now)
    val byId = swept.select("id", "status", "error_log").collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(byId(2L)._1 === "FAILED") // old PENDING
    assert(byId(2L)._2.contains(TransactionLedger.RunawayMessage))
    assert(byId(4L)._1 === "PENDING") // only 30 min old
    assert(byId(1L)._1 === "SUCCESS") // untouched
    assert(byId(3L)._1 === "FAILED")
    assert(byId(3L)._2.exists(_.startsWith("Configuration Error:"))) // error_log preserved
  }

  test("log parser mines counts and classifies errors like app.py") {
    val logs = txns.select(col("id"), coalesce(col("error_log"), lit("")).as("log"))
    val parsed = logs.select(col("id"),
      LogParser.inputCount(col("log")).as("ic"),
      LogParser.hudiCount(col("log")).as("hc"),
      LogParser.errorMessage(col("log")).as("msg")).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), r.getString(3))).toMap
    assert(parsed(1L)._1.contains(1500L) && parsed(1L)._2.contains(1500L))
    assert(parsed(2L)._1.isEmpty && parsed(2L)._2.isEmpty)
    assert(parsed(3L)._3 === "Configuration Error: Key field 'nope' not found in schema.")
    assert(parsed(2L)._3 === "An Unexpected error occurred during Hudi table Bootstrap")
  }

  test("status payload is the reference's JSON shape") {
    val p = LogParser.statusPayload(txns.filter(col("id") === 3L)).head().getString(0)
    assert(p.contains("\"transaction_id\":\"lineitem-1700000003\""))
    assert(p.contains("\"error_message\":\"Configuration Error: Key field 'nope' not found in schema.\""))
    assert(p.contains("\"record_counts\""))
  }

  test("pagination window slices like the frontend") {
    val page1 = TransactionLedger.page(txns, 1, 2, Seq(col("start_time").desc))
      .select("id").as[Long].collect()
    assert(page1.toSeq === Seq(2L, 1L))
  }
}
