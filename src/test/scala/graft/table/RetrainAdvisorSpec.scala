package graft.table

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.AnnIndex

/** retrain.auto: an opted-in standing index journals a retrain
  * RECOMMENDATION when its hottest coarse cell crosses the threshold,
  * stays quiet when balanced, amortizes the check over the configured
  * publish cadence, and never auto-runs anything.
  */
class RetrainAdvisorSpec extends SparkTestBase {

  private def emb = spark.read.parquet(sf("embeddings"))

  private def entry(idx: String): Option[MaintenanceLog.Entry] =
    MaintenanceLog.read(spark, idx).find(_.service == "retrain.auto")

  test("skew journals a recommendation, a balanced re-check clears it, and " +
      "nothing retrains by itself") {
    val idx = s"${tmpDir("retrain-auto")}/idx"
    AnnIndex.build(spark, idx, emb.filter(col("vec_id") >= 25),
      nlist = 4, iters = 1)
    // opt in with a floor threshold: any non-degenerate distribution has a
    // hottest-cell share >= 1/nlist, so the next checked publish recommends
    TableProperties.set(spark, idx, Map(
      RetrainAdvisor.Prop -> "0.01", RetrainAdvisor.EveryProp -> "1"))
    assert(entry(idx).isEmpty)
    val commits0 = CommitLog.commits(spark, idx).size
    AnnIndex.append(spark, idx, emb.filter(col("vec_id") < 5))
    val rec = entry(idx)
    assert(rec.exists(_.outcome == "recommend"), s"journal: $rec")
    assert(rec.exists(_.detail.contains("index_retrain")), s"journal: $rec")
    // advisory only: the append's publishes are the only new commits (plus
    // any compact.auto fold) — no retrain commit appeared
    assert(CommitLog.commits(spark, idx).map(_.operation)
      .count(_ == "bootstrap") === 1)
    assert(CommitLog.commits(spark, idx).size <= commits0 + 2)

    // drift "recedes" (threshold above the real share): the stale
    // recommendation clears to ok on the next checked publish
    TableProperties.set(spark, idx, Map(RetrainAdvisor.Prop -> "0.999"))
    AnnIndex.append(spark, idx, emb.filter(col("vec_id") >= 5 && col("vec_id") < 10))
    val cleared = entry(idx)
    assert(cleared.exists(_.outcome == "ok"), s"journal: $cleared")
    assert(cleared.exists(_.detail.contains("balanced")), s"journal: $cleared")

    // ...and once cleared, balanced checks stay QUIET (no journal churn:
    // the entry's timestamp-bearing row does not rewrite)
    val before = cleared.get
    AnnIndex.append(spark, idx, emb.filter(col("vec_id") >= 10 && col("vec_id") < 12))
    assert(entry(idx).contains(before), "balanced re-check rewrote the journal")
  }

  test("the check amortizes over retrain.auto.every publishes") {
    val idx = s"${tmpDir("retrain-auto-cadence")}/idx"
    AnnIndex.build(spark, idx, emb.filter(col("vec_id") >= 25),
      nlist = 4, iters = 1)
    TableProperties.set(spark, idx, Map(
      RetrainAdvisor.Prop -> "0.01", RetrainAdvisor.EveryProp -> "3"))
    AnnIndex.append(spark, idx, emb.filter(col("vec_id") < 2))
    assert(entry(idx).isEmpty, "checked before the cadence elapsed")
    AnnIndex.append(spark, idx, emb.filter(col("vec_id") >= 2 && col("vec_id") < 4))
    assert(entry(idx).isEmpty, "checked before the cadence elapsed")
    AnnIndex.append(spark, idx, emb.filter(col("vec_id") >= 4 && col("vec_id") < 6))
    assert(entry(idx).exists(_.outcome == "recommend"),
      "the third publish must run the check")
    // the counter reset: the next publish is publish 1 of the next window
    AnnIndex.append(spark, idx, emb.filter(col("vec_id") >= 6 && col("vec_id") < 8))
    assert(TableProperties.get(spark, idx)
      .get(RetrainAdvisor.SeenProp).contains("1"))
  }

  test("a non-index table with the property journals skipped, not an error") {
    import spark.implicits._
    val tbl = s"${tmpDir("retrain-auto-plain")}/t"
    KeyedTable.create(spark, tbl, Seq((1L, "a")).toDF("k", "v"),
      tableName = "plain", keyFields = Seq("k"), precombineField = "k",
      partitionFields = Seq.empty, tableType = graft.model.TableType.MergeOnRead)
    TableProperties.set(spark, tbl, Map(
      RetrainAdvisor.Prop -> "0.5", RetrainAdvisor.EveryProp -> "1"))
    KeyedTable.upsert(spark, tbl, Seq((2L, "b")).toDF("k", "v"))
    val e = entry(tbl)
    assert(e.exists(_.outcome == "skipped"), s"journal: $e")
    assert(e.exists(_.detail.contains("kind/cell")), s"journal: $e")
  }
}
