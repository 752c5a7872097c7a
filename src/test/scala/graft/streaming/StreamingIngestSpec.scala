package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, TableType}
import graft.table.{CommitLog, Deltas, KeyedTable}

case class Rec(id: Long, v: String, ver: Long, p: String)

class StreamingIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def bootstrapped(tableType: TableType): String = {
    val in = tmpDir("in")
    Seq(Rec(1, "a", 1, "p1"), Rec(2, "b", 1, "p1"), Rec(3, "c", 1, "p2"))
      .toDF().write.mode("overwrite").parquet(in)
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = table, tableName = "stream_t",
      keyFields = Seq("id"), precombineField = "ver",
      partitionFields = Seq("p"), tableType = tableType))
    table
  }

  test("micro-batches upsert into a MOR table; auto-compaction folds deltas") {
    implicit val sqlCtx = spark.sqlContext
    val table = bootstrapped(TableType.MergeOnRead)
    val stream = MemoryStream[Rec]
    val q = StreamingIngest.upsertStream(
      stream.toDF(), table, tmpDir("ckpt"), compactEvery = 2)

    stream.addData(Rec(2, "b2", 2, "p1"), Rec(4, "d", 1, "p2")) // batch 0
    q.processAllAvailable()
    assert(Deltas.liveCommits(spark, table).size === 1) // delta, not rewritten
    val mid = KeyedTable.read(spark, table)
    assert(mid.count() === 4)
    assert(mid.filter(col("id") === 2).head().getAs[String]("v") === "b2")

    stream.addData(Rec(1, "a3", 3, "p1")) // batch 1 → triggers compaction
    q.processAllAvailable()
    q.stop()
    assert(Deltas.liveCommits(spark, table).isEmpty) // compacted away
    val fin = KeyedTable.read(spark, table).orderBy("id")
      .select("id", "v", "ver").as[(Long, String, Long)].collect().toSeq
    assert(fin === Seq((1L, "a3", 3L), (2L, "b2", 2L), (3L, "c", 1L), (4L, "d", 1L)))
    assert(CommitLog.commits(spark, table).map(_.operation) ===
      Seq("bootstrap", "delta_commit", "delta_commit", "compact"))
  }

  test("same stream into a COW table converges to the same state") {
    implicit val sqlCtx = spark.sqlContext
    val table = bootstrapped(TableType.CopyOnWrite)
    val stream = MemoryStream[Rec]
    val q = StreamingIngest.upsertStream(stream.toDF(), table, tmpDir("ckpt"))
    stream.addData(Rec(2, "b2", 2, "p1"), Rec(4, "d", 1, "p2"))
    stream.addData(Rec(1, "a3", 3, "p1"))
    q.processAllAvailable()
    q.stop()
    val fin = KeyedTable.read(spark, table).orderBy("id")
      .select("id", "v", "ver").as[(Long, String, Long)].collect().toSeq
    assert(fin === Seq((1L, "a3", 3L), (2L, "b2", 2L), (3L, "c", 1L), (4L, "d", 1L)))
  }
}
