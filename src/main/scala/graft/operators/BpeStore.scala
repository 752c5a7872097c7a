package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

import graft.model.WriteOperation
import graft.table.{CommitLog, KeyedTable}

/** Versioned tokenizer state: x55's learned merge table + segmented
  * vocabulary persisted as ONE keyed graft table, one bulk-insert commit
  * per training run — so tokenizers inherit the table services the same
  * way x53's dedup index does: `asOf` an older instant loads the tokenizer
  * that was current THEN (reproducing any historical pipeline run), CDC
  * streams tokenizer updates to consumers, OCC serializes concurrent
  * trainers.
  *
  * Rows are RUN-SCOPED (key = run/kind/k): a save appends a complete new
  * state and never touches earlier runs, which stay loadable forever and
  * remain plain data (`deleteWhere("run < …")` retires them). Cost per
  * save is O(vocab) — one commit, no read-modify-write of old runs; a load
  * is pruned to the `kind` partition it needs and the newest run at the
  * queried instant.
  */
object BpeStore {

  final case class TokenizerState(run: Long, merges: Seq[Bpe.Merge], vocab: DataFrame)

  /** Persist a trained (merges, segmented-vocab) pair as the next run.
    * First save creates the table; every later save is one bulk-insert
    * commit. Returns the new run id.
    */
  def save(
      spark: SparkSession,
      tablePath: String,
      merges: Seq[Bpe.Merge],
      vocab: DataFrame): Long = {
    require(merges.nonEmpty, "save needs a non-empty merge table")
    import spark.implicits._
    val fs = CommitLog.fs(spark, tablePath)
    val exists = fs.exists(CommitLog.logDir(tablePath))
    val run =
      if (!exists) 1L
      else KeyedTable.read(spark, tablePath).agg(max("run")).head().getLong(0) + 1L

    val mergeDf = merges
      .map(m => (run, "merge", m.rank.toString, Option(m.left), Option(m.right)))
      .toDF("run", "kind", "k", "lft", "rgt")
      .withColumn("freq", lit(null).cast(LongType))
      .withColumn("syms", lit(null).cast(ArrayType(StringType)))
    val vocabDf = vocab.select(
      lit(run).as("run"), lit("vocab").as("kind"), col("word").as("k"),
      lit(null).cast(StringType).as("lft"), lit(null).cast(StringType).as("rgt"),
      col("freq").cast(LongType).as("freq"), col("syms"))
    val rows = mergeDf.unionByName(vocabDf)

    if (!exists)
      KeyedTable.create(spark, tablePath, rows, "bpe_tokenizer",
        keyFields = Seq("run", "kind", "k"), precombineField = "run",
        partitionFields = Seq("kind"))
    else
      KeyedTable.append(spark, tablePath, rows, WriteOperation.BulkInsert)
    run
  }

  /** Load the newest run at the queried instant (`asOf = None` → the live
    * tip). The `kind` partition column prunes each half's scan.
    */
  def load(
      spark: SparkSession,
      tablePath: String,
      asOf: Option[String] = None): TokenizerState = {
    val df = asOf.map(KeyedTable.readAsOf(spark, tablePath, _))
      .getOrElse(KeyedTable.read(spark, tablePath))
    val run = df.agg(max("run")).head().getLong(0)
    val cur = df.filter(col("run") === run)
    val merges = cur.filter(col("kind") === "merge")
      .select(col("k").cast(IntegerType), col("lft"), col("rgt"))
      .collect()
      .map(r => Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq
    val vocab = cur.filter(col("kind") === "vocab")
      .select(col("k").as("word"), col("freq"), col("syms"))
    TokenizerState(run, merges, vocab)
  }
}
