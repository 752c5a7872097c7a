package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plan-evidence dumper for the r14 optimization round. Several declared
  * queries end in `localCheckpoint()` (cache-hygiene inside the dedup
  * operators), so their final `.explain` shows only an ExistingRDD scan —
  * the interesting shape is the pipeline BEFORE the checkpoint. This main
  * rebuilds those inner pipelines — the round-13 formulation inlined
  * verbatim next to the current operator's shape — and explains both, so
  * the committed before/after files are diffable from one binary.
  * Measurement tooling only; not part of the driver contract.
  *
  * Usage: sbt "runMain graft.PlanProbe <outDir>"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r14"
    val d = "/root/testdata/sf0.01"
    val s = Sessions.local("8")
    new java.io.File(outDir).mkdirs()

    def dump(name: String, df: DataFrame, header: String): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), header + "\n\n" + plan)
      println(s"[planprobe] wrote $outDir/$name.txt")
    }

    val docs = Tables.documents(s, d)

    // ---- x04 inner pipeline: prefix-filter Jaccard join up to the verify
    // filter (the declared query then localCheckpoints + orders). The df
    // computation is the changed piece: r13 = groupBy + equi-join back;
    // r14 = count window over the same single exploded stream.
    {
      val n = 2; val t = lit(0.6)
      val sh = docs.select(col("doc_id").as("id"), col("source").as("blk"),
          graft.operators.Dedup.shingles(split(col("text"), "\\s+"), n).as("sh"))
        .withColumn("sz", size(col("sh")))
      def tail(pref: DataFrame): DataFrame = {
        val cand = pref.select(col("blk"), col("tok"), col("id").as("a_id"), col("sz").as("a_sz"))
          .join(pref.select(col("blk"), col("tok"), col("id").as("b_id"), col("sz").as("b_sz")),
            Seq("blk", "tok"))
          .filter(col("a_id") < col("b_id") &&
            col("b_sz") >= ceil(col("a_sz") * t) && col("a_sz") >= ceil(col("b_sz") * t))
          .select("blk", "a_id", "b_id").distinct()
        cand
          .join(sh.select(col("id").as("a_id"), col("sh").as("sh_a")), "a_id")
          .join(sh.select(col("id").as("b_id"), col("sh").as("sh_b")), "b_id")
          .select(col("blk"), col("a_id"), col("b_id"),
            graft.operators.Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
          .filter(col("jaccard") >= 0.6)
      }
      val before = {
        val tokDf = sh.select(explode(col("sh")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("df"))
        val pref = sh.select(col("id"), col("blk"), col("sz"), explode(col("sh")).as("tok"))
          .join(tokDf, "tok")
          .groupBy("id", "blk", "sz")
          .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ord"))
          .select(col("id"), col("blk"), col("sz"),
            explode(slice(transform(col("ord"), _.getField("tok")), lit(1),
              greatest(col("sz") - ceil(col("sz") * t).cast("int") + 1, lit(1)))).as("tok"))
        tail(pref)
      }
      val after = {
        val pref = sh.select(col("id"), col("blk"), col("sz"), explode(col("sh")).as("tok"))
          .withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
          .groupBy("id", "blk", "sz")
          .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ord"))
          .select(col("id"), col("blk"), col("sz"),
            explode(slice(transform(col("ord"), _.getField("tok")), lit(1),
              greatest(col("sz") - ceil(col("sz") * t).cast("int") + 1, lit(1)))).as("tok"))
        tail(pref)
      }
      dump("x04_inner_before",
        before,
        "x04_dedup_ngram_jaccard — INNER pipeline (pre-localCheckpoint), " +
          "ROUND-13 formulation inlined: token df as groupBy + equi-join " +
          "back onto the exploded stream (two exchanges keyed on tok).")
      dump("x04_inner_after",
        after,
        "x04_dedup_ngram_jaccard — INNER pipeline (pre-localCheckpoint), " +
          "CURRENT operator shape: df as count-window over one exchange on " +
          "tok (Dedup.ngramJaccardPrefixJoin).")
    }

    // ---- x02 inner pipeline: LSH candidate generation up to the Jaccard
    // verify. The band-key rendering is the changed piece: r13 = comma-
    // joined string of the signature slice; r14 = xxhash64 of the slice.
    {
      val (bands, rpb, numHashes) = (4, 4, 16)
      val sigd = docs.select(col("doc_id").as("id"),
        graft.operators.Dedup.minhashSignature(
          graft.operators.Dedup.shingles(split(col("text"), "\\s+"), 3), numHashes).as("sig"))
      def cands(banded: DataFrame): DataFrame = {
        val a = banded.as("a"); val b = banded.as("b")
        a.join(b, col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.id") < col("b.id"))
          .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
          .distinct()
      }
      val bandedBefore = sigd.select(
          col("id"),
          explode(transform(sequence(lit(0), lit(bands - 1)), bnd => struct(
            bnd.as("band"),
            concat_ws(",",
              transform(slice(col("sig"), bnd * lit(rpb) + lit(1), lit(rpb)),
                _.cast("string"))).as("bkey")))).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      val bandedAfter = sigd.select(
          col("id"),
          explode(transform(sequence(lit(0), lit(bands - 1)), bnd => struct(
            bnd.as("band"),
            xxhash64(slice(col("sig"), bnd * lit(rpb) + lit(1), lit(rpb))).as("bkey")))).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      dump("x02_inner_before", cands(bandedBefore),
        "x02_dedup_minhash_lsh — LSH candidate join (pre-verify), ROUND-13 " +
          "band key: comma-joined string rendering of the signature slice.")
      dump("x02_inner_after", cands(bandedAfter),
        "x02_dedup_minhash_lsh — LSH candidate join (pre-verify), CURRENT " +
          "band key: xxhash64 of the signature slice (8-byte join key).")
    }
    // ---- CDC pull plan on an unpartitioned MOR corpus (the sync-hook
    // steady state, x71/q28b/x69–x71): readChanges since the pre-upsert
    // tip after one delta commit. The interesting diff is the upserts leg:
    // full-snapshot merge + commit-time filter vs the interval-delta-only
    // winner resolution.
    {
      val root = java.nio.file.Files.createTempDirectory("graft-planprobe-cdc").toString
      val corpusTbl = s"$root/corpus"
      graft.table.KeyedTable.create(s, corpusTbl,
        docs.select("doc_id", "source", "text").filter(col("doc_id") % 5 =!= 2),
        tableName = "planprobe_corpus", keyFields = Seq("doc_id"),
        precombineField = "doc_id", partitionFields = Seq.empty,
        tableType = graft.model.TableType.MergeOnRead)
      val tip0 = graft.table.CommitLog.commits(s, corpusTbl).last.commitTime
      graft.table.KeyedTable.upsert(s, corpusTbl,
        docs.select("doc_id", "source", "text").filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + lit(100000000L)).as("doc_id"), col("source"), col("text")))
      dump(s"readchanges_${if (args.length > 1) args(1) else "current"}",
        graft.table.KeyedTable.readChanges(s, corpusTbl, tip0),
        "KeyedTable.readChanges on an unpartitioned MOR corpus, one delta " +
          "commit since the watermark (the sync-hook steady state).")
    }
    s.stop()
  }
}
