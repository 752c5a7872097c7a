package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Concat-and-chunk sequence packing: slices must tile the concatenated
  * corpus exactly — every window full except the last, every doc covered
  * once — with the two-level prefix sum invisible in the answer.
  */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("docs straddle window boundaries exactly; window/doc composition is total") {
    // capacity 10; docs of 4, 8, 10, 3 tokens → global offsets 0, 4, 12, 22
    val d = Seq(
      (1L, (1 to 4).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 8).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 10).map(i => s"c$i").mkString(" ")),
      (4L, (1 to 3).map(i => s"d$i").mkString(" "))).toDF("doc_id", "text")
    val got = Packing.packSequences(d, col("doc_id"), col("text"), capacity = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (1L, 0L, 1L, 4L),                   // doc1 [0,4)  → window 0
      (2L, 0L, 1L, 6L), (2L, 1L, 7L, 8L), // doc2 [4,12) straddles 0→1
      (3L, 1L, 1L, 8L), (3L, 2L, 9L, 10L), // doc3 [12,22) straddles 1→2
      (4L, 2L, 1L, 3L)))                  // doc4 [22,25) → window 2
  }

  test("duplicate doc_ids tile correctly (ROWS cumsum frame, not RANGE peers)") {
    // two rows share doc_id 1 — under the default RANGE frame they'd be
    // order-by peers sharing ONE cumulative sum, double-packing the same
    // token range; the ROWS frame gives each row its own slice
    val d = Seq((1L, "a b c"), (1L, "x y z w"), (2L, "p q")).toDF("doc_id", "text")
    val packed = Packing.packSequences(d, col("doc_id"), col("text"), capacity = 4L)
      .withColumn("len", col("tok_to") - col("tok_from") + 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lens = packed.map(s => (s._2, s._4 - s._3 + 1))
    // 3 + 4 + 2 = 9 tokens → windows 0 and 1 full (4), window 2 holds 1
    val winSums = lens.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    assert(winSums === Seq((0L, 4L), (1L, 4L), (2L, 1L)))
    // both id-1 rows cover their own tokens exactly once (7 total, not 8)
    assert(packed.filter(_._1 == 1L).map(s => s._4 - s._3 + 1).sum === 7L)
    assert(packed.filter(_._1 == 2L).map(s => s._4 - s._3 + 1).sum === 2L)
  }

  test("randomized invariants: slices tile the corpus for any docs/capacity (fixed seed)") {
    val rnd = new scala.util.Random(17)
    (1 to 4).foreach { _ =>
      val capacity = 7L + rnd.nextInt(58)
      val docs = (0 until 100 + rnd.nextInt(150)).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(40))(s"w${rnd.nextInt(1000)}").mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val packed = Packing.packSequences(df, col("doc_id"), col("text"), capacity)
        .withColumn("len", col("tok_to") - col("tok_from") + 1L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val nOf = docs.map { case (id, t) => id -> t.split("\\s+").length.toLong }.toMap
      // per-doc coverage: slices are contiguous from token 1 to n
      packed.groupBy(_._1).foreach { case (id, slices) =>
        val sorted = slices.sortBy(_._2)
        assert(sorted.head._3 === 1L, s"doc $id first slice starts at ${sorted.head._3}")
        assert(sorted.last._4 === nOf(id), s"doc $id last slice ends early")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(b._3 === a._4 + 1, s"doc $id slice gap")
            assert(b._2 === a._2 + 1, s"doc $id skipped a window")
          case _ => ()
        }
      }
      // window tiling: every window full except the last, ids contiguous
      val winSums = packed.groupBy(_._2).view
        .mapValues(_.map(s => s._4 - s._3 + 1).sum).toSeq.sortBy(_._1)
      assert(winSums.map(_._1) === (0L until winSums.length.toLong))
      assert(winSums.dropRight(1).forall(_._2 === capacity),
        s"non-final window not full at capacity $capacity")
      assert(winSums.map(_._2).sum === nOf.values.sum)
    }
  }

  test("on the real corpus every window is full except the last; a custom counter plugs in") {
    val docs = spark.read.parquet(sf("documents")).select("doc_id", "text")
    val packed = Packing.packSequences(docs, col("doc_id"), col("text"), capacity = 512L)
      .withColumn("len", col("tok_to") - col("tok_from") + 1L)
    val total = docs.select(sum(size(split(col("text"), "\\s+")).cast("long")))
      .head().getLong(0)
    val winSums = packed.groupBy("window_id").agg(sum("len").as("s"))
      .orderBy("window_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(winSums.map(_._2).sum === total)
    assert(winSums.dropRight(1).forall(_._2 === 512L), "a non-final window is not full")
    assert(winSums.map(_._1).toSeq === (0L until winSums.length.toLong))
    // every doc's slices cover exactly its own tokens
    val direct = docs.select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("n"))
    assert(packed.groupBy("doc_id").agg(sum("len").as("s"))
      .join(direct, "doc_id").filter(col("s") =!= col("n")).count() === 0)
    // the counter hook ([[Bpe.counterOf]] shape): a constant counter packs
    // every doc as 7 tokens
    val const = Packing.packSequences(docs, col("doc_id"), col("text"), 100L, _ => lit(7L))
    assert(const.groupBy("doc_id")
      .agg(sum(col("tok_to") - col("tok_from") + 1L).as("s"))
      .filter(col("s") =!= 7L).count() === 0)
  }
}
