package graft.table

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model._

/** Add-column schema evolution on the write path: new batch columns append to
  * the table schema; untouched old files null-fill at read time (no rewrite).
  */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def bootstrapped(tt: TableType): String = {
    val in = tmpDir("in")
    Seq((1L, 1L, "a", "p1"), (2L, 1L, "b", "p1"), (3L, 1L, "c", "p2"))
      .toDF("id", "ver", "v", "p").write.mode("overwrite").parquet(in)
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = table, tableName = "evo_t",
      keyFields = Seq("id"), precombineField = "ver",
      partitionFields = Seq("p"), tableType = tt))
    table
  }

  private def evolvingBatch = Seq((2L, 2L, "b2", "p1", 0.9))
    .toDF("id", "ver", "v", "p", "score")

  test("COW upsert with a new column evolves the schema; old rows null-fill") {
    val table = bootstrapped(TableType.CopyOnWrite)
    KeyedTable.upsert(spark, table, evolvingBatch)
    val after = KeyedTable.read(spark, table)
    assert(after.columns.contains("score"))
    assert(after.count() === 3)
    assert(after.filter(col("id") === 2).head().getAs[Double]("score") === 0.9)
    // p2 was never rewritten, yet reads with the evolved schema
    assert(after.filter(col("id") === 3).head().isNullAt(after.columns.indexOf("score")))
    // a following no-new-column upsert keeps the evolved schema
    KeyedTable.upsert(spark, table, Seq((1L, 2L, "a2", "p1")).toDF("id", "ver", "v", "p"))
    val last = KeyedTable.read(spark, table)
    assert(last.columns.contains("score"))
    assert(last.filter(col("id") === 1).head().getAs[String]("v") === "a2")
  }

  test("addColumns is metadata-only and rollback undoes it") {
    val table = bootstrapped(TableType.CopyOnWrite)
    val boot = CommitLog.requireState(spark, table).latest.commitTime
    KeyedTable.addColumns(spark, table, Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType)))
    val evolved = KeyedTable.read(spark, table)
    assert(evolved.columns.contains("note"))
    assert(evolved.count() === 3)
    assert(evolved.filter(col("note").isNotNull).count() === 0)
    assert(CommitLog.requireState(spark, table).latest.operation === "alter_schema")
    // time travel to the bootstrap serves the pre-evolution projection
    assert(!KeyedTable.readAsOf(spark, table, boot).columns.contains("note"))

    // the alter is fully undoable: metadata-only, nothing on disk to restore
    KeyedTable.rollback(spark, table, boot)
    val back = KeyedTable.read(spark, table)
    assert(!back.columns.contains("note"))
    assert(back.count() === 3)

    // refusals: collision (case-insensitive), non-nullable
    KeyedTable.addColumns(spark, table, Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType)))
    val e1 = intercept[GraftException] {
      KeyedTable.addColumns(spark, table, Seq(
        org.apache.spark.sql.types.StructField("NOTE",
          org.apache.spark.sql.types.StringType)))
    }
    assert(e1.getMessage.contains("already exist"))
    val e2 = intercept[GraftException] {
      KeyedTable.addColumns(spark, table, Seq(
        org.apache.spark.sql.types.StructField("n2",
          org.apache.spark.sql.types.LongType, nullable = false)))
    }
    assert(e2.getMessage.contains("must be nullable"))
  }

  test("MOR delta upsert evolves the schema; merge and compaction carry it") {
    val table = bootstrapped(TableType.MergeOnRead)
    KeyedTable.upsert(spark, table, evolvingBatch)
    val merged = KeyedTable.read(spark, table)
    assert(merged.columns.contains("score"))
    assert(merged.filter(col("id") === 2).head().getAs[Double]("score") === 0.9)
    assert(merged.filter(col("id") === 1).head().isNullAt(merged.columns.indexOf("score")))
    KeyedTable.compact(spark, table)
    val after = KeyedTable.read(spark, table)
    assert(after.columns.contains("score") && after.count() === 3)
    assert(after.filter(col("id") === 2).head().getAs[Double]("score") === 0.9)
  }

  test("type change is rejected with the config-error taxonomy") {
    val table = bootstrapped(TableType.CopyOnWrite)
    val bad = Seq((1L, 2L, 42, "p1")).toDF("id", "ver", "v", "p") // v: int, was string
    val e = intercept[GraftException] { KeyedTable.upsert(spark, table, bad) }
    assert(e.getMessage.startsWith("Configuration Error: Schema evolution cannot change type"))
  }

  test("T39 drop is metadata-only; re-add under a new type serves fresh nulls, never old data") {
    val table = bootstrapped(TableType.CopyOnWrite)
    val preDrop = CommitLog.requireState(spark, table).latest.commitTime

    KeyedTable.dropColumns(spark, table, Seq("v"))
    val dropped = KeyedTable.read(spark, table)
    assert(!dropped.columns.contains("v"))
    assert(dropped.count() === 3)
    // metadata-only: one alter_schema commit, physical ddl unchanged
    val st = CommitLog.requireState(spark, table)
    assert(st.latest.operation === "alter_schema")
    assert(st.latest.schemaDdl.contains("v"))
    // time travel BEFORE the drop still serves the column and its data
    val asOf = KeyedTable.readAsOf(spark, table, preDrop)
    assert(asOf.columns.contains("v"))
    assert(asOf.filter(col("id") === 1).head().getAs[String]("v") === "a")

    // re-add the SAME name under a NEW type: fresh physical column — the
    // dropped string data must never bleed into the new double column
    KeyedTable.addColumns(spark, table, Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    val readded = KeyedTable.read(spark, table)
    assert(readded.schema("v").dataType === org.apache.spark.sql.types.DoubleType)
    assert(readded.filter(col("v").isNotNull).count() === 0)
    // writes through the logical name land in the fresh physical column
    KeyedTable.upsert(spark, table,
      Seq((1L, 2L, "p1", 1.5)).toDF("id", "ver", "p", "v"))
    val after = KeyedTable.read(spark, table)
    assert(after.filter(col("id") === 1).head().getAs[Double]("v") === 1.5)
    assert(after.filter(col("id") =!= 1 && col("v").isNotNull).count() === 0)

    // refusal: key/partition/precombine columns cannot drop
    val e = intercept[GraftException] { KeyedTable.dropColumns(spark, table, Seq("id")) }
    assert(e.getMessage.contains("cannot drop"))
  }

  test("T39 rename serves the new name in snapshot + CDC; time travel serves the old name") {
    val table = bootstrapped(TableType.MergeOnRead)
    val boot = CommitLog.requireState(spark, table).latest.commitTime

    KeyedTable.renameColumn(spark, table, "v", "label")
    val renamed = KeyedTable.read(spark, table)
    assert(renamed.columns.contains("label") && !renamed.columns.contains("v"))
    assert(renamed.filter(col("id") === 1).head().getAs[String]("label") === "a")
    // pre-rename instants serve the OLD name
    val asOf = KeyedTable.readAsOf(spark, table, boot)
    assert(asOf.columns.contains("v") && !asOf.columns.contains("label"))

    // writes use the new logical name; the OLD name is refused loudly
    KeyedTable.upsert(spark, table,
      Seq((2L, 2L, "b2", "p1")).toDF("id", "ver", "label", "p"))
    assert(KeyedTable.read(spark, table)
      .filter(col("id") === 2).head().getAs[String]("label") === "b2")
    val e = intercept[GraftException] {
      KeyedTable.upsert(spark, table, Seq((3L, 2L, "x", "p2")).toDF("id", "ver", "v", "p"))
    }
    assert(e.getMessage.contains("hidden by a metadata-only drop/rename"))

    // CDC serves the new name (the upsert since boot carries label)
    val changes = KeyedTable.readChanges(spark, table, boot)
    assert(changes.columns.contains("label") && !changes.columns.contains("v"))
    assert(changes.filter(col("id") === 2).head().getAs[String]("label") === "b2")

    // compaction folds the renamed-era deltas; the logical view is unchanged
    KeyedTable.compact(spark, table)
    val compacted = KeyedTable.read(spark, table)
    assert(compacted.filter(col("id") === 2).head().getAs[String]("label") === "b2")

    // rename refusals: protected columns; occupied target
    assert(intercept[GraftException] {
      KeyedTable.renameColumn(spark, table, "id", "id2")
    }.getMessage.contains("cannot rename"))
    assert(intercept[GraftException] {
      KeyedTable.renameColumn(spark, table, "label", "p")
    }.getMessage.contains("already exists"))
  }

  test("T39 indexed lookups and SQL MERGE address the renamed logical name") {
    val table = bootstrapped(TableType.CopyOnWrite)
    KeyedTable.renameColumn(spark, table, "v", "label")

    // range read: the logical name routes to the physical stats/file layout
    val ranged = KeyedTable.readBetween(spark, table, "label", Some("a"), Some("b"))
    assert(ranged.columns.contains("label"))
    assert(ranged.select("label").collect().map(_.getString(0)).toSet === Set("a", "b"))

    // secondary point lookup through the bloom surface, logical name in & out
    val byVal = BloomIndex.readByValues(spark, table, "label", Seq("c"))
    assert(byVal.count() === 1 && byVal.head().getAs[String]("label") === "c")

    // SQL MERGE binds the renamed column in conditions and assignments
    import spark.implicits._
    Seq((1L, 2L, "m1", "p1"), (9L, 1L, "new", "p2"))
      .toDF("id", "ver", "label", "p").createOrReplaceTempView("t39_merge_src")
    spark.sql(
      s"""MERGE INTO graft.`$table` t USING t39_merge_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET label = s.label
         |WHEN NOT MATCHED THEN INSERT (id, ver, label, p)
         |  VALUES (s.id, s.ver, s.label, s.p)""".stripMargin)
    val after = KeyedTable.read(spark, table)
    assert(after.filter(col("id") === 1).head().getAs[String]("label") === "m1")
    assert(after.filter(col("id") === 9).head().getAs[String]("label") === "new")
    assert(after.count() === 4)

    // layout/index services take the logical name too
    KeyedTable.clusterSort(spark, table, Seq("label"))
    StatsIndex.build(spark, table, Seq("label"))
    BloomIndex.build(spark, table, logicalColumn = "label")
    val clustered = KeyedTable.read(spark, table)
    assert(clustered.count() === 4)
    assert(clustered.filter(col("id") === 9).head().getAs[String]("label") === "new")
  }

  test("T39 property: a random add/drop/rename/write sequence matches a logical-schema model") {
    val rnd = new scala.util.Random(20260815L)
    val table = bootstrapped(TableType.CopyOnWrite)
    // model: the NON-protected logical string columns and the value row
    // id=1 should carry in each (None = null). Protected (id, ver, p) and
    // the meta columns are invariant and checked implicitly by the reads.
    val model = scala.collection.mutable.LinkedHashMap[String, Option[String]]("v" -> Some("a"))
    var fresh = 0
    def freshName(): String = { fresh += 1; s"c$fresh" }
    def assertMatches(): Unit = {
      val row = KeyedTable.read(spark, table).filter(col("id") === 1).head()
      val logicalCols = row.schema.fieldNames
        .filterNot(n => Seq("id", "ver", "p").contains(n) || n.startsWith("_")).toSet
      assert(logicalCols === model.keySet.toSet,
        s"logical columns $logicalCols != model ${model.keySet}")
      model.foreach { case (n, v) =>
        val got = if (row.isNullAt(row.fieldIndex(n))) None else Some(row.getAs[String](n))
        assert(got === v, s"column $n")
      }
    }
    (1 to 24).foreach { _ =>
      val cols = model.keys.toSeq
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // add a fresh nullable string column
          val n = freshName()
          KeyedTable.addColumns(spark, table, Seq(
            org.apache.spark.sql.types.StructField(n,
              org.apache.spark.sql.types.StringType)))
          model(n) = None
        case 3 | 4 if cols.nonEmpty => // drop a random current column
          val n = cols(rnd.nextInt(cols.size))
          KeyedTable.dropColumns(spark, table, Seq(n))
          model -= n
        case 5 | 6 | 7 if cols.nonEmpty => // rename a random current column
          val from = cols(rnd.nextInt(cols.size))
          val to = freshName()
          KeyedTable.renameColumn(spark, table, from, to)
          val v = model.remove(from).get
          model(to) = v
        case _ if cols.nonEmpty => // write a value through the logical name
          val n = cols(rnd.nextInt(cols.size))
          val v = s"w$fresh-$n"
          KeyedTable.upsert(spark, table,
            Seq((1L, 99L, "p1", v)).toDF("id", "ver", "p", n))
          // the upsert's full-row image null-pads every OTHER patchable
          // column (overwrite-latest payload semantics)
          model.keys.foreach(k => model(k) = None)
          model(n) = Some(v)
        case _ => () // nothing to drop/rename/write yet
      }
      assertMatches()
    }
    // at least a few of each op kind actually ran (seed sanity)
    assert(fresh >= 6)
  }

  test("T39 rollback of a rename restores the old logical view") {
    val table = bootstrapped(TableType.CopyOnWrite)
    val boot = CommitLog.requireState(spark, table).latest.commitTime
    KeyedTable.renameColumn(spark, table, "v", "label")
    assert(KeyedTable.read(spark, table).columns.contains("label"))
    KeyedTable.rollback(spark, table, boot)
    val back = KeyedTable.read(spark, table)
    assert(back.columns.contains("v") && !back.columns.contains("label"))
    assert(back.filter(col("id") === 1).head().getAs[String]("v") === "a")
  }

  test("rename chain reusing a vacated name applies atomically on read AND write") {
    val table = bootstrapped(TableType.CopyOnWrite)
    KeyedTable.addColumns(spark, table, Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.StringType)))
    KeyedTable.upsert(spark, table,
      Seq((2L, 2L, "b2", "p1", "A2")).toDF("id", "ver", "v", "p", "a"))
    // aliases end up {a->v, v->z}: serialized sorted by physical name, a
    // sequential rename fold would apply a->v while physical v is still
    // present and duplicate the column — the projection must be atomic
    KeyedTable.renameColumn(spark, table, "v", "z")
    KeyedTable.renameColumn(spark, table, "a", "v") // 'v' was just vacated
    val df = KeyedTable.read(spark, table)
    assert(df.columns.toSeq.sorted === df.columns.toSeq.distinct.sorted)
    assert(df.columns.count(_ == "v") === 1 && df.columns.count(_ == "z") === 1)
    val r2 = df.filter(col("id") === 2).head()
    assert(r2.getAs[String]("z") === "b2")
    assert(r2.getAs[String]("v") === "A2")
    // writes through the chained mapping round-trip (toPhysical is the
    // mirror projection: the batch carries BOTH a vacated name and its
    // new tenant)
    KeyedTable.upsert(spark, table,
      Seq((3L, 2L, "c2", "p2", "C2")).toDF("id", "ver", "z", "p", "v"))
    val r3 = KeyedTable.read(spark, table).filter(col("id") === 3).head()
    assert(r3.getAs[String]("z") === "c2" && r3.getAs[String]("v") === "C2")
  }

  test("fresh physical names dodge alias targets, not just physical names") {
    val table = bootstrapped(TableType.CopyOnWrite)
    KeyedTable.addColumns(spark, table, Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.StringType)))
    KeyedTable.dropColumns(spark, table, Seq("x"))
    // alias target occupies the would-be fresh name 'x__2'
    KeyedTable.renameColumn(spark, table, "v", "x__2")
    KeyedTable.addColumns(spark, table, Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.StringType)))
    val df = KeyedTable.read(spark, table)
    assert(df.columns.toSeq.sorted === df.columns.toSeq.distinct.sorted)
    assert(df.columns.contains("x") && df.columns.contains("x__2"))
    // the re-added x is fresh nulls; x__2 serves the renamed v's values
    assert(df.filter(col("x").isNotNull).count() === 0)
    assert(df.filter(col("id") === 1).head().getAs[String]("x__2") === "a")
  }

  test("multi-change alterSchema is atomic: a refused change aborts the whole statement") {
    val table = bootstrapped(TableType.CopyOnWrite)
    val before = CommitLog.requireState(spark, table).latest.commitTime
    val e = intercept[GraftException] {
      KeyedTable.alterSchema(spark, table,
        adds = Seq(org.apache.spark.sql.types.StructField("note",
          org.apache.spark.sql.types.StringType)),
        drops = Seq("v"),
        renames = Seq("note" -> "id")) // 'id' is the key name: refused
    }
    assert(e.getMessage.contains("already exists"))
    // nothing committed: neither the add nor the drop leaked
    assert(CommitLog.requireState(spark, table).latest.commitTime === before)
    val df = KeyedTable.read(spark, table)
    assert(!df.columns.contains("note") && df.columns.contains("v"))
    // a valid multi-change lands as exactly ONE alter_schema commit
    KeyedTable.alterSchema(spark, table,
      adds = Seq(org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType)),
      drops = Seq("v"),
      renames = Seq("note" -> "remark"))
    val st2 = CommitLog.requireState(spark, table)
    assert(st2.commits.count(_.operation == "alter_schema") === 1)
    val df2 = KeyedTable.read(spark, table)
    assert(df2.columns.contains("remark") && !df2.columns.contains("v")
      && !df2.columns.contains("note"))
  }

  test("reclaim physically sheds dropped columns; pre-drop time travel still serves them") {
    val table = bootstrapped(TableType.CopyOnWrite)
    val preDrop = CommitLog.requireState(spark, table).latest.commitTime
    KeyedTable.dropColumns(spark, table, Seq("v"))
    val snapBefore = KeyedTable.read(spark, table)
      .select("id", "ver", "p").orderBy("id").collect().toSeq

    assert(KeyedTable.reclaim(spark, table).nonEmpty)

    // physical: no live parquet file carries the column anymore
    val fs = CommitLog.fs(spark, table)
    val files = StatsIndex.listBaseFiles(fs, table)
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(!spark.read.parquet(f).columns.contains("v"), s"$f still carries 'v'")
    }
    // ddl + mapping shed in the same commit
    val st = CommitLog.requireState(spark, table)
    assert(st.latest.operation === "reclaim")
    assert(!org.apache.spark.sql.types.StructType.fromDDL(st.latest.schemaDdl)
      .fieldNames.contains("v"))
    assert(st.columnMapping.dropped.isEmpty)
    // logical snapshot content unchanged by the rewrite
    val snapAfter = KeyedTable.read(spark, table)
      .select("id", "ver", "p").orderBy("id").collect().toSeq
    assert(snapAfter === snapBefore)
    assert(!KeyedTable.read(spark, table).columns.contains("v"))
    // time travel BEFORE the drop serves the old view from the archive
    val old = KeyedTable.readAsOf(spark, table, preDrop)
    assert(old.columns.contains("v"))
    assert(old.orderBy("id").select("v").collect().map(_.getString(0)).toSeq ===
      Seq("a", "b", "c"))
    // a second reclaim is a no-op: nothing hidden remains
    assert(KeyedTable.reclaim(spark, table).isEmpty)
  }

  test("incremental reclaim campaign: bounded per-partition runs; the ddl sheds " +
      "exactly on the run that cleans the last carrying file") {
    val table = bootstrapped(TableType.CopyOnWrite)
    KeyedTable.dropColumns(spark, table, Seq("v"))
    def ddlHas(c: String) = org.apache.spark.sql.types.StructType
      .fromDDL(CommitLog.requireState(spark, table).latest.schemaDdl)
      .fieldNames.contains(c)
    val fs = CommitLog.fs(spark, table)
    def carrying = StatsIndex.listBaseFiles(fs, table)
      .count(f => spark.read.parquet(f).columns.contains("v"))

    // run 1: only p1 — bounded rewrite, p2 still carries the column, so the
    // ddl must NOT shed yet (a shed ddl over a carrying file would lie)
    assert(KeyedTable.reclaim(spark, table, Some(Seq("p=p1"))) === Seq("p=p1"))
    assert(ddlHas("v"))
    assert(CommitLog.requireState(spark, table).columnMapping.dropped.nonEmpty)
    assert(carrying > 0)
    // reads stay correct mid-campaign (mixed file schemas)
    assert(!KeyedTable.read(spark, table).columns.contains("v"))
    assert(KeyedTable.read(spark, table).count() === 3)

    // run 2: p2 — the last carrying file is rewritten, ddl + mapping shed
    assert(KeyedTable.reclaim(spark, table, Some(Seq("p=p2"))) === Seq("p=p2"))
    assert(!ddlHas("v"))
    assert(CommitLog.requireState(spark, table).columnMapping.dropped.isEmpty)
    assert(carrying === 0)
    assert(KeyedTable.read(spark, table).count() === 3)

    // unknown-partition refusal (needs a hidden column present — reclaim
    // early-exits with nothing to do otherwise)
    KeyedTable.addColumns(spark, table, Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType)))
    KeyedTable.dropColumns(spark, table, Seq("note"))
    val e = intercept[GraftException] {
      KeyedTable.reclaim(spark, table, Some(Seq("nope")))
    }
    assert(e.getMessage.contains("unknown or non-native"))
  }

  test("campaign.reclaim property: bounded hands-off batches ride data publishes " +
      "until the ddl sheds, then the campaign goes quiet") {
    val table = bootstrapped(TableType.CopyOnWrite) // partitions p1, p2
    KeyedTable.dropColumns(spark, table, Seq("v"))
    TableProperties.set(spark, table, Map(TableProperties.CampaignReclaim -> "1"))
    def ddlHas(c: String) = org.apache.spark.sql.types.StructType
      .fromDDL(CommitLog.requireState(spark, table).latest.schemaDdl)
      .fieldNames.contains(c)
    def reclaims = CommitLog.commits(spark, table).filter(_.operation == "reclaim")

    // publish 1: an ordinary upsert (whose new p1 file null-fills the
    // still-physical column); the hook then rewrites at most ONE partition
    KeyedTable.upsert(spark, table, Seq((1L, 3L, "p1")).toDF("id", "ver", "p"))
    assert(reclaims.size === 1)
    assert(reclaims.forall(_.partitions.size <= 1), "campaign batch exceeded its bound")

    // further data publishes: the rotation cursor reaches every partition,
    // and the ddl + mapping shed hands-off within a bounded number of writes
    var i = 4L
    while (ddlHas("v") && i < 12) {
      KeyedTable.upsert(spark, table, Seq((3L, i, "p2")).toDF("id", "ver", "p"))
      i += 1
    }
    assert(!ddlHas("v"), "campaign never shed the ddl")
    assert(CommitLog.requireState(spark, table).columnMapping.dropped.isEmpty)
    assert(reclaims.forall(_.partitions.size <= 1))
    val snap = KeyedTable.read(spark, table)
    assert(snap.count() === 3 && !snap.columns.contains("v"))
    // no live file carries the column anymore
    val fs = CommitLog.fs(spark, table)
    assert(StatsIndex.listBaseFiles(fs, table)
      .count(f => spark.read.parquet(f).columns.contains("v")) === 0)

    // quiet after the shed: another data publish adds no reclaim commit
    val n = reclaims.size
    KeyedTable.upsert(spark, table, Seq((2L, 9L, "p1")).toDF("id", "ver", "p"))
    assert(reclaims.size === n)
  }

  test("campaign.reclaim inspection budget: no publish probes more partitions " +
      "than the budget, the cursor walks the table across publishes, and sparse " +
      "campaigns still converge to the shed") {
    // 5 partitions, every file carrying the dropped column — with
    // inspect=2 a publish may footer-probe AT MOST 2 partitions even
    // though carriers abound, and the rotation cursor spreads one full
    // cycle over consecutive publishes instead of one unlucky publish
    // sweeping partition after partition (the r10 unbounded-inspection
    // defect on many-partition tables)
    val rows = (0 until 5).flatMap(p =>
      (0 until 2).map(i => ((p * 10 + i).toLong, 1L, s"v$i", s"p$p")))
    val in = tmpDir("in")
    rows.toDF("id", "ver", "v", "p").write.mode("overwrite").parquet(in)
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = table, tableName = "budget_t",
      keyFields = Seq("id"), precombineField = "ver",
      partitionFields = Seq("p"), tableType = TableType.CopyOnWrite))
    KeyedTable.dropColumns(spark, table, Seq("v"))
    TableProperties.set(spark, table, Map(
      TableProperties.CampaignReclaim -> "1",
      TableProperties.CampaignReclaimInspect -> "2"))
    def ddlHas(c: String) = org.apache.spark.sql.types.StructType
      .fromDDL(CommitLog.requireState(spark, table).latest.schemaDdl)
      .fieldNames.contains(c)
    def inspectedOf(detail: String): Int =
      "inspected=(\\d+)".r.findFirstMatchIn(detail).map(_.group(1).toInt)
        .getOrElse(fail(s"journal detail lacks the inspection count: '$detail'"))
    var i = 2L
    val details = scala.collection.mutable.ArrayBuffer[String]()
    while (ddlHas("v") && i < 20) {
      KeyedTable.upsert(spark, table, Seq((0L, i, "p0")).toDF("id", "ver", "p"))
      val e = MaintenanceLog.read(spark, table)
        .find(_.service == TableProperties.CampaignReclaim)
        .getOrElse(fail("campaign hook left no journal row"))
      details += e.detail
      i += 1
    }
    assert(!ddlHas("v"), "budgeted campaign never shed the ddl")
    assert(CommitLog.requireState(spark, table).columnMapping.dropped.isEmpty)
    // EVERY publish respected the inspection budget — the defect was one
    // publish probing the whole table when carriers ran sparse
    details.foreach(d => assert(inspectedOf(d) <= 2, s"budget exceeded: '$d'"))
    // and the rewrite bound still holds
    val reclaims = CommitLog.commits(spark, table).filter(_.operation == "reclaim")
    assert(reclaims.nonEmpty && reclaims.forall(_.partitions.size <= 1))
    // bookkeeping retired with the campaign
    val props = TableProperties.get(spark, table)
    assert(!props.contains(TableProperties.CampaignReclaim + ".cursor"))
    assert(!props.contains(TableProperties.CampaignReclaimClean))
    val snap = KeyedTable.read(spark, table)
    assert(snap.count() === 10 && !snap.columns.contains("v"))
  }

  test("campaign.reclaim clean streak: with zero carriers anywhere the shed " +
      "arrives via a cross-publish full-clean cycle, one bounded slice at a time") {
    // v is added then dropped with NO intervening write: no file ever
    // carried it, so the campaign's only path to the shed is the clean
    // streak accumulating across publishes (inspect=1 forces >1 publish)
    val rows = (0 until 4).map(p => (p.toLong, 1L, s"p$p"))
    val in = tmpDir("in")
    rows.toDF("id", "ver", "p").write.mode("overwrite").parquet(in)
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = table, tableName = "streak_t",
      keyFields = Seq("id"), precombineField = "ver",
      partitionFields = Seq("p"), tableType = TableType.CopyOnWrite))
    KeyedTable.addColumns(spark, table, Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType)))
    KeyedTable.dropColumns(spark, table, Seq("note"))
    TableProperties.set(spark, table, Map(
      TableProperties.CampaignReclaim -> "1",
      TableProperties.CampaignReclaimInspect -> "1"))
    def ddlHas(c: String) = org.apache.spark.sql.types.StructType
      .fromDDL(CommitLog.requireState(spark, table).latest.schemaDdl)
      .fieldNames.contains(c)
    assert(ddlHas("note"))
    // trigger data publishes that write NO carrying files: partition drops.
    // each hook slice probes exactly ONE clean partition; the streak has to
    // cover every remaining partition before the shed run fires
    KeyedTable.dropPartitions(spark, table, Seq("p=p3"))
    assert(ddlHas("note"), "shed too early: streak cannot cover 3 partitions after 1 probe")
    val propsMid = TableProperties.get(spark, table)
    assert(propsMid.contains(TableProperties.CampaignReclaim + ".cursor"),
      "cursor must persist even when no carrier was found")
    assert(propsMid.get(TableProperties.CampaignReclaimClean) === Some("1"))
    KeyedTable.dropPartitions(spark, table, Seq("p=p2"))
    // 2 native partitions remain; the accumulated streak (2) covers them →
    // this publish ran the single shed run
    assert(!ddlHas("note"), "full-clean streak never shed the ddl")
    assert(CommitLog.requireState(spark, table).columnMapping.dropped.isEmpty)
    val e = MaintenanceLog.read(spark, table)
      .find(_.service == TableProperties.CampaignReclaim).get
    assert(e.detail.contains("shed run"), s"unexpected journal detail '${e.detail}'")
    val props = TableProperties.get(spark, table)
    assert(!props.contains(TableProperties.CampaignReclaim + ".cursor"))
    assert(!props.contains(TableProperties.CampaignReclaimClean))
    // quiet afterwards
    val n = CommitLog.commits(spark, table).count(_.operation == "reclaim")
    KeyedTable.upsert(spark, table, Seq((0L, 9L, "p0")).toDF("id", "ver", "p"))
    assert(CommitLog.commits(spark, table).count(_.operation == "reclaim") === n)
  }

  test("randomized reclaim campaigns: any batch order converges, the ddl sheds " +
      "exactly on the final batch, the snapshot never moves (fixed seed)") {
    val rnd = new scala.util.Random(29)
    (1 to 2).foreach { _ =>
      // 5 partitions, 2-4 rows each
      val rows = (0 until 5).flatMap { p =>
        (0 until 2 + rnd.nextInt(3)).map { i =>
          ((p * 10 + i).toLong, 1L, s"v${rnd.nextInt(100)}", s"p$p")
        }
      }
      val in = tmpDir("in")
      rows.toDF("id", "ver", "v", "p").write.mode("overwrite").parquet(in)
      val table = tmpDir("tbl")
      KeyedTable.bootstrap(spark, BootstrapConfig(
        dataFilePath = in, tablePath = table, tableName = "camp_t",
        keyFields = Seq("id"), precombineField = "ver",
        partitionFields = Seq("p"), tableType = TableType.CopyOnWrite))
      KeyedTable.dropColumns(spark, table, Seq("v"))
      val want = KeyedTable.read(spark, table)
        .select("id", "ver", "p").orderBy("id").collect().toSeq

      // random batch split of the partitions, random order
      val parts = rnd.shuffle((0 until 5).map(p => s"p=p$p").toList)
      val batches = {
        var rest = parts; val b = Seq.newBuilder[Seq[String]]
        while (rest.nonEmpty) {
          val take = 1 + rnd.nextInt(rest.size)
          b += rest.take(take); rest = rest.drop(take)
        }
        b.result()
      }
      def shed = !org.apache.spark.sql.types.StructType
        .fromDDL(CommitLog.requireState(spark, table).latest.schemaDdl)
        .fieldNames.contains("v")
      batches.zipWithIndex.foreach { case (batch, i) =>
        KeyedTable.reclaim(spark, table, Some(batch))
        assert(shed === (i == batches.size - 1),
          s"ddl shed after batch ${i + 1}/${batches.size} of ${batches.map(_.size)}")
        assert(KeyedTable.read(spark, table)
          .select("id", "ver", "p").orderBy("id").collect().toSeq === want)
      }
    }
  }

  test("reclaim on MOR folds deltas first; rollback restores the pre-reclaim state") {
    val table = bootstrapped(TableType.MergeOnRead)
    KeyedTable.upsert(spark, table,
      Seq((2L, 3L, "b3", "p1")).toDF("id", "ver", "v", "p")) // delta carries v
    KeyedTable.dropColumns(spark, table, Seq("v"))
    val preReclaim = CommitLog.requireState(spark, table).latest.commitTime
    assert(KeyedTable.reclaim(spark, table).nonEmpty)

    val fs = CommitLog.fs(spark, table)
    StatsIndex.listBaseFiles(fs, table).foreach { f =>
      assert(!spark.read.parquet(f).columns.contains("v"), s"$f still carries 'v'")
    }
    // the delta upsert survived the compact-first fold
    assert(KeyedTable.read(spark, table)
      .filter(col("id") === 2).head().getAs[Long]("ver") === 3L)

    // rollback: the archived pre-reclaim files return — the column is
    // physically back on disk, and still logically dropped
    KeyedTable.rollback(spark, table, preReclaim)
    val st = CommitLog.requireState(spark, table)
    assert(org.apache.spark.sql.types.StructType.fromDDL(st.latest.schemaDdl)
      .fieldNames.contains("v"))
    assert(st.columnMapping.dropped.nonEmpty)
    val back = KeyedTable.read(spark, table)
    assert(!back.columns.contains("v"))
    assert(back.count() === 3)
    assert(back.filter(col("id") === 2).head().getAs[Long]("ver") === 3L)
  }
}
