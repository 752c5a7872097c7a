package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.{GraftException, TableType, WriteOperation}
import graft.table.{CommitLog, KeyedTable, MetaColumns}

/** SQL/DataSource access to the keyed table — the surface that makes graft
  * tables visible to SQL-only consumers (BI tools, notebooks), matching the
  * reference's intent of exposing its output tables to Hive/SQL engines
  * (app.py:403-436 probes Hive tables + locations precisely so SQL consumers
  * can read them). Without this, snapshots/time-travel were reachable only
  * through the Scala API.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft").load(tablePath)                    // snapshot
  *   spark.read.format("graft").option("asOf", instant).load(p)    // time travel
  *   spark.read.format("graft").option("mode", "read_optimized")   // RO query
  *   spark.sql(s"CREATE TABLE t USING graft LOCATION '$p'")        // catalog
  * }}}
  *
  * Architecture: a DataSource V2 [[TableProvider]] whose scan implements
  * [[V1Scan]] — the sanctioned V2→V1 execution bridge (the same mechanism
  * Spark's own JDBC v2 connector uses). The table snapshot is not a static
  * file list (MOR delta merge, metadata-only partitions, read-time null-fill
  * for schema evolution are all *plans*), so the scan delegates to the
  * engine's own DataFrame ([[KeyedTable.read]]/readAsOf/readOptimized) and
  * hands Spark its `queryExecution.toRdd`. Pruned columns and pushed filters
  * are applied to that inner DataFrame first, so column pruning and predicate
  * pushdown reach the underlying parquet scans (partition pruning included —
  * predicates on partition columns prune at the inner file index); every
  * pushed filter is also reported back as post-scan residual, so correctness
  * never depends on the translation. The provider doubles as a DSv1
  * [[RelationProvider]] so session-catalog tables (`CREATE TABLE ... USING
  * graft`) resolve on Spark versions that route catalog reads through the V1
  * `DataSource.resolveRelation` path — Hudi's own Spark DefaultSource makes
  * the same dual registration for the same reason.
  */
class GraftDataSource extends TableProvider with RelationProvider
    with CreatableRelationProvider with StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  // ---- streaming write: df.writeStream.format("graft").start(path) lands
  // each micro-batch as one engine commit (GraftStreamSink). The DSv2 table
  // deliberately does NOT claim STREAMING_WRITE, so DataStreamWriter falls
  // back to this V1 face — the write twin of the streaming-read fallback
  // below, needed for the same reason (a micro-batch write is an engine
  // commit, not a file append).
  override def createSink(
      ctx: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    if (outputMode == org.apache.spark.sql.streaming.OutputMode.Complete)
      throw GraftException.config(
        "graft streaming sink supports append/update output (each micro-batch is " +
          "one keyed commit); Complete mode would re-write the whole result every batch.")
    val ci = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val compactEvery = ci.get("compactevery").map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw GraftException.config(
          s"graft option compactEvery must be a positive integer, got '$v'.")
      }
      if (n <= 0) throw GraftException.config(
        s"graft option compactEvery must be a positive integer, got '$v'.")
      n
    }.getOrElse(0)
    // DataStreamWriter.partitionBy must not be silently dropped: map it onto
    // the engine's partitionFields option (used when the first batch creates
    // the table), and refuse a contradiction between the two spellings
    val declared = ci.get("partitionfields")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // a contradiction is judged under the session's column-resolution rules:
    // Spark resolves partitionBy("Month") and partitionFields=month to the
    // SAME column unless spark.sql.caseSensitive is on, so only then do the
    // spellings genuinely disagree
    val caseSensitive = ctx.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def norm(s: Seq[String]) =
      if (caseSensitive) s else s.map(_.toLowerCase(java.util.Locale.ROOT))
    val effective = (declared, partitionColumns) match {
      case (Some(d), pc) if pc.nonEmpty && norm(d) != norm(pc) =>
        throw GraftException.config(
          s"graft streaming sink: partitionBy(${pc.mkString(", ")}) contradicts option " +
            s"partitionFields=${d.mkString(",")} — declare the partitioning once.")
      case (Some(_), _) => parameters
      case (None, pc) if pc.nonEmpty =>
        parameters + ("partitionFields" -> pc.mkString(","))
      case _ => parameters
    }
    new graft.streaming.GraftStreamSink(
      ctx.sparkSession, effective, GraftDataSource.readOptions(parameters).path, compactEvery)
  }

  // ---- streaming read: spark.readStream.format("graft").load(path) tails
  // the table's CDC feed (GraftChangeSource). The DSv2 table deliberately
  // does NOT claim MICRO_BATCH_READ, so DataStreamReader falls back to this
  // V1 face — the streaming mirror of the batch V1Scan bridge, needed for
  // the same reason (a micro-batch here is an arbitrary plan, not a file
  // list).
  override def sourceSchema(
      ctx: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), graft.streaming.GraftChangeSource.changeSchema(
      ctx.sparkSession, GraftDataSource.readOptions(parameters).path))

  override def createSource(
      ctx: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val ci = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val cap = ci.get("maxcommitspertrigger").map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw GraftException.config(
          s"graft option maxCommitsPerTrigger must be a positive integer, got '$v'.")
      }
      if (n <= 0) throw GraftException.config(
        s"graft option maxCommitsPerTrigger must be a positive integer, got '$v'.")
      n
    }
    val renameTolerant = ci.get("onschemachange") match {
      case None => false
      case Some(v) if v.equalsIgnoreCase("fail") => false
      case Some(v) if v.equalsIgnoreCase("allowRename") => true
      case Some(v) => throw GraftException.config(
        s"graft option onSchemaChange must be 'fail' or 'allowRename', got '$v'.")
    }
    new graft.streaming.GraftChangeSource(
      ctx, GraftDataSource.readOptions(parameters).path, ci.get("startat"), metadataPath,
      cap, renameTolerant)
  }

  // true so V2 CTAS (CreateTableAsSelectExec) can pass the query schema to
  // the session catalog; the engine itself always serves the authoritative
  // schema from the commit log (getTable ignores the provided one)
  override def supportsExternalMetadata(): Boolean = true

  /** Empty schema for a not-yet-created table: `df.write.format("graft")`
    * probes getTable before the V1 write fallback, and a throw here would
    * make first-time creation impossible. Reads of a missing table still
    * fail with the engine's own error — at scan build instead of analysis.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = GraftDataSource.readOptions(options.asScala.toMap)
    val spark = SparkSession.active
    if (!CommitLog.exists(spark, opts.path)) new StructType()
    else GraftDataSource.sourceSchema(spark, opts)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val params = properties.asScala.toMap
    val hasPath = params.keys.exists(_.equalsIgnoreCase("path"))
    // CREATE TABLE handshake for a MANAGED table (e.g. writeStream.toTable
    // on a missing name): the session catalog asks the provider for a Table
    // BEFORE any location exists. Serve an inert descriptor — name, the
    // declared schema, capabilities — so creation can validate; every later
    // load resolves through the catalog with the metastore-assigned
    // LOCATION, and the first write creates the engine table there.
    if (!hasPath) {
      val declared = Option(schema).getOrElse(new StructType())
      new Table {
        override def name(): String = "graft:<pending-location>"
        override def schema(): StructType = declared
        override def capabilities(): java.util.Set[TableCapability] =
          java.util.EnumSet.of(
            TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
            TableCapability.TRUNCATE, TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
      }
    } else new GraftTable(GraftDataSource.readOptions(params), params, Option(schema))
  }

  // DSv1 fallback: the session catalog's V1 resolution path for
  // `CREATE TABLE ... USING graft` tables.
  override def createRelation(ctx: SQLContext, parameters: Map[String, String]): BaseRelation =
    new GraftRelation(ctx, GraftDataSource.readOptions(parameters), parameters)

  /** DSv1 write path: `df.write.format("graft").mode(...)` and V1 CTAS
    * (`CREATE TABLE ... USING graft AS SELECT`). SaveMode mapping —
    * Overwrite re-creates (options may override the existing table's key
    * config), Append upserts/appends per the `op` option (creating the
    * table first if the path is new), ErrorIfExists/Ignore behave per
    * contract.
    */
  override def createRelation(
      ctx: SQLContext, mode: SaveMode, parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val spark = ctx.sparkSession
    val ropts = GraftDataSource.readOptions(parameters)
    val exists = CommitLog.exists(spark, ropts.path)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw GraftException.config(
          s"graft table already exists at ${ropts.path} (SaveMode.ErrorIfExists).")
      case SaveMode.Ignore if exists => ()
      case m =>
        GraftDataSource.executeWrite(spark, parameters, data,
          overwrite = m == SaveMode.Overwrite || !exists)
    }
    new GraftRelation(ctx, ropts, parameters)
  }
}

object GraftDataSource {
  final case class ReadOptions(path: String, asOf: Option[String], mode: String)

  private[sources] def readOptions(params: Map[String, String]): ReadOptions = {
    val ci = params.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val path = ci.getOrElse("path",
      throw GraftException.config("graft source requires a path (load(path) or LOCATION)."))
    val mode = ci.getOrElse("mode", "snapshot")
    if (mode != "snapshot" && mode != "read_optimized")
      throw GraftException.config(s"graft mode must be snapshot or read_optimized, got '$mode'.")
    val asOf = ci.get("asof")
    if (asOf.isDefined && mode == "read_optimized")
      throw GraftException.config("graft options asOf and mode=read_optimized are mutually exclusive.")
    ReadOptions(path, asOf, mode)
  }

  /** The engine-side plan the scan delegates to. Driver-only construction —
    * no jobs run until the outer query executes.
    */
  private[sources] def sourceDf(spark: SparkSession, opts: ReadOptions): DataFrame =
    opts.asOf match {
      case Some(instant) => KeyedTable.readAsOf(spark, opts.path, instant)
      case None if opts.mode == "read_optimized" => KeyedTable.readOptimized(spark, opts.path)
      case None => KeyedTable.read(spark, opts.path)
    }

  /** `sourceDf(...).schema`, cached per (path, table tip, asOf, mode):
    * every analysis of every query over a catalog graft table asks for the
    * relation schema, and building the full snapshot plan (O(#partitions)
    * existence checks, MOR merge plan) each time is measurable driver
    * latency. The schema must come from the REAL plan — the commit-log DDL
    * alone differs in attribute nullability (unions/merges widen it), which
    * breaks INSERT analysis — so cache the exact computation instead,
    * invalidated by the tip instant whenever the table advances.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Option[String], String), StructType]()

  private[sources] def sourceSchema(spark: SparkSession, opts: ReadOptions): StructType = {
    val tip = graft.table.CommitLog.requireState(spark, opts.path).latest.commitTime
    if (schemaCache.size > 256) schemaCache.clear()
    schemaCache.computeIfAbsent((opts.path, tip, opts.asOf, opts.mode),
      _ => sourceDf(spark, opts).schema)
  }

  /** Best-effort Filter→Column translation for pushdown into the inner plan.
    * Unsupported shapes return None and are simply not pushed — Spark
    * re-evaluates every filter post-scan regardless (see pushFilters), so
    * this translation can only prune work, never change answers.
    */
  private[sources] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case EqualNullSafe(a, v) => Some(col(a) <=> v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }

  /** Shared write dispatch for every SQL/DataFrame write surface (DSv1
    * CreatableRelationProvider, V1 catalog InsertableRelation, DSv2
    * V1Write bridge).
    *
    *  - `overwrite` (or a brand-new path) → [[KeyedTable.create]]: a
    *    bootstrap-from-DataFrame. Key config comes from write options
    *    (`keyFields`, `precombineField`, `partitionFields`, `tableType`,
    *    `tableName`), falling back to the existing table's commit-log
    *    config on re-create.
    *  - append to an existing table → the `op` option selects the engine
    *    write: `upsert` (default — the keyed-table semantic: INSERT INTO a
    *    keyed table must not duplicate keys), `insert` (in-batch dedup +
    *    append), or `bulk_insert` (raw append).
    *
    * Meta columns riding in (a CTAS from another graft table, or an
    * INSERT whose column list let Spark null-fill them) are stripped —
    * the engine stamps its own.
    */
  private[graft] def executeWrite(
      spark: SparkSession,
      params: Map[String, String],
      data: DataFrame,
      overwrite: Boolean): Unit = {
    val ci = params.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val path = ci.getOrElse("path",
      throw GraftException.config("graft write requires a path (save(path) or LOCATION)."))
    val df = data.drop(MetaColumns.all.filter(data.columns.contains): _*)
    def csv(name: String): Option[Seq[String]] =
      ci.get(name).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

    if (overwrite || !CommitLog.exists(spark, path)) {
      val prior = CommitLog.state(spark, path).map(_.latest)
      def need[A](opt: Option[A], what: String): A = opt.getOrElse(
        throw GraftException.config(
          s"graft write creating a table at $path requires option $what."))
      KeyedTable.create(spark, path, df,
        tableName = ci.get("tablename").orElse(prior.map(_.tableName))
          .getOrElse(new org.apache.hadoop.fs.Path(path).getName),
        keyFields = need(csv("keyfields").orElse(prior.map(_.keyFields)), "keyFields"),
        precombineField = need(
          ci.get("precombinefield").orElse(prior.map(_.precombineField)), "precombineField"),
        partitionFields = csv("partitionfields").orElse(prior.map(_.partitionFields))
          .getOrElse(Seq.empty),
        tableType = ci.get("tabletype").map(TableType.parse)
          .orElse(prior.map(p => TableType.parse(p.tableType))).getOrElse(TableType.CopyOnWrite))
    } else ci.getOrElse("op", "upsert") match {
      case "upsert" => KeyedTable.upsert(spark, path, df)
      case "insert" => KeyedTable.append(spark, path, df, WriteOperation.Insert)
      case "bulk_insert" => KeyedTable.append(spark, path, df, WriteOperation.BulkInsert)
      case other => throw GraftException.config(
        s"graft write op must be upsert, insert, or bulk_insert, got '$other'.")
    }
  }

  /** Range/equality bounds extractable from pushed filters — the shapes the
    * engine's stats index can prune files with. Strict comparisons map to
    * their INCLUSIVE bound: pruning with a superset range is always safe
    * (extra files survive pruning, no row escapes) and the strict predicate
    * is still applied as a residual filter.
    */
  private def conjuncts(f: Filter): Seq[Filter] = f match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private[sources] def toRanges(filters: Seq[Filter]): Seq[(String, Option[Any], Option[Any])] =
    filters.flatMap(conjuncts).collect {
      case EqualTo(a, v) if v != null && !a.contains(".") => (a, Some(v), Some(v))
      case GreaterThan(a, v) if v != null && !a.contains(".") => (a, Some(v), None)
      case GreaterThanOrEqual(a, v) if v != null && !a.contains(".") => (a, Some(v), None)
      case LessThan(a, v) if v != null && !a.contains(".") => (a, None, Some(v))
      case LessThanOrEqual(a, v) if v != null && !a.contains(".") => (a, None, Some(v))
    }

  /** Pushed IN-lists (null members dropped — IN never matches null), for
    * [[KeyedTable.readWhere]]'s bloom-probed membership pruning.
    */
  private[sources] def toInLists(filters: Seq[Filter]): Seq[(String, Seq[Any])] =
    filters.flatMap(conjuncts).collect {
      case In(a, vs) if !a.contains(".") && vs.exists(_ != null) =>
        (a, vs.toSeq.filter(_ != null))
    }

  /** Inner DataFrame with pushed filters and pruned columns applied. An empty
    * pruned schema (count(*) over the source) selects zero columns — the row
    * count survives, no data columns are read. Snapshot reads with range/
    * equality predicates route through [[KeyedTable.readWhere]], so a SQL
    * consumer's `WHERE x BETWEEN ...` skips files via the table's stats
    * index exactly like the Scala API (readWhere degrades to the plain
    * snapshot when no index exists or live deltas force a merge).
    */
  private[sources] def prunedDf(
      spark: SparkSession,
      opts: ReadOptions,
      pruneTo: Option[StructType],
      filters: Seq[Filter]): DataFrame = {
    val live = opts.asOf.isEmpty && opts.mode == "snapshot"
    val ranges = if (live) toRanges(filters) else Seq.empty
    val inLists = if (live) toInLists(filters) else Seq.empty
    val base =
      if (ranges.nonEmpty || inLists.nonEmpty)
        KeyedTable.readWhere(spark, opts.path, ranges, inLists)
      else sourceDf(spark, opts)
    val filtered = filters.flatMap(toColumn).foldLeft(base)(_ filter _)
    pruneTo match {
      case Some(s) => filtered.select(s.fieldNames.toIndexedSeq.map(col): _*)
      case None => filtered
    }
  }
}

private[sources] class GraftTable(
    opts: GraftDataSource.ReadOptions, params: Map[String, String],
    provided: Option[StructType] = None)
    extends Table with SupportsRead with SupportsWrite {
  private[sources] def path: String = opts.path
  override def name(): String =
    opts.asOf.map(t => s"graft:${opts.path}@$t").getOrElse(s"graft:${opts.path}")
  /** Commit-log schema once the table exists; before that (a CTAS validating
    * the table it is about to create) echo the caller-provided schema.
    */
  override def schema(): StructType = {
    val spark = SparkSession.active
    if (!CommitLog.exists(spark, opts.path))
      provided.filter(_.nonEmpty).getOrElse(new StructType())
    else GraftDataSource.sourceSchema(spark, opts)
  }
  // V1_BATCH_WRITE (not BATCH_WRITE): DataFrameWriter.save then takes its
  // V1 fallback into createRelation, while V2 relation INSERTs execute
  // through the V1Write bridge below — the write-side mirror of V1Scan.
  // AUTOMATIC_SCHEMA_EVOLUTION makes `MERGE ... WITH SCHEMA EVOLUTION`
  // work end-to-end: the analyzer's ResolveMergeIntoSchemaEvolution sees
  // the capability, computes the add-only column changes from the source
  // schema, applies them through GraftCatalog.alterTable (a metadata-only
  // commit), and re-resolves the statement against the widened relation —
  // no merge-side evolution code needed.
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(opts)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(params ++ info.options.asScala)
}

/** A session-catalog graft table ([[GraftSessionCatalog.loadTable]]'s wrap):
  * the same DSv2 face as [[GraftTable]] for everything batch, PLUS the V1
  * streaming fallback carrying the metastore entry — which is what lets
  * `writeStream.toTable("t")` and `spark.readStream.table("t")` resolve the
  * identifier to its LOCATION and route into the engine's existing
  * path-addressed stream sink/source (micro-batch = one commit, unchanged).
  * Spark consults the fallback only on the streaming paths; claiming
  * STREAMING_WRITE instead would demand the distributed row-level V2
  * StreamingWrite protocol, which cannot express a driver-coordinated
  * whole-batch engine commit.
  */
private[sources] class GraftCatalogBackedTable(
    opts: GraftDataSource.ReadOptions,
    params: Map[String, String],
    provided: Option[StructType],
    ct: org.apache.spark.sql.catalyst.catalog.CatalogTable)
    extends GraftTable(opts, params, provided)
    with org.apache.spark.sql.graftbridge.V1FallbackTable {
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = ct
}

/** Read-only metadata relation (`graft.`/path`.history` / `.files` /
  * `.savepoints`): the frame is a bounded, driver-built metadata listing
  * (commit log rows, file stats), served through the same [[GraftV1Scan]]
  * bridge as data scans. No pushdown — the relations are O(#commits) /
  * O(#files) small by construction.
  */
private[sources] class GraftMetaTable(tableName: String, df: DataFrame)
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = df.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new GraftV1Scan(df) }
}

/** Write-side twin of [[GraftV1Scan]]: a [[V1Write]] whose InsertableRelation
  * dispatches into the engine's own write path ([[GraftDataSource.executeWrite]]).
  * `truncate()` marks INSERT OVERWRITE → table re-create.
  */
private[sources] class GraftWriteBuilder(params: Map[String, String])
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, ov: Boolean): Unit =
        GraftDataSource.executeWrite(
          data.sparkSession, params, data, overwrite || ov)
    }
  }
}

private[sources] class GraftScanBuilder(opts: GraftDataSource.ReadOptions)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pruned: Option[StructType] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = Some(requiredSchema)

  /** Accept every translatable filter for pushdown into the inner plan, but
    * return ALL filters as post-scan residual: Spark re-applies them above
    * the scan, so a translation gap costs pruning opportunity, never
    * correctness.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => GraftDataSource.toColumn(f).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // resolved eagerly on the driver so readSchema() and the V1 relation
    // schema are the SAME StructType instance — DataSourceV2Strategy
    // hard-checks their equality before wiring the bridged RDD
    val df = GraftDataSource.prunedDf(
      SparkSession.active, opts, pruned, pushed.toIndexedSeq)
    new GraftV1Scan(df)
  }
}

/** V2 Scan executed through the V1 bridge: the relation's RDD is the inner
  * DataFrame's own physical plan (`queryExecution.toRdd`), zero-copy
  * (`needConversion = false` — rows are already InternalRow).
  */
private[sources] class GraftV1Scan(df: DataFrame) extends V1Scan {
  override def readSchema(): StructType = df.schema
  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = df.schema
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] =
        df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
    }.asInstanceOf[T]
}

/** DSv1 relation for the session-catalog path; pruning and filters reach the
  * inner plan exactly as in the V2 scan, and `unhandledFilters` keeps the
  * default (all) so Spark re-applies every predicate post-scan. The
  * [[InsertableRelation]] face serves `INSERT INTO` / `INSERT OVERWRITE` on
  * catalog tables (`CREATE TABLE ... USING graft`), routed through the same
  * write dispatch as every other surface.
  */
private[sources] class GraftRelation(
    ctx: SQLContext, opts: GraftDataSource.ReadOptions, params: Map[String, String])
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private[sources] def path: String = opts.path
  override def sqlContext: SQLContext = ctx
  override val schema: StructType =
    GraftDataSource.sourceSchema(ctx.sparkSession, opts)
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val wanted = StructType(requiredColumns.toIndexedSeq.map(n => schema(n)))
    GraftDataSource.prunedDf(ctx.sparkSession, opts, Some(wanted), filters.toIndexedSeq)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    GraftDataSource.executeWrite(
      ctx.sparkSession, params + ("path" -> opts.path), data, overwrite)
}
