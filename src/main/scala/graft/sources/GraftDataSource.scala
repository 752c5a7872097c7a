package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.GraftException
import graft.table.KeyedTable

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
class GraftDataSource extends TableProvider with RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDataSource.sourceDf(SparkSession.active, GraftDataSource.readOptions(options.asScala.toMap)).schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftTable(GraftDataSource.readOptions(properties.asScala.toMap))

  // DSv1 fallback: the session catalog's V1 resolution path for
  // `CREATE TABLE ... USING graft` tables.
  override def createRelation(ctx: SQLContext, parameters: Map[String, String]): BaseRelation =
    new GraftRelation(ctx, GraftDataSource.readOptions(parameters))
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

  /** Inner DataFrame with pushed filters and pruned columns applied. An empty
    * pruned schema (count(*) over the source) selects zero columns — the row
    * count survives, no data columns are read.
    */
  private[sources] def prunedDf(
      spark: SparkSession,
      opts: ReadOptions,
      pruneTo: Option[StructType],
      filters: Seq[Filter]): DataFrame = {
    val base = sourceDf(spark, opts)
    val filtered = filters.flatMap(toColumn).foldLeft(base)(_ filter _)
    pruneTo match {
      case Some(s) => filtered.select(s.fieldNames.toIndexedSeq.map(col): _*)
      case None => filtered
    }
  }
}

private[sources] class GraftTable(opts: GraftDataSource.ReadOptions) extends Table with SupportsRead {
  override def name(): String =
    opts.asOf.map(t => s"graft:${opts.path}@$t").getOrElse(s"graft:${opts.path}")
  override def schema(): StructType =
    GraftDataSource.sourceDf(SparkSession.active, opts).schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(opts)
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
  * default (all) so Spark re-applies every predicate post-scan.
  */
private[sources] class GraftRelation(ctx: SQLContext, opts: GraftDataSource.ReadOptions)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = ctx
  override val schema: StructType =
    GraftDataSource.sourceDf(ctx.sparkSession, opts).schema
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val wanted = StructType(requiredColumns.toIndexedSeq.map(n => schema(n)))
    GraftDataSource.prunedDf(ctx.sparkSession, opts, Some(wanted), filters.toIndexedSeq)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
