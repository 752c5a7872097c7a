package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{AsOfTimestamp, RelationTimeTravel, TimeTravelSpec, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL time travel for SESSION-CATALOG graft tables
  * (`CREATE TABLE t USING graft LOCATION ...` then
  * `SELECT ... FROM t VERSION AS OF i` / `TIMESTAMP AS OF ts`).
  *
  * Spark's `V2SessionCatalog.loadTable(ident, version)` categorically fails
  * time travel for provider-backed session tables, so the path catalog's
  * overloads ([[GraftCatalog.loadTable]]) can't serve these — instead this
  * HINT-RESOLUTION rule (the batch that runs before relation resolution,
  * i.e. before `failTimeTravel` would fire) rewrites
  * `RelationTimeTravel(UnresolvedRelation(t))` over a session-catalog table
  * whose provider is `graft` into the table's V2 relation with the `asOf`
  * read option — the exact relation the path catalog's VERSION AS OF
  * resolves to, so both SQL spellings share one read path
  * ([[graft.table.KeyedTable.readAsOf]]).
  *
  * `VERSION AS OF` takes an engine commit instant; `TIMESTAMP AS OF` any
  * expression Spark's own `TimeTravelSpec` accepts — literals AND foldable
  * function forms (`current_timestamp()`, `date_sub(current_date(), 1)`):
  * the hint batch runs before function resolution, so the timestamp
  * expression is first resolved against a one-row plan, then handed to
  * `TimeTravelSpec.create` (which folds current-time expressions and
  * ANSI-casts exactly as V2 catalogs do) and converted to the UTC instant
  * encoding. Non-graft tables and non-session-catalog identifiers pass
  * through untouched; an unresolvable timestamp falls through to Spark's
  * own error path.
  */
class GraftTimeTravel(spark: SparkSession) extends Rule[LogicalPlan] {

  private def sessionGraftPath(parts: Seq[String]): Option[String] = {
    val id = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(d, t) => TableIdentifier(t, Some(d))
      case Seq(cat, d, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(d))
      case _ => return None
    }
    try {
      val cat = spark.sessionState.catalog
      // name resolution prefers temp views: a temp view shadowing a
      // same-named graft table must take Spark's own path (time travel on a
      // view is an error there), never be silently bypassed to the table
      if (cat.isTempView(parts)) None
      else if (!cat.tableExists(id)) None
      else {
        val meta = cat.getTableMetadata(id)
        if (meta.provider.exists(_.equalsIgnoreCase("graft")))
          Some(new org.apache.hadoop.fs.Path(meta.location).toString)
        else None
      }
    } catch { case _: Exception => None }
  }

  /** Resolve a (possibly still-unresolved — the hint batch precedes
    * function resolution) timestamp expression against a one-row plan.
    */
  private def resolveTs(e: Expression): Option[Expression] =
    if (e.resolved) Some(e)
    else try {
      spark.sessionState.analyzer.execute(
        Project(Seq(Alias(e, "__ts")()), OneRowRelation())) match {
        case Project(Seq(a: Alias), _) if a.child.resolved => Some(a.child)
        case _ => None
      }
    } catch { case _: Exception => None }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, timestamp, version) =>
      sessionGraftPath(u.multipartIdentifier) match {
        case None => tt
        case Some(path) =>
          version.foreach(GraftCatalog.requireInstant)
          val instant: Option[String] = version.orElse {
            timestamp.flatMap(resolveTs).flatMap { re =>
              // Spark's own spec builder: folds current_timestamp-likes,
              // ANSI-casts, and raises ITS errors for unfoldable inputs —
              // session-catalog tables behave exactly like V2 catalogs
              TimeTravelSpec.create(Some(re), None, conf.sessionLocalTimeZone).collect {
                case AsOfTimestamp(micros) => GraftCatalog.microsToInstant(micros)
              }
            }
          }
          instant match {
            case None => tt // unresolvable timestamp: Spark's own error path
            case Some(i) =>
              val params = Map("path" -> path, "asOf" -> i)
              DataSourceV2Relation.create(
                new GraftTable(GraftDataSource.readOptions(params), params, None),
                None, None)
          }
      }
  }
}
