package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.TimestampType

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
  * foldable timestamp expression (evaluated in the session time zone,
  * converted to the UTC instant encoding). Non-graft tables and
  * non-session-catalog identifiers pass through untouched; an unfoldable
  * timestamp falls through to Spark's own error path.
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, timestamp, version) =>
      sessionGraftPath(u.multipartIdentifier) match {
        case None => tt
        case Some(path) =>
          version.foreach(GraftCatalog.requireInstant)
          val instant: Option[String] = version.orElse {
            timestamp.collect {
              case e if e.resolved && e.foldable =>
                Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)).eval() match {
                  case micros: Long => Some(GraftCatalog.microsToInstant(micros))
                  case _ => None
                }
            }.flatten
          }
          instant match {
            case None => tt // unfoldable timestamp: Spark's own error path
            case Some(i) =>
              val params = Map("path" -> path, "asOf" -> i)
              DataSourceV2Relation.create(
                new GraftTable(GraftDataSource.readOptions(params), params, None),
                None, None)
          }
      }
  }
}
