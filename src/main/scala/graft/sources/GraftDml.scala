package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.model.GraftException
import graft.table.KeyedTable

/** Native SQL row-level DML for graft tables: `DELETE FROM t WHERE ...` and
  * `UPDATE t SET ... WHERE ...` typed as plain SQL statements (no CALL)
  * lower onto the engine's predicate DML ([[KeyedTable.deleteWhere]] /
  * [[KeyedTable.updateWhere]] — T29), which resolves the affected keys and
  * routes through the ordinary keyed delete/upsert commit path: OCC
  * markers, archives, CDC rows, time travel all behave exactly as if the
  * Scala API had been called. The reference's runaway sweep is literally a
  * bulk SQL UPDATE (fastapi-backend/app.py:96-102); this makes that exact
  * statement work against the engine's own tables.
  *
  * Implemented as an analyzer post-hoc resolution rule (injected by
  * [[graft.functions.GraftExtensions]]) that rewrites a resolved
  * [[DeleteFromTable]]/[[UpdateTable]] over a graft relation — either the
  * DSv2 [[GraftTable]] relation or the session-catalog V1
  * [[GraftRelation]] — into a runnable command. Vanilla Spark would
  * otherwise reject both statements (row-level plans exist only for
  * [[org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]]
  * catalogs). The resolved condition/assignment trees are re-rendered to
  * SQL text with qualifiers stripped, because the engine's predicate DML
  * re-binds them against its OWN snapshot read — attribute identity must
  * not leak across the two plans.
  */
object GraftDml {

  /** A resolved relation over a graft table, in any of the shapes the
    * analyzer produces: V2 relation, V1 LogicalRelation, or either under
    * SubqueryAlias wrappers.
    */
  private[sources] object GraftRel {
    def unapply(plan: LogicalPlan): Option[String] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable => Some(t.path)
        case _ => None
      }
      case l: LogicalRelation => l.relation match {
        case g: GraftRelation => Some(g.path)
        case _ => None
      }
      case _ => None
    }
  }

  /** Render a RESOLVED expression back to parseable SQL for the engine's
    * predicate DML. Qualifiers are stripped (the engine re-binds names
    * against its own read; a `spark_catalog.default.t.x` spelling would
    * not resolve there), and meta-column references are refused — they are
    * engine-stamped, not user data.
    */
  private[sources] def toSql(e: Expression): String = {
    val metaRefs = e.collect {
      case a: Attribute if graft.table.MetaColumns.all.contains(a.name) => a.name
    }.distinct
    if (metaRefs.nonEmpty)
      throw GraftException.config(
        s"DML over graft tables cannot reference meta column(s): ${metaRefs.mkString(", ")}.")
    e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql
  }

  final case class GraftDeleteCommand(path: String, predicateSql: String)
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      KeyedTable.deleteWhere(spark, path, predicateSql)
      Seq.empty
    }
  }

  final case class GraftUpdateCommand(
      path: String, predicateSql: String, sets: Map[String, String])
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      KeyedTable.updateWhere(spark, path, predicateSql, sets)
      Seq.empty
    }
  }

  class DmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case d @ DeleteFromTable(GraftRel(path), condition) if d.resolved =>
        GraftDeleteCommand(path, toSql(condition))
      case u @ UpdateTable(GraftRel(path), assignments, condition) if u.resolved =>
        val sets = assignments.map { a =>
          a.key match {
            case attr: Attribute => attr.name -> toSql(a.value)
            case other => throw GraftException.config(
              s"UPDATE on a graft table supports plain column assignments, " +
                s"got '${other.sql}' (nested-field assignment is not a keyed-row patch).")
          }
        }.toMap
        GraftUpdateCommand(path, toSql(condition.getOrElse(Literal.TrueLiteral)), sets)
      case _ => plan
    }
  }
}
