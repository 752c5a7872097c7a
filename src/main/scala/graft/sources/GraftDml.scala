package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, Filter, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.model.GraftException
import graft.table.{CommitLog, KeyedTable, MetaColumns}

/** Native SQL row-level DML for graft tables: `DELETE FROM t WHERE ...` and
  * `UPDATE t SET ... WHERE ...` typed as plain SQL statements (no CALL)
  * lower onto the engine's keyed delete/upsert commit path — identical
  * semantics to the T29 predicate DML services (one predicate read
  * resolves the affected rows; SET expressions all evaluate against the
  * PRE-update row): OCC markers, archives, CDC rows, time travel all
  * behave exactly as if the Scala API had been called. The reference's
  * runaway sweep is literally a bulk SQL UPDATE
  * (fastapi-backend/app.py:96-102); this makes that exact statement work
  * against the engine's own tables.
  *
  * Implemented as an analyzer post-hoc resolution rule (injected by
  * [[graft.functions.GraftExtensions]]) that rewrites a resolved
  * [[DeleteFromTable]]/[[UpdateTable]] over a graft relation — either the
  * DSv2 [[GraftTable]] relation or the session-catalog V1
  * [[GraftRelation]] — into a runnable command. Vanilla Spark would
  * otherwise reject both statements (row-level plans exist only for
  * [[org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]]
  * catalogs). The command carries the statement's OWN resolved
  * Filter(condition, relation) plan and evaluates it directly — no
  * re-rendering to SQL text, so any analyzable predicate works, including
  * IN/EXISTS subqueries (a rendered `InSubquery.sql` would not re-parse).
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

  /** Meta columns are engine-stamped, never user data — any reference in a
    * DML condition or assignment value is refused loudly.
    */
  private[sources] def refuseMetaRefs(e: Expression): Unit = {
    val metaRefs = e.collect {
      case a: Attribute if graft.table.MetaColumns.all.contains(a.name) => a.name
    }.distinct
    if (metaRefs.nonEmpty)
      throw GraftException.config(
        s"DML over graft tables cannot reference meta column(s): ${metaRefs.mkString(", ")}.")
  }

  /** DELETE: the statement's own resolved Filter(condition, relation) plan
    * resolves the doomed rows; [[KeyedTable.deleteRows]] — the same core
    * the T29 predicate service uses — commits them.
    */
  final case class GraftDeleteCommand(path: String, filtered: LogicalPlan)
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      KeyedTable.deleteRows(spark, path, ColumnBridge.ofRows(spark, filtered))
      Seq.empty
    }
  }

  /** UPDATE: the statement's resolved Filter plan + assignment trees feed
    * [[KeyedTable.updateRows]] — the same core (old-row SET evaluation,
    * key/partition/meta refusals) the T29 predicate service uses.
    */
  final case class GraftUpdateCommand(
      path: String, filtered: LogicalPlan, sets: Map[String, Expression])
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      KeyedTable.updateRows(spark, path, ColumnBridge.ofRows(spark, filtered),
        sets.map { case (c, e) => c -> ColumnBridge.column(e) })
      Seq.empty
    }
  }

  // ------------------------------------------------------------------ MERGE

  /** One WHEN clause, pre-rendered at rule time to side-prefixed SQL
    * (`__t`.`col` / `__s`.`col`) so the command re-binds it against its own
    * aliased join of engine snapshot × statement source.
    */
  private[sources] final case class MergeClause(
      kind: String, // "update" | "delete" | "insert"
      condSql: Option[String],
      sets: Map[String, String])

  /** MERGE INTO on a graft table — the SQL spelling of the engine's core
    * keyed upsert (J4/H7). Lowered onto existing engine writes, all
    * computed against the PRE-merge snapshot and then applied:
    *
    *  - WHEN MATCHED UPDATE SET → a column patch via
    *    [[KeyedTable.upsertPartial]] (assignments may reference both sides;
    *    unassigned columns keep their old values),
    *  - WHEN MATCHED DELETE → [[KeyedTable.delete]] of the matched keys,
    *  - WHEN NOT MATCHED INSERT → [[KeyedTable.upsert]] of the new rows
    *    (values may reference the source side only).
    *
    * Multiple WHEN MATCHED / WHEN NOT MATCHED clauses apply SQL-style
    * first-match-wins — per (target, source) pair via the eligibility
    * chain, AND per target key across clauses (an earlier clause's keys
    * are anti-joined out of later batches, so a key deleted through one
    * source row can never be resurrected by an update through another).
    * `UPDATE/INSERT *` expand by column name; UPDATE * skips key/partition
    * columns (pinned by the match condition; assigning them is a refused
    * row move). Documented divergences from strict ANSI MERGE, inherited
    * from the keyed-table contract: several source rows matching one
    * target key are precombine-resolved instead of raising a cardinality
    * error (Hudi's behavior); `SET c = NULL` keeps the old value (a
    * partial patch cannot distinguish explicit NULL from absent); and the
    * clause batches commit separately (deletes, then patches, then
    * inserts) — each commit is individually atomic and fsck-safe, but a
    * crash between them leaves the statement partially applied. WHEN NOT
    * MATCHED BY SOURCE and schema-evolving merges are refused loudly.
    */
  final case class GraftMergeCommand(
      path: String,
      source: LogicalPlan,
      mergeCondSql: String,
      matched: Seq[MergeClause],
      notMatched: Seq[MergeClause])
      extends LeafRunnableCommand {

    /** first-match-wins eligibility chain over this clause list */
    private def chained(clauses: Seq[MergeClause]): Seq[(MergeClause, String)] = {
      var prior = Seq.empty[String]
      clauses.map { c =>
        val own = c.condSql.getOrElse("true")
        val eligible =
          (prior.map(p => s"NOT (coalesce(($p), false))") :+ s"coalesce(($own), false)")
            .mkString(" AND ")
        prior :+= own
        c -> eligible
      }
    }

    override def run(spark: SparkSession): Seq[Row] = {
      val st = CommitLog.requireState(spark, path)
      val keyF = st.latest.keyFields
      val partF = st.latest.partitionFields
      val precombine = st.latest.precombineField
      // a key/partition assignment is a row MOVE, not a patch — the same
      // refusal updateWhere makes (use upsertGlobal for moves). Checked
      // here, where the table's key config is known.
      matched.filter(_.kind == "update").foreach { c =>
        val illegal = c.sets.keys.filter(n => keyF.contains(n) || partF.contains(n)).toSeq
        if (illegal.nonEmpty)
          throw GraftException.config(
            s"MERGE UPDATE cannot assign key/partition column(s): ${illegal.mkString(", ")} " +
              "(a key or partition change is a row move — use upsertGlobal).")
      }
      // the source is materialized ONCE: the matched and not-matched
      // batches each re-reference it, and a non-deterministic source
      // (uuid(), rand(), a shifting view) evaluated per-batch could route
      // a row to both or neither clause — the same reason Delta/Hudi
      // materialize MERGE sources
      val src = ColumnBridge.ofRows(spark, source).localCheckpoint().alias("__s")
      val tgt = KeyedTable.read(spark, path).alias("__t")

      // every batch is computed (materialized) against the PRE-merge
      // snapshot before any write mutates the table
      val joined = tgt.join(src, expr(mergeCondSql), "inner")
      // clause exclusivity must hold at TARGET-ROW granularity, not just
      // per (target, source) pair: a row matched by one source row under a
      // DELETE clause and another under an UPDATE clause would otherwise
      // land in both batches — and since the batches commit sequentially,
      // the later patch would resurrect the deleted row as a half-NULL one.
      // Earlier clauses claim their rows; later batches anti-join them out.
      // Row identity is key PLUS partition (the engine's key scope is
      // per-partition — the same key may legally exist in two partitions,
      // and claiming on key alone would drop the other partition's row).
      val rowId = (keyF ++ partF).distinct
      var claimed = Option.empty[org.apache.spark.sql.DataFrame]
      def unclaimed(batch: org.apache.spark.sql.DataFrame) = {
        val b = claimed.fold(batch)(k => batch.join(k, rowId, "left_anti")).localCheckpoint()
        val keys = b.select(rowId.map(org.apache.spark.sql.functions.col): _*).distinct()
        claimed = Some(claimed.fold(keys)(_.unionByName(keys)).localCheckpoint())
        b
      }
      val matchedBatches = chained(matched).map { case (c, eligible) =>
        val rows = joined.filter(expr(eligible))
        c.kind match {
          case "delete" =>
            val keep = (keyF ++ partF).distinct
            "delete" -> unclaimed(
              rows.select(keep.map(n => expr(s"`__t`.`$n`").as(n)): _*))
          case "update" =>
            val carry = (keyF ++ partF :+ precombine).distinct.filterNot(c.sets.contains)
            val cols = carry.map(n => expr(s"`__t`.`$n`").as(n)) ++
              c.sets.toSeq.sortBy(_._1).map { case (n, sql) => expr(sql).as(n) }
            "update" -> unclaimed(rows.select(cols: _*))
        }
      }
      val antiSrc = src.join(tgt, expr(mergeCondSql), "left_anti")
      val insertBatches = chained(notMatched).map { case (c, eligible) =>
        val cols = c.sets.toSeq.sortBy(_._1).map { case (n, sql) => expr(sql).as(n) }
        antiSrc.filter(expr(eligible)).select(cols: _*).localCheckpoint()
      }

      matchedBatches.foreach {
        case ("delete", b) if !b.isEmpty => KeyedTable.delete(spark, path, b)
        case ("update", b) if !b.isEmpty => KeyedTable.upsertPartial(spark, path, b)
        case _ => ()
      }
      insertBatches.filter(!_.isEmpty).foreach(b => KeyedTable.upsert(spark, path, b))
      Seq.empty
    }
  }

  class DmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case d @ DeleteFromTable(GraftRel(path), condition) if d.resolved =>
        refuseMetaRefs(condition)
        GraftDeleteCommand(path, Filter(condition, d.table))
      case u @ UpdateTable(GraftRel(path), assignments, condition) if u.resolved =>
        condition.foreach(refuseMetaRefs)
        val sets = assignments.map { a =>
          a.key match {
            case attr: Attribute => refuseMetaRefs(a.value); attr.name -> a.value
            case other => throw GraftException.config(
              s"UPDATE on a graft table supports plain column assignments, " +
                s"got '${other.sql}' (nested-field assignment is not a keyed-row patch).")
          }
        }.toMap
        GraftUpdateCommand(path,
          Filter(condition.getOrElse(Literal.TrueLiteral), u.table), sets)
      case m: MergeIntoTable if m.resolved =>
        m.targetTable match {
          case GraftRel(path) => rewriteMerge(path, m)
          case _ => plan
        }
      case _ => plan
    }

    private def rewriteMerge(path: String, m: MergeIntoTable): LogicalPlan = {
      if (m.notMatchedBySourceActions.nonEmpty)
        throw GraftException.config(
          "MERGE on a graft table does not support WHEN NOT MATCHED BY SOURCE " +
            "(use deleteWhere/updateWhere for source-absent sweeps).")
      if (m.schemaEvolutionEnabled)
        throw GraftException.config(
          "MERGE WITH SCHEMA EVOLUTION is not supported on graft tables " +
            "(write the evolving batch through upsert, which evolves add-only).")
      val tgtAttrs = m.targetTable.outputSet
      val srcAttrs = m.sourceTable.outputSet
      val tgtNames = m.targetTable.output.map(_.name)
      val srcNames = m.sourceTable.output.map(_.name).toSet

      def sideSql(e: Expression): String = {
        val meta = e.collect {
          case a: Attribute if MetaColumns.all.contains(a.name) => a.name
        }.distinct
        if (meta.nonEmpty)
          throw GraftException.config(
            s"MERGE on a graft table cannot reference meta column(s): ${meta.mkString(", ")}.")
        // merge expressions re-render to SQL (they must re-bind against the
        // command's aliased join); a subquery cannot round-trip that way
        if (e.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
          throw GraftException.config(
            "MERGE on a graft table does not support subqueries in clause " +
              "conditions or assignment values — pre-compute them into the USING source.")
        e.transform {
          case a: AttributeReference if tgtAttrs.contains(a) =>
            UnresolvedAttribute(Seq("__t", a.name))
          case a: AttributeReference if srcAttrs.contains(a) =>
            UnresolvedAttribute(Seq("__s", a.name))
        }.sql
      }
      def srcOnlySql(e: Expression, what: String): String = {
        val stray = e.collect {
          case a: AttributeReference if tgtAttrs.contains(a) => a.name
        }.distinct
        if (stray.nonEmpty)
          throw GraftException.config(
            s"MERGE $what may reference source columns only; found target column(s): " +
              stray.mkString(", ") + ".")
        sideSql(e)
      }
      def named(a: Assignment, what: String): String = a.key match {
        case attr: Attribute => attr.name
        case other => throw GraftException.config(
          s"MERGE $what supports plain column assignments, got '${other.sql}'.")
      }
      // UPDATE * must not expand to key/partition columns: their values are
      // pinned by the match condition anyway, and assigning them is the
      // refused row-move — expanding them would make UPDATE * unusable on
      // every keyed table. INSERT * keeps the full column list.
      val keyish: Set[String] = CommitLog.state(spark, path)
        .map(st => (st.latest.keyFields ++ st.latest.partitionFields).toSet)
        .getOrElse(Set.empty)
      def starSets(forUpdate: Boolean): Map[String, String] = {
        val dataCols = tgtNames.filterNot(MetaColumns.all.contains)
          .filterNot(n => forUpdate && keyish.contains(n))
        val missing = dataCols.filterNot(srcNames.contains)
        if (missing.nonEmpty)
          throw GraftException.config(
            s"MERGE * expansion: source is missing target column(s): ${missing.mkString(", ")}.")
        dataCols.map(n => n -> s"`__s`.`$n`").toMap
      }

      // Spark's analyzer resolves `UPDATE SET *` / `INSERT *` into plain
      // assignment lists expanded over the relation's FULL output — meta
      // columns included (the source must carry same-named columns for the
      // statement to analyze). STAR-generated meta and key/partition update
      // assignments are dropped (the engine stamps metas; the match pins
      // keys — keeping them would make every UPDATE * a refused row-move).
      // An EXPLICITLY written meta assignment in a non-star UPDATE still
      // hits the loud refusal below. INSERT carries no star flag, so its
      // meta assignments are dropped unconditionally (documented: the
      // engine stamps its own).
      def isMeta(a: Assignment) = a.key match {
        case attr: Attribute => MetaColumns.all.contains(attr.name)
        case _ => false
      }
      def isKeyish(a: Assignment) = a.key match {
        case attr: Attribute => keyish.contains(attr.name)
        case _ => false
      }
      val matched = m.matchedActions.map {
        case u: UpdateAction =>
          val kept =
            if (u.fromStar) u.assignments.filterNot(a => isMeta(a) || isKeyish(a))
            else u.assignments
          MergeClause("update", u.condition.map(sideSql),
            kept.map(a => named(a, "UPDATE SET") -> sideSql(a.value)).toMap)
        case UpdateStarAction(cond) =>
          MergeClause("update", cond.map(sideSql), starSets(forUpdate = true))
        case DeleteAction(cond) =>
          MergeClause("delete", cond.map(sideSql), Map.empty)
        case other => throw GraftException.config(
          s"MERGE matched action not supported on graft tables: $other.")
      }
      matched.filter(_.kind == "update").foreach { c =>
        val illegal = c.sets.keys.filter(MetaColumns.all.contains).toSeq
        if (illegal.nonEmpty)
          throw GraftException.config(
            s"MERGE UPDATE cannot assign meta column(s): ${illegal.mkString(", ")}.")
      }
      val notMatched = m.notMatchedActions.map {
        case InsertAction(cond, assignments) =>
          MergeClause("insert", cond.map(e => srcOnlySql(e, "NOT MATCHED condition")),
            assignments.filterNot(isMeta).map(a =>
              named(a, "INSERT") -> srcOnlySql(a.value, "INSERT values")).toMap)
        case InsertStarAction(cond) =>
          MergeClause("insert", cond.map(e => srcOnlySql(e, "NOT MATCHED condition")),
            starSets(forUpdate = false))
        case other => throw GraftException.config(
          s"MERGE not-matched action not supported on graft tables: $other.")
      }
      GraftMergeCommand(path, m.sourceTable, sideSql(m.mergeCondition), matched, notMatched)
    }
  }
}
