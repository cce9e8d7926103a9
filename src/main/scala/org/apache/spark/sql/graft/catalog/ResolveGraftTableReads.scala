package org.apache.spark.sql.graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{DataSourceStrategy, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Resolves catalog READS of graft tables onto the V1
  * [[org.apache.spark.sql.graft.table.GraftTableRelation]] — the same
  * move Delta's `DeltaAnalysis` makes for `DeltaTableV2`. The V1 relation
  * is a `PrunedFilteredScan`, so predicate pushdown reaches the log's
  * stats/bloom/hidden-partition file pruning before a single parquet
  * footer opens, and MOR collapse / time travel come along for free.
  *
  * Write TARGETS must stay `DataSourceV2Relation`: `INSERT`/`DELETE`
  * planning matches on the V2 relation and dispatches to the table's
  * `V1Write`/`SupportsDelete` — rewriting them would strand the command
  * on the V1 `InsertableRelation` path the relation does not implement.
  * The rule therefore recurses manually, skipping exactly the target
  * position of each write/DML node and rewriting everything else
  * (subquery plans are resolved by the analyzer's own sub-execution, so
  * this rule sees them as top-level plans).
  */
final case class ResolveGraftTableReads(session: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      val t = r.table.asInstanceOf[GraftTable]
      val params = Map("path" -> t.path) ++
        t.asOf.map(v => "versionAsOf" -> v.toString)
      val rel = new org.apache.spark.sql.graft.table.GraftTableRelation(
        session.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext,
        params)
      // keep the V2 relation's attribute ids — the enclosing plan
      // already references them
      new LogicalRelation(rel,
        r.output.map(_.asInstanceOf[AttributeReference]),
        None, false, None)
    case i: InsertIntoStatement =>
      i.copy(query = rewrite(i.query))
    case w: V2WriteCommand =>
      w.withNewQuery(rewrite(w.query))

    // ---- DML Spark has no native V2 execution for: once the analyzer
    // has resolved (and aligned) the node, convert it to a command over
    // the table ops. Unresolved yet → leave for the next fixpoint pass.
    case u: UpdateTable
        if u.resolved && GraftDml.graftTarget(u.table).isDefined =>
      GraftUpdateCommand(GraftDml.graftTarget(u.table).get,
        u.assignments, u.condition, u.table.output)
    case u: UpdateTable => u

    case m: MergeIntoTable
        if m.resolved && GraftDml.graftTarget(m.targetTable).isDefined =>
      val t = GraftDml.graftTarget(m.targetTable).get
      if (m.notMatchedBySourceActions.nonEmpty) throw new UnsupportedOperationException(
        "graft MERGE: WHEN NOT MATCHED BY SOURCE clauses are not supported")
      if (m.withSchemaEvolution) throw new UnsupportedOperationException(
        "graft MERGE: WITH SCHEMA EVOLUTION is not supported in SQL — " +
          "use VersionedTable.merge(evolveSchema = true)")
      GraftMergeCommand(t, rewrite(m.sourceTable), m.mergeCondition,
        m.matchedActions, m.notMatchedActions, m.targetTable.output)
    case m: MergeIntoTable =>
      m.copy(sourceTable = rewrite(m.sourceTable))

    // translatable predicates stay on the metadata-only SupportsDelete
    // path; anything richer runs the full-predicate table op
    case d: DeleteFromTable
        if d.resolved && GraftDml.graftTarget(d.table).isDefined &&
          splitConjunctivePredicates(d.condition)
            .exists(c => DataSourceStrategy.translateFilter(c, true).isEmpty) =>
      GraftDeleteCommand(GraftDml.graftTarget(d.table).get,
        d.condition, d.table.output)
    case d: DeleteFromTable => d

    case other =>
      other.mapChildren(rewrite)
  }
}
