package org.apache.spark.sql.graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
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
final case class ResolveGraftTableReads(session: SparkSession) extends Rule[LogicalPlan] {

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
    case d: DeleteFromTable => d
    case u: UpdateTable => u
    case m: MergeIntoTable =>
      m.copy(sourceTable = rewrite(m.sourceTable))
    case other =>
      other.mapChildren(rewrite)
  }
}
