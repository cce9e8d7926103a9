package org.apache.spark.sql.graft.catalog

import org.apache.spark.sql.{Column, GraftShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sinks.VersionedTable

/** Shared translation from RESOLVED DML expressions (bound to plan
  * attribute ids) back into name-addressed `Column`s the table ops
  * evaluate over their own frames: target attributes become `t.<col>`
  * (or bare names for single-table commands), source attributes
  * `s.<col>`. Subqueries are rejected — the command re-plans the
  * expression in a different frame where the subquery's bindings are
  * gone.
  */
private[catalog] object GraftDml {

  def graftTarget(plan: LogicalPlan): Option[GraftTable] = plan match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      Some(r.table.asInstanceOf[GraftTable])
    case _ => None
  }

  def rebind(e: Expression, mapping: Map[Long, Seq[String]]): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"graft DML does not support subqueries in conditions/values: ${e.sql}")
    GraftShim.column(e.transform {
      case a: AttributeReference =>
        UnresolvedAttribute(mapping.getOrElse(a.exprId.id,
          throw new IllegalArgumentException(
            s"graft DML: reference ${a.name} is bound to neither side")))
    })
  }

  def mappingOf(attrs: Seq[Attribute], prefix: Seq[String]): Map[Long, Seq[String]] =
    attrs.map(a => a.exprId.id -> (prefix :+ a.name)).toMap

  /** An aligned assignment whose value is just the column itself is the
    * analyzer's padding — dropping it keeps the op's "unlisted columns
    * keep their value" default doing the work.
    */
  def isIdentity(a: Assignment): Boolean = (a.key, a.value) match {
    case (k: AttributeReference, v: AttributeReference) => k.exprId == v.exprId
    case _ => false
  }

  def targetColOf(a: Assignment): String = a.key match {
    case k: AttributeReference => k.name
    case other => throw new UnsupportedOperationException(
      s"graft DML supports top-level column assignments only, got ${other.sql}")
  }

  /** Re-execute any cached plan over the table's live snapshot — DML
    * lands outside Spark's V2 write hooks, so cached reads (which this
    * module resolves to the V1 relation) must be refreshed here. The
    * relation's value equality on (path, version, schema) is what makes
    * the lookup hit.
    */
  def refreshCache(session: SparkSession, table: GraftTable): Unit = {
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rel = new org.apache.spark.sql.graft.table.GraftTableRelation(
      classic.sqlContext, Map("path" -> table.path))
    classic.sharedState.cacheManager.recacheByPlan(classic,
      org.apache.spark.sql.execution.datasources.LogicalRelation(rel, false))
  }
}

/** `UPDATE graft.ns.t SET ... WHERE ...` → [[VersionedTable.update]]:
  * a COW rewrite of only the predicate's partitions.
  */
final case class GraftUpdateCommand(
    table: GraftTable,
    assignments: Seq[Assignment],
    condition: Option[Expression],
    targetOutput: Seq[Attribute]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val m = GraftDml.mappingOf(targetOutput, Nil)
    val set = assignments.filterNot(GraftDml.isIdentity)
      .map(a => GraftDml.targetColOf(a) -> GraftDml.rebind(a.value, m)).toMap
    if (set.isEmpty) return Nil // every assignment was identity padding
    val pred = condition.map(GraftDml.rebind(_, m))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    VersionedTable.update(session, table.path, set, pred,
      if (table.hiddenSpec.nonEmpty) Nil else table.identityCols)
    GraftDml.refreshCache(session, table)
    Nil
  }
}

/** `DELETE FROM graft.ns.t WHERE <predicate Spark cannot turn into
  * source filters>` → [[VersionedTable.delete]] with the full Column
  * predicate (the translatable case stays on the metadata-only
  * `SupportsDelete` path).
  */
final case class GraftDeleteCommand(
    table: GraftTable,
    condition: Expression,
    targetOutput: Seq[Attribute]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val pred = GraftDml.rebind(condition, GraftDml.mappingOf(targetOutput, Nil))
    VersionedTable.delete(session, table.path, pred,
      if (table.hiddenSpec.nonEmpty) Nil else table.identityCols)
    GraftDml.refreshCache(session, table)
    Nil
  }
}

/** `MERGE INTO graft.ns.t t USING src s ON ...` → [[VersionedTable.merge]].
  *
  * The ON clause must be a conjunction of `t.<c> = s.<c>` equalities
  * covering exactly the table's identity partition columns plus ONE key
  * column — that is precisely the join [[VersionedTable.merge]] runs, so
  * the SQL gets standard MERGE semantics (including the
  * multiple-source-rows-matched error). On a hidden-transform table the
  * ON must instead cover the transforms' RAW source columns plus one
  * key: exact equality on the raw columns implies equality on every
  * derived partition value (transforms are functions of them), so the
  * engine's partition-scoped join with the raw columns as extra exact
  * keys matches precisely the rows the SQL says — no silent widening to
  * day/bucket granularity.
  */
final case class GraftMergeCommand(
    table: GraftTable,
    source: LogicalPlan,
    mergeCondition: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    targetOutput: Seq[Attribute]) extends LeafRunnableCommand
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def run(session: SparkSession): Seq[Row] = {
    val tm = GraftDml.mappingOf(targetOutput, Seq("t"))
    val sm = GraftDml.mappingOf(source.output, Seq("s"))
    val both = tm ++ sm
    val key = keyFromOn

    // UPDATE/INSERT * take every same-named source column — exactly the
    // op's own defaults, so the star cases carry no assignment list
    val sourceNames = source.output.map(_.name)
    def starSet: Map[String, Column] =
      targetOutput.map(_.name).filter(sourceNames.contains)
        .map(n => n -> org.apache.spark.sql.functions.col(s"s.$n")).toMap
    def clauseOf(a: MergeAction): VersionedTable.MergeClause = a match {
      case UpdateAction(cond, assigns, _) =>
        VersionedTable.MatchedUpdate(
          assigns.filterNot(GraftDml.isIdentity)
            .map(x => GraftDml.targetColOf(x) -> GraftDml.rebind(x.value, both)).toMap,
          cond.map(GraftDml.rebind(_, both)))
      case UpdateStarAction(cond) =>
        VersionedTable.MatchedUpdate(starSet, cond.map(GraftDml.rebind(_, both)))
      case DeleteAction(cond) =>
        VersionedTable.MatchedDelete(cond.map(GraftDml.rebind(_, both)))
      case InsertAction(cond, assigns) =>
        VersionedTable.NotMatchedInsert(
          Some(assigns.map(x =>
            GraftDml.targetColOf(x) -> GraftDml.rebind(x.value, both)).toMap),
          cond.map(GraftDml.rebind(_, both)))
      case InsertStarAction(cond) =>
        VersionedTable.NotMatchedInsert(None, cond.map(GraftDml.rebind(_, both)))
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: unsupported action $other")
    }
    val sourceDf = GraftShim.ofRows(session, source)
    val hidden = table.hiddenSpec
    VersionedTable.merge(session, table.path, sourceDf, key,
      if (hidden.nonEmpty) Nil else table.identityCols,
      (matchedActions ++ notMatchedActions).map(clauseOf),
      extraKeyCols = hidden.map(_.source).distinct.filterNot(_ == key))
    GraftDml.refreshCache(session, table)
    Nil
  }

  /** Split the ON conjunction into same-name t=s equalities; exactly the
    * partition columns (identity, or the transforms' raw sources for a
    * hidden-partitioned table) plus one key must be covered.
    */
  private def keyFromOn: String = {
    val tIds = targetOutput.map(a => a.exprId.id -> a.name).toMap
    val sIds = source.output.map(a => a.exprId.id -> a.name).toMap
    val names = splitConjunctivePredicates(mergeCondition).map {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          a: AttributeReference, b: AttributeReference) =>
        val (t, s) = (tIds.get(a.exprId.id).orElse(tIds.get(b.exprId.id)),
          sIds.get(a.exprId.id).orElse(sIds.get(b.exprId.id)))
        (t, s) match {
          case (Some(tn), Some(sn)) if tn == sn => tn
          case _ => throw new UnsupportedOperationException(
            s"graft MERGE: ON must equate same-named target/source columns, " +
              s"got ${a.name} = ${b.name}")
        }
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: ON must be a conjunction of t.<c> = s.<c> equalities, " +
          s"got ${other.sql}")
    }.toSet
    val partSet =
      if (table.hiddenSpec.nonEmpty) table.hiddenSpec.map(_.source).toSet
      else table.identityCols.toSet
    val keys = names -- partSet
    require(partSet.subsetOf(names) && keys.size == 1,
      s"graft MERGE: ON must cover the partition columns ${partSet.mkString(",")} " +
        s"plus exactly one key column; got ${names.mkString(",")}")
    keys.head
  }
}
