package org.apache.spark.sql.graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.sinks.VersionedTable

/** Maintenance-statement SQL for graft tables — the statements Spark's
  * grammar has no production for, intercepted BEFORE the delegate
  * parser (the delta-spark `DeltaSqlParser` mechanism, injected via
  * `SparkSessionExtensions.injectParser`):
  *
  *   OPTIMIZE graft.ns.t
  *   VACUUM graft.ns.t [RETAIN <n> VERSIONS] [GRACE <m> MINUTES]
  *   DESCRIBE HISTORY graft.ns.t
  *
  * Anything else — including every standard statement — passes to the
  * delegate verbatim, so the parser is a pure extension, never a fork.
  * Statement recognition is a case-insensitive prefix match; the table
  * identifier resolves through the REGISTERED catalog instance (same
  * warehouse mapping as DataFrame reads), refusing non-graft catalogs
  * and absent tables loudly.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Optimize =
    """(?is)\s*OPTIMIZE\s+([\w.`]+?)(?:\s+ZORDER\s+BY\s+\(([\w,\s`]+)\))?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+([\w.`]+?)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(?:\s+GRACE\s+(\d+)\s+MINUTES)?\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`]+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Optimize(ident, zorder) =>
      GraftOptimizeCommand(parseIdent(ident),
        Option(zorder).toSeq.flatMap(_.split(","))
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
    case Vacuum(ident, retain, grace) =>
      GraftVacuumCommand(parseIdent(ident),
        Option(retain).map(_.toInt).getOrElse(2),
        Option(grace).map(_.toLong * 60000L)
          .getOrElse(GraftVacuumCommand.DefaultOrphanGraceMs))
    case History(ident) =>
      GraftHistoryCommand(parseIdent(ident))
    case _ => delegate.parsePlan(sqlText)
  }

  private def parseIdent(raw: String): Seq[String] =
    delegate.parseMultipartIdentifier(raw.trim)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private object GraftMaintenance {
  def catalogOf(spark: SparkSession, ident: Seq[String]): GraftCatalog =
    spark.sessionState.catalogManager.catalog(ident.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"'${ident.head}' is not a graft catalog (${other.getClass.getSimpleName})")
    }

  /** `catalog.[ns.]table` → Identifier, the catalog's default namespace
    * filling a 2-part ident — the SAME resolution a SELECT gets, so the
    * maintenance statement and the read target one table.
    */
  def identOf(cat: GraftCatalog, ident: Seq[String]): Identifier =
    if (ident.size == 2) Identifier.of(cat.defaultNamespace(), ident.last)
    else Identifier.of(ident.tail.init.toArray, ident.last)

  /** Resolve `catalog.ns....name` through the registered [[GraftCatalog]]
    * — the one source of truth for the ident → warehouse-path mapping.
    */
  def tablePath(spark: SparkSession, ident: Seq[String]): String = {
    require(ident.size >= 2,
      s"graft maintenance statements need catalog.[ns.]table, got ${ident.mkString(".")}")
    val cat = catalogOf(spark, ident)
    val id = identOf(cat, ident)
    require(cat.tableExists(id),
      s"table ${ident.mkString(".")} does not exist")
    cat.resolvedTablePath(id)
  }

  def attrs(fields: (String, DataType)*): Seq[Attribute] =
    fields.map { case (n, t) => AttributeReference(n, t, nullable = true)() }
}

/** `OPTIMIZE graft.ns.t [ZORDER BY (c1, c2)]` →
  * [[VersionedTable.optimize]] (bin-pack every over-fragmented
  * partition dir) or [[VersionedTable.clusterZOrder]] (global rewrite
  * clustered by the interleaved key; identity partition columns come
  * from the catalog's table metadata).
  */
final case class GraftOptimizeCommand(ident: Seq[String],
    zorderBy: Seq[String] = Nil) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenance.attrs("version" -> LongType)
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenance.tablePath(spark, ident)
    if (zorderBy.isEmpty) Seq(Row(VersionedTable.optimize(spark, path)))
    else {
      val cat = GraftMaintenance.catalogOf(spark, ident)
      val t = cat.loadTable(GraftMaintenance.identOf(cat, ident))
        .asInstanceOf[GraftTable]
      require(t.hiddenSpec.isEmpty,
        "OPTIMIZE ZORDER BY on a transform-partitioned table is not " +
          "supported through SQL — use the clusterZOrder API")
      Seq(Row(VersionedTable.clusterZOrder(spark, path, zorderBy,
        t.identityCols)))
    }
  }
}

/** `VACUUM graft.ns.t [RETAIN n VERSIONS] [GRACE m MINUTES]` →
  * [[VersionedTable.vacuum]]. The orphan grace defaults to 10 minutes —
  * a bare `VACUUM t` issued while another writer sits between staging
  * and commit must not delete that writer's not-yet-referenced files
  * (Delta's spelling keeps a 7-day default for the same reason);
  * `GRACE 0 MINUTES` makes zero-grace an explicit opt-in.
  */
object GraftVacuumCommand {
  val DefaultOrphanGraceMs: Long = 10L * 60 * 1000
}
final case class GraftVacuumCommand(ident: Seq[String], retainVersions: Int,
    orphanGraceMs: Long = GraftVacuumCommand.DefaultOrphanGraceMs)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenance.attrs("deleted_files" -> LongType)
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenance.tablePath(spark, ident)
    val deleted = VersionedTable.vacuum(spark, path,
      retainVersions = retainVersions, orphanMinAgeMs = orphanGraceMs)
    Seq(Row(deleted.size.toLong))
  }
}

/** `DESCRIBE HISTORY graft.ns.t` → the commit ledger as rows. */
final case class GraftHistoryCommand(ident: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("version", LongType),
      StructField("ts_ms", LongType),
      StructField("op", StringType),
      StructField("n_added", IntegerType),
      StructField("n_removed", IntegerType))))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenance.tablePath(spark, ident)
    VersionedTable.history(spark, path).collect().toSeq
  }
}
