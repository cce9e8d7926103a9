package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registration + Column-level API for graft's native expressions.
  *
  * Internal operators build Columns directly (no registry round-trip).
  * SQL users get the same functions by name via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (set by
  * `GraftSession.tuned`) or an explicit `ensureRegistered(spark)`.
  */
object GraftFunctions {

  val DefaultPlanes = 16

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_hyperplane_sig" -> { args =>
      val n = args.lift(1).map {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_hyperplane_sig(v, numPlanes): numPlanes must be an int literal, got $other")
      }.getOrElse(DefaultPlanes)
      HyperplaneSig(args.head, n)
    },
    "graft_cosine" -> { args => CosineSim(args(0), args(1)) },
    "graft_shingles" -> { args => ShingleHash(args.head) },
    "graft_fingerprint" -> { args => RollingFingerprint(args.head) },
    "graft_word_ngrams" -> { args =>
      val n = args.lift(1).map {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_word_ngrams(text, n): n must be an int literal, got $other")
      }.getOrElse(3)
      WordNgrams(args.head, n)
    },
    "graft_stopword_hits" -> { args => StopwordHits(args.head) },
    "graft_nfc" -> { args => NfcNormalize(args.head) })

  private[functions] def registrations = fns.map { case (name, builder) =>
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.VectorExpressions", name),
      builder)
  }

  private def str(fn: String, e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: expected a string literal, got $other")
  }
  private def dbl(fn: String, e: Expression): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: expected a numeric literal, got $other")
  }
  private def lng(fn: String, e: Expression): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got $other")
  }

  /** SQL table functions:
    *  - `graft_near_dup('<scale-dir>', threshold)` — near-dup pairs of
    *    the dir's `documents` table as a relation; declares a
    *    [[graft.plans.NearDupJoin]] node which the injected resolution
    *    rule expands into the LSH pipeline.
    *  - `graft_snapshot('<table-path>'[, version])` — a
    *    [[graft.sinks.VersionedTable]] snapshot as a relation: latest by
    *    default, or time travel AS OF the given version —
    *    `SELECT * FROM graft_snapshot('/tables/orders', 3)`.
    *  - `graft_pruned('<table-path>', '<predicate sql>'[, version])` —
    *    the same snapshot read through log-stats + bloom file skipping:
    *    the predicate string is parsed and applied exactly, but files
    *    the log proves irrelevant are never scanned.
    */
  private[functions] def tableFunctions
      : Seq[(FunctionIdentifier, ExpressionInfo,
         Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (new FunctionIdentifier("graft_near_dup"),
      new ExpressionInfo("graft.plans.NearDupJoin", "graft_near_dup"),
      { args =>
        val dir = str("graft_near_dup(dir, threshold)", args.head)
        val threshold =
          if (args.length > 1) dbl("graft_near_dup(dir, threshold)", args(1)) else 0.5
        val docs = SparkSession.active.read
          .parquet(graft.sources.Tables.path(dir, "documents"))
        graft.plans.NearDupJoin(
          GraftShim.analyzed(docs), "doc_id", "text", threshold)
      }),
    (new FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo("graft.sinks.VersionedTable", "graft_snapshot"),
      { args =>
        val path = str("graft_snapshot(path, version)", args.head)
        val version =
          if (args.length > 1) Some(lng("graft_snapshot(path, version)", args(1))) else None
        GraftShim.analyzed(
          graft.sinks.VersionedTable.read(SparkSession.active, path, asOfVersion = version))
      }),
    (new FunctionIdentifier("graft_pruned"),
      new ExpressionInfo("graft.sinks.VersionedTable", "graft_pruned"),
      { args =>
        val fn = "graft_pruned(path, predicateSql[, version])"
        require(args.length >= 2, fn)
        val spark = SparkSession.active
        val pred = GraftShim.column(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
            .sessionState.sqlParser.parseExpression(str(fn, args(1))))
        val version = if (args.length > 2) Some(lng(fn, args(2))) else None
        val (df, _, _) = graft.sinks.VersionedTable.readPruned(
          spark, str(fn, args(0)), pred, version)
        GraftShim.analyzed(df)
      }),
    (new FunctionIdentifier("graft_files"),
      new ExpressionInfo("graft.sinks.VersionedTable", "graft_files"),
      { args =>
        val fn = "graft_files(path[, version])"
        val version = if (args.length > 1) Some(lng(fn, args(1))) else None
        GraftShim.analyzed(graft.sinks.VersionedTable.filesMeta(
          SparkSession.active, str(fn, args.head), version))
      }),
    (new FunctionIdentifier("graft_history"),
      new ExpressionInfo("graft.sinks.VersionedTable", "graft_history"),
      { args =>
        val path = str("graft_history(path)", args.head)
        GraftShim.analyzed(
          graft.sinks.VersionedTable.history(SparkSession.active, path))
      }),
    (new FunctionIdentifier("graft_changes"),
      new ExpressionInfo("graft.sinks.VersionedTable", "graft_changes"),
      { args =>
        require(args.length >= 4,
          "graft_changes(path, fromVersion, toVersion, key[, partitionCols...])")
        val fn = "graft_changes(path, from, to, key, parts...)"
        GraftShim.analyzed(graft.sinks.VersionedTable.changes(
          SparkSession.active, str(fn, args(0)), lng(fn, args(1)), lng(fn, args(2)),
          key = str(fn, args(3)),
          partitionCols = args.drop(4).map(str(fn, _)).toSeq))
      }),
    // delta-spark's table_changes(...) over the WIRE format
    (new FunctionIdentifier("delta_changes"),
      new ExpressionInfo("graft.sinks.DeltaInterop", "delta_changes"),
      { args =>
        val fn = "delta_changes(path, fromVersion, toVersion)"
        require(args.length == 3, fn)
        GraftShim.analyzed(graft.sinks.DeltaInterop.readChangeFeed(
          SparkSession.active, str(fn, args(0)), lng(fn, args(1)),
          lng(fn, args(2))))
      }))

  /** Register into an existing session's function registry (idempotent).
    * `sessionState` lives on the classic session only — fine for this
    * library, which targets classic (non-Connect) Spark.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val state = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState
    val registry = state.functionRegistry
    registrations.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
    tableFunctions.foreach { case (tfIdent, tfInfo, tfBuilder) =>
      if (!state.tableFunctionRegistry.functionExists(tfIdent)) {
        state.tableFunctionRegistry.registerFunction(tfIdent, tfInfo, tfBuilder)
      }
    }
  }

  // Column-level wrappers — direct expression construction.
  def hyperplaneSig(v: Column, numPlanes: Int = DefaultPlanes): Column =
    GraftShim.column(HyperplaneSig(GraftShim.expression(v), numPlanes))
  def cosine(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))
  def shingles(text: Column): Column =
    GraftShim.column(ShingleHash(GraftShim.expression(text)))
  def nearestCentroids(v: Column, kernel: CentroidKernel, nProbe: Int): Column =
    GraftShim.column(NearestCentroids(GraftShim.expression(v), kernel, nProbe))
  def fingerprint(text: Column): Column =
    GraftShim.column(RollingFingerprint(GraftShim.expression(text)))
  def stopwordHits(text: Column): Column =
    GraftShim.column(StopwordHits(GraftShim.expression(text)))
  def wordNgrams(text: Column, n: Int): Column =
    GraftShim.column(WordNgrams(GraftShim.expression(text), n))
  def nfc(text: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(text)))
}

/** `spark.sql.extensions` entry point: injects the graft function family,
  * the `graft_near_dup` table function, and the [[graft.plans.NearDupJoin]]
  * resolution rule at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach(ext.injectFunction)
    GraftFunctions.tableFunctions.foreach(ext.injectTableFunction)
    ext.injectResolutionRule(graft.plans.ResolveNearDupJoin(_))
    ext.injectResolutionRule(
      org.apache.spark.sql.graft.catalog.ResolveGraftTableReads(_))
    // maintenance statements Spark's grammar lacks (OPTIMIZE / VACUUM /
    // DESCRIBE HISTORY); everything else delegates verbatim
    ext.injectParser((_, delegate) =>
      new org.apache.spark.sql.graft.catalog.GraftSqlParser(delegate))
  }
}
