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
    "graft_stopword_hits" -> { args => StopwordHits(args.head) })

  private[functions] def registrations = fns.map { case (name, builder) =>
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.VectorExpressions", name),
      builder)
  }

  /** SQL table function `graft_near_dup('<scale-dir>', threshold)`:
    * near-dup pairs of the dir's `documents` table as a relation —
    * `SELECT * FROM graft_near_dup('/data/sf1', 0.5)`. Declares a
    * [[graft.plans.NearDupJoin]] node; the injected resolution rule
    * expands it into the LSH pipeline.
    */
  private[functions] def tableFunction
      : (FunctionIdentifier, ExpressionInfo,
         Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
    def str(e: Expression): String = e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
      case other => throw new IllegalArgumentException(
        s"graft_near_dup(dir, threshold): dir must be a string literal, got $other")
    }
    def dbl(e: Expression): Double = e match {
      case Literal(v: Double, _) => v
      case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case Literal(v: Int, _) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"graft_near_dup(dir, threshold): threshold must be a numeric literal, got $other")
    }
    (new FunctionIdentifier("graft_near_dup"),
      new ExpressionInfo("graft.plans.NearDupJoin", "graft_near_dup"),
      { args =>
        val dir = str(args.head)
        val threshold = if (args.length > 1) dbl(args(1)) else 0.5
        val docs = SparkSession.active.read
          .parquet(graft.sources.Tables.path(dir, "documents"))
        graft.plans.NearDupJoin(
          GraftShim.analyzed(docs), "doc_id", "text", threshold)
      })
  }

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
    val (tfIdent, tfInfo, tfBuilder) = tableFunction
    if (!state.tableFunctionRegistry.functionExists(tfIdent)) {
      state.tableFunctionRegistry.registerFunction(tfIdent, tfInfo, tfBuilder)
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
}

/** `spark.sql.extensions` entry point: injects the graft function family,
  * the `graft_near_dup` table function, and the [[graft.plans.NearDupJoin]]
  * resolution rule at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach(ext.injectFunction)
    ext.injectTableFunction(GraftFunctions.tableFunction)
    ext.injectResolutionRule(graft.plans.ResolveNearDupJoin(_))
  }
}
