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

  /** Register into an existing session's function registry (idempotent).
    * `sessionState` lives on the classic session only — fine for this
    * library, which targets classic (non-Connect) Spark.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registrations.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
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
}

/** `spark.sql.extensions` entry point: injects the graft function family
  * at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach(ext.injectFunction)
}
