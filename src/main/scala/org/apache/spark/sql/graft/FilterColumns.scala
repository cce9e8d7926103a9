package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter

/** Translates V1 `sources.Filter` trees into `Column` predicates for
  * [[graft.sinks.VersionedTable.readPruned]] and the catalog's
  * delete/overwrite paths. Untranslatable nodes drop out conservatively:
  * callers that merely PRUNE with the result stay sound (Spark re-applies
  * the exact filters), while callers that need EXACT semantics (DELETE,
  * replaceWhere) must first check [[translatesFully]].
  */
private[graft] object FilterColumns {

  def toColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) if vs.nonEmpty => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.And(l, r) =>
      (toColumn(l), toColumn(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b) // half an AND still prunes soundly
      }
    case sources.Or(l, r) =>
      for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case _ => None
  }

  /** Exact translation for row-mutating callers: every node (including
    * both AND branches) must translate, and the semantics must be a
    * strict equivalence — no pruning-only approximations. */
  def toColumnExact(f: Filter): Option[Column] = f match {
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case sources.Not(c) => toColumnExact(c).map(!_)
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for { a <- toColumnExact(l); b <- toColumnExact(r) } yield a && b
    case sources.Or(l, r) =>
      for { a <- toColumnExact(l); b <- toColumnExact(r) } yield a || b
    case other => toColumn(other)
  }

  def translatesFully(fs: Seq[Filter]): Boolean = fs.forall(toColumnExact(_).isDefined)

  /** AND of exactly-translated filters; None if any fails. */
  def conjunctionExact(fs: Seq[Filter]): Option[Column] = {
    val cols = fs.map(toColumnExact)
    if (cols.exists(_.isEmpty)) None
    else Some(cols.flatten.reduceOption(_ && _).getOrElse(lit(true)))
  }
}
