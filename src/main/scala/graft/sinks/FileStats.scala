package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-data-file column statistics + conservative stats-vs-predicate
  * pruning, shared by the lakehouse wire-format writers/readers
  * ([[DeltaInterop]] `add.stats`, [[IcebergInterop]] manifest bounds).
  *
  * This is the 100 TB data-skipping path: at scale the win is not
  * row-group skipping inside an opened file (the parquet reader already
  * does that) but never PLANNING a task for a file the predicate can
  * provably not match — with millions of files, pruning happens against
  * the table metadata before any scan task exists. The reference gets
  * this from the connector jars (Delta/Hudi/Iceberg all ship it); here
  * it is implemented against the open formats directly.
  *
  * Collection is ONE distributed aggregation over the freshly staged
  * files (grouped by `input_file_name`), not a driver loop over parquet
  * footers — per-commit cost, scales with the commit's executor count.
  *
  * Pruning is CONSERVATIVE by construction: only simple conjuncts of
  * comparisons between a column and a literal participate; anything
  * else (functions, OR trees, column-column predicates) keeps the file.
  * Callers must still apply the full predicate to the rows — pruning
  * may only ever drop files that cannot match.
  */
object FileStats {

  /** Stats for one column of one file. `allNull` is the strongest form
    * of "min/max absent": the column is known to hold no non-null value.
    */
  final case class ColStats(min: Option[Any], max: Option[Any],
      nullCount: Option[Long], allNull: Boolean)

  final case class FileStat(numRecords: Option[Long], cols: Map[String, ColStats])

  /** Types whose min/max order parquet, Delta's stats JSON, and
    * Iceberg's bound serialization all agree on. Binary/struct/array
    * and exotic types carry no stats (never pruned on).
    */
  def boundEligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  /** One Spark job over `files` (all sharing `schema`, no partition
    * columns): per file, row count + min/max/nullCount for every
    * bound-eligible column. Keys are CANONICAL FULL PATHS ([[canon]]) —
    * basenames are NOT unique when the file list mixes hive partition
    * dirs or donor files gathered from arbitrary commits (a task reuses
    * its part filename in every partition dir it touches), and a
    * basename collision would cross-assign stats, making stats-based
    * pruning silently drop matching rows. Look results up with
    * `statsByFile.get(FileStats.canon(path))`.
    */
  def collect(spark: SparkSession, files: Seq[String],
      schema: StructType): Map[String, FileStat] = {
    if (files.isEmpty) return Map.empty
    val statCols = schema.fields.filter(f => boundEligible(f.dataType)).toSeq
    val aggs = count(lit(1)).as("_nrec") +: statCols.flatMap { f =>
      Seq(min(col(f.name)).as(s"_min_${f.name}"),
        max(col(f.name)).as(s"_max_${f.name}"),
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"_nc_${f.name}"))
    }
    spark.read.schema(schema).parquet(files: _*)
      .groupBy(input_file_name().as("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val n = r.getAs[Long]("_nrec")
        val cols = statCols.map { f =>
          val nc = r.getAs[Long](s"_nc_${f.name}")
          val mn = Option(r.get(r.fieldIndex(s"_min_${f.name}")))
            .map(v => toInternal(v, f.dataType))
          val mx = Option(r.get(r.fieldIndex(s"_max_${f.name}")))
            .map(v => toInternal(v, f.dataType))
          f.name -> ColStats(mn, mx, Some(nc), allNull = nc == n)
        }.toMap
        canon(r.getAs[String]("_file")) -> FileStat(Some(n), cols)
      }.toMap
  }

  /** Canonical form of a file path for stats-map keying: URI forms
    * percent-decode their path; scheme+authority survive when present
    * (s3://bucket/key stays bucket-qualified), while local URI shapes
    * (`file:///x`, `file:/x`) and bare paths all collapse to `/x` — so
    * `input_file_name()`'s URI spelling and a caller's plain path
    * spelling of the same file agree. Undecodable strings pass through
    * verbatim.
    */
  def canon(p: String): String =
    if (p.matches("[A-Za-z][A-Za-z0-9+.-]*:/.*"))
      try {
        val u = java.net.URI.create(p)
        val auth = Option(u.getAuthority).getOrElse("")
        if (auth.isEmpty) u.getPath else s"${u.getScheme}://$auth${u.getPath}"
      } catch { case _: IllegalArgumentException => p }
    else p

  /** External (Row) value → catalyst internal value, the domain all
    * comparisons run in (UTF8String for strings, days for dates,
    * micros for timestamps).
    */
  def toInternal(v: Any, dt: DataType): Any =
    CatalystTypeConverters.createToCatalystConverter(dt)(v)

  // ---- predicate model ----

  sealed trait Pred { def colName: String }
  final case class Cmp(colName: String, op: String, value: Any) extends Pred
  final case class InSet(colName: String, values: Seq[Any]) extends Pred
  final case class NullCheck(colName: String, isNull: Boolean) extends Pred

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case a: Attribute => Some(a.name)
    case _ => None
  }

  /** A resolved expression whose value is a compile-time constant — a
    * bare Literal, or the analyzer's implicit Cast around one (e.g. an
    * Int literal compared to a Long column).
    */
  private object Const {
    def unapply(e: Expression): Option[Any] =
      if (e.foldable) Some(e.eval(null)) else None
  }

  /** Resolve `where` against the table schema (an empty relation — the
    * analyzer types the literals and inserts the implicit casts, so a
    * pruning comparison runs in exactly the domain the row filter
    * would), then keep the conjuncts this evaluator understands;
    * everything else is silently non-pruning (the caller re-applies the
    * full predicate to rows).
    */
  def prunablePreds(spark: SparkSession, schema: StructType,
      where: Column): Seq[Pred] = {
    val analyzed = org.apache.spark.sql.GraftShim.analyzed(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema).filter(where))
    val condition = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    condition.toSeq.flatMap(conjuncts).flatMap {
      case EqualTo(a, Const(v)) => attrName(a).map(Cmp(_, "=", v))
      case EqualTo(Const(v), a) => attrName(a).map(Cmp(_, "=", v))
      case LessThan(a, Const(v)) => attrName(a).map(Cmp(_, "<", v))
      case LessThan(Const(v), a) => attrName(a).map(Cmp(_, ">", v))
      case LessThanOrEqual(a, Const(v)) => attrName(a).map(Cmp(_, "<=", v))
      case LessThanOrEqual(Const(v), a) => attrName(a).map(Cmp(_, ">=", v))
      case GreaterThan(a, Const(v)) => attrName(a).map(Cmp(_, ">", v))
      case GreaterThan(Const(v), a) => attrName(a).map(Cmp(_, "<", v))
      case GreaterThanOrEqual(a, Const(v)) => attrName(a).map(Cmp(_, ">=", v))
      case GreaterThanOrEqual(Const(v), a) => attrName(a).map(Cmp(_, "<=", v))
      case In(a, vs) if vs.forall(_.foldable) =>
        attrName(a).map(InSet(_, vs.map(_.eval(null))))
      case IsNull(a) => attrName(a).map(NullCheck(_, isNull = true))
      case IsNotNull(a) => attrName(a).map(NullCheck(_, isNull = false))
      case _ => None
    }
  }

  /** Could any row of a file with `stat` match every pred? Missing
    * stats for a column ⇒ that pred cannot prune. Null literals never
    * prune (SQL null comparison semantics stay with the row filter).
    */
  def mayMatch(preds: Seq[Pred], stat: FileStat): Boolean = preds.forall {
    case NullCheck(c, wantNull) => stat.cols.get(c) match {
      case None => true
      case Some(s) if wantNull => s.allNull || s.nullCount.forall(_ > 0)
      case Some(s) => !s.allNull
    }
    case Cmp(_, _, null) => true
    case Cmp(c, op, v) => stat.cols.get(c) match {
      case None => true
      case Some(s) if s.allNull => false
      case Some(s) => rangeMayMatch(op, v, s)
    }
    case InSet(c, vs) => stat.cols.get(c) match {
      case None => true
      case Some(s) if s.allNull => false
      case Some(s) => vs.exists(v => v != null && rangeMayMatch("=", v, s))
    }
  }

  private def rangeMayMatch(op: String, v: Any, s: ColStats): Boolean = {
    // absent min/max with live non-null rows (foreign table without
    // stats for this column) → cannot prune
    if (s.min.isEmpty || s.max.isEmpty) return true
    val (mn, mx) = (s.min.get, s.max.get)
    op match {
      case "=" => cmp(v, mn).forall(_ >= 0) && cmp(v, mx).forall(_ <= 0)
      case "<" => cmp(mn, v).forall(_ < 0)
      case "<=" => cmp(mn, v).forall(_ <= 0)
      case ">" => cmp(mx, v).forall(_ > 0)
      case ">=" => cmp(mx, v).forall(_ >= 0)
      case _ => true
    }
  }

  /** Compare two catalyst-internal values; None (no pruning) when the
    * pair is not comparable. Numerics widen through BigDecimal so an
    * IntegerType literal ranges against a LongType column.
    */
  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Number, y: Number) =>
      Some(BigDecimal(x.toString).compare(BigDecimal(y.toString)))
    case (x: Decimal, y) => cmp(x.toBigDecimal.underlying(), y)
    case (x, y: Decimal) => cmp(x, y.toBigDecimal.underlying())
    case (x: UTF8String, y: UTF8String) => Some(x.compareTo(y))
    case (x: UTF8String, y: String) => Some(x.toString.compareTo(y))
    case (x: String, y: UTF8String) => Some(x.compareTo(y.toString))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case _ => None
  }

  /** Apply `where` to a file list: keep files whose stats may match.
    * Returns (kept, prunedCount) so callers can surface skipping
    * effectiveness.
    */
  def prune[A](spark: SparkSession, schema: StructType, where: Option[Column],
      files: Seq[A], statOf: A => FileStat): (Seq[A], Int) = where match {
    case None => (files, 0)
    case Some(w) =>
      val preds = prunablePreds(spark, schema, w)
      if (preds.isEmpty) (files, 0)
      else {
        val kept = files.filter(f => mayMatch(preds, statOf(f)))
        (kept, files.size - kept.size)
      }
  }
}
