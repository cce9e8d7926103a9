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
  * Collection reads the parquet FOOTERS the writer already computed
  * ([[fromFooters]] — KBs per file, zero data bytes re-read); the
  * distributed re-scan ([[collect]]) remains for callers whose inputs
  * may carry untrustworthy footers and as the spec's ground truth.
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
      .collect() // one row per staged file — bounded by the commit's file count
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

  /** Footer route — the same per-file stats read straight from the
    * parquet footers the writer already computed, NEVER re-reading a
    * data byte. [[collect]]'s distributed re-scan reads the whole
    * commit a second time (at 100 TB that doubles every write's I/O);
    * footers are a few KB per file, so a commit's stats cost is
    * O(files), IO-bound, and runs on a small thread pool. Used by the
    * lakehouse writers for freshly-staged commits; [[collect]] remains
    * for callers that must scan anyway.
    *
    * Conservative by construction: a column chunk without trustworthy
    * stats (INT96 timestamps, unknown logical units, stats dropped by
    * the writer, NaN-poisoned floats) yields NO bounds for that file —
    * pruning then keeps the file. Truncated binary bounds are still
    * valid bounds (parquet rounds the max UP), so pruning stays sound.
    * A spec pins this route equal to [[collect]] across the type
    * battery.
    */
  def fromFooters(spark: SparkSession, files: Seq[String],
      schema: StructType): Map[String, FileStat] = {
    if (files.isEmpty) return Map.empty
    val conf = spark.sparkContext.hadoopConfiguration
    val statCols = schema.fields.filter(f => boundEligible(f.dataType)).toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.size))
    try {
      import scala.jdk.CollectionConverters._
      pool.invokeAll(files.map { f =>
        new java.util.concurrent.Callable[(String, FileStat)] {
          override def call(): (String, FileStat) =
            canon(f) -> readFooterStats(conf, f, statCols)
        }
      }.asJava).asScala.map(_.get()).toMap
    } finally pool.shutdown()
  }

  /** Spark schema of one parquet file, from its FOOTER on the calling
    * thread — the building block for driver-side schema resolution
    * where `spark.read.option("mergeSchema", …)` would ship a
    * distributed footer job per read construction.
    */
  def footerSchema(conf: org.apache.hadoop.conf.Configuration,
      file: String): StructType = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf))
    // converter from the SESSION's SQLConf (binaryAsString,
    // int96AsTimestamp, timestampNTZ must match what spark.read would
    // infer), and .asNullable because inference always reports nullable —
    // a required-field footer schema would otherwise misclassify
    // logically identical files as divergent in the schemas.distinct
    // checks (HudiMor/HudiInterop) and flip nullability vs prior behavior
    try asNullable(
      new org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter(
        org.apache.spark.sql.internal.SQLConf.get)
      .convert(reader.getFooter.getFileMetaData.getSchema))
      .asInstanceOf[StructType]
    finally reader.close()
  }

  /** Everything-nullable copy of a schema (what spark.read inference
    * reports); StructType.asNullable is private[spark].
    */
  private def asNullable(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: ArrayType => a.copy(elementType = asNullable(a.elementType),
      containsNull = true)
    case m: MapType => m.copy(keyType = asNullable(m.keyType),
      valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Footer schemas of many files on a driver thread pool. */
  def footerSchemas(conf: org.apache.hadoop.conf.Configuration,
      files: Seq[String]): Seq[StructType] = {
    if (files.isEmpty) return Nil
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.size))
    try {
      import scala.jdk.CollectionConverters._
      pool.invokeAll(files.map { f =>
        new java.util.concurrent.Callable[StructType] {
          override def call(): StructType = footerSchema(conf, f)
        }
      }.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
  }

  private def readFooterStats(conf: org.apache.hadoop.conf.Configuration,
      file: String, statCols: Seq[StructField]): FileStat = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf))
    try {
      import scala.jdk.CollectionConverters._
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val cols = statCols.flatMap { f =>
        // merge this column's chunk stats across row groups; any chunk
        // without trustworthy stats makes the whole column unknown
        var mn: Option[Any] = None
        var mx: Option[Any] = None
        var nulls: Option[Long] = Some(0L)
        var boundsOk = true
        blocks.foreach { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString == f.name) match {
            case None => boundsOk = false; nulls = None
            case Some(c) =>
              val st = c.getStatistics
              if (st == null) { boundsOk = false; nulls = None }
              else {
                nulls =
                  if (st.isNumNullsSet) nulls.map(_ + st.getNumNulls)
                  else None
                if (st.hasNonNullValue) {
                  (fromParquet(st.genericGetMin, f.dataType, c),
                    fromParquet(st.genericGetMax, f.dataType, c)) match {
                    case (Some(lo), Some(hi)) =>
                      mn = Some(mn.filter(m => cmp(m, lo).exists(_ <= 0))
                        .getOrElse(lo))
                      mx = Some(mx.filter(m => cmp(m, hi).exists(_ >= 0))
                        .getOrElse(hi))
                    case _ => boundsOk = false
                  }
                } else if (!st.isNumNullsSet ||
                    st.getNumNulls < c.getValueCount) {
                  // values exist but no min/max recorded
                  boundsOk = false
                } // else: an all-null chunk constrains nothing
              }
          }
        }
        val allNull = nulls.contains(numRecords) && numRecords > 0
        if (!boundsOk && nulls.isEmpty) None
        else Some(f.name -> ColStats(
          if (boundsOk) mn else None,
          if (boundsOk) mx else None,
          nulls, allNull))
      }.toMap
      FileStat(Some(numRecords), cols)
    } finally reader.close()
  }

  /** Parquet chunk-statistics value → catalyst internal, keyed on the
    * SPARK type the file was written with. Unknown pairings (INT96
    * timestamps, non-micro units, foreign encodings) → None.
    */
  private def fromParquet(v: Any,
      dt: DataType,
      chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[Any] = {
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.LogicalTypeAnnotation
    def tsIsMicros: Boolean =
      chunk.getPrimitiveType.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
        case _ => false
      }
    (dt, v) match {
      case (ByteType, i: java.lang.Integer) => Some(i.byteValue())
      case (ShortType, i: java.lang.Integer) => Some(i.shortValue())
      case (IntegerType, i: java.lang.Integer) => Some(i.intValue())
      case (DateType, i: java.lang.Integer) => Some(i.intValue()) // days
      case (LongType, l: java.lang.Long) => Some(l.longValue())
      case (TimestampType, l: java.lang.Long) if tsIsMicros =>
        Some(l.longValue()) // micros
      case (FloatType, f: java.lang.Float) if !f.isNaN => Some(f.floatValue())
      case (DoubleType, d: java.lang.Double) if !d.isNaN => Some(d.doubleValue())
      case (StringType, b: Binary) => Some(UTF8String.fromBytes(b.getBytes))
      case (d: DecimalType, i: java.lang.Integer) =>
        Some(Decimal(BigDecimal(BigInt(i.longValue()), d.scale), d.precision, d.scale))
      case (d: DecimalType, l: java.lang.Long) =>
        Some(Decimal(BigDecimal(BigInt(l.longValue()), d.scale), d.precision, d.scale))
      case (d: DecimalType, b: Binary) =>
        Some(Decimal(BigDecimal(
          BigInt(new java.math.BigInteger(b.getBytes)), d.scale),
          d.precision, d.scale))
      case _ => None
    }
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

  /** Outcome of [[keyEnvelope]]: can the source's join keys be turned
    * into a file-prunable range predicate?
    */
  sealed trait Envelope
  /** Some key column has no non-null source value: equality can never
    * hold, so NO target row matches any source row.
    */
  case object Unmatchable extends Envelope
  /** No orderable key column: every file is a candidate. */
  case object Unbounded extends Envelope
  /** Conjunction of per-column `key BETWEEN min AND max` ranges —
    * conservative: a file outside the envelope cannot hold a match.
    */
  final case class Bounds(pred: Column) extends Envelope

  /** The [min, max] envelope of `source`'s `on` columns as ONE bounded
    * driver aggregate (2·|on| scalars), for MERGE-style touched-file
    * pruning: a target file whose stats lie outside every source key's
    * range cannot contain a matched row. Non-orderable key types simply
    * drop out of the conjunction (still conservative).
    */
  private[sinks] def keyEnvelope(source: DataFrame, on: Seq[String]): Envelope = {
    val fields = source.schema.fields.filter(f => on.contains(f.name))
    val orderable = fields.filter(_.dataType match {
      case _: NumericType | StringType | DateType | TimestampType |
           TimestampNTZType | BooleanType => true
      case _ => false
    })
    if (orderable.isEmpty) return Unbounded
    val aggs = orderable.flatMap(f =>
      Seq(min(col(f.name)).as(s"__lo_${f.name}"),
        max(col(f.name)).as(s"__hi_${f.name}")))
    val row = source.agg(aggs.head, aggs.tail.toSeq: _*).collect()(0) // one row
    val bounds = orderable.map { f =>
      (f, row.getAs[Any](s"__lo_${f.name}"), row.getAs[Any](s"__hi_${f.name}"))
    }
    if (bounds.exists(b => b._2 == null || b._3 == null)) Unmatchable
    else Bounds(bounds.map { case (f, lo, hi) =>
      col(f.name) >= lit(lo) && col(f.name) <= lit(hi)
    }.reduce(_ && _))
  }
}
