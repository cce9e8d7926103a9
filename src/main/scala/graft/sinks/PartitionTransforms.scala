package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.functions._

/** Hidden partitioning: partition a table by TRANSFORMS of row columns
  * (day(ts), bucket(n, id), truncate(w, col)) and recover partition
  * pruning automatically from predicates on the RAW columns — the user
  * never names a partition column (Iceberg's partition-transform idea,
  * re-expressed on the hive-layout parquet + Catalyst surface).
  *
  * Read-side, [[read]] analyzes the user predicate, derives the IMPLIED
  * partition predicate per transform (day range from a ts range, bucket
  * equality from a key equality, prefix range from a string range…) and
  * ANDs it in — Catalyst turns that into PartitionFilters, so the scan
  * touches only matching directories. The scale failure this kills: a
  * 100 TB table partitioned by day where an analyst filters on raw `ts`
  * and silently full-scans.
  *
  * Monotone transforms (day/hour/truncate) map range predicates; bucket
  * maps only equality/IN (hash destroys order). Unsupported predicate
  * shapes contribute no implied filter — never wrong results, just no
  * pruning, mirroring [[VersionedTable.readPruned]]'s conservatism.
  */
object PartitionTransforms {

  /** Driver-checkable round trip: events written with hidden
    * day(ts)+bucket(user_id) partitioning, read back through the
    * raw-column predicate (day range + key IN-list — both map to
    * partition filters). Oracle = the same predicate in plain SQL over
    * the source table: hidden partitioning must be invisible to results.
    */
  def hiddenPartitionRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.Scratch.dir("graft-hp") + "/events_hp"
    val ev = graft.sources.Tables.events(spark, dir)
    val ts = Seq(Day("ts"), Bucket("user_id", 16))
    write(spark, path, ev, ts)
    read(spark, path, ts,
      col("ts") >= lit("2024-01-10") && col("ts") < lit("2024-01-20") &&
        col("user_id").isin(1L, 2L, 3L))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  val ops: Seq[graft.Op] = Seq(
    graft.Op("q_hidden_partition", hiddenPartitionRoundTrip,
      Some("""
        SELECT event_id, user_id, event_type, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
          AND user_id IN (1, 2, 3)
        ORDER BY event_id""")))

  sealed trait Transform {
    def source: String
    /** Derived partition column name (never collides with data cols). */
    def name: String = s"__p_$source"
    def derive(c: Column): Column
    /** Is derive order-preserving (so range predicates map through)? */
    def monotone: Boolean
  }
  final case class Day(source: String) extends Transform {
    def derive(c: Column): Column = to_date(c)
    def monotone = true
  }
  final case class Hour(source: String) extends Transform {
    def derive(c: Column): Column = date_format(c, "yyyy-MM-dd-HH")
    def monotone = true
  }
  final case class Month(source: String) extends Transform {
    def derive(c: Column): Column = date_format(c, "yyyy-MM")
    def monotone = true // "yyyy-MM" string order agrees with time order
  }
  final case class Year(source: String) extends Transform {
    def derive(c: Column): Column = year(c)
    def monotone = true
  }
  final case class Bucket(source: String, n: Int) extends Transform {
    def derive(c: Column): Column = pmod(hash(c), lit(n))
    def monotone = false
  }
  final case class TruncateStr(source: String, width: Int) extends Transform {
    def derive(c: Column): Column = substring(c, 1, width)
    def monotone = true // prefix order agrees with string order
  }
  final case class TruncateNum(source: String, width: Long) extends Transform {
    def derive(c: Column): Column = floor(c / width).cast("long") * width
    def monotone = true
  }

  /** Add the derived partition columns. */
  def derive(df: DataFrame, transforms: Seq[Transform]): DataFrame =
    transforms.foldLeft(df)((d, t) => d.withColumn(t.name, t.derive(col(t.source))))

  /** Write hive-partitioned by the transform columns. The frame is
    * hash-repartitioned on the derived columns first, so each partition
    * directory is written by ONE task (one file per dir) instead of
    * every task holding an open writer per dir — without this, T tasks ×
    * P dirs produces T·P small files and T·P concurrent column writers
    * (at 100 TB: an OOM and a small-file storm; here: measured 3×
    * slower). A skewed hot partition can be split by salting the
    * repartition — not needed for date/bucket transforms, which are
    * uniform by construction.
    */
  def write(spark: SparkSession, path: String, df: DataFrame,
      transforms: Seq[Transform], mode: String = "overwrite"): Unit =
    derive(df, transforms)
      .repartition(transforms.map(t => col(t.name)): _*)
      .write.mode(mode)
      .partitionBy(transforms.map(_.name): _*).parquet(path)

  /** Read with a raw-column predicate; the implied partition predicates
    * are added automatically (then the raw predicate still applies
    * exactly). Returns the frame without the derived columns.
    */
  def read(spark: SparkSession, path: String, transforms: Seq[Transform],
      predicate: Column): DataFrame = {
    val df = spark.read.parquet(path)
    val cond = df.filter(predicate).queryExecution.analyzed
      .collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
    val full = transforms.flatMap(t => cond.flatMap(implied(t, _)))
      .foldLeft(predicate)(_ && _)
    df.filter(full).drop(transforms.map(_.name): _*)
  }

  /** The partition predicate implied by `cond` for one transform, or None.
    * Shared with [[VersionedTable]]'s log-recorded hidden partitioning.
    */
  private[graft] def implied(t: Transform,
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Option[Column] = {
    import org.apache.spark.sql.catalyst.expressions._
    // The column side must be the BARE attribute: a cast changes the
    // value domain the dirs were derived from, and for Bucket the hash
    // is type-exact — deriving in the cast domain would prune the WRONG
    // bucket. For the same reason the literal side keeps its
    // analyzer-inserted cast (it coerces the literal INTO the column's
    // type); unwrapping it would hash e.g. 5:int where the dirs hashed
    // 5:bigint, silently losing rows.
    def src(x: Expression): Boolean = x match {
      case a: AttributeReference => a.name == t.source
      case _ => false
    }
    def lit(x: Expression): Option[Column] = x match {
      case _: AttributeReference => None
      case l if l.foldable => Some(GraftShim.column(l))
      case _ => None
    }
    val p = col(t.name)
    cond match {
      case And(l, r) =>
        (implied(t, l), implied(t, r)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) => // both branches must prune, else no implication
        for (a <- implied(t, l); b <- implied(t, r)) yield a || b
      case EqualTo(a, b) if src(a) => lit(b).map(v => p === t.derive(v))
      case EqualTo(a, b) if src(b) => lit(a).map(v => p === t.derive(v))
      case In(a, vs) if src(a) && vs.forall(v => lit(v).isDefined) =>
        Some(p.isin(vs.map(v => t.derive(lit(v).get)): _*))
      case GreaterThan(a, b) if src(a) && t.monotone => lit(b).map(v => p >= t.derive(v))
      case GreaterThanOrEqual(a, b) if src(a) && t.monotone => lit(b).map(v => p >= t.derive(v))
      case LessThan(a, b) if src(a) && t.monotone => lit(b).map(v => p <= t.derive(v))
      case LessThanOrEqual(a, b) if src(a) && t.monotone => lit(b).map(v => p <= t.derive(v))
      // literal-on-the-left range forms
      case GreaterThan(a, b) if src(b) && t.monotone => lit(a).map(v => p <= t.derive(v))
      case GreaterThanOrEqual(a, b) if src(b) && t.monotone => lit(a).map(v => p <= t.derive(v))
      case LessThan(a, b) if src(b) && t.monotone => lit(a).map(v => p >= t.derive(v))
      case LessThanOrEqual(a, b) if src(b) && t.monotone => lit(a).map(v => p >= t.derive(v))
      case _ => None
    }
  }
}
