package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Loaders for the engine's table layout: one parquet dataset per table
  * under a scale-factor directory.
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown /
  * pruning ability: every operator downstream should show its filters in
  * `PushedFilters` and its projection in `ReadSchema` when explained.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    spark.read.parquet(path(dir, name))
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read nanos as long (legacy conf) and floor
    * to microseconds — the precision Spark timestamps actually carry.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table of a scale dir as a temp view so the whole
    * engine is reachable from `spark.sql` (including graft's native
    * functions once registered — see `GraftFunctions`).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { name =>
      val df = name match {
        case "events" => events(spark, dir)
        case _ => table(spark, dir, name)
      }
      df.createOrReplaceTempView(name)
    }

  /** Ensure a frame headed into CPU-heavy per-row compute (signatures,
    * hashes) uses every core: small local tables arrive as ONE parquet
    * split, which would serialize an interpreted-expression stage. At
    * production scale inputs come in thousands of splits and this is a
    * no-op; the round-robin shuffle is only paid when the scan is narrower
    * than the cluster.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
