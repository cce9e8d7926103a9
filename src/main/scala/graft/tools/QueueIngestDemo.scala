package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Smoke/demo driver for the `graft-queue` notification source: stages a
  * slice of the events feed as a landed file, drops a file-created
  * notification in a queue directory, runs the streaming query, and
  * prints what reached the sink and what is left in the queue.
  *
  * Usage: runMain graft.tools.QueueIngestDemo [sfDir]
  */
object QueueIngestDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark: SparkSession = GraftSession.local(4, "graft-queue-demo")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val work = graft.Scratch.dir("queue-demo")
    val schema = "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"

    // Stage the feed shape (ts = int64 nanos) from the normalized table —
    // the table file's own physical ts encoding is the generator's choice.
    graft.sources.Tables.events(spark, sfDir)
      .withColumn("ts", org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts")) * 1000L)
      .limit(300).coalesce(1).write.parquet(s"$work/data")
    val dataFile = Files.list(Paths.get(s"$work/data")).iterator.asScala
      .map(_.toString).filter(_.endsWith(".parquet")).next()
    Files.createDirectories(Paths.get(s"$work/q"))
    Files.write(Paths.get(s"$work/q/m1.json"),
      s"""{"path": "$dataFile", "timestamp": 1}""".getBytes(StandardCharsets.UTF_8))

    val q = spark.readStream.format("graft-queue")
      .schema(schema)
      .option("queue.dir", s"$work/q")
      .option("fileFormat", "parquet")
      .load()
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$work/ckpt")
      .option("path", s"$work/sink")
      .start()
    q.processAllAvailable()
    q.stop()

    println("SUNK_ROWS=" + spark.read.parquet(s"$work/sink").count())
    println("QUEUE_LEFT=" + Files.list(Paths.get(s"$work/q")).count())
    spark.stop()
  }
}
