package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession


/** Dump StreamingQueryProgress for the stream-stream join round trip. */
object SsjProgress {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1).toInt else 16
    val rocks = args.length > 2 && args(2) == "rocksdb"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val b = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-ssj"), cpus)
    val spark = (if (rocks) b.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()

    val work = graft.Scratch.dir("graft-ssjp")
    def src() = IngestPipeline.source(spark, IngestPipeline.stagedEventsDir(spark, dir))
    val events = IngestPipeline.transform(src())
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = IngestPipeline.transform(src())
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_event_id"))
    val q = StreamTuning.withStatePartitions(spark, parts) {
      StreamJoin.intervalJoin(events, clicks).writeStream
        .format("parquet")
        .option("checkpointLocation", StreamTuning.scratchDir("graft-ssjp-ckpt"))
        .option("path", s"$work/sink")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    println(f"[wall] ${(System.nanoTime() - t0) / 1e9}%.2f")
    q.recentProgress.foreach(p => println("[progress] " + p.json))
    spark.stop()
  }
}
