package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession
import graft.operators.Dedup

/** Dev-only plan audit (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[8]").appName("scratch"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = graft.sources.Tables.documents(spark, dir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[audit] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    // warm both plans once, then measure
    noop(Dedup.bandedSignature(docs)); noop(Dedup.candidatePairs(docs))
    val nTasks0 = spark.sparkContext.statusTracker.getExecutorInfos.length
    time("banded-warm")(noop(Dedup.bandedSignature(docs)))
    time("candpairs-warm")(noop(Dedup.candidatePairs(docs)))
    spark.stop()
  }
}
