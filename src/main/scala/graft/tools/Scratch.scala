package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Dev-only micro-bench for plan iterations (not part of the API). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[8]").appName("scratch"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    time("warm")(docs.count())
    time("sigs")(noop(Dedup.signatures(docs)))
    time("minhash")(noop(Dedup.minHashLsh(spark, dir)))
    time("jaccard")(noop(Dedup.ngramJaccard(spark, dir)))
    time("simhash")(noop(Dedup.simHash(spark, dir)))
    time("embed")(noop(Dedup.embeddingCosine(spark, dir)))
    time("sim_topk")(noop(Similarity.bruteForceTopK(spark, dir)))
    time("sim_lsh")(noop(Similarity.lshTopK(spark, dir)))
    spark.stop()
  }
}
