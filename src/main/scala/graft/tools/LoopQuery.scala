package graft.tools

import org.apache.spark.sql.SparkSession

/** Loop ONE registered query forever for jstack sampling. Throwaway. */
object LoopQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-loopq"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    while (true) {
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      System.err.println("[loopq] pass done")
    }
  }
}
