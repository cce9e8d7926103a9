package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registered queries to files — the
  * plan-shape evidence the optimization rounds commit under `plans/`.
  *
  * Usage: runMain graft.tools.DumpPlan <outDir> <suffix> <query...>
  * writes `<outDir>/<query>_<suffix>.txt` for each named query (query
  * name `all` dumps every registered query).
  *
  * Note: this is the COMPILE-TIME plan (AdaptiveSparkPlan
  * isFinalPlan=false where AQE applies); queries that internally run
  * actions (staging writes, streaming round trips, lakehouse commits)
  * surface only their final read-back plan here, which is still the
  * plan the noop sink times.
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names =
      if (args.length == 3 && args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-dumpplan"), cpus)
      // plan EVIDENCE tool: never truncate the dumped text (the tuned
      // session bounds plan strings because listener events render them
      // per action; here the full string is the entire point)
      .config("spark.sql.maxPlanStringLength", (Int.MaxValue - 15).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[dumpplan] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
