package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Ad-hoc per-JOB profiler: run one query by name, print each Spark
  * job's wall time, description, and — the number [[StageProfile]]
  * cannot show — the DRIVER GAP before it (time between the previous
  * job's end and this job's start: filesystem probes, log writes,
  * planning, footer reads). Multi-commit lakehouse queries spend their
  * fixed tail in those gaps. Usage:
  *   runMain graft.tools.JobProfile <queryName> [sfDir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-jprofile"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.ArrayBuffer[(Int, Long, Long, String)]() // id, start, end, desc
    val starts = mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.currentTimeMillis(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .filter(_.nonEmpty)
            .orElse(j.stageInfos.lastOption.map(si =>
              s"[${j.stageInfos.size}st] ${si.name}"))
            .getOrElse("?").takeWhile(_ != '\n').take(100))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs += ((j.jobId, t0, System.currentTimeMillis(), d))
        }
    })

    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
    org.apache.spark.GraftSparkShim.waitListenerBusEmpty(spark.sparkContext)
    jobs.clear()
    val t0 = System.currentTimeMillis()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val wall = (System.currentTimeMillis() - t0) / 1e3
    org.apache.spark.GraftSparkShim.waitListenerBusEmpty(spark.sparkContext)
    val sorted = jobs.sortBy(_._2).toSeq
    println(f"[jprofile] $name wall=$wall%.2f s, ${sorted.size} jobs")
    var prevEnd = t0
    var gapTotal = 0L
    var jobTotal = 0L
    sorted.foreach { case (id, s, e, d) =>
      val gap = s - prevEnd
      gapTotal += math.max(0L, gap)
      jobTotal += e - s
      println(f"[jprofile] job=$id%4d gap=${gap / 1e3}%6.2fs run=${(e - s) / 1e3}%6.2fs  $d")
      prevEnd = math.max(prevEnd, e)
    }
    println(f"[jprofile] SUM gaps=${gapTotal / 1e3}%.2fs jobs=${jobTotal / 1e3}%.2fs " +
      f"(wall $wall%.2fs; driver-side = wall - jobs)")
    spark.stop()
  }
}
