package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Ad-hoc per-stage profiler: run one query by name, print each stage's
  * task count / summed run time / name. Usage:
  *   runMain graft.tools.StageProfile <queryName> [sfDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer[(Int, Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        stages += ((i.stageId, i.numTasks, i.taskMetrics.executorRunTime,
          i.taskMetrics.executorDeserializeTime, i.name.takeWhile(_ != '\n').take(120)))
      }
    })

    val fn = graft.SparkEntry.queries(name)
    // warm pass then measured pass
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    stages.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.GraftSparkShim.waitListenerBusEmpty(spark.sparkContext)
    println(f"[profile] $name wall=$sec%.2f s, ${stages.size} stages")
    stages.sortBy(-_._3).foreach { case (id, n, run, deser, nm) =>
      println(f"[profile] stage=$id%4d tasks=$n%4d run=${run / 1e3}%8.2fs deser=${deser / 1e3}%6.2fs  $nm")
    }
    spark.stop()
  }
}
