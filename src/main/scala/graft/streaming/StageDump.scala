package graft.streaming

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Per-stage task-count + deserialization-time dump for one registered
  * query: pinpoints which stages ship heavyweight task binaries.
  * Throwaway diagnostic.
  */
object StageDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-sdump"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val deserByStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val runByStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          deserByStage.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong())
            .addAndGet(t.taskMetrics.executorDeserializeTime)
          runByStage.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong())
            .addAndGet(t.taskMetrics.executorRunTime)
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val d = Option(deserByStage.get(i.stageId)).map(_.get()).getOrElse(0L)
        val r = Option(runByStage.get(i.stageId)).map(_.get()).getOrElse(0L)
        if (i.numTasks > 0)
          println(f"[sdump] stage=${i.stageId}%4d tasks=${i.numTasks}%4d run=${r / 1e3}%7.2fs deser=${d / 1e3}%6.2fs  ${i.name.takeWhile(_ != '\n').take(90)}")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
    println("[sdump] ===== measured pass =====")
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    org.apache.spark.GraftSparkShim.waitListenerBusEmpty(spark.sparkContext)
    spark.stop()
  }
}
