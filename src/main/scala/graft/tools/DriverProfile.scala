package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** In-JVM sampling profiler for the DRIVER side of a query: runs the
  * named query on the calling thread while a sampler thread captures
  * that thread's stack every few ms, then prints the hottest collapsed
  * frames. Shows where driver wall-time goes between jobs (planning,
  * commit IO, listing, encode) — the layer task metrics cannot see.
  *
  * Usage: runMain graft.tools.DriverProfile <queryName> [sfDir] [topK]
  */
object DriverProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val topK = if (args.length > 2) args(2).toInt else 40
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-dprofile"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm

    val target = Thread.currentThread()
    val counts = new ConcurrentHashMap[String, Integer]()
    @volatile var on = true
    @volatile var n = 0
    val sampler = new Thread(() => {
      while (on) {
        val st = target.getStackTrace
        if (st.nonEmpty) {
          n += 1
          // collapse to the deepest "interesting" frames: skip pure JDK
          // park/wait tops so the attribution lands on the caller
          val top = st.take(24).map(e => s"${e.getClassName}.${e.getMethodName}")
          val key = top.take(8).mkString(" <- ")
          counts.merge(key, 1, (a, b) => a + b)
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    val t0 = System.currentTimeMillis()
    sampler.start()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    on = false
    val wall = (System.currentTimeMillis() - t0) / 1e3
    Thread.sleep(50)
    import scala.jdk.CollectionConverters._
    println(f"[dprofile] $name wall=$wall%.2f s, samples=$n")
    counts.asScala.toSeq.sortBy(-_._2).take(topK).foreach { case (k, c) =>
      println(f"[dprofile] ${c.toInt}%5d  $k")
    }
    spark.stop()
  }
}
