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

    def compiles(): Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount

    // GRAFT_CG_DIFF=1: capture every compiled source body per pass and
    // print the first differing line of measured-pass bodies that have
    // no byte-identical twin in the warm pass — pinpoints the varying
    // token that defeats the codegen cache.
    val cgDiff = sys.env.get("GRAFT_CG_DIFF").contains("1")
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    @volatile var pass = 0
    if (cgDiff) {
      import org.apache.logging.log4j.{Level, LogManager}
      import org.apache.logging.log4j.core.{LogEvent, Logger => CoreLogger}
      import org.apache.logging.log4j.core.appender.AbstractAppender
      val cgName = "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
      org.apache.logging.log4j.core.config.Configurator.setLevel(cgName, Level.DEBUG)
      val cgLogger = LogManager.getLogger(cgName).asInstanceOf[CoreLogger]
      cgLogger.setLevel(Level.DEBUG)
      println(s"[dprofile] cg debug enabled=${cgLogger.isDebugEnabled}")
      val app = new AbstractAppender("graft-cg", null, null, false,
          org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
        override def append(e: LogEvent): Unit = {
          val m = e.getMessage.getFormattedMessage
          if (m.contains("/* 001 */")) bodies.add((pass, m))
        }
      }
      app.start()
      cgLogger.addAppender(app)
    }

    val fn = graft.SparkEntry.queries(name)
    val c0 = compiles()
    pass = 1
    fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
    val c1 = compiles()
    println(s"[dprofile] compiles warm-pass=${c1 - c0}")

    // mode: "driver" samples the query thread; "exec" samples executor
    // task-launch worker threads (local mode: same JVM)
    val mode = sys.env.getOrElse("GRAFT_PROFILE_MODE", "driver")
    val target = Thread.currentThread()
    val counts = new ConcurrentHashMap[String, Integer]()
    @volatile var on = true
    @volatile var n = 0
    val sampler = new Thread(() => {
      while (on) {
        val stacks: Seq[Array[StackTraceElement]] =
          if (mode == "driver") Seq(target.getStackTrace)
          else {
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.collect {
              case (t, st) if t.getName.startsWith("Executor task launch") &&
                st.nonEmpty => st
            }.toSeq
          }
        stacks.foreach { st =>
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
    val c2 = compiles()
    pass = 2
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    on = false
    val wall = (System.currentTimeMillis() - t0) / 1e3
    println(s"[dprofile] compiles measured-pass=${compiles() - c2}")

    if (cgDiff) {
      import scala.jdk.CollectionConverters._
      val all = bodies.asScala.toSeq
      val p1 = all.filter(_._1 == 1).map(_._2)
      val p2 = all.filter(_._1 == 2).map(_._2)
      val p1Set = p1.toSet
      val fresh = p2.filterNot(p1Set.contains)
      println(s"[dprofile] cgdiff: pass1=${p1.size} pass2=${p2.size} fresh-in-pass2=${fresh.size}")
      fresh.take(8).foreach { b =>
        val bl = b.linesIterator.toVector
        // most similar pass-1 body: longest common prefix length
        val near = p1.maxByOption { a =>
          a.linesIterator.zip(b.linesIterator).takeWhile { case (x, y) => x == y }.size
        }
        near match {
          case Some(a) =>
            val al = a.linesIterator.toVector
            val i = al.zip(bl).indexWhere { case (x, y) => x != y }
            if (i >= 0)
              println(s"[dprofile] DIFF at line $i:\n  pass1: ${al(i).take(200)}\n  pass2: ${bl(i).take(200)}")
            else println(s"[dprofile] fresh body is a prefix/extension (lens ${al.size} vs ${bl.size}); head: ${bl.take(3).mkString(" | ").take(200)}")
          case None => println(s"[dprofile] no pass-1 bodies at all; head: ${bl.take(3).mkString(" | ").take(200)}")
        }
      }
    }
    Thread.sleep(50)
    import scala.jdk.CollectionConverters._
    println(f"[dprofile] $name wall=$wall%.2f s, samples=$n")
    counts.asScala.toSeq.sortBy(-_._2).take(topK).foreach { case (k, c) =>
      println(f"[dprofile] ${c.toInt}%5d  $k")
    }
    spark.stop()
  }
}
