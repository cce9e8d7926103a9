package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registered query, timed end-to-end at the
  * driver's scale factor, one JSON line on stdout.
  *
  * Queries are forced through the `noop` sink — `count()` would let
  * Catalyst prune the projections being measured (a map-only query
  * collapses to a metadata count), noop materializes every output column.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths so the first measured query isn't
    // paying one-time engine setup.
    spark.range(1L << 20).selectExpr("sum(id * 2)").collect()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
