package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbenchmark of this host's fixed Spark costs: same-plan re-run,
  * fresh-plan trivial jobs, N-task empty stages, and a tiny
  * shuffle+write. Separates "the engine is doing too much" from "every
  * job/task costs X ms here no matter what" so optimization targets the
  * right layer. Usage: runMain graft.tools.FixedCostProbe
  */
object FixedCostProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-probe"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String, reps: Int)(body: Int => Unit): Unit = {
      body(0) // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(body)
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"[probe] $label%-40s ${ms}%8.1f ms/op")
    }

    time("same-plan range(1).count", 20)(_ => { spark.range(1).count(); () })
    time("fresh-plan filter+count", 20)(i =>
      { spark.range(100).filter(col("id") > i).select((col("id") + i).as("x"))
          .agg(sum("x")).collect(); () })
    time("32-task empty stage (count)", 20)(_ =>
      { spark.range(0, 3200, 1, 32).count(); () })
    time("1-task noop write", 20)(_ =>
      spark.range(100).write.mode("overwrite").format("noop").save())
    time("fresh-plan 1-task noop write", 10)(i =>
      spark.range(100).filter(col("id") =!= i).withColumn("y", col("id") * i)
        .write.mode("overwrite").format("noop").save())
    time("tiny shuffle (groupBy) AQE", 10)(i =>
      spark.range(1000).withColumn("k", pmod(col("id") + i, lit(50)))
        .groupBy("k").agg(sum("id")).write.mode("overwrite").format("noop").save())
    def withConf(k: String, v: String)(body: => Unit): Unit = {
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try body finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
    withConf("spark.sql.adaptive.enabled", "false") {
      time("same-plan range(1).count AQE OFF", 20)(_ => { spark.range(1).count(); () })
      time("tiny shuffle (groupBy) AQE OFF", 10)(i =>
        spark.range(1000).withColumn("k", pmod(col("id") + i, lit(50)))
          .groupBy("k").agg(sum("id")).write.mode("overwrite").format("noop").save())
    }
    time("same-plan count #2", 20)(_ => { spark.range(1).count(); () })
    time("collect 1 row (executeTake)", 20)(i =>
      { spark.range(100).filter(col("id") >= i).limit(1).collect(); () })
    val li = "/root/testdata/sf0.1/lineitem.parquet"
    val sch = spark.read.parquet(li).schema
    time("read.parquet construct (infer)", 20)(_ =>
      { spark.read.parquet(li); () })
    time("read.parquet infer + count", 10)(_ =>
      { spark.read.parquet(li).select(lit(1)).limit(1).count(); () })
    time("read.schema().parquet + count", 10)(_ =>
      { spark.read.schema(sch).parquet(li).select(lit(1)).limit(1).count(); () })
    val tmp = graft.Scratch.dir("probe")
    time("tiny parquet write (tmpfs, 1 file)", 10)(i =>
      spark.range(1000).coalesce(1).write.mode("overwrite").parquet(s"$tmp/t$i"))
    time("tiny parquet read+count", 10)(i =>
      { spark.read.parquet(s"$tmp/t${i % 10}").count(); () })
    spark.stop()
  }
}
