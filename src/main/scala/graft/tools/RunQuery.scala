package graft.tools

import org.apache.spark.sql.SparkSession

/** Run ONE registered query and dump its result as parquet — the
  * single-operator slice of [[graft.Verify]], for iterating on a new
  * oracle without replaying the whole board.
  *
  * Usage: runMain graft.tools.RunQuery <query_name> <sfDir> <outDir>
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-runquery"),
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query $name; have: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    graft.SparkEntry.oracleSql.get(name).foreach(sql =>
      println(s"[runquery] oracle for $name:\n$sql"))
    println(s"[runquery] wrote $outDir/$name")
    spark.stop()
  }
}
