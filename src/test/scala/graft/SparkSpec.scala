package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide, sbt forks once). */
object SparkSpec {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")

  /** Smallest real data; correctness at sf0.01 is the driver's job. */
  val Sf = "/root/testdata/sf0.001"

  /** Materialize planted tables as parquet under a temp sf-style dir so
    * operators can be pointed at controlled inputs.
    */
  def plantedDir(tables: (String, DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft-planted").toFile.getAbsolutePath
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }
}

abstract class SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.Sf
}
