package graft.jobs

import java.io.FileInputStream
import java.util.Properties

import scala.jdk.CollectionConverters._

/** Environment-scoped job configuration — the reference's operational
  * shape (`utils/Config.scala:1-9` + `application.conf`: an ENVIRONMENT
  * variable selects a config block holding source/sink/format/trigger/
  * checkpoint keys) on `java.util.Properties`, the only config format on
  * this classpath.
  *
  * File layout: keys are `<env>.<job>.<key>`, e.g.
  * {{{
  * development.ingest.source.path = /data/landing
  * development.ingest.source.format = parquet
  * development.ingest.maxFilesPerTrigger = 100
  * development.ingest.sink.path = /data/table
  * development.ingest.checkpointLocation = /data/ckpt
  * }}}
  * The active environment comes from `ENVIRONMENT` (default
  * `development`), exactly as the reference resolves it.
  */
final case class JobConfig(env: String, job: String, values: Map[String, String]) {

  def apply(key: String): String = values.getOrElse(key,
    throw new IllegalArgumentException(
      s"job config: missing required key '$env.$job.$key' " +
        s"(present: ${values.keys.toSeq.sorted.mkString(", ")})"))

  def get(key: String): Option[String] = values.get(key)
  def getOrElse(key: String, default: String): String = values.getOrElse(key, default)
  def getInt(key: String, default: Int): Int = values.get(key).map(_.toInt).getOrElse(default)
}

object JobConfig {

  def envName(getenv: String => String = System.getenv): String =
    Option(getenv("ENVIRONMENT")).getOrElse("development")

  /** Load `<env>.<job>.*` from a properties file. */
  def load(path: String, job: String,
      getenv: String => String = System.getenv): JobConfig = {
    val props = new Properties()
    val in = new FileInputStream(path)
    try props.load(in) finally in.close()
    fromProperties(props, envName(getenv), job)
  }

  def fromProperties(props: Properties, env: String, job: String): JobConfig = {
    val prefix = s"$env.$job."
    val scoped = props.stringPropertyNames().asScala
      .filter(_.startsWith(prefix))
      .map(k => k.stripPrefix(prefix) -> props.getProperty(k).trim)
      .toMap
    require(scoped.nonEmpty,
      s"job config: no keys under '$prefix' — wrong ENVIRONMENT ('$env') or job name ('$job')?")
    JobConfig(env, job, scoped)
  }
}
