package graft

import org.apache.spark.sql.SparkSession

/** Job-description labels for multi-action operators (guide §1.5): the
  * commit machinery runs several Spark actions per logical operation
  * (probes, staged writes, publishes), and without labels every job in a
  * profile collapses into the operator's outermost call site. Thread-local
  * (job descriptions are), restores the previous label so nested scopes
  * compose.
  */
object JobLabel {
  def apply[T](spark: SparkSession, label: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try body finally sc.setJobDescription(prev)
  }
}
