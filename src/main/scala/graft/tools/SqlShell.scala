package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Standalone SQL workflow — graft's spelling of the reference's
  * `spark-sql --conf spark.sql.catalog...` sessions (README:172-201,
  * where DDL/DML scripts drive lakehouse tables from a SQL shell). No
  * external catalog service: `graft.<ns>.<table>` identifiers resolve
  * through [[org.apache.spark.sql.graft.catalog.GraftCatalog]] into
  * versioned tables under the warehouse dir, and every statement kind
  * the catalog face supports (CREATE/INSERT/DELETE/UPDATE/MERGE/SELECT,
  * hidden partitioning transforms) runs exactly as it does in-process.
  *
  * Usage: `runMain graft.tools.SqlShell <script.sql> [warehouseDir]`
  * or with no args, statements from stdin. Statements split on `;` at
  * top level (quote-aware — a `;` inside a string literal stays put).
  * SELECT-shaped results print as Spark's truncated table.
  */
object SqlShell {

  /** Quote-aware statement splitter: `;` terminates a statement unless
    * inside a single- or double-quoted literal (with `''` escaping).
    * Line comments (`--`) are stripped outside literals.
    */
  private[graft] def split(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"') {
        quote = c; cur.append(c); i += 1
      } else if (c == '-' && i + 1 < script.length && script.charAt(i + 1) == '-') {
        while (i < script.length && script.charAt(i) != '\n') i += 1
      } else if (c == ';') {
        val s = cur.toString.trim
        if (s.nonEmpty) out += s
        cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Run every statement of `script` in order, returning each
    * statement's result frame (DDL/DML return Spark's empty/count
    * frames). The execution surface the spec drives.
    */
  private[graft] def runScript(spark: SparkSession, script: String): Seq[DataFrame] =
    split(script).map(spark.sql(_))

  def main(args: Array[String]): Unit = {
    val script = args.headOption match {
      case Some(f) => new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8")
      case None => scala.io.Source.stdin.mkString
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = graft.GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-sql"),
      cpus.toInt)
    args.lift(1).foreach(w =>
      builder.config("spark.sql.catalog.graft.warehouse", w))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try runScript(spark, script).foreach { df =>
      if (df.schema.nonEmpty) df.show(50, truncate = false)
    } finally spark.stop()
  }
}
