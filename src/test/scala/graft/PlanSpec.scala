package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.CodegenMode

import graft.operators.{Dedup, Relational, Similarity}
import graft.sources.Tables

/** Physical-plan contracts: the scale properties SURVEY §4 promises are
  * asserted here, not just claimed — codegen coverage, partial
  * aggregation, group-limit bucket caps, pushdown.
  */
class PlanSpec extends SparkSpec {

  private def codegen(df: DataFrame): String =
    df.queryExecution.explainString(CodegenMode)
  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("relational core runs inside whole-stage codegen") {
    Seq(
      Relational.pricingSummary(spark, sf),
      Relational.filterAgg(spark, sf),
      Relational.revenueTopN(spark, sf)).foreach { df =>
      val t = codegen(df)
      assert(t.contains("WholeStageCodegen"), t.take(500))
    }
  }

  test("native kernels stay inside codegen spans (no interpreted fallback)") {
    val t = codegen(Similarity.bruteForceTopK(spark, sf))
    assert(t.contains("WholeStageCodegen"))
    // the cosine projection must appear in a codegen'd subtree, i.e. the
    // expression compiles rather than falling back to eval
    assert(!t.toLowerCase.contains("failed to generate"), t.take(500))
  }

  test("minhash signatures aggregate partially map-side") {
    val p = physical(Dedup.signatures(Tables.documents(spark, sf)))
    assert(p.contains("partial_min"), p.take(2000))
    assert(p.contains("HashAggregate"))
  }

  test("LSH bucket caps compile to WindowGroupLimit, not a full sort") {
    val p = physical(Dedup.candidatePairs(Tables.documents(spark, sf)))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("document scans prune to the referenced columns") {
    val p = physical(graft.operators.TextOps.tokenCounts(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang"), readSchema)
  }
}
