package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.NearDupJoin

/** The declarative near-dup join: custom LogicalPlan + resolution rule +
  * SQL table function must all produce exactly the imperative operator's
  * output.
  */
class PlansSpec extends SparkSpec {

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
  private lazy val expected = asSet(Dedup.ngramJaccardPairs(docs, 0.5))

  test("NearDupJoin.pairs (DataFrame API) matches the imperative pipeline") {
    assert(expected.nonEmpty, "sf0.001 documents must contain planted near-dups")
    assert(asSet(NearDupJoin.pairs(docs, 0.5)) == expected)
  }

  test("graft_near_dup SQL table function resolves through the rule") {
    val viaSql = spark.sql(
      s"SELECT doc_a, doc_b, jaccard FROM graft_near_dup('$sf', 0.5)")
    assert(asSet(viaSql) == expected)
    // jaccard column survives the rewrite with its declared type
    assert(viaSql.schema("jaccard").dataType.typeName == "double")
  }

  test("filters stacked above the node apply to the expanded plan") {
    val someA = expected.head._1
    val filtered = NearDupJoin.pairs(docs, 0.5).filter(col("doc_a") === someA)
    assert(asSet(filtered) == expected.filter(_._1 == someA))
  }

  test("column renames flow through idCol/textCol parameters") {
    val renamed = docs.select(col("doc_id").as("id"), col("text").as("body"))
    assert(asSet(NearDupJoin.pairs(renamed, 0.5, idCol = "id", textCol = "body")) == expected)
  }
}
