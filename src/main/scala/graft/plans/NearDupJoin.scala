package graft.plans

import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Declarative near-duplicate self-join: the whole-operator Catalyst
  * surface over the LSH dedup pipeline.
  *
  * `NearDupJoin(child, idCol, textCol, threshold)` DECLARES "all pairs of
  * `child` rows whose word-3-shingle Jaccard similarity is ≥ threshold"
  * and leaves the HOW to the engine: [[ResolveNearDupJoin]] rewrites the
  * node during analysis into the MinHash-LSH candidate pipeline
  * ([[graft.operators.Dedup.ngramJaccardPairs]] — signature aggregation,
  * banded bucketing with skew caps, exact verification on candidates
  * only), after which Catalyst plans/optimizes it like any other plan
  * (the rewrite happens before optimization, so filters a user stacks on
  * top push into the generated pipeline).
  *
  * Reachable three ways: the Scala API ([[NearDupJoin.pairs]]), raw plan
  * construction, and SQL via the `graft_near_dup('<scale-dir>', thr)`
  * table function registered in `GraftExtensions` — the reference's
  * engine exposes fixed jobs; this exposes the capability as a first-class
  * relational operator instead.
  *
  * Output schema is fixed: (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE),
  * doc_a < doc_b. Output attribute ids are allocated once at construction
  * and preserved by the rewrite (the rule aliases the generated plan's
  * columns back onto them), so references bound above the node survive
  * resolution.
  */
final case class NearDupJoin(
    child: LogicalPlan,
    idCol: String,
    textCol: String,
    threshold: Double,
    outputAttrs: Seq[Attribute]) extends UnaryNode {
  override def output: Seq[Attribute] = outputAttrs
  override protected def withNewChildInternal(newChild: LogicalPlan): NearDupJoin =
    copy(child = newChild)
}

object NearDupJoin {
  def apply(child: LogicalPlan, idCol: String, textCol: String, threshold: Double): NearDupJoin =
    NearDupJoin(child, idCol, textCol, threshold, Seq(
      AttributeReference("doc_a", LongType)(),
      AttributeReference("doc_b", LongType)(),
      AttributeReference("jaccard", DoubleType)()))

  /** Scala surface: near-dup pairs of `df` (id/text column names free). */
  def pairs(
      df: org.apache.spark.sql.DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    GraftShim.ofRows(df.sparkSession,
      apply(GraftShim.analyzed(df), idCol, textCol, threshold))

  /** Driver-checkable op: the SQL table-function surface end-to-end
    * (parse → NearDupJoin node → resolution-rule expansion → LSH
    * pipeline). The oracle is the exact all-pairs set: verification
    * computes exact string-shingle Jaccard on candidates, so the output
    * equals ground truth whenever LSH recall is 1 — which the 16×4
    * banding guarantees to ~2·10⁻⁴ per corpus on this data (every
    * above-threshold pair sits at J ≥ 0.8, where the per-pair miss
    * probability is (1−J⁴)¹⁶ ≤ 2.2·10⁻⁴; DedupSpec pins the
    * LSH-equals-exact property directly).
    */
  val ops: Seq[graft.Op] = Seq(
    graft.Op("q_near_dup_sql", (spark, dir) =>
      spark.sql(
        s"SELECT doc_a, doc_b, jaccard FROM graft_near_dup('$dir', 0.5) " +
          "ORDER BY doc_a, doc_b"),
      Some(s"""
        WITH ${graft.operators.Dedup.ExactPairsCtes}
        SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b""")))
}

/** Analyzer rule: expand [[NearDupJoin]] into the LSH pipeline's logical
  * plan. Runs as an extension resolution rule; the expansion itself is
  * built with the DataFrame API over the (resolved) child, so it stays in
  * sync with the imperative operator — one implementation, two surfaces.
  */
final case class ResolveNearDupJoin(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    GraftShim.resolveOperatorsUp(plan) {
      case ndj: NearDupJoin if ndj.child.resolved =>
        val docs = GraftShim.ofRows(session, ndj.child)
          .select(
            col(ndj.idCol).cast("long").as("doc_id"),
            col(ndj.textCol).cast("string").as("text"))
        val expanded = GraftShim.analyzed(
          graft.operators.Dedup.ngramJaccardPairs(docs, ndj.threshold))
        // Re-bind the generated columns onto the node's public attribute
        // ids so references above the node stay resolved.
        Project(
          expanded.output.zip(ndj.output).map { case (from, to) =>
            Alias(from, to.name)(exprId = to.exprId)
          },
          expanded)
    }
}
