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

  test("per-stratum top-N sample keeps local top-N map-side (WindowGroupLimit)") {
    val p = physical(graft.operators.Corpus.sampleTopN(spark, sf))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("fixed-value pivot is one map-side-partial groupBy (no PivotFirst second shuffle)") {
    val p = physical(graft.operators.Relational.pivotCounts(spark, sf))
    assert(!p.contains("pivotfirst"), p.take(2000))
    val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges == 2, s"expected agg + sort exchanges only, got $exchanges")
  }

  test("intra-doc word dedup is a pure map: only the output sort exchanges") {
    val p = physical(graft.operators.TextOps.dedupWords(spark, sf))
    val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges == 1, s"expected only the orderBy exchange, got $exchanges:\n${p.take(2000)}")
  }

  test("bucketed fact tables join with ZERO shuffle (co-location)") {
    val ss = spark
    import org.apache.spark.sql.functions.col
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
      val j = ss.table("lineitem_b")
        .join(ss.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val p = physical(j)
      assert(p.contains("SortMergeJoin"), p.take(800))
      assert(!p.contains("Exchange"),
        "bucketed-by-join-key tables must not shuffle:\n" + p.take(2000))
      assert(j.count() > 0)
    } finally {
      ss.sql("DROP TABLE IF EXISTS orders_b")
      ss.sql("DROP TABLE IF EXISTS lineitem_b")
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    }
  }

  test("salted join equals the plain join on skewed data") {
    val ss2 = SparkSpec.spark
    import ss2.implicits._
    import org.apache.spark.sql.functions.col
    // hot key 1 (2000 rows) + uniform tail
    val skewed = ((1 to 2000).map(i => (1L, i.toLong)) ++
      (1 to 500).map(i => ((i % 50).toLong, i.toLong))).toDF("k", "payload")
    val dim = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = skewed.join(dim, "k")
      .orderBy("k", "payload").collect()
    val salted = graft.operators.Skew.saltedJoin(skewed, dim, "k", buckets = 8)
      .select("k", "payload", "name").orderBy("k", "payload").collect()
    assert(salted.length == plain.length, s"${salted.length} vs ${plain.length}")
    assert(salted.zip(plain).forall { case (a, b) => a == b })
  }

  test("registered views expose the engine through spark.sql") {
    Tables.registerViews(spark, sf)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val r = spark.sql("""
      SELECT count(*) AS n,
             max(graft_cosine(e.embedding, e.embedding)) AS self_cos
      FROM embeddings e""").collect()(0)
    assert(r.getLong(0) > 0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0) > 0)
  }

  test("decontaminate broadcasts the benchmark n-gram set") {
    val p = physical(graft.operators.Corpus.decontaminate(spark, sf))
    // the corpus→bench membership probe must be a broadcast join (the
    // bench side is an eval suite — tiny by construction at any scale)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("corpus stats aggregate partially map-side") {
    val p = physical(graft.operators.Corpus.corpusStats(spark, sf))
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(2000))
  }

  test("document scans prune to the referenced columns") {
    val p = physical(graft.operators.TextOps.tokenCounts(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang"), readSchema)
  }

  test("corpus splits are a pure projection: no shuffle, no sample") {
    val p = physical(graft.operators.Corpus.assignSplits(spark, sf))
    // one scan + project + the oracle-determinism sort; assignment adds
    // no exchange of its own and no Sample node
    assert(!p.contains("Sample"), p.take(2000))
    val beforeSort = p.split("Sort").last // subtree under the sort
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"split assignment must not shuffle\n${p.take(2000)}")
  }

  test("unigram log-prob bounded-vocab branch broadcasts the frequency table (no token-key shuffle)") {
    val p = physical(graft.operators.TextOps.unigramLogProb(spark, sf))
    // the default branch: (doc, token) rows meet the frequency table in a
    // broadcast hash join — the token stream never shuffles on the token
    // key, which is the stop-word-skewed key at corpus scale
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      s"token stream must not shuffle on the skewed token key\n${p.take(2000)}")
    assert(p.contains("partial_count"), p.take(2000))
  }

  test("unigram log-prob unbounded-vocab fallback keeps the shuffle join (AQE skew territory)") {
    val p = physical(
      graft.operators.TextOps.unigramLogProb(spark, sf, broadcastVocab = false))
    // the fallback for vocabularies that scale with the corpus: a shuffle
    // join (AQE splits the hot keys at runtime, and converts back to
    // broadcast if the built table is small); frequencies still meet the
    // rows in a JOIN, never a collected driver-side map
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(p.contains("partial_count"), p.take(2000))
  }

  test("jaccard verify is explode-and-count: no array payloads or interpreted set ops") {
    val p = physical(Dedup.ngramJaccardPairs(Tables.documents(spark, sf), 0.5))
    // the rewrite's whole point: intersection is a codegen'd COUNT over
    // equi-joined (doc, shingle) rows, never array_intersect/array_union
    // over shingle arrays shipped through the pair joins
    assert(!p.contains("array_intersect"), p.take(2000))
    assert(!p.contains("array_union"), p.take(2000))
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p.take(2000))
  }

  test("embedding near-dup attaches pair vectors through ONE member-keyed join") {
    val p = physical(Dedup.embeddingCosine(spark, sf))
    // the rewrite's contract: candidate pairs explode into members and
    // meet the vector table in a single equi-join on the member id; the
    // pre-rewrite shape joined the vector table once per pair side
    // (keys doc_a then doc_b), shuffling the 512 B payloads twice
    val memberJoins = p.linesIterator.count(l =>
      l.contains("Join") && l.contains("[member#"))
    assert(memberJoins == 1, s"expected exactly 1 member-keyed attach join, got $memberJoins\n${p.take(2000)}")
    // and the re-pair fold is a partial-aggregating groupBy, not a join
    assert(p.contains("partial_first") || p.contains("partial_count"), p.take(2000))
  }

  test("weighted sample is a pure filter: no shuffle below the output sort") {
    val p = physical(graft.operators.Corpus.weightedSample(spark, sf))
    assert(!p.contains("Sample"), p.take(2000))
    val beforeSort = p.split("Sort").last
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"the quality-weighted cut must not shuffle\n${p.take(2000)}")
  }

  test("text normalization is a scan-speed projection inside codegen") {
    val df = graft.operators.TextOps.normalizeText(spark, sf)
    val p = physical(df)
    val beforeSort = p.split("Sort").last
    assert(!beforeSort.contains("Exchange hashpartitioning"), p.take(2000))
    assert(codegen(df).contains("WholeStageCodegen"),
      "graft_nfc must compile into the codegen span")
  }

  test("length histogram and BPE pair counts aggregate partially map-side") {
    val ph = physical(graft.operators.Corpus.lengthHistogram(spark, sf))
    assert(ph.contains("partial_count") || ph.contains("partial_sum"), ph.take(2000))
    val pb = physical(graft.operators.Tokenize.bpePairCounts(spark, sf))
    // both aggregates (word frequency, pair totals) fold map-side; the
    // top-K rides TakeOrderedAndProject, not a global sort
    assert(pb.contains("partial_count") && pb.contains("partial_sum"), pb.take(2000))
    assert(pb.contains("TakeOrderedAndProject"), pb.take(2000))
  }
}
