package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.sources.Tables

class CorpusSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  test("piiScrub redacts exactly the injected PII with exact counts") {
    val out = Corpus.piiScrub(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(out.count() == n)
    // every doc got exactly one email + one phone injected, all redacted
    assert(out.filter(col("n_emails") === 1 && col("n_phones") === 1).count() == n)
    assert(out.filter(col("scrubbed").contains("@")).count() == 0)
    assert(out.filter(col("scrubbed").rlike("555-[0-9]{4}")).count() == 0)
    assert(out.filter(col("scrubbed").contains("<EMAIL>") &&
      col("scrubbed").contains("<PHONE>")).count() == n)
    out.unpersist()
  }

  test("stratifiedSample is deterministic and near the per-stratum target fractions") {
    val docs = Tables.documents(spark, sf)
    val out = Corpus.stratifiedSample(spark, sf).cache()
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    total.foreach { case (lang, n) =>
      val target = if (lang == "en") 0.25 else 0.5
      val got = kept.getOrElse(lang, 0L).toDouble / n
      // md5 is uniform; with small strata allow a wide but honest band
      assert(math.abs(got - target) < 0.15, f"$lang: got $got%.2f want $target")
    }
    // determinism: same rows on a second run
    val again = Corpus.stratifiedSample(spark, sf)
    assert(out.select("doc_id").as[Long].collect().toSeq ==
      again.select("doc_id").as[Long].collect().toSeq)
    out.unpersist()
  }

  test("packSequences: bins respect the budget boundary within each (lang, shard)") {
    val budget = 512L
    val out = Corpus.packSequences(spark, sf, budget).cache()
    // every doc's start offset lies inside its bin
    assert(out.filter(col("bin_off") < 0 || col("bin_off") >= budget).count() == 0)
    // offsets are the running concatenation: joining back, each bin's
    // docs start before the next budget boundary in doc_id order
    val perStream = out.groupBy("lang", "shard")
      .agg(countDistinct("bin").as("bins"), count("*").as("docs"))
    assert(perStream.filter(col("bins") > col("docs")).count() == 0)
    // bin ids are dense-ish: max bin * budget <= total chars of stream
    val chars = Tables.documents(spark, sf)
      .withColumn("shard", (col("doc_id") % 16).cast("int"))
      .groupBy("lang", "shard").agg(sum("n_chars").as("total"))
    val joined = out.groupBy("lang", "shard").agg(max("bin").as("maxBin"))
      .join(chars, Seq("lang", "shard"))
    assert(joined.filter(col("maxBin") * budget > col("total")).count() == 0)
    out.unpersist()
  }
}
