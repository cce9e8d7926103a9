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

  test("chunk: every token covered once per stride, chunks respect budget and overlap") {
    val docs = Tables.documents(spark, sf)
      .withColumn("n_toks", size(split(trim(col("text")), "\\s+")).cast("long"))
    val toks = docs.select(col("doc_id"), col("n_toks")).as[(Long, Long)].collect().toMap
    val out = Corpus.chunk(spark, sf).as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(out.keySet == toks.keySet, "every doc chunks")
    out.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_._2)
      val n = toks(id)
      // first chunk starts at 0; last chunk ends at n_toks; each ≤ budget
      assert(sorted.head._3 == 0L)
      assert(sorted.last._4 == n, s"doc $id: last chunk must end at $n")
      sorted.foreach { case (_, _, s, e) =>
        assert(e - s <= 64 && e > s, s"doc $id: chunk [$s,$e) breaks the budget")
      }
      // consecutive chunks overlap by exactly budget-stride tokens
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + 48, s"doc $id: stride broken")
        case _ =>
      }
    }
  }

  test("sampleTopN: exactly N per stratum (or the whole stratum), deterministic rank") {
    val out = Corpus.sampleTopN(spark, sf, n = 50).cache()
    val total = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    total.foreach { case (lang, n) =>
      assert(kept.getOrElse(lang, 0L) == math.min(n, 50L), s"$lang: want min($n,50)")
    }
    // rank is 1..N dense within each stratum and the cut is reproducible
    assert(out.groupBy("lang").agg(max("rank"), countDistinct("rank"))
      .as[(String, Long, Long)].collect()
      .forall { case (_, mx, d) => mx == d })
    val again = Corpus.sampleTopN(spark, sf, n = 50)
    assert(out.select("doc_id").as[Long].collect().toSeq ==
      again.select("doc_id").as[Long].collect().toSeq)
    out.unpersist()
  }

  test("decontaminate flags exactly the docs sharing an 8-gram with the bench split") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // pick real ids on each side of the md5-bucket split
    val benchId = (0 to 500).find(i => md5hex(i.toString).startsWith("f")).get.toLong
    val cs = (0 to 500).filter(i => !md5hex(i.toString).startsWith("f")).map(_.toLong)
    val (cA, cB, cC) = (cs(0), cs(1), cs(2))
    val docs = Seq(
      (benchId, "a b c d e f g h benchtail"),       // benchmark member
      (cA, "x1 x2 a b c d e f g h y1"),             // copies one bench 8-gram
      (cB, "p q r s t u v w x y z"),                // disjoint vocabulary
      (cC, "too short doc"))                        // < 8 words: zero n-grams
      .toDF("doc_id", "text")
    val out = Corpus.decontaminateFrame(docs, 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(benchId), "bench docs are not part of the corpus output")
    assert(out(cA).getAs[Boolean]("contaminated") && out(cA).getAs[Long]("n_hits") >= 1)
    assert(!out(cB).getAs[Boolean]("contaminated") && out(cB).getAs[Long]("n_hits") == 0)
    assert(out(cC).getAs[Long]("n_ngrams") == 0 && !out(cC).getAs[Boolean]("contaminated"))
  }

  test("pipeline composes dedup, gate, sample, pack in one plan with two window shuffles") {
    val out = Corpus.pipeline(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(out.count() > 0 && out.count() < docs.count(), "gates must drop something")
    // sampled ids are exactly the md5-bucket survivors among token-gated docs
    val ids = out.select("doc_id").as[Long].collect().toSet
    val expected = docs
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("text")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .filter(size(split(trim(col("text")), "\\s+")) >= 20)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) <= "7")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == expected)
    // plan shape: exactly the dedup window + the packing window shuffle
    // (AQE prints initial+final plans — count distinct exchange nodes)
    val finalPlan = out.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val exchanges = finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"pipeline must not add shuffles beyond its two windows: $exchanges")
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

  test("weightedSample: keep probability follows quality, draw follows md5 exactly") {
    val rich = "the a of and to in is that it for" // 10/10 stopwords → p=1.0
    val poor = "zebra quark nebula glyph"          // 0 stopwords → p=0.1
    val rows = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) rich else poor, "en", "s", 1L))
    val dir = SparkSpec.plantedDir(
      "documents" -> rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = Corpus.weightedSample(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("keep_prob")).toMap
    // independent JVM recomputation of the md5 draw (same cross-check
    // idiom as the assignSplits spec)
    def u(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.take(2).map(b => f"$b%02x").mkString
      java.lang.Integer.parseInt(hex, 16) / 65536.0
    }
    rows.foreach { case (id, text, _, _, _) =>
      val p = if (text == rich) 1.0 else 0.1
      assert(got.contains(id) == (u(id) < p),
        s"doc $id: u=${u(id)} p=$p kept=${got.contains(id)}")
      if (got.contains(id)) assert(got(id) == p)
    }
    assert(rows.count(r => r._2 == rich) == got.count(_._2 == 1.0),
      "every stopword-rich doc is kept (p=1.0)")
  }

  test("lengthHistogram buckets by exact integer log2") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "w", "en", "s", 1L),             // 1 token  → bucket 0
        (1L, "w w", "en", "s", 1L),           // 2 tokens → bucket 1
        (2L, "w w w", "en", "s", 1L),         // 3 tokens → bucket 1
        (3L, "w w w w", "en", "s", 1L),       // 4 tokens → bucket 2 (exact power)
        (4L, "w w w w w w w w", "en", "s", 1L)) // 8 tokens → bucket 3
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = Corpus.lengthHistogram(spark, dir).collect()
      .map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("min_tokens"), r.getAs[Long]("max_tokens")))).toMap
    assert(got == Map(
      0 -> ((1L, 1L, 1L, 1L)),
      1 -> ((2L, 5L, 2L, 3L)),
      2 -> ((1L, 4L, 4L, 4L)),
      3 -> ((1L, 8L, 8L, 8L))), got)
  }

  test("shuffleOrder is a dense deterministic permutation, not id order") {
    val got = Corpus.shuffleOrder(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))
    val n = got.length
    assert(n > 0)
    assert(got.map(_._2).toSeq == (1L to n).toSeq,
      "positions must be the dense range 1..n in output order")
    assert(got.map(_._1).distinct.length == n, "each doc exactly once")
    assert(got.map(_._1).toSeq != got.map(_._1).sorted.toSeq,
      "shuffled order must differ from doc_id order")
    val again = Corpus.shuffleOrder(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))
    assert(got.toSeq == again.toSeq, "same permutation on every run")
  }

  test("dsirWeights ranks target-like docs above off-domain; zero-feature docs get 0") {
    // two distinct vocabularies: 'wiki' (the target) and 'spamish' noise,
    // plus a raw doc written in the target's vocabulary and one written
    // in the noise vocabulary — DSIR must rank the former higher
    val dir = SparkSpec.plantedDir(
      "documents" -> (
        (0 until 8).map(i =>
          (i.toLong, "alpha beta gamma delta epsilon zeta", "en", "wiki", 30L)) ++
        (8 until 16).map(i =>
          (i.toLong, "buy now click here free pills", "en", "ads", 25L)) :+
        (100L, "alpha beta gamma delta", "en", "raw", 20L) :+
        (101L, "buy now click here", "en", "raw", 15L) :+
        (102L, "one", "en", "raw", 3L) // < 2 tokens: no features
      ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = Corpus.dsirWeights(spark, dir, targetSource = "wiki")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("dsir_weight"))).toMap
    assert(got.size == 19)
    assert(got(100L)._2 > got(101L)._2,
      s"target-vocabulary doc must outweigh noise doc: $got")
    assert(got(102L) == (0L, 0.0))
    // determinism: second run identical
    val again = Corpus.dsirWeights(spark, dir, targetSource = "wiki")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("dsir_weight"))).toMap
    assert(again == got)
  }

  test("sourceMix repeats docs by their source weight, partial epochs hash-gated") {
    val got = Corpus.sourceMix(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("epoch")))
    // 2.5-epoch sources: every doc twice, SOME (not all) a third time
    val heavy = got.filter(t => t._2.stripPrefix("src").toInt % 5 == 0)
    val heavyCounts = heavy.groupBy(_._1).view.mapValues(_.length).toMap
    assert(heavyCounts.nonEmpty)
    assert(heavyCounts.values.forall(c => c == 2 || c == 3))
    assert(heavyCounts.values.exists(_ == 3) && heavyCounts.values.exists(_ == 2),
      "the 0.5 partial epoch must keep some docs and drop others")
    // 1.0-epoch sources: exactly once
    val unit = got.filter(t => t._2.stripPrefix("src").toInt % 5 == 1)
    assert(unit.groupBy(_._1).forall(_._2.length == 1))
    assert(unit.forall(_._3 == 0))
    // 0.25-epoch sources: a strict subset at epoch 0 only
    val lightDocs = got.filter(t => t._2.stripPrefix("src").toInt % 5 >= 2)
    assert(lightDocs.forall(_._3 == 0))
    val lightTotal = spark.read.parquet(s"$sf/documents.parquet")
      .filter("CAST(substr(source, 4, 10) AS INT) % 5 >= 2").count()
    assert(lightDocs.length > 0 && lightDocs.length < lightTotal,
      s"0.25 weight keeps a strict subset (${lightDocs.length} of $lightTotal)")
  }
}
