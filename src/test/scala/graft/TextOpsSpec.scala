package graft

import graft.operators.{Dedup, TextOps}

class TextOpsSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private lazy val planted = SparkSpec.plantedDir(
    "documents" -> Seq(
      (0L, "the cat sat on the mat and it is happy", "en", "s", 38L),
      (1L, "der Hund ist nicht mit der Katze auf dem Sofa", "de", "s", 45L),
      (2L, "le chat est dans la maison pour la nuit", "fr", "s", 39L),
      (3L, "el perro es un animal y la casa es grande", "es", "s", 41L),
      (4L, "你好世界这是中文", "zh", "s", 8L),
      (5L, "qqq zzz xxx", "und", "s", 11L),
      (6L, "the cat sat on the mat and it is happy", "en", "s2", 38L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("langId identifies planted languages, und for no signal") {
    val got = TextOps.langId(spark, planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(got(0L) == "en")
    assert(got(1L) == "de")
    assert(got(2L) == "fr")
    assert(got(3L) == "es")
    assert(got(4L) == "zh")
    assert(got(5L) == "und")
  }

  test("docFrequency counts each doc once per token and ranks deterministically") {
    // "the" appears twice in docs 0 and 6 but df counts DOCS, not
    // occurrences; ties in df break by token ascending
    val got = TextOps.docFrequency(spark, planted, minDf = 2, topK = 10).collect()
    val byToken = got.map(r =>
      r.getAs[String]("token") -> r.getAs[Long]("df")).toMap
    assert(byToken("the") == 2L, "df is per-doc, not per-occurrence")
    assert(byToken("la") == 2L, "fr + es docs share 'la'")
    assert(byToken.values.forall(_ >= 2L), "minDf filter")
    val dfs = got.map(_.getAs[Long]("df"))
    assert(dfs.sameElements(dfs.sortBy(-_)), "sorted by df desc")
    val n = 7.0 // planted corpus size
    got.foreach { r =>
      val expected = math.log((n + 1.0) / (r.getAs[Long]("df") + 1.0))
      assert(math.abs(r.getAs[Double]("idf") - expected) < 1e-12)
    }
  }

  test("unigramLogProb scores corpus-typical docs above out-of-distribution ones") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "the cat sat", "en", "s", 11L),
        (1L, "the cat ran", "en", "s", 11L),
        (2L, "zz qq vv", "und", "s", 8L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = TextOps.unigramLogProb(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob"))).toMap
    // corpus: the×2 cat×2 sat ran zz qq vv — T=9
    def lp(cs: Seq[Long]): Double = cs.map(c => math.log(c / 9.0)).sum / cs.length
    assert(got(0L)._1 == 3L)
    assert(math.abs(got(0L)._2 - lp(Seq(2, 2, 1))) < 1e-9) // op rounds to 9 dp for cross-engine row-sort stability
    assert(math.abs(got(2L)._2 - lp(Seq(1, 1, 1))) < 1e-9)
    assert(got(0L)._2 > got(2L)._2, "common-token doc scores higher")
  }

  test("perplexityBuckets splits ~thirds; approx thresholds agree with exact") {
    val exact = TextOps.perplexityBuckets(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("ppl"), r.getAs[String]("bucket"))).toMap
    val n = exact.size
    val byBucket = exact.values.groupBy(_._2).view.mapValues(_.size).toMap
    // corpus-relative terciles: each bucket within one doc of n/3
    Seq("head", "middle", "tail").foreach { b =>
      assert(math.abs(byBucket(b) - n / 3.0) <= 1.0, s"$b -> ${byBucket(b)}")
    }
    // ordering contract: every head doc is less perplexed than every tail doc
    val maxHead = exact.values.filter(_._2 == "head").map(_._1).max
    val minTail = exact.values.filter(_._2 == "tail").map(_._1).min
    assert(maxHead <= minTail)
    // approx branch: same rows, near-identical assignment
    val approx = TextOps.perplexityBuckets(spark, sf, exactThresholds = false)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
      .toMap
    assert(approx.size == n)
    val agree = exact.count { case (id, (_, b)) => approx(id) == b }
    assert(agree >= (n * 0.95).toInt, s"approx agrees on $agree/$n")
  }

  test("bigramLogProb interpolates bigram and unigram models; branches agree") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "the cat sat", "en", "s", 11L),
        (1L, "the cat ran", "en", "s", 11L),
        (2L, "solo", "und", "s", 4L)) // < 2 tokens: no bigram positions
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = TextOps.bigramLogProb(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_bi_logprob"))).toMap
    // bigrams: "the cat"×2, "cat sat", "cat ran"; contexts: the→2, cat→2
    // unigrams over T=7: the×2 cat×2 sat ran solo
    def term(p2: Double, c1: Double): Double = math.log(0.7 * p2 + 0.3 * (c1 / 7.0))
    val doc0 = (term(2.0 / 2.0, 2.0) + term(1.0 / 2.0, 1.0)) / 2.0
    assert(got(0L)._1 == 2L)
    assert(math.abs(got(0L)._2 - doc0) < 1e-9) // ditto: 9-dp rounding
    assert(!got.contains(2L), "single-token doc has no bigram rows")
    assert(got(0L)._2 == got(1L)._2, "symmetric docs score identically")
    // the shuffle-join fallback is the same function
    val shuffled = TextOps.bigramLogProb(spark, dir, broadcastModel = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(shuffled == got.map { case (k, (n, s)) => (k, n, s) }.toSet)
  }

  test("knTrigramLogProb matches an independent naive KN; mass normalizes") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "the cat sat on the mat", "en", "s", 22L),
        (1L, "the cat ran on the mat", "en", "s", 22L),
        (2L, "the dog sat on a rug", "en", "s", 20L),
        (3L, "so lo", "und", "s", 5L)) // < 3 tokens: no trigram rows
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    // independent naive implementation over plain maps
    val texts = Seq("the cat sat on the mat", "the cat ran on the mat",
      "the dog sat on a rug", "so lo").map(_.split(" ").toSeq)
    val tris = texts.flatMap(_.sliding(3).collect { case Seq(a, b, c) => (a, b, c) })
    val bgs = texts.flatMap(_.sliding(2).collect { case Seq(a, b) => (a, b) })
    val c3 = tris.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val c2 = tris.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toDouble).toMap
    val b3 = c3.keys.toSeq.groupBy(t => (t._1, t._2)).view.mapValues(_.distinct.size.toDouble).toMap
    val n3 = c3.keys.toSeq.groupBy(t => (t._2, t._3)).view.mapValues(_.map(_._1).distinct.size.toDouble).toMap
    val n3mid = n3.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val b2 = n3.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val bgTypes = bgs.distinct
    val n2 = bgTypes.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val nBg = bgTypes.size.toDouble
    val D = 0.75
    def p1(w3: String) = n2.getOrElse(w3, 0.0) / nBg
    def p2(w2: String, w3: String) =
      (math.max(n3.getOrElse((w2, w3), 0.0) - D, 0.0) +
        D * b2(w2) * p1(w3)) / n3mid(w2)
    def p3(t: (String, String, String)) =
      (math.max(c3.getOrElse(t, 0.0) - D, 0.0) +
        D * b3((t._1, t._2)) * p2(t._2, t._3)) / c2((t._1, t._2))
    val got = graft.operators.TextOps.knTrigramLogProb(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_kn_logprob"))).toMap
    texts.zipWithIndex.take(3).foreach { case (ts, i) =>
      val docTris = ts.sliding(3).map { case Seq(a, b, c) => (a, b, c) }.toSeq
      val want = docTris.map(t => math.log(p3(t))).sum / docTris.size
      assert(got(i.toLong)._1 == docTris.size.toLong)
      assert(math.abs(got(i.toLong)._2 - want) < 1e-9, s"doc $i")
    }
    assert(!got.contains(3L), "2-token doc has no trigram rows")
    // KN's defining property: conditional mass over the continuation
    // vocabulary sums to 1 for every observed context
    val vocab = n2.keys.toSeq
    c2.keys.foreach { case (w1, w2) =>
      val mass = vocab.map(w3 => p3((w1, w2, w3))).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context ($w1,$w2) mass $mass")
    }
    // shuffle-join fallback is the same function
    val shuffled = graft.operators.TextOps
      .knTrigramLogProb(spark, dir, broadcastModel = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(shuffled == got.map { case (k, (n, s)) => (k, n, s) }.toSet)
  }

  test("LM broadcast guard: over-threshold model tables auto-route to the shuffle join") {
    // a 2-row vocabulary with a 1-row guard: the guard must trip, route the
    // join through the shuffle branch, and produce identical results —
    // never Spark's generic broadcast failure
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "the cat sat on the mat", "en", "s", 22L),
        (1L, "the cat ran on the mat", "en", "s", 22L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val normal = TextOps.unigramLogProb(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val guarded = TextOps.unigramLogProb(spark, dir, maxBroadcastRows = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(guarded == normal, "guard-tripped shuffle route changed results")
    val guardedBi = TextOps.bigramLogProb(spark, dir, maxBroadcastRows = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val normalBi = TextOps.bigramLogProb(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(guardedBi == normalBi)
    val guardedKn = TextOps.knTrigramLogProb(spark, dir, maxBroadcastRows = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val normalKn = TextOps.knTrigramLogProb(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(guardedKn == normalKn)
    // and the guard decision itself is what flipped: the fitsBroadcast
    // helper says no at 1 row, yes at the default threshold
    val freq = TextOps.unigramLogProb(spark, dir) // plan builds fine either way
    assert(freq.columns.sameElements(Array("doc_id", "n_tokens", "avg_logprob")))
  }

  test("assignSplits is a stable pure function of doc_id with ~80/10/10 shape") {
    val got = graft.operators.Corpus.assignSplits(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // recompute the formula independently (first 16 md5 bits mod 100)
    def expected(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val pct = (((md(0) & 0xFF) << 8) | (md(1) & 0xFF)) % 100
      if (pct < 80) "train" else if (pct < 90) "val" else "test"
    }
    got.foreach { case (id, split) => assert(split == expected(id), s"doc $id") }
    val byTag = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byTag("train") > byTag.getOrElse("val", 0))
    assert(byTag("train") > byTag.getOrElse("test", 0))
  }

  test("tokenCounts: whitespace vs BPE-ish on punctuation") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq((0L, "hello, world! it's 42", "en", "s", 21L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = TextOps.tokenCounts(spark, dir).collect()(0)
    assert(r.getAs[Int]("n_ws_tokens") == 4)
    // hello , world ! it ' s 42
    assert(r.getAs[Int]("n_bpe_tokens") == 8)
  }

  test("fingerprint: rolling hash is order-sensitive and deterministic") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "abc", "en", "s", 3L),
        (1L, "cba", "en", "s", 3L),
        (2L, "abc", "en", "s", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val fp = TextOps.fingerprint(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    // ((0*31+97)*31+98)*31+99 = 97*961 + 98*31 + 99
    assert(fp(0L) == 97L * 961 + 98L * 31 + 99)
    assert(fp(0L) != fp(1L))
    assert(fp(0L) == fp(2L))
  }

  test("qualityScore ratios on a known document") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq((0L, "the cat, the dog.", "en", "s", 17L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = TextOps.qualityScore(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_chars") == 17)
    assert(r.getAs[Long]("n_tokens") == 4)
    assert(r.getAs[Double]("punct_ratio") == 2.0 / 17.0)
    assert(r.getAs[Double]("stopword_ratio") == 0.5) // "the" twice in 4 tokens
  }

  test("repetitionStats flags repeated-word and hot-bigram docs, exact integer flag") {
    val docs = Seq(
      (0L, "a a a a a a a a a a"),                                    // all dup
      (1L, (1 to 21).map(i => s"w$i").mkString(" ")),                 // all unique
      (2L, "single"))                                                 // no bigrams
      .toDF("doc_id", "text")
    val out = TextOps.repetitionFrame(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val a = out(0L)
    assert(a.getAs[Long]("n_words") == 10 && a.getAs[Long]("n_distinct_words") == 1)
    assert(a.getAs[Long]("top_bigram_count") == 9 && a.getAs[Long]("n_bigrams") == 9)
    assert(a.getAs[Boolean]("flagged"))
    val b = out(1L)
    assert(b.getAs[Long]("n_distinct_words") == 21)
    assert(b.getAs[Long]("top_bigram_count") == 1 && b.getAs[Long]("n_bigrams") == 20)
    assert(!b.getAs[Boolean]("flagged")) // top-bigram frac 1/20 = 0.05 <= 0.1
    val c = out(2L)
    assert(c.getAs[Long]("n_bigrams") == 0 && !c.getAs[Boolean]("flagged"))
  }

  test("exact dedup keeps lowest doc_id and counts copies") {
    val rows = Dedup.exact(spark, planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(rows(0L) == 2) // doc 6 is an exact copy of doc 0
    assert(!rows.contains(6L))
    assert(rows(1L) == 1)
  }

  test("dedupWords keeps first occurrences in order") {
    val docs = Seq(
      (0L, "a b a c b a d", "en", "s", 13L),
      (1L, "x x x", "en", "s", 5L),
      (2L, "solo", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.TextOps.dedupWordsFrame(docs)
      .select("doc_id", "n_unique", "deduped")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((0L, 4L, "a b c d")))
    assert(out(1) == ((1L, 1L, "x")))
    assert(out(2) == ((2L, 1L, "solo")))
  }

  test("normalizeText: NFC composition, lowercase, whitespace collapse, trim") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "Cafe\u0301   du   Monde", "fr", "s", 1L), // decomposed é + runs
        (1L, "already clean", "en", "s", 1L),
        (2L, "  padded  ", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = TextOps.normalizeText(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("norm"), r.getAs[Boolean]("changed"),
          r.getAs[Long]("len_delta")))).toMap
    // e + combining acute (2 codepoints) composes to é (1); 4 extra
    // spaces collapse → 18 chars becomes 13
    assert(got(0L) == (("café du monde", true, 5L)), got(0L))
    assert(got(1L) == (("already clean", false, 0L)))
    assert(got(2L) == (("padded", true, 4L)))
  }

  test("stripBoilerplate removes corpus-repeated lines, keeps order; branches agree") {
    // "HEADER" appears (trimmed) in 3 docs -> boilerplate at minDocs=3;
    // "twice" appears in only 2 -> kept; within-doc repetition of a
    // unique line must NOT make it boilerplate (row-local distinct)
    val docs = Seq(
      (0L, "HEADER\nalpha\nbeta", "en", "s", 1L),
      (1L, "  HEADER  \ntwice\ngamma", "en", "s", 1L),
      (2L, "HEADER\ntwice\nself\nself", "en", "s", 1L),
      (3L, "HEADER only doc? no: unique\n\ndelta", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.stripBoilerplateFrame(docs, minDocs = 3, broadcastSet = true)
      .as[(Long, String, Long)].collect().map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(out(0L) == (("alpha\nbeta", 2L)))
    // trimmed-key match strips the padded header; order preserved
    assert(out(1L) == (("twice\ngamma", 2L)))
    assert(out(2L) == (("twice\nself\nself", 3L)))
    // empty lines survive (never boilerplate keys)
    assert(out(3L) == (("HEADER only doc? no: unique\n\ndelta", 3L)))
    // a doc that is ALL boilerplate becomes empty, not dropped
    val allBl = Seq(
      (0L, "X", "en", "s", 1L), (1L, "X", "en", "s", 1L),
      (2L, "X", "en", "s", 1L), (3L, "X\nkeep", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val outBl = TextOps.stripBoilerplateFrame(allBl, minDocs = 3, broadcastSet = true)
      .as[(Long, String, Long)].collect().map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(outBl(0L) == (("", 0L)) && outBl(3L) == (("keep", 1L)))
    // the anti-join fallback produces the identical frame on both corpora
    for (d <- Seq(docs, allBl)) {
      val a = TextOps.stripBoilerplateFrame(d, 3, broadcastSet = true)
        .as[(Long, String, Long)].collect().toSet
      val b = TextOps.stripBoilerplateFrame(d, 3, broadcastSet = false)
        .as[(Long, String, Long)].collect().toSet
      assert(a == b)
    }
  }

  test("bm25 ranks by tf and term rarity; non-matching docs never appear") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "apple banana banana pear pear pear pear pear", "en", "s", 1L),
        (1L, "banana pear pear pear pear pear pear pear", "en", "s", 1L),
        (2L, "pear pear pear pear pear pear pear pear", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = TextOps.bm25(spark, dir, Seq("apple", "banana"))
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 1L), s"doc 2 has no hits: ${got.toSeq}")
    // hand-computed: N=3, avgdl=8, dl=8 → length norm is exactly 1
    val idfA = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0) // df(apple)=1
    val idfB = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0) // df(banana)=2
    val s0 = idfA * 2.2 / (1 + 1.2) + idfB * (2 * 2.2) / (2 + 1.2)
    val s1 = idfB * 2.2 / (1 + 1.2)
    assert(math.abs(got(0)._2 - s0) < 1e-8, s"${got(0)._2} vs $s0")
    assert(math.abs(got(1)._2 - s1) < 1e-8, s"${got(1)._2} vs $s1")
    assert(got(0)._2 > got(1)._2)
  }

  test("nbClassifier learns the planted spam vocabulary and flags held-out planted docs") {
    val out = TextOps.nbClassifier(spark, sf)
      .select("doc_id", "log_odds", "predicted", "correct")
      .as[(Long, Double, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, lo, _, _) => !lo.isNaN && !lo.isInfinite })
    val acc = out.count(_._4).toDouble / out.length
    assert(acc >= 0.95, s"accuracy $acc < 0.95 on a separable planted vocabulary")
    // the held-out split (docs never seen in training) must generalize
    val heldOut = out.filter(_._1 % 5 == 0)
    val hoAcc = heldOut.count(_._4).toDouble / heldOut.length
    assert(hoAcc >= 0.9, s"held-out accuracy $hoAcc < 0.9")
    // both classes actually get predicted (no degenerate always-one-class)
    assert(out.exists(_._3) && out.exists(!_._3))
  }

  test("nbClassifierFrame handles overlapping vocabularies and unseen tokens via smoothing") {
    // spam and ham share 'common'; 'novel' appears only at scoring time
    val labeled = Seq(
      (1L, true, "buy now common deal"),
      (2L, true, "buy deal common now"),
      (3L, false, "common words about tables"),
      (4L, false, "plain common words here"),
      (6L, false, "tables words plain common"),
      (0L, true, "buy now novel common"), // held out: spam tokens dominate
      (5L, false, "plain words novel common")) // held out: ham tokens dominate
      .toDF("doc_id", "pos", "text")
    val got = TextOps.nbClassifierFrame(labeled, broadcastModel = true)
      .select("doc_id", "predicted", "correct")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 7)
    assert(got(0L) == ((true, true)), s"held-out spam flagged: $got")
    assert(got(5L) == ((false, true)), s"held-out ham passes: $got")
    assert(got.forall(_._2._2), s"separable corpus classifies fully: $got")
  }

  test("nbClassifier shuffle-join fallback equals the broadcast-model branch") {
    def run(bc: Boolean): Map[Long, (Long, Double, Boolean, Boolean)] =
      TextOps.nbClassifier(spark, sf, broadcastModel = bc)
        .as[(Long, Long, Double, Boolean, Boolean)].collect()
        .map { case (id, n, lo, p, c) => id -> ((n, lo, p, c)) }.toMap
    val a = run(true)
    val b = run(false)
    assert(a.keySet == b.keySet)
    // token order under the shuffle join differs, so the log-odds sum is
    // equal only up to fp association; decisions must match exactly
    a.foreach { case (id, (n, lo, p, c)) =>
      val (n2, lo2, p2, c2) = b(id)
      assert(n == n2 && p == p2 && c == c2, s"doc $id decision drifted")
      assert(math.abs(lo - lo2) < 1e-9, s"doc $id log_odds $lo vs $lo2")
    }
  }

  test("Misra-Gries sketch: guarantee holds on a planted heavy hitter; two-pass top-N is exact") {
    // corpus where one token dominates and the tail is wide: the sketch
    // (k far below vocabulary size) must still surface the hitters
    val rows = (0L until 400L).map { i =>
      val filler = s"tail${i}a tail${i}b tail${i}c tail${i}d"
      val hot = if (i % 2 == 0) "alpha alpha alpha" else "beta beta"
      (i, s"$hot $filler", "en", "s", 1L)
    }
    val dir = SparkSpec.plantedDir(
      "documents" -> rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = TextOps.heavyHitters(spark, dir, k = 8, topN = 2)
      .as[(String, Long, Boolean)].collect().toSeq
    // alpha: 200*3=600, beta: 200*2=400, every tail token: 1
    assert(got == Seq(("alpha", 600L, true), ("beta", 400L, true)), got.toString)
  }

  test("FreqSketch offer/merge keep the n/(k+1) guarantee and O(k) size") {
    import graft.functions.FreqSketch
    val rnd = new scala.util.Random(11)
    val k = 16
    // stream with two genuine hitters buried in noise, split across two
    // "partitions" merged via weighted offers (the aggregate's merge path)
    def stream() = scala.util.Random.shuffle(
      (Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
        (0 until 900).map(i => s"noise${rnd.nextInt(400)}")).toList)
    val parts = Seq.fill(3) {
      val m = new java.util.HashMap[String, Long]()
      stream().foreach(t => FreqSketch.offer(m, k, t, 1L))
      assert(m.size <= k, s"summary exceeded k: ${m.size}")
      m
    }
    val merged = new java.util.HashMap[String, Long]()
    parts.foreach(_.forEach((t, c) => FreqSketch.offer(merged, k, t, c)))
    assert(merged.size <= k)
    // total stream = 3*1700 = 5100; guarantee: count > 5100/17 = 300
    assert(merged.containsKey("hot1"), "hot1 (1500 > n/(k+1)) must survive")
    assert(merged.containsKey("hot2"), "hot2 (900 > n/(k+1)) must survive")
  }
}
