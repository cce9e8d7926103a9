package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

class DedupSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  // Planted corpus: 0/1 near-dups (one word changed), 2 unrelated,
  // 3/4 identical, 5 a shuffled-word variant of 0 (low shingle overlap).
  private val base = "spark streaming engine processes large volumes of event data with watermarks and stateful operators every day"
  private lazy val planted = SparkSpec.plantedDir(
    "documents" -> Seq(
      (0L, base, "en", "s", 1L),
      (1L, base.replace("large", "huge"), "en", "s", 1L),
      (2L, "completely different text about cooking pasta with tomatoes and basil in a small kitchen pot tonight", "en", "s", 1L),
      (3L, "identical row twin one two three four five six seven eight nine ten eleven twelve", "en", "s", 1L),
      (4L, "identical row twin one two three four five six seven eight nine ten eleven twelve", "en", "s", 1L),
      (5L, base.split(" ").reverse.mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("minhash LSH finds planted near-dups, not unrelated docs") {
    val got = Dedup.minHashLsh(spark, planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_candidates")).toMap
    assert(got(3L) >= 1 && got(4L) >= 1, "identical docs must collide in every band")
    assert(got(0L) >= 1 && got(1L) >= 1, "one-word-changed docs should share bands")
    assert(got(2L) == 0, "unrelated doc must have no candidates")
  }

  test("duplicatedSpans counts corpus-repeated k-grams per doc; short docs zero") {
    val boiler = "subscribe to our newsletter for more updates" // 7 words → 3 5-grams
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, s"alpha beta gamma delta epsilon zeta $boiler", "en", "s", 1L),
        (1L, s"one two three four five six $boiler", "en", "s", 1L),
        (2L, s"red orange yellow green blue indigo $boiler", "en", "s", 1L),
        (3L, "entirely unique text with nothing shared across the corpus at all", "en", "s", 1L),
        (4L, "too short", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = Dedup.duplicatedSpans(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"), r.getAs[Double]("dup_ratio"))))
      .toMap
    // the boilerplate tail is 7 words → its 3 interior 5-grams repeat in
    // all three docs; the 2 bridge 5-grams straddling unique prefix +
    // boilerplate differ per doc
    for (d <- Seq(0L, 1L, 2L)) {
      assert(got(d)._1 == 9, s"13 words → 9 5-grams (doc $d): ${got(d)}")
      assert(got(d)._2 == 3, s"3 interior boilerplate spans repeat (doc $d): ${got(d)}")
      assert(math.abs(got(d)._3 - 3.0 / 9.0) < 1e-12)
    }
    assert(got(3L) == ((7L, 0L, 0.0)), "unique doc: spans, none duplicated")
    assert(got(4L) == ((0L, 0L, 0.0)), "sub-k doc: no spans, ratio 0 not null")
    // broadcast and shuffle branches agree
    val shuffled = Dedup.duplicatedSpans(spark, dir, broadcastDupSet = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(shuffled ==
      got.map { case (d, (a, b, c)) => (d, a, b, c) }.toSet)
  }

  test("removeDuplicatedSpans excises every covered token, keeps order, restores all-boilerplate docs") {
    val boiler = "subscribe to our newsletter for more updates" // 7 words → 3 5-grams
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, s"alpha beta gamma delta epsilon zeta $boiler", "en", "s", 1L),
        (1L, s"one two three four five six $boiler", "en", "s", 1L),
        (2L, s"red orange yellow green blue indigo $boiler", "en", "s", 1L),
        (3L, "entirely unique text with nothing shared across the corpus at all", "en", "s", 1L),
        (4L, "too short", "en", "s", 1L),
        (5L, boiler, "en", "s", 1L)) // pure boilerplate: rewrites to empty
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = Dedup.removeDuplicatedSpans(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("cleaned"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"))))
      .toMap
    // the 3 interior boilerplate 5-grams cover the whole 7-token tail;
    // the 2 bridge spans are per-doc unique so the prefix survives intact
    assert(got(0L) == (("alpha beta gamma delta epsilon zeta", 6L, 7L)))
    assert(got(1L) == (("one two three four five six", 6L, 7L)))
    assert(got(2L) == (("red orange yellow green blue indigo", 6L, 7L)))
    assert(got(3L) == (("entirely unique text with nothing shared across the corpus at all", 11L, 0L)))
    assert(got(4L) == (("too short", 2L, 0L)), "sub-k doc passes through untouched")
    assert(got(5L) == (("", 0L, 7L)), "all-boilerplate doc becomes empty, not dropped")
    // the positional anti-join fallback produces the identical frame
    val shuffled = Dedup.removeDuplicatedSpans(spark, dir, broadcastSet = false)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(shuffled == got.map { case (d, (c, k, rm)) => (d, c, k, rm) }.toSet)
  }

  test("minhash signature estimates jaccard ≈ exact on near-dup pair") {
    val rows = spark.read.parquet(s"$planted/documents.parquet")
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("sh"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("text"))).as("sig"))
      .collect()
    val sh = rows.map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet).toMap
    val sig = rows.map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](2)).toMap
    val (shA, sigA) = (sh(0L), sig(0L)); val (shB, sigB) = (sh(1L), sig(1L))
    val exact = shA.intersect(shB).size.toDouble / shA.union(shB).size
    val est = sigA.zip(sigB).count { case (a, b) => a == b }.toDouble / sigA.length
    assert(math.abs(exact - est) < 0.2, s"exact=$exact est=$est")
  }

  test("simhash: identical docs hamming 0; near-dups small; unrelated large") {
    val sh = spark.read.parquet(s"$planted/documents.parquet")
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(3L), sh(4L)) == 0)
    assert(ham(sh(0L), sh(1L)) <= 6, s"near-dup hamming ${ham(sh(0L), sh(1L))}")
    // word order doesn't matter for bag-of-words simhash
    assert(ham(sh(0L), sh(5L)) == 0)
    assert(ham(sh(0L), sh(2L)) > 10, s"unrelated hamming ${ham(sh(0L), sh(2L))}")
  }

  test("jaccard verify separates near-dup from band-collision noise") {
    val got = Dedup.ngramJaccard(spark, planted, threshold = 0.3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_verified"), r.getAs[Double]("best_jaccard"))).toMap
    assert(got(3L)._2 == 1.0 && got(4L)._2 == 1.0)
    assert(got(0L)._2 > 0.3 && got(0L)._2 < 1.0)
    assert(got(2L)._1 == 0)
  }

  test("embedding cosine near-dup finds planted duplicate vectors") {
    val dim = 64
    val rnd = new scala.util.Random(3)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val v0 = vec()
    val v0close = v0.clone(); v0close(0) = v0close(0) + 0.01f
    val rows = Seq(
      (0L, v0.toSeq, 0), (1L, v0close.toSeq, 0), (2L, v0.toSeq, 0)) ++
      (3L to 40L).map(i => (i, vec().toSeq, 1))
    val dir = SparkSpec.plantedDir("embeddings" -> rows.toDF("vec_id", "embedding", "label"))
    val got = Dedup.embeddingCosine(spark, dir, threshold = 0.95).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_candidates")).toMap
    assert(got(0L) == 2 && got(1L) == 2 && got(2L) == 2,
      s"planted trio must find each other: $got")
    assert(got.filter(_._1 >= 3L).values.forall(_ == 0), "random vectors are not near-dups")
  }

  test("LSH ANN recall vs brute force is reasonable on real embeddings") {
    val brute = Similarity.bruteForceTopK(spark, sf, k = 10, nQueries = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val lsh = Similarity.lshTopK(spark, sf, k = 10, nQueries = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      lsh.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // 16 hyperplanes / 4-bit bands on random gaussian data: candidates
    // share a 4-bit prefix with p≈(1/2)^4 per band per point; top-10 of
    // 500 random vecs are weakly correlated, so recall is modest but must
    // beat the ~27% random-candidate floor.
    assert(mean >= 0.3, s"mean recall $mean too low: $recalls")
    assert(lsh.values.forall(_.size <= 10))
  }

  test("LSH+verify pair set equals the exact all-pairs ground truth") {
    // Verification already computes exact string-shingle Jaccard, so
    // LSH+verify ⊆ exact by construction; equality pins recall = 1 on
    // this data (every above-threshold pair sits at J ≥ 0.8, where the
    // 16×4 banding misses with p ≤ 2.2e-4 per pair). This is the spec
    // behind q_near_dup_sql's exact DuckDB oracle.
    val docs = graft.sources.Tables.documents(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = pairSet(Dedup.ngramJaccardPairs(docs, 0.5))
    val exact = pairSet(Dedup.exactJaccardPairs(docs, 0.5))
    assert(lsh == exact, s"lsh-only=${lsh -- exact} missed=${exact -- lsh}")
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
  }

  test("exact jaccard rollup: planted pairs verified, values exact") {
    val got = Dedup.exactJaccard(spark, planted, threshold = 0.3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_verified"), r.getAs[Double]("best_jaccard"))).toMap
    assert(got(3L)._2 == 1.0 && got(4L)._2 == 1.0)
    assert(got(0L)._2 > 0.3 && got(0L)._2 < 1.0)
    assert(got(2L)._1 == 0)
    // the one-word-changed pair's jaccard from first principles:
    // 16 tokens → 14 distinct shingles each, the changed word (position
    // 5) perturbs 3 of them → |∩| = 11, |∪| = 17
    assert(math.abs(got(0L)._2 - 11.0 / 17.0) < 1e-12, got(0L))
  }

  test("threshold <= 0 is rejected (empty-intersection pairs drop by design)") {
    val docs = graft.sources.Tables.documents(spark, planted)
    intercept[IllegalArgumentException](Dedup.ngramJaccardPairs(docs, 0.0))
    intercept[IllegalArgumentException](Dedup.exactJaccardPairs(docs, -0.5))
  }

  test("embedding nearest-neighbor audit finds the planted twin, ties break low") {
    val dim = 64
    val rnd = new scala.util.Random(3)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val v0 = vec()
    val v0close = v0.clone(); v0close(0) = v0close(0) + 0.01f
    val rows = Seq(
      (0L, v0.toSeq, 0), (1L, v0close.toSeq, 0), (2L, v0.toSeq, 0)) ++
      (3L to 40L).map(i => (i, vec().toSeq, 1))
    val dir = SparkSpec.plantedDir("embeddings" -> rows.toDF("vec_id", "embedding", "label"))
    val got = Dedup.embeddingNearest(spark, dir, threshold = 0.95).collect()
      .map(r => (r.getAs[Long]("doc_id"), (r.getAs[Long]("nn_id"), r.getAs[Long]("n_near")))).toMap
    assert(got(0L) == (2L, 2L), s"identical twin wins for 0: $got")
    // 1's cosine to 0 and 2 is IDENTICAL (same vector) — tie must break
    // to the lowest id deterministically
    assert(got(1L) == (0L, 2L), s"tie must break low for 1: $got")
    assert(got(2L) == (0L, 2L), s"identical twin (lowest id) wins for 2: $got")
    assert(got.filter(_._1 >= 3L).values.forall(_._2 == 0L), "random vectors are not near-dups")
  }

  test("semanticDedup removes higher-id cluster-mates above threshold, keeps the gaussian bulk") {
    val dim = 64
    val rnd = new scala.util.Random(3)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val v0 = vec()
    val v0close = v0.clone(); v0close(0) = v0close(0) + 0.01f
    val rows = Seq(
      (0L, v0.toSeq, 0), (1L, v0close.toSeq, 0), (2L, v0.toSeq, 0)) ++
      (3L to 40L).map(i => (i, vec().toSeq, 1))
    val dir = SparkSpec.plantedDir("embeddings" -> rows.toDF("vec_id", "embedding", "label"))
    val got = Dedup.semanticDedup(spark, dir, nLists = 4, threshold = 0.95).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("removed")).toMap
    assert(got.size == 41)
    assert(!got(0L), "lowest id of the planted trio survives")
    assert(got(1L) && got(2L), s"higher-id near-identical twins removed: $got")
    assert(got.filter(_._1 >= 3L).values.forall(!_), "gaussian bulk untouched")
    // deterministic across runs (fixed quantizer init + greedy rule)
    val again = Dedup.semanticDedup(spark, dir, nLists = 4, threshold = 0.95).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("removed")).toMap
    assert(again == got)
  }

  test("semanticDedupStaged audit: planted copies all caught, soundness holds") {
    val out = Dedup.semanticDedupStaged(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_vectors") == 550)
    assert(r.getAs[Long]("n_dup_global") == 50, "each planted copy pairs with its source only")
    assert(r.getAs[Boolean]("sound_ok"), "no invented duplicates")
    assert(r.getAs[Boolean]("recall_ok"), "the quantizer co-assigns copies with sources")
  }

  test("components link transitive chains; survivors keep the min id") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // chain 0-1-2 (0-2 never paired directly), pair 3-4, isolated 5
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.components(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 5L), got)
  }

  test("components converge on a 60-link chain within 10 rounds (pointer doubling)") {
    // One-hop-per-round propagation needs 60 rounds for this chain; the
    // label(label(u)) shortcut must collapse it within the default 10.
    val n = 60L
    val docs = (0L to n).toDF("doc_id")
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.components(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n + 1 && got.values.forall(_ == 0L), got)
  }

  test("survivors absorb the planted duplicate pairs") {
    val got = Dedup.survivors(spark, planted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 and 4 are identical → one survivor (3) with 2 members;
    // 0/1 near-dup → survivor 0; 2 alone
    assert(got(3L) == 2L && !got.contains(4L), got)
    assert(got(0L) >= 2L && !got.contains(1L), got)
    assert(got(2L) == 1L, got)
  }

  test("survivorsLsh (the 100 TB route) equals the exact-pairs survivors") {
    // Both routes verify candidates with the same exact Jaccard, and
    // LSH recall is 1 on this data (pinned above), so the outputs must
    // be identical — the spec behind exposing a non-quadratic public
    // entry for the dedup-corpus API.
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Dedup.survivorsLsh(spark, planted)) == m(Dedup.survivors(spark, planted)))
    assert(m(Dedup.survivorsLsh(spark, sf)) == m(Dedup.survivors(spark, sf)))
  }

  test("minhash audit: signature estimate within bound on every exact pair") {
    val got = Dedup.minhashAudit(spark, sf).collect()
    assert(got.nonEmpty, "audit needs the planted near-dup pairs")
    assert(got.forall(_.getAs[Boolean]("est_ok")),
      s"estimator out of bound: ${got.filterNot(_.getAs[Boolean]("est_ok")).mkString(", ")}")
  }

  test("simhash audit: angle estimate within bound on every exact pair") {
    val got = Dedup.simhashAudit(spark, sf).collect()
    assert(got.nonEmpty, "audit needs the planted near-dup pairs")
    assert(got.forall(_.getAs[Boolean]("est_ok")),
      s"estimator out of bound: ${got.filterNot(_.getAs[Boolean]("est_ok")).mkString(", ")}")
    // the exact anchor is a true cosine: bounded and 1.0 only for
    // identical token sets
    assert(got.forall { r =>
      val c = r.getAs[Double]("cos_exact"); c > 0.0 && c <= 1.0 + 1e-12
    })
  }

  test("IVF ANN recall beats the probe-fraction floor; deterministic") {
    val brute = Similarity.bruteForceTopK(spark, sf, k = 10, nQueries = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    def run() = Similarity.ivfTopK(spark, sf, k = 10, nQueries = 5).collect()
    val a = run(); val b = run()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "ivf must be deterministic")
    val ivf = a.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // probing 4/16 lists scans ~25% of the corpus at random; true
    // neighbors concentrate in the query's own lists, so recall must
    // clearly beat that floor.
    assert(mean >= 0.4, s"mean ivf recall $mean too low: $recalls")
    assert(ivf.values.forall(_.size <= 10))
  }

  test("incremental dedup: exact beats near; corpus-internal dups never flag the batch") {
    val corpus = Seq(
      (1L, base),                                  // near-twin of new doc 100
      (2L, "identical row twin one two three four five six seven eight nine ten"),
      (3L, "identical row twin one two three four five six seven eight nine ten"),
      (4L, "unrelated corpus text about cooking pasta with tomatoes and basil tonight"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, base.replace("large", "huge")),       // near-dup of corpus 1
      (101L, "identical row twin one two three four five six seven eight nine ten"), // exact copy
      (102L, "entirely novel content about mountain weather stations reporting hourly pressure readings"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupAgainstFrame(batch, corpus, threshold = 0.5)
      .as[(Long, String)].collect().toMap
    assert(got == Map(100L -> "near", 101L -> "exact", 102L -> "kept"), got)
    // corpus-internal duplication (2,3) must not appear anywhere: only
    // batch docs get rows, corpus x corpus pairs never materialize
    assert(got.keySet == Set(100L, 101L, 102L))
    // an empty batch yields an empty, well-typed result
    val empty = Dedup.dedupAgainstFrame(batch.limit(0), corpus, 0.5)
    assert(empty.collect().isEmpty)
    assert(empty.schema.fieldNames.toSeq == Seq("doc_id", "status"))
  }

  test("streaming LSH finds the batch pipeline's pair set across batch boundaries") {
    val sf = "/root/testdata/sf0.001"
    // the per-row banded kernel and the aggregate pipeline agree on the
    // candidate set (same perms, same shingles — banding only groups
    // equal min-tuples)
    val docs = graft.sources.Tables.documents(spark, sf)
    val perRow = docs.select(col("doc_id"),
        posexplode(Dedup.minHashBandsCol(col("text"))))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "h")
    val rowCand = perRow.alias("l").join(perRow.alias("r"),
        col("l.band_id") === col("r.band_id") && col("l.h") === col("r.h") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
      .as[(Long, Long)].collect().toSet
    val batchCand = Dedup.candidatePairs(docs)
      .as[(Long, Long)].collect().toSet
    assert(rowCand == batchCand,
      s"per-row kernel candidates diverge: ${rowCand.size} vs ${batchCand.size}")
    // the streamed round trip (4 micro-batches, per-bucket state)
    // converges to the batch verify's exact pair set
    val streamed = graft.streaming.StreamNearDup.nearDupRoundTrip(spark, sf)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    val batch = Dedup.ngramJaccardPairs(docs, 0.5)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(streamed.nonEmpty, "testdata should contain near-dup pairs")
  }
}
