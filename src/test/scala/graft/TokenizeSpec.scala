package graft

import graft.operators.Tokenize

class TokenizeSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  test("bpePairCounts weights pairs by word frequency; ties break by pair") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "ab ab abc", "en", "s", 1L),
        (1L, "ab xy", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    // words: ab×3, abc×1, xy×1 → pair "ab": 3 + 1 = 4; "bc": 1; "xy": 1
    val got = Tokenize.bpePairCounts(spark, dir).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n"))
    assert(got.toMap == Map("ab" -> 4L, "bc" -> 1L, "xy" -> 1L))
    assert(got.map(_._1).toSeq == Seq("ab", "bc", "xy"),
      "count desc, then pair asc")
  }

  test("bpeMerges trains the greedy merge sequence and stops when dry") {
    val docs = Seq((0L, "aa aa aa ab")).toDF("doc_id", "text")
    // vocab: aa×3, ab×1. Round 1: (a,a)=3 beats (a,b)=1; after the merge
    // "aa" is a single symbol, so round 2 sees only (a,b)=1; round 3 has
    // no pairs left → training stops early.
    val got = Tokenize.bpeMerges(docs, nMerges = 5).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    assert(got.toSeq == Seq((1, "a", "a", 3L), (2, "a", "b", 1L)))
  }

  test("bpeMerges merges overlapping pairs left-to-right (the paper's greedy rule)") {
    val docs = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    // "aaa" has two overlapping (a,a) pairs ×2 words = 4; the greedy
    // merge turns it into [aa, a] — NOT [a, aa] — so round 2 must see
    // (aa, a) = 2, never (a, aa).
    val got = Tokenize.bpeMerges(docs, nMerges = 5).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    assert(got.toSeq == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  test("bpeMerges symbol boundaries: a merged symbol never matches inside a longer one") {
    // vocab: "xab"×3, "ab"×1. Round 1 merges (a,b)=4. Round 2's top pair
    // must be (x, ab)=3 — and the round-1 merge must have fused "ab"
    // inside "xab" too (same pair, symbol-boundary-anchored).
    val docs = Seq((0L, "xab xab xab ab")).toDF("doc_id", "text")
    val got = Tokenize.bpeMerges(docs, nMerges = 2).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    assert(got.toSeq == Seq((1, "a", "b", 4L), (2, "x", "ab", 3L)))
  }

  test("encodeVocab segments by the merge table, greedily, losslessly") {
    val vocab = Seq("the", "then", "in", "thin", "banana", "zzz", "a")
      .toDF("w")
    val got = Tokenize.encodeVocab(vocab, Tokenize.EnglishMerges)
      .collect().map(r => r.getAs[String]("w") ->
        r.getSeq[String](1).toList).toMap
    // th←t+h, the←th+e, in←i+n, an←a+n, er←e+r, on←o+n, ing←in+g, al←a+l
    assert(got("the") == List("the"))
    assert(got("then") == List("the", "n"))
    assert(got("in") == List("in"))
    assert(got("thin") == List("th", "in"))
    assert(got("banana") == List("b", "an", "an", "a"))
    assert(got("zzz") == List("z", "z", "z"), "no merge applies → characters")
    assert(got("a") == List("a"))
    // lossless: token concatenation reproduces every word
    got.foreach { case (w, toks) => assert(toks.mkString == w, s"lossy: $w") }
  }

  test("one merge application is greedy left-to-right (adjacent runs, two passes suffice)") {
    // "aaaa" under merge (a,a): greedy = [aa, aa]; "aaa" = [aa, a];
    // "ababab" under (a,b) = [ab, ab, ab] — the shared-boundary cases a
    // single replace pass misses and the second pass must complete.
    val vocab = Seq("aaaa", "aaa", "ababab").toDF("w")
    val aa = Tokenize.encodeVocab(vocab, Seq("a" -> "a")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(aa("aaaa") == List("aa", "aa"))
    assert(aa("aaa") == List("aa", "a"))
    val ab = Tokenize.encodeVocab(vocab, Seq("a" -> "b")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(ab("ababab") == List("ab", "ab", "ab"))
  }

  test("trained merges feed encodeVocab: train→encode round trip") {
    val docs = Seq((0L, "aa aa aa ab")).toDF("doc_id", "text")
    val merges = Tokenize.bpeMerges(docs, nMerges = 5).collect()
      .map(r => r.getAs[String]("left") -> r.getAs[String]("right")).toSeq
    val enc = Tokenize.encodeVocab(Seq("aa", "ab", "aab").toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(enc("aa") == List("aa"))
    assert(enc("ab") == List("ab"))
    // greedy: (a,a) ranks first → "aab" = [aa, b], not [a, ab]
    assert(enc("aab") == List("aa", "b"))
  }

  test("bpeEncode counts words and tokens per doc; non-alpha words count 1") {
    val dir = SparkSpec.plantedDir(
      "documents" -> Seq(
        (0L, "the thin one", "en", "s", 1L),
        (1L, "X9 then", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = Tokenize.bpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 0: the→1, thin→2, one→2 (o+n merges, e remains) → 5 tokens
    // doc 1: X9 (non-alpha) → 1, then→2 → 3 tokens
    assert(got.toSeq == Seq((0L, 3L, 5L), (1L, 2L, 3L)))
  }

  test("bpePairCounts on the sf corpus is deterministic and bounded") {
    val a = Tokenize.bpePairCounts(spark, sf).collect().map(_.toString).toSeq
    val b = Tokenize.bpePairCounts(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size <= 50)
  }
}
