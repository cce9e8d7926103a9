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

  test("bpePairCounts on the sf corpus is deterministic and bounded") {
    val a = Tokenize.bpePairCounts(spark, sf).collect().map(_.toString).toSeq
    val b = Tokenize.bpePairCounts(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size <= 50)
  }
}
