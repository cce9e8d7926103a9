package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{AsOf, Dedup}

/** Randomized cross-checks of the composed operators against brute-force
  * reference implementations — ties, empties, singletons, and dense
  * collisions that planted fixtures don't cover.
  */
class PropertySpec extends SparkSpec {
  /** Drive a Gen deterministically (seeded) without the scalatest bridge. */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i))
        .foreach(a => body(a))
    }
  private val ss = SparkSpec.spark
  import ss.implicits._

  private val genEdges: Gen[List[(Long, Long)]] =
    Gen.listOfN(30, for {
      a <- Gen.choose(0L, 14L); b <- Gen.choose(0L, 14L) if a != b
    } yield (math.min(a, b), math.max(a, b)))

  test("components equal brute-force union-find on random graphs") {
    forAllSeeded(genEdges) { edges =>
      val docs = (0L to 14L).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = Dedup.components(docs, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force union-find
      val parent = scala.collection.mutable.Map((0L to 14L).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0L to 14L).map(i => i -> find(i)).toMap
      assert(got == want, s"edges=$edges got=$got want=$want")
    }
  }

  private val genEvents: Gen[(List[(Long, Int)], List[(Long, Int, Long)])] = for {
    left <- Gen.listOfN(25, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0, 50)
    } yield (k, t))
    right <- Gen.listOfN(10, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0, 50); p <- Gen.choose(100L, 999L)
    } yield (k, t, p))
  } yield (left, right)

  test("asofJoin equals brute-force most-recent lookup on random data") {
    forAllSeeded(genEvents) { case (left, right) =>
      def ts(t: Int) = new Timestamp(1700000000000L + t * 60000L)
      // unique right rows per (key, ts) with deterministic max payload
      val rightDedup = right.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toList
      val leftDf = left.zipWithIndex
        .map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("user_id", "ts", "event_id")
      val rightDf = rightDedup.map { case (k, t, p) => (k, ts(t), p) }
        .toDF("user_id", "ts", "pay")
      val got = AsOf.asofJoin(leftDf, rightDf, "user_id", "ts", Seq("pay"))
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Any]("asof_pay")).map(_.asInstanceOf[Long])).toMap
      val want = left.zipWithIndex.map { case ((k, t), i) =>
        val candidates = rightDedup.filter(r => r._1 == k && r._2 <= t)
        i.toLong -> (if (candidates.isEmpty) None
          else Some(candidates.maxBy(_._2)._3))
      }.toMap
      assert(got == want, s"left=$left right=$right")
    }
  }

  private val genDoc: Gen[String] =
    Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "", "  "))
      .map(_.mkString(" "))

  test("aggregate minhash signatures equal the per-row HOF formulation") {
    forAllSeeded(Gen.listOfN(12, genDoc), n = 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .filter(_._2.trim.nonEmpty) // empty docs have no shingle rows either way
        .toDF("doc_id", "text")
      if (docs.count() > 0) {
        val agg = Dedup.signatures(docs).collect()
          .map(r => r.getLong(0) -> (1 to 64).map(i => r.getLong(i)).toList).toMap
        val hof = docs.select(col("doc_id"),
            Dedup.minhashSignature(Dedup.shingleHashes(col("text"))).as("sig"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
        assert(agg == hof, s"texts=$texts")
      }
    }
  }

  test("aggregate simhash signatures equal the per-row HOF formulation") {
    forAllSeeded(Gen.listOfN(12, genDoc), n = 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val agg = Dedup.simhashSignatures(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hof = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // agg path drops docs whose token explode is empty; every doc it
      // does emit must match the HOF value exactly
      assert(agg.forall { case (id, sh) => hof(id) == sh }, s"texts=$texts")
      assert(agg.nonEmpty || texts.forall(_.trim.isEmpty))
    }
  }

  test("shingle kernel equals a scala reimplementation on random strings") {
    forAllSeeded(Gen.listOfN(20, genDoc)) { texts =>
      val got = texts.toDF("text")
        .select(Dedup.shingleHashes(col("text")).as("sh"))
        .collect().map(_.getSeq[Long](0).toList)
      val want = texts.map { t =>
        val toks = t.trim.split("\\s+")
        val shingles = if (toks.length >= 3)
          (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
        else Seq(t.trim)
        shingles.map { s =>
          val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L) & 0xFFFFFFFFL
        }.distinct.toList
      }
      assert(got.toList == want, texts.toString)
    }
  }

  test("Roaring64 round-trips arbitrary sorted position sets") {
    val genPositions: Gen[List[Long]] = Gen.listOf(Gen.oneOf(
      Gen.choose(0L, 200000L), // dense low range: array+bitmap containers
      Gen.choose(0L, 1L << 40))) // sparse high words
    forAllSeeded(genPositions, n = 12) { raw =>
      val pos = raw.distinct.sorted.toArray
      val back = graft.sinks.Roaring64.deserialize(
        graft.sinks.Roaring64.serialize(pos))
      assert(back.toSeq == pos.toSeq, s"n=${pos.length}")
    }
  }

  test("Z85 round-trips arbitrary 4-aligned byte payloads") {
    val genBytes: Gen[List[Byte]] =
      Gen.choose(0, 64).flatMap(g => Gen.listOfN(g * 4, Gen.choose(-128, 127).map(_.toByte)))
    forAllSeeded(genBytes, n = 12) { bs =>
      val arr = bs.toArray
      assert(graft.sinks.Z85.decode(graft.sinks.Z85.encode(arr)).toSeq == arr.toSeq)
    }
  }

  test("count-min estimates never undercount on random weighted corpora") {
    val genWords: Gen[List[String]] = Gen.listOfN(300,
      Gen.choose(0, 40).map(i => s"t$i"))
    forAllSeeded(genWords, n = 6) { words =>
      val buf = new Array[Long](4 * 64 + 1)
      words.foreach(w => graft.functions.CountMin.add(buf, 4, 64, w, 1L))
      val exact = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      exact.foreach { case (w, n) =>
        assert(graft.functions.CountMin.estimate(buf, 4, 64, w) >= n)
      }
    }
  }
}
