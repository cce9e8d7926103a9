package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private lazy val planted = SparkSpec.plantedDir(
    "documents" -> Seq(
      (0L, "abc", "en", "s", 3L),
      (2L, "frame sample payload with enough bytes to slice", "en", "s", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("feature extraction computes exact sha256/mean on planted payloads") {
    val row = Multimodal.featuresOp(spark, planted)
      .filter(col("media_id") === 0L).collect()(0)
    assert(row.getAs[String]("sha256") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(row.getAs[Double]("mean_byte") == (97 + 98 + 99) / 3.0)
    assert(row.getAs[Long]("n_bytes") == 3L)
    assert(row.getAs[String]("kind") == "image") // media_id % 3 == 0
  }

  test("metadata-only projection prunes the payload column from the scan") {
    val meta = Multimodal.mediaTable(spark, sf).toDF()
      .select("media_id", "width", "height")
    val scan = meta.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      s"payload column must not be read for metadata queries: $readSchema")
  }

  test("resize never upscales and bounds the long side at 256") {
    val rows = Multimodal.resizeOp(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("new_w"), r.getAs[Int]("new_h"))
      assert(w >= 1 && h >= 1 && math.max(w, h) <= 256 + 256, r.toString)
      assert(math.max(w, h) <= 256 || math.min(w, h) <= 256, r.toString)
    }
    // original 64x64 (media_id 0) is untouched
    val small = rows.find(_.getAs[Long]("media_id") == 0L).get
    assert(small.getAs[Int]("new_w") == 64 && small.getAs[Int]("new_h") == 64)
  }

  test("frame sampling emits nf rows per video with in-bounds byte ranges") {
    val rows = Multimodal.frameSampleOp(spark, planted).collect()
    // doc 2 is 'video' (2 % 3 == 2), nf = 2 % 8 + 2 = 4, nb = 47
    assert(rows.length == 4)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("frame_id") == i)
      assert(r.getAs[Long]("frame_len") == 47L / 4)
      assert(r.getAs[Long]("frame_off") + r.getAs[Long]("frame_len") <= 47L)
    }
  }
}
