package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and per-partition BATCHED
  * feature extraction.
  *
  * The real pattern at 100 TB: media bytes travel as parquet binary
  * columns next to their metadata; decode/feature-extract runs once per
  * partition with an expensively-initialized "model" reused across the
  * partition's rows (the Spark-side shape of batched inference). No
  * media codecs exist in this container, so the decoder is a
  * DETERMINISTIC STUB — `Sha256Featurizer` stands where a JNI/ONNX
  * decoder would — but everything Spark-level is real: schema, encoder,
  * partition batching, per-partition init, column pruning of the heavy
  * binary column when only metadata is queried.
  *
  * The stub features are engine-portable on purpose (byte length, SHA-256
  * hex, mean byte), so even the mapPartitions path is oracle-checked.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, fmt: String)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      sha256: String, mean_byte: Double, width: Int, height: Int)

  /** Deterministic media table derived from `documents`: the text bytes
    * stand in for the payload; metadata is a pure function of the id.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    val kinds = Seq("image", "audio", "video")
    Tables.spread(Tables.documents(spark, dir))
      .select(
        col("doc_id").as("media_id"),
        element_at(typedlit(kinds), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        ((col("doc_id") % 16) * 64 + 64).cast("int").as("width"),
        ((col("doc_id") % 9) * 64 + 64).cast("int").as("height"),
        lit("raw").as("fmt"))
      .as(Encoders.product[MediaRow])
  }

  /** The "model": initialized once per partition, applied to every row in
    * the partition's batch. Stub = SHA-256; real life = decoder + feature
    * network. Stateless across rows, so partition retry is safe.
    */
  private final class Sha256Featurizer {
    private val digest = MessageDigest.getInstance("SHA-256")
    def features(r: MediaRow): MediaFeatures = {
      digest.reset()
      val hex = digest.digest(r.content).map("%02x".format(_)).mkString
      val bytes = r.content
      val mean = if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / bytes.length
      MediaFeatures(r.media_id, r.kind, bytes.length.toLong, hex, mean, r.width, r.height)
    }
  }

  /** Batched extraction: one featurizer per partition, streamed over the
    * iterator (no materialization of the whole partition in memory).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      val model = new Sha256Featurizer
      rows.map(model.features)
    }(Encoders.product[MediaFeatures])

  def featuresOp(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .toDF()
      .orderBy(col("media_id"))

  /** Aspect-preserving downscale into a 256-box: pure per-row projection
    * (no shuffle) over metadata plus a stub payload slice — the byte
    * surgery a real resampler would do sits behind the same columns.
    * Integer arithmetic only, so the oracle is exact.
    */
  def resizeOp(spark: SparkSession, dir: String): DataFrame = {
    val m = mediaTable(spark, dir).toDF()
    val maxSide = greatest(col("width"), col("height"))
    def scaled(side: Column): Column =
      when(maxSide <= 256, side)
        .otherwise((side.cast("long") * 256 / maxSide).cast("int"))
    m.select(
        col("media_id"), col("kind"),
        scaled(col("width")).cast("int").as("new_w"),
        scaled(col("height")).cast("int").as("new_h"),
        least(length(col("content")),
          (scaled(col("width")).cast("long") * scaled(col("height")))).as("n_bytes_out"))
      .orderBy(col("media_id"))
  }

  /** Frame sampling for video payloads: deterministic 1→N row expansion
    * (`posexplode(sequence(...))` — the generator form a video pipeline
    * uses to emit frames), each row carrying its byte-range metadata.
    * Narrow transform, no shuffle; N is bounded per row.
    */
  def frameSampleOp(spark: SparkSession, dir: String): DataFrame = {
    val m = mediaTable(spark, dir).toDF().filter(col("kind") === "video")
    val nFrames = (col("media_id") % 8 + 2).cast("int")
    m.select(col("media_id"), length(col("content")).cast("long").as("nb"),
        nFrames.as("nf"),
        posexplode(sequence(lit(0), nFrames - 1)))
      .withColumn("frame_len", floor(col("nb") / col("nf")).cast("long"))
      .select(
        col("media_id"),
        col("col").cast("long").as("frame_id"),
        (col("col") * col("frame_len")).cast("long").as("frame_off"),
        col("frame_len"))
      .orderBy(col("media_id"), col("frame_id"))
  }

  val ops: Seq[Op] = Seq(
    Op("q_mm_resize", resizeOp,
      Some("""
        SELECT doc_id AS media_id,
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
          CAST(CASE WHEN greatest(w, h) <= 256 THEN w ELSE w * 256 // greatest(w, h) END AS INT) AS new_w,
          CAST(CASE WHEN greatest(w, h) <= 256 THEN h ELSE h * 256 // greatest(w, h) END AS INT) AS new_h,
          least(octet_length(encode(text)),
            (CASE WHEN greatest(w, h) <= 256 THEN w ELSE w * 256 // greatest(w, h) END)
            * (CASE WHEN greatest(w, h) <= 256 THEN h ELSE h * 256 // greatest(w, h) END)) AS n_bytes_out
        FROM (SELECT doc_id, text,
                CAST((doc_id % 16) * 64 + 64 AS BIGINT) AS w,
                CAST((doc_id % 9) * 64 + 64 AS BIGINT) AS h
              FROM documents)
        ORDER BY media_id""")),
    Op("q_mm_frames", frameSampleOp,
      Some("""
        SELECT media_id, frame_id, frame_id * (nb // nf) AS frame_off, nb // nf AS frame_len
        FROM (
          SELECT media_id, nb, nf, unnest(generate_series(0, nf - 1)) AS frame_id
          FROM (
            SELECT doc_id AS media_id, octet_length(encode(text)) AS nb,
                   CAST(doc_id % 8 + 2 AS BIGINT) AS nf
            FROM documents WHERE doc_id % 3 = 2))
        ORDER BY media_id, frame_id""")),
    Op("q_multimodal", featuresOp,
      Some("""
        SELECT doc_id AS media_id,
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
          octet_length(encode(text)) AS n_bytes,
          lower(sha256(text)) AS sha256,
          coalesce(list_avg(list_transform(range(0, octet_length(encode(text))),
            i -> CAST((strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i+1, 1))-1)*16
                    + (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i+2, 1))-1) AS DOUBLE))), 0.0) AS mean_byte,
          CAST((doc_id % 16) * 64 + 64 AS INT) AS width,
          CAST((doc_id % 9) * 64 + 64 AS INT) AS height
        FROM documents
        ORDER BY media_id"""))
  )
}
