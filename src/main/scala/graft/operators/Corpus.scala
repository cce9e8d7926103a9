package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Corpus-preparation operators a training-data pipeline runs between
  * dedup and tokenization: PII scrubbing, deterministic stratified
  * sampling, and token-budget sequence packing.
  *
  * All three are single-pass, codegen-friendly column programs (regex and
  * window functions — no UDFs, no driver loops), so they scale with the
  * scan: at 100 TB each is one map stage (+ one bounded window shuffle for
  * packing).
  */
object Corpus {

  // Conservative patterns that parse identically under Java regex (Spark)
  // and RE2 (DuckDB): no backrefs, no lookaround.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** PII scrub over `documents`. The synthetic corpus carries no PII, so
    * the op first APPENDS deterministic doc_id-derived PII (an email and
    * a 555 phone number) and then must remove exactly what it added —
    * the redaction counts are exact and the oracle rebuilds the same
    * text in SQL. Redaction = regexp_replace with typed placeholders,
    * counts via regexp_extract_all, both whole-stage-codegen'd.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val withPii = docs.withColumn("text",
      concat(col("text"), lit(" Contact user"), col("doc_id"),
        lit("@mail.example.com or call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(".")))
    withPii.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).as("n_phones"),
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("scrubbed"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic hash-stratified sampling: keep a per-stratum fraction
    * decided by the first hex digit of md5(doc_id) — reproducible across
    * engines and runs (the property a training-data pipeline needs for
    * auditable corpus cuts), unlike `df.sample`'s seed-and-partition-
    * dependent Bernoulli draw. en keeps 4/16 of docs, other languages
    * 8/16. A pure filter: no shuffle, fully pushdown-friendly.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 1)
    Tables.documents(spark, dir)
      .filter(when(col("lang") === "en", bucket <= "3").otherwise(bucket <= "7"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Greedy sequence packing: within each (lang, shard) stream, docs are
    * taken in doc_id order and assigned to fixed `budget`-char bins by
    * their start offset in the running concatenation — bin
    * floor(prefix_sum_before / budget). One window shuffle; the shard
    * key (doc_id % 16 here) bounds every window partition so the packing
    * parallelizes — at 100 TB you raise the shard count, never the
    * per-task state.
    */
  def packSequences(spark: SparkSession, dir: String, budget: Long = 4096L): DataFrame =
    packFrame(Tables.documents(spark, dir), budget).orderBy(col("doc_id"))

  private def packFrame(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", (col("doc_id") % 16).cast("int"))
      .withColumn("start_off", sum(col("n_chars")).over(w) - col("n_chars"))
      .select(col("doc_id"), col("lang"), col("shard"),
        floor(col("start_off") / budget).as("bin"),
        (col("start_off") % budget).as("bin_off"))
  }

  /** The composed corpus pipeline, end to end in ONE declarative plan:
    * exact dedup (keep-first per text) → quality gate (token floor) →
    * deterministic 50% sample → sequence packing. Catalyst fuses the
    * stages: dedup's window and packing's window are the only shuffles,
    * the filters run map-side between them, nothing materializes. This
    * is the shape a real training-data run takes at 100 TB — and the
    * whole composition is hash-checked against one nested SQL oracle.
    */
  def pipeline(spark: SparkSession, dir: String, budget: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dedupW = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    val survivors = Tables.documents(spark, dir)
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1).drop("__rn")
    val gated = survivors
      .filter(size(split(trim(col("text")), "\\s+")) >= 20)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) <= "7")
    packFrame(gated, budget).orderBy(col("doc_id"))
  }

  val ops: Seq[Op] = Seq(
    Op("q_pii_scrub", piiScrub,
      Some("""
        SELECT doc_id,
          len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            AS n_emails,
          len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS n_phones,
          regexp_replace(
            regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
              '<EMAIL>', 'g'),
            '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS scrubbed
        FROM (
          SELECT doc_id,
            text || ' Contact user' || doc_id || '@mail.example.com or call 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS t
          FROM documents)
        ORDER BY doc_id""")),
    Op("q_sample_stratified", stratifiedSample,
      Some("""
        SELECT doc_id, lang, source FROM documents
        WHERE CASE WHEN lang = 'en'
          THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '3'
          ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7' END
        ORDER BY doc_id""")),
    Op("q_pipeline", (s, d) => pipeline(s, d),
      Some("""
        WITH surv AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents) WHERE rn = 1),
        gated AS (
          SELECT doc_id, lang, n_chars FROM surv
          WHERE len(string_split_regex(trim(text), '\s+')) >= 20
            AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7'),
        packed AS (
          SELECT doc_id, lang, CAST(doc_id % 16 AS INT) AS shard,
            SUM(n_chars) OVER (PARTITION BY lang, doc_id % 16 ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
          FROM gated)
        SELECT doc_id, lang, shard,
          CAST(FLOOR(start_off / 4096.0) AS BIGINT) AS bin,
          start_off % 4096 AS bin_off
        FROM packed ORDER BY doc_id""")),
    Op("q_pack_sequences", (s, d) => packSequences(s, d),
      Some("""
        SELECT doc_id, lang, shard,
          CAST(FLOOR(start_off / 4096.0) AS BIGINT) AS bin,
          start_off % 4096 AS bin_off
        FROM (
          SELECT doc_id, lang, CAST(doc_id % 16 AS INT) AS shard,
            SUM(n_chars) OVER (PARTITION BY lang, doc_id % 16 ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
          FROM documents)
        ORDER BY doc_id""")))
}
