package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial FOREIGN-writer Hudi fixture: a COW table whose
  * `.hoodie` timeline, properties file, and data files are hand-written
  * the way the reference Hudi writer lays them out — fileIds carrying
  * the real writer's `-<index>` suffix (38 chars, not graft's bare
  * 36-char UUID), `p-s-a` write tokens, requested/inflight/commit
  * instant triplets with JSON commit metadata, clean instants, a
  * `.hoodie/metadata` table dir, `.hoodie_partition_metadata` markers,
  * hive-style partition dirs, and a properties file full of keys graft
  * never writes. Plus the refusal surface: MERGE_ON_READ tables and
  * 1.x timeline layouts must fail loudly, never return stale rows.
  * Offline proxy for real-reader interop while connector jars are
  * environment-blocked (reference: jobs/S3HudiBatchReader.scala).
  */
class HudiForeignSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private def writeProps(root: String, extra: Map[String, String] = Map.empty): Unit = {
    val base = Map(
      "hoodie.table.name" -> "foreign_tbl",
      "hoodie.table.type" -> "COPY_ON_WRITE",
      "hoodie.table.version" -> "6",
      "hoodie.timeline.layout.version" -> "1",
      "hoodie.table.checksum" -> "3101069148",
      "hoodie.datasource.write.hive_style_partitioning" -> "true",
      "hoodie.table.keygenerator.class" ->
        "org.apache.hudi.keygen.SimpleKeyGenerator",
      "hoodie.table.recordkey.fields" -> "id",
      "hoodie.table.precombine.field" -> "ts",
      "hoodie.partition.metafile.use.base.format" -> "false",
      "hoodie.archivelog.folder" -> "archived",
      "hoodie.populate.meta.fields" -> "true")
    val body = "#Updated at 2024-01-01T00:00:00Z\n" +
      (base ++ extra).map { case (k, v) => s"$k=$v" }.mkString("\n") + "\n"
    Files.createDirectories(java.nio.file.Paths.get(s"$root/.hoodie"))
    Files.write(java.nio.file.Paths.get(s"$root/.hoodie/hoodie.properties"),
      body.getBytes("UTF-8"))
  }

  /** Plant one base file under a partition dir with the real writer's
    * name shape and the five meta columns inside.
    */
  private def plantSlice(root: String, dir: String, fileId: String,
      token: String, instant: String,
      rows: Seq[(Long, String, Double)]): Unit = {
    val name = s"${fileId}_${token}_$instant.parquet"
    val df = rows.toDF("id", "cat", "v")
      .withColumn("_hoodie_commit_time", lit(instant))
      .withColumn("_hoodie_commit_seqno",
        concat_ws("_", lit(instant), lit("0"), monotonically_increasing_id()))
      .withColumn("_hoodie_record_key", col("id").cast("string"))
      .withColumn("_hoodie_partition_path", lit(dir))
      .withColumn("_hoodie_file_name", lit(name))
      .select(HudiInterop.MetaCols.map(col) ++ Seq(col("id"), col("cat"), col("v")): _*)
    val stage = s"$root/stage-${java.util.UUID.randomUUID()}"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dstDir = new java.io.File(if (dir.isEmpty) root else s"$root/$dir")
    dstDir.mkdirs()
    assert(part.renameTo(new java.io.File(dstDir, name)))
    Files.write(java.nio.file.Paths.get(dstDir.getPath, ".hoodie_partition_metadata"),
      s"#partition metadata\ncommitTime=$instant\npartitionDepth=1\n".getBytes("UTF-8"))
  }

  private def commitInstant(root: String, instant: String): Unit = {
    Files.write(java.nio.file.Paths.get(s"$root/.hoodie/$instant.commit.requested"),
      Array.empty[Byte])
    Files.write(java.nio.file.Paths.get(s"$root/.hoodie/$instant.inflight"),
      "{}".getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(s"$root/.hoodie/$instant.commit"),
      s"""{"partitionToWriteStats":{},"compacted":false,"operationType":"UPSERT",
         |"extraMetadata":{"schema":"{}"},"totalRecordsDeleted":0}"""
        .stripMargin.getBytes("UTF-8"))
  }

  // real-writer fileId: 36-char uuid + "-0" group index = 38 chars
  private val fidA = "11111111-2222-4333-8444-555555555555-0"
  private val fidB = "66666666-7777-4888-9999-aaaaaaaaaaaa-0"

  private lazy val table: String = {
    val root = Files.createTempDirectory("graft-hudi-foreign").toFile.getAbsolutePath
    writeProps(root)
    // commit 1: both partitions
    val i1 = "20240101010101123"
    plantSlice(root, "cat=a", fidA, "1-10-25", i1,
      Seq((1L, "a", 10.0), (2L, "a", 20.0)))
    plantSlice(root, "cat=b", fidB, "1-11-26", i1,
      Seq((3L, "b", 30.0)))
    commitInstant(root, i1)
    // commit 2: upsert rewrites group A (id 2 updated, id 1 carried
    // with its ORIGINAL commit time — the incremental-pull contract)
    val i2 = "20240102010101456"
    val name2 = s"${fidA}_2-20-30_$i2.parquet"
    val df2 = Seq((1L, "a", 10.0, i1), (2L, "a", 25.0, i2))
      .toDF("id", "cat", "v", "ct")
      .withColumn("_hoodie_commit_time", col("ct")).drop("ct")
      .withColumn("_hoodie_commit_seqno",
        concat_ws("_", col("_hoodie_commit_time"), lit("0"),
          monotonically_increasing_id()))
      .withColumn("_hoodie_record_key", col("id").cast("string"))
      .withColumn("_hoodie_partition_path", lit("cat=a"))
      .withColumn("_hoodie_file_name", lit(name2))
      .select(HudiInterop.MetaCols.map(col) ++ Seq(col("id"), col("cat"), col("v")): _*)
    val stage = s"$root/stage-c2"
    df2.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(s"$root/cat=a", name2)))
    commitInstant(root, i2)
    // a clean instant (digits stem, different suffix) must not confuse
    // the timeline
    Files.write(java.nio.file.Paths.get(s"$root/.hoodie/20240103010101000.clean"),
      """{"earliestInstantRetained":"20240101010101123"}""".getBytes("UTF-8"))
    // crash debris: slice landed, instant never completed — INVISIBLE
    val i3 = "20240104010101789"
    plantSlice(root, "cat=b", fidB, "1-12-27", i3, Seq((99L, "b", 999.0)))
    Files.write(java.nio.file.Paths.get(s"$root/.hoodie/$i3.commit.requested"),
      Array.empty[Byte])
    Files.write(java.nio.file.Paths.get(s"$root/.hoodie/$i3.inflight"),
      "{}".getBytes("UTF-8"))
    // the metadata-table dir under .hoodie must be skipped by the walk
    Files.createDirectories(java.nio.file.Paths.get(s"$root/.hoodie/metadata/files"))
    Files.write(java.nio.file.Paths.get(s"$root/.hoodie/metadata/files/marker"),
      "not-a-parquet".getBytes("UTF-8"))
    root
  }

  test("foreign COW table reads: latest slice per group, debris invisible") {
    val got = HudiInterop.read(spark, table)
      .select(col("id"), col("cat"), col("v"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "a", 25.0), (3L, "b", 30.0)),
      s"expected latest committed slices only, got $got")
  }

  test("foreign table time travel + incremental pull honor real instants") {
    val asOf = HudiInterop.read(spark, table, asOf = Some("20240101999999999"))
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(asOf == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // incremental: only records whose slice stamped a NEWER commit time
    val inc = HudiInterop.readIncremental(spark, table, "20240101010101123")
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(inc == Set((2L, 25.0)), s"carried-over id 1 must not re-emit: $inc")
  }

  test("graft upsert composes onto the foreign table") {
    // copy the fixture so the shared lazy table stays pristine
    val root = Files.createTempDirectory("graft-hudi-upsert").toFile.getAbsolutePath
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(table), new java.io.File(root))
    HudiInterop.upsert(
      Seq((3L, "b", 31.0, 5L), (4L, "b", 40.0, 5L)).toDF("id", "cat", "v", "ts"),
      root, recordKey = "id", precombine = "ts", partitionBy = Seq("cat"))
    val got = HudiInterop.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 10.0), (2L, 25.0), (3L, 31.0), (4L, 40.0)), got.toString)
  }

  test("14-digit (pre-0.13 writer) instants read fine") {
    val root = Files.createTempDirectory("graft-hudi-old").toFile.getAbsolutePath
    writeProps(root, Map("hoodie.table.version" -> "4"))
    val i = "20230101010101" // second resolution, 14 digits
    plantSlice(root, "cat=a", fidA, "0-1-2", i, Seq((7L, "a", 70.0)))
    commitInstant(root, i)
    val got = HudiInterop.read(spark, root)
      .select(col("id")).as[Long].collect().toSeq
    assert(got == Seq(7L))
  }

  test("MERGE_ON_READ reads route through the collapse; COW maintenance and 1.x refuse") {
    val mor = Files.createTempDirectory("graft-hudi-mor").toFile.getAbsolutePath
    writeProps(mor, Map("hoodie.table.type" -> "MERGE_ON_READ"))
    val i = "20240101010101123"
    plantSlice(mor, "cat=a", fidA, "1-1-1", i, Seq((1L, "a", 1.0)))
    commitInstant(mor, i)
    // r8: MOR snapshot reads SERVE (HudiMor collapse — a log-less
    // foreign MOR table is just its base slices); COW slice writes and
    // the COW maintenance surface still refuse by name
    val got = HudiInterop.read(spark, mor).select(col("id")).as[Long].collect().toSeq
    assert(got == Seq(1L), got.toString)
    val e = intercept[IllegalArgumentException](HudiInterop.upsert(
      Seq((1L, "a", 2.0, 9L)).toDF("id", "cat", "v", "ts"),
      mor, recordKey = "id", precombine = "ts", partitionBy = Seq("cat")))
    assert(e.getMessage.contains("MERGE_ON_READ"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      HudiInterop.clean(spark, mor, retainCommits = 1))
    assert(e2.getMessage.contains("MERGE_ON_READ"), e2.getMessage)

    // an EMPTY 1.x table (no timeline dir yet) reads as no commits,
    // not as a version refusal (r9: the 1.x layout is read-served)
    val v8 = Files.createTempDirectory("graft-hudi-v8").toFile.getAbsolutePath
    writeProps(v8, Map("hoodie.table.version" -> "8"))
    val e3 = intercept[IllegalArgumentException](HudiInterop.read(spark, v8))
    assert(e3.getMessage.contains("no completed commits"), e3.getMessage)
  }

  test("1.x timeline layout (table version 8) reads serve; writes and maintenance refuse") {
    val root = Files.createTempDirectory("graft-hudi-1x").toFile.getAbsolutePath
    writeProps(root, Map("hoodie.table.version" -> "8",
      "hoodie.timeline.layout.version" -> "2",
      "hoodie.timeline.path" -> "timeline"))
    Files.createDirectories(java.nio.file.Paths.get(s"$root/.hoodie/timeline"))
    def completed1x(instant: String, completion: String, action: String): Unit = {
      Files.write(java.nio.file.Paths.get(
        s"$root/.hoodie/timeline/$instant.$action.requested"), Array.empty[Byte])
      Files.write(java.nio.file.Paths.get(
        s"$root/.hoodie/timeline/${instant}_$completion.$action"),
        """{"partitionToWriteStats":{}}""".getBytes("UTF-8"))
    }
    // commit 1: both partitions; commit 2 rewrites group A (1.x names)
    val i1 = "20250101010101111"
    plantSlice(root, "cat=a", fidA, "1-10-25", i1,
      Seq((1L, "a", 10.0), (2L, "a", 20.0)))
    plantSlice(root, "cat=b", fidB, "1-11-26", i1, Seq((3L, "b", 30.0)))
    completed1x(i1, "20250101010102000", "commit")
    val i2 = "20250102010101222"
    plantSlice(root, "cat=a", fidA, "2-20-30", i2,
      Seq((1L, "a", 10.0), (2L, "a", 25.0)))
    completed1x(i2, "20250102010102000", "commit")
    // crash debris: a slice whose instant only has requested/inflight
    val i3 = "20250103010101333"
    plantSlice(root, "cat=b", fidB, "1-12-27", i3, Seq((99L, "b", 999.0)))
    Files.write(java.nio.file.Paths.get(
      s"$root/.hoodie/timeline/$i3.commit.requested"), Array.empty[Byte])
    Files.write(java.nio.file.Paths.get(
      s"$root/.hoodie/timeline/$i3.inflight"), "{}".getBytes("UTF-8"))

    val got = HudiInterop.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 10.0), (2L, 25.0), (3L, 30.0)),
      s"1.x completed instants must resolve, debris must not: $got")
    // time travel against the 1.x begin-instant ordering
    val v1 = HudiInterop.read(spark, root, asOf = Some(i1))
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(v1 == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)), v1.toString)
    // the timeline inspection table resolves 1.x names
    val tl = HudiInterop.metadataTable(spark, root, "timeline")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(tl.count(t => t._2 == "commit" && t._3) == 2, tl.mkString(","))
    assert(tl.exists(t => t._1 == i3 && t._2 == "commit.requested"), tl.mkString(","))
    // writes and maintenance refuse BY NAME — a v6-shaped instant file
    // would be invisible to 1.x completion-time readers
    val e = intercept[IllegalArgumentException](HudiInterop.upsert(
      Seq((1L, "a", 2.0, 9L)).toDF("id", "cat", "v", "ts"),
      root, recordKey = "id", precombine = "ts", partitionBy = Seq("cat")))
    assert(e.getMessage.contains("1.x"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      HudiInterop.clean(spark, root, retainCommits = 1))
    assert(e2.getMessage.contains("1.x"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      HudiInterop.restoreToInstant(spark, root, i1))
    assert(e3.getMessage.contains("1.x"), e3.getMessage)
  }

  test("1.x non-default hoodie.timeline.path resolves (not hardcoded 'timeline')") {
    val root = Files.createTempDirectory("graft-hudi-1x-tlpath").toFile.getAbsolutePath
    writeProps(root, Map("hoodie.table.version" -> "8",
      "hoodie.timeline.layout.version" -> "2",
      "hoodie.timeline.path" -> "tl_custom"))
    Files.createDirectories(java.nio.file.Paths.get(s"$root/.hoodie/tl_custom"))
    val i1 = "20250105010101111"
    plantSlice(root, "cat=a", fidA, "1-1-1", i1, Seq((1L, "a", 10.0)))
    Files.write(java.nio.file.Paths.get(
      s"$root/.hoodie/tl_custom/$i1.commit.requested"), Array.empty[Byte])
    Files.write(java.nio.file.Paths.get(
      s"$root/.hoodie/tl_custom/${i1}_20250105010102000.commit"),
      """{"partitionToWriteStats":{}}""".getBytes("UTF-8"))
    val got = HudiInterop.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 10.0)), got.toString)
  }

  test("1.x MERGE_ON_READ: delta-commit-named logs serve through the collapse") {
    val root = Files.createTempDirectory("graft-hudi-1x-mor").toFile.getAbsolutePath
    writeProps(root, Map("hoodie.table.version" -> "8",
      "hoodie.timeline.layout.version" -> "2",
      "hoodie.table.type" -> "MERGE_ON_READ"))
    Files.createDirectories(java.nio.file.Paths.get(s"$root/.hoodie/timeline"))
    def completed1x(instant: String, completion: String, action: String): Unit = {
      Files.write(java.nio.file.Paths.get(
        s"$root/.hoodie/timeline/$instant.$action.requested"), Array.empty[Byte])
      Files.write(java.nio.file.Paths.get(
        s"$root/.hoodie/timeline/${instant}_$completion.$action"),
        """{"partitionToWriteStats":{}}""".getBytes("UTF-8"))
    }
    // 1.x NAMING RULE: the instant in a log file's name is the DELTA
    // COMMIT that wrote it — binding to the file group is by fileId.
    val i1 = "20250201010101111"
    plantSlice(root, "cat=a", fidM1, "1-1-1", i1,
      Seq((1L, "a", 1.0), (2L, "a", 2.0)))
    completed1x(i1, "20250201010102000", "deltacommit")
    val i2 = "20250202010101222"
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i2.log.1_1-0-1",
      Seq(avroBlock(i2, Seq((2L, "a", 9.0)), "cat=a",
        s".${fidM1}_$i2.log.1_1-0-1")))
    completed1x(i2, "20250202010102000", "deltacommit")
    // crash debris: a log named by an instant that never completed
    val i3 = "20250202020202333"
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i3.log.1_1-0-1",
      Seq(avroBlock(i3, Seq((1L, "a", 777.0)), "cat=a",
        s".${fidM1}_$i3.log.1_1-0-1")))
    Files.write(java.nio.file.Paths.get(
      s"$root/.hoodie/timeline/$i3.deltacommit.requested"), Array.empty[Byte])
    // a log-ONLY group (bucket-index writer, no base ever) in cat=b
    plantLogBlocks(root, "cat=b", s".${fidM3}_$i2.log.1_1-0-1",
      Seq(avroBlock(i2, Seq((7L, "b", 70.0)), "cat=b",
        s".${fidM3}_$i2.log.1_1-0-1")))
    val got = HudiInterop.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 1.0), (2L, 9.0), (7L, 70.0)), got.toString)
    // asOf the bootstrap: the i2 log is not visible yet
    val v1 = HudiMor.read(spark, root, asOf = Some(i1))
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(v1 == Set((1L, 1.0), (2L, 2.0)), v1.toString)
    // a foreign COMPACTION (`.commit`) at i4 rewrites the group's base;
    // the i2 log binds BELOW it and must fall off — the planted base
    // deliberately carries a different value for id 2 so a wrongly
    // re-applied log would surface as 9.0
    val i4 = "20250203010101444"
    plantSlice(root, "cat=a", fidM1, "2-2-2", i4,
      Seq((1L, "a", 1.0), (2L, "a", 4.0)))
    completed1x(i4, "20250203010102000", "commit")
    // a post-compaction delta commit logs a new change for id 1
    val i5 = "20250204010101555"
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i5.log.1_1-0-1",
      Seq(avroBlock(i5, Seq((1L, "a", 5.0)), "cat=a",
        s".${fidM1}_$i5.log.1_1-0-1")))
    completed1x(i5, "20250204010102000", "deltacommit")
    val after = HudiInterop.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(after == Set((1L, 5.0), (2L, 4.0), (7L, 70.0)), after.toString)
    // asOf between compaction and the i5 log: base-only for the group
    val v4 = HudiMor.read(spark, root, asOf = Some(i4))
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(v4 == Set((1L, 1.0), (2L, 4.0), (7L, 70.0)), v4.toString)
    // MOR writers refuse 1.x by name
    val e = intercept[IllegalArgumentException](HudiMor.upsert(
      Seq((1L, "a", 5.0, 9L)).toDF("id", "cat", "v", "ts"),
      root, recordKey = "id", precombine = "ts", partitionBy = Seq("cat")))
    assert(e.getMessage.contains("1.x"), e.getMessage)
  }

  test("1.x MERGE_ON_READ: delete and rollback blocks honor the delta-commit binding") {
    val root = Files.createTempDirectory("graft-hudi-1x-mor-db").toFile.getAbsolutePath
    writeProps(root, Map("hoodie.table.version" -> "8",
      "hoodie.timeline.layout.version" -> "2",
      "hoodie.table.type" -> "MERGE_ON_READ"))
    Files.createDirectories(java.nio.file.Paths.get(s"$root/.hoodie/timeline"))
    def dc(instant: String, completion: String): Unit = {
      Files.write(java.nio.file.Paths.get(
        s"$root/.hoodie/timeline/$instant.deltacommit.requested"), Array.empty[Byte])
      Files.write(java.nio.file.Paths.get(
        s"$root/.hoodie/timeline/${instant}_$completion.deltacommit"),
        """{"partitionToWriteStats":{}}""".getBytes("UTF-8"))
    }
    val i1 = "20250301010101111"
    plantSlice(root, "cat=a", fidM1, "1-1-1", i1,
      Seq((1L, "a", 1.0), (2L, "a", 2.0)))
    dc(i1, "20250301010102000")
    // DELETE block in a log named by ITS delta commit (1.x rule)
    val i2 = "20250302010101222"
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i2.log.1_1-0-1",
      Seq(HudiLogFormat.LogBlock(HudiLogFormat.DeleteBlock,
        Map(HudiLogFormat.InstantTime -> i2),
        HudiLogFormat.deleteContent(Seq(
          HudiLogFormat.DeleteRecord("2", "cat=a"))))))
    dc(i2, "20250302010102000")
    val afterDelete = HudiInterop.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(afterDelete == Set((1L, 1.0)), afterDelete.toString)
    // an upsert at i3, then a rollback COMMAND at i4 targeting i3:
    // the rolled-back change must vanish even across log files
    val i3 = "20250303010101333"
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i3.log.1_1-0-1",
      Seq(avroBlock(i3, Seq((1L, "a", 9.0)), "cat=a",
        s".${fidM1}_$i3.log.1_1-0-1")))
    dc(i3, "20250303010102000")
    val i4 = "20250304010101444"
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i4.log.1_1-0-1",
      Seq(HudiLogFormat.LogBlock(HudiLogFormat.CommandBlock,
        Map(HudiLogFormat.InstantTime -> i4,
          HudiLogFormat.TargetInstantTime -> i3,
          HudiLogFormat.CommandBlockType -> "0"), Array.empty[Byte])))
    dc(i4, "20250304010102000")
    val afterRollback = HudiInterop.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(afterRollback == Set((1L, 1.0)), afterRollback.toString)
  }

  // ---- foreign MERGE_ON_READ fixture: multi-group partition,
  // real-writer log names, rollback block, log-only group ----

  private def deltaCommitInstant(root: String, instant: String): Unit = {
    Files.write(java.nio.file.Paths.get(
      s"$root/.hoodie/$instant.deltacommit.requested"), Array.empty[Byte])
    Files.write(java.nio.file.Paths.get(
      s"$root/.hoodie/$instant.deltacommit.inflight"), "{}".getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(s"$root/.hoodie/$instant.deltacommit"),
      """{"partitionToWriteStats":{},"operationType":"UPSERT"}""".getBytes("UTF-8"))
  }

  private val morSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("_hoodie_commit_time",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_hoodie_commit_seqno",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_hoodie_record_key",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_hoodie_partition_path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_hoodie_file_name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cat",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.DoubleType)))

  private def plantLogBlocks(root: String, dir: String, name: String,
      blocks: Seq[HudiLogFormat.LogBlock]): Unit = {
    val dirFile = new java.io.File(s"$root/$dir"); dirFile.mkdirs()
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(new java.io.File(dirFile, name)))
    try blocks.foreach(b => HudiLogFormat.writeBlock(out, b)) finally out.close()
  }

  private def avroBlock(instant: String,
      rows: Seq[(Long, String, Double)], dir: String, fileName: String): HudiLogFormat.LogBlock = {
    val schemaJson = HudiMor.avroSchemaJson(morSchema)
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val recs = rows.map { case (id, cat, v) =>
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("_hoodie_commit_time", instant)
      r.put("_hoodie_commit_seqno", s"${instant}_0_$id")
      r.put("_hoodie_record_key", id.toString)
      r.put("_hoodie_partition_path", dir)
      r.put("_hoodie_file_name", fileName)
      r.put("id", id); r.put("cat", cat); r.put("v", v)
      HudiLogFormat.encodeAvro(schema, r)
    }
    HudiLogFormat.LogBlock(HudiLogFormat.AvroDataBlock,
      Map(HudiLogFormat.InstantTime -> instant,
        HudiLogFormat.SchemaKey -> schemaJson),
      HudiLogFormat.avroDataContent(recs))
  }

  // two REAL-writer file groups in ONE partition (38-char fileIds) +
  // a log-only third group — the bucket-index layout graft's own
  // writer never produces but must read
  private val fidM1 = "aaaaaaaa-bbbb-4ccc-8ddd-eeeeeeeeeeee-0"
  private val fidM2 = "aaaaaaaa-bbbb-4ccc-8ddd-eeeeeeeeeeee-1"
  private val fidM3 = "99999999-8888-4777-8666-555555555555-0"

  private lazy val morTable: String = {
    val root = Files.createTempDirectory("graft-hudi-mor-foreign")
      .toFile.getAbsolutePath
    writeProps(root, Map("hoodie.table.type" -> "MERGE_ON_READ"))
    val i1 = "20240201010101111"
    // bootstrap: group M1 (ids 1, 2) and group M2 (id 3) BOTH in cat=a
    plantSlice(root, "cat=a", fidM1, "1-10-25", i1,
      Seq((1L, "a", 10.0), (2L, "a", 20.0)))
    plantSlice(root, "cat=a", fidM2, "1-11-26", i1, Seq((3L, "a", 30.0)))
    deltaCommitInstant(root, i1)
    // i2: avro log block updates id 2 in group M1 (real writer token)
    val i2 = "20240202010101222"
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i1.log.1_1-0-1",
      Seq(avroBlock(i2, Seq((2L, "a", 25.0)), "cat=a",
        s".${fidM1}_$i1.log.1_1-0-1")))
    deltaCommitInstant(root, i2)
    // i3: avro block on id 1, then a ROLLBACK command block hides it
    val i3 = "20240203010101333"
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i1.log.2_1-0-2",
      Seq(avroBlock(i3, Seq((1L, "a", 999.0)), "cat=a",
        s".${fidM1}_$i1.log.2_1-0-2")))
    deltaCommitInstant(root, i3)
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i1.log.3_1-0-3",
      Seq(HudiLogFormat.LogBlock(HudiLogFormat.CommandBlock,
        Map(HudiLogFormat.InstantTime -> i3,
          HudiLogFormat.TargetInstantTime -> i3,
          HudiLogFormat.CommandBlockType -> "0"), Array.emptyByteArray)))
    // i4: LOG-ONLY group M3 in cat=b — insert routed straight to a log
    // (bucket-index writer shape), no base parquet ever
    val i4 = "20240204010101444"
    plantLogBlocks(root, "cat=b", s".${fidM3}_$i4.log.1_1-0-1",
      Seq(avroBlock(i4, Seq((7L, "b", 70.0)), "cat=b",
        s".${fidM3}_$i4.log.1_1-0-1")))
    deltaCommitInstant(root, i4)
    root
  }

  test("foreign MOR: multi-group partition + rollback block + log-only group all serve") {
    val got = HudiInterop.read(spark, morTable)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 10.0), (2L, 25.0), (3L, 30.0), (7L, 70.0)),
      s"rollback must hide i3, log-only group must serve: $got")
    // time travel to i2: no log-only group yet, id 2 already updated
    val v2 = HudiInterop.read(spark, morTable, asOf = Some("20240202010101222"))
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(v2 == Set((1L, 10.0), (2L, 25.0), (3L, 30.0)), v2.toString)
    // incremental window (i1, i2]: exactly the i2 row versions
    val inc = HudiInterop.readIncrementalBetween(spark, morTable,
      "20240201010101111", "20240202010101222")
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(inc == Set((2L, 25.0)), inc.toString)
    // the files inspection lists both groups' bases, bound logs, AND
    // the log-only group's log
    val inv = HudiInterop.metadataTable(spark, morTable, "files")
      .select(col("path")).collect().map(_.getString(0))
    assert(inv.count(_.endsWith(".parquet")) == 2, inv.mkString(","))
    assert(inv.exists(_.contains(fidM3)), inv.mkString(","))
  }

  test("foreign MOR: writes cannot route into a multi-group dir without bucket props") {
    val root = Files.createTempDirectory("graft-hudi-mor-w").toFile.getAbsolutePath
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(morTable), new java.io.File(root))
    val e = intercept[IllegalArgumentException](HudiMor.upsert(
      Seq((2L, "a", 26.0, 9L)).toDF("id", "cat", "v", "ts"),
      root, recordKey = "id", precombine = "ts", partitionBy = Seq("cat")))
    assert(e.getMessage.contains("route"), e.getMessage)
    // compaction refuses on the log-only group by name
    val e2 = intercept[IllegalArgumentException](
      HudiMor.compact(spark, root, Seq("cat")))
    assert(e2.getMessage.contains("log-only"), e2.getMessage)
  }

  test("foreign MOR: v2 Kryo delete payloads refuse by name") {
    val root = Files.createTempDirectory("graft-hudi-mor-kryo").toFile.getAbsolutePath
    writeProps(root, Map("hoodie.table.type" -> "MERGE_ON_READ"))
    val i1 = "20240301010101111"
    plantSlice(root, "cat=a", fidM1, "1-1-1", i1, Seq((1L, "a", 1.0)))
    deltaCommitInstant(root, i1)
    val i2 = "20240302010101222"
    val kryoContent = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(bos)
      d.writeInt(2); d.writeInt(4); d.write(Array[Byte](9, 9, 9, 9)); d.flush()
      bos.toByteArray
    }
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i1.log.1_1-0-1",
      Seq(HudiLogFormat.LogBlock(HudiLogFormat.DeleteBlock,
        Map(HudiLogFormat.InstantTime -> i2), kryoContent)))
    deltaCommitInstant(root, i2)
    val e = intercept[Exception](HudiInterop.read(spark, root).collect())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("Kryo"), s"$e")
  }

  test("foreign MOR: parquet data blocks decode and merge; hfile refuses by name") {
    val root = Files.createTempDirectory("graft-hudi-mor-pq").toFile.getAbsolutePath
    writeProps(root, Map("hoodie.table.type" -> "MERGE_ON_READ"))
    val i1 = "20240401010101111"
    plantSlice(root, "cat=a", fidM1, "1-1-1", i1,
      Seq((1L, "a", 1.0), (2L, "a", 2.0)))
    deltaCommitInstant(root, i1)
    // PARQUET_DATA block content = a real Spark-written (snappy) parquet
    // file of morSchema rows — the shape HoodieParquetDataBlock streams
    val i2 = "20240402010101222"
    val stage = Files.createTempDirectory("graft-pq-block").toFile.getAbsolutePath
    Seq((2L, "a", 9.0)).toDF("id", "cat", "v")
      .withColumn("_hoodie_commit_time", lit(i2))
      .withColumn("_hoodie_commit_seqno",
        concat_ws("_", lit(i2), lit("0"), col("id").cast("string")))
      .withColumn("_hoodie_record_key", col("id").cast("string"))
      .withColumn("_hoodie_partition_path", lit("cat=a"))
      .withColumn("_hoodie_file_name", lit("pq-block"))
      .select(morSchema.fieldNames.map(col).toIndexedSeq: _*)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val pqFile = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val content = Files.readAllBytes(pqFile.toPath)
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i1.log.1_1-0-1",
      Seq(HudiLogFormat.LogBlock(HudiLogFormat.ParquetDataBlock,
        Map(HudiLogFormat.InstantTime -> i2,
          HudiLogFormat.SchemaKey -> HudiMor.avroSchemaJson(morSchema)),
        content)))
    deltaCommitInstant(root, i2)
    val got = HudiInterop.read(spark, root)
      .select(col("id"), col("v")).as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 1.0), (2L, 9.0)), got.toString)
    // hfile data blocks still refuse by name
    val i3 = "20240403010101333"
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i1.log.2_1-0-1",
      Seq(HudiLogFormat.LogBlock(HudiLogFormat.HFileDataBlock,
        Map(HudiLogFormat.InstantTime -> i3), Array[Byte](1, 2, 3))))
    deltaCommitInstant(root, i3)
    val e = intercept[Exception](HudiInterop.read(spark, root).collect())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("unsupported log block type 4"), s"$e")
  }

  test("foreign MOR: additive log-side schema evolution serves; type change refuses") {
    val root = Files.createTempDirectory("graft-hudi-mor-evo").toFile.getAbsolutePath
    writeProps(root, Map("hoodie.table.type" -> "MERGE_ON_READ"))
    val i1 = "20240501010101111"
    plantSlice(root, "cat=a", fidM1, "1-1-1", i1,
      Seq((1L, "a", 1.0), (2L, "a", 2.0)))
    deltaCommitInstant(root, i1)
    // a log block whose schema ADDS column w (strict additive superset)
    val i2 = "20240502010101222"
    val evolved = org.apache.spark.sql.types.StructType(morSchema.fields :+
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.DoubleType))
    val evoJson = HudiMor.avroSchemaJson(evolved)
    val evoSchema = new org.apache.avro.Schema.Parser().parse(evoJson)
    val rec = new org.apache.avro.generic.GenericData.Record(evoSchema)
    rec.put("_hoodie_commit_time", i2)
    rec.put("_hoodie_commit_seqno", s"${i2}_0_2")
    rec.put("_hoodie_record_key", "2")
    rec.put("_hoodie_partition_path", "cat=a")
    rec.put("_hoodie_file_name", "evo-log")
    rec.put("id", 2L); rec.put("cat", "a"); rec.put("v", 9.0); rec.put("w", 7.5)
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i1.log.1_1-0-1",
      Seq(HudiLogFormat.LogBlock(HudiLogFormat.AvroDataBlock,
        Map(HudiLogFormat.InstantTime -> i2, HudiLogFormat.SchemaKey -> evoJson),
        HudiLogFormat.avroDataContent(Seq(
          HudiLogFormat.encodeAvro(evoSchema, rec))))))
    deltaCommitInstant(root, i2)
    val df = HudiInterop.read(spark, root)
    assert(df.schema.fieldNames.contains("w"), df.schema.treeString)
    val got = df.select(col("id"), col("v"), col("w"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set((1L, 1.0, None), (2L, 9.0, Some(7.5))), got.toString)
    // a TYPE-CHANGING block schema (v: double -> string) refuses by name
    val i3 = "20240503010101333"
    val retyped = org.apache.spark.sql.types.StructType(morSchema.fields.map(f =>
      if (f.name == "v") f.copy(dataType = org.apache.spark.sql.types.StringType)
      else f))
    val badJson = HudiMor.avroSchemaJson(retyped)
    val badSchema = new org.apache.avro.Schema.Parser().parse(badJson)
    val badRec = new org.apache.avro.generic.GenericData.Record(badSchema)
    badRec.put("_hoodie_commit_time", i3)
    badRec.put("_hoodie_commit_seqno", s"${i3}_0_1")
    badRec.put("_hoodie_record_key", "1")
    badRec.put("_hoodie_partition_path", "cat=a")
    badRec.put("_hoodie_file_name", "bad-log")
    badRec.put("id", 1L); badRec.put("cat", "a"); badRec.put("v", "oops")
    plantLogBlocks(root, "cat=a", s".${fidM1}_$i1.log.2_1-0-1",
      Seq(HudiLogFormat.LogBlock(HudiLogFormat.AvroDataBlock,
        Map(HudiLogFormat.InstantTime -> i3, HudiLogFormat.SchemaKey -> badJson),
        HudiLogFormat.avroDataContent(Seq(
          HudiLogFormat.encodeAvro(badSchema, badRec))))))
    deltaCommitInstant(root, i3)
    val e = intercept[IllegalArgumentException](HudiInterop.read(spark, root))
    assert(e.getMessage.contains("type-changing"), e.getMessage)
  }
}
