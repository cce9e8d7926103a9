package graft.sinks

import java.io.DataOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import HudiInterop.{MetaCols, MetaDir, Slice}
import HudiLogFormat.{AvroDataBlock, CommandBlock, DeleteBlock, LogBlock}

/** Hudi MERGE_ON_READ wire format: delta commits append AVRO/DELETE log
  * blocks ([[HudiLogFormat]]) beside the file group's base parquet, and
  * snapshot reads collapse base + log latest-wins — the other
  * `hoodie.datasource.write.table.type` the reference's Hudi job can be
  * configured with (`jobs/S3ToHudiStreamJob.scala`; COW is its
  * default). Write cost is O(update batch) regardless of partition
  * width — the trade the reference's README benchmarks against COW
  * upserts — and the read pays the merge.
  *
  * Mechanics, spec-pinned:
  *  - one log file per (file group, delta commit), named
  *    `.<fileId>_<baseInstant>.log.<version>_<writeToken>` (hidden);
  *    `baseInstant` binds it to the base slice it amends, `version`
  *    increments per append.
  *  - timeline: `<t>.deltacommit.requested` → `.deltacommit.inflight` →
  *    `.deltacommit`; blocks are INVISIBLE until their instant
  *    completes (crash debris never surfaces — Hudi's contract).
  *  - merge: per (partition, record key), the LATEST visible log block
  *    wins over earlier blocks and over base
  *    (OverwriteWithLatestAvroPayload, Hudi's default); DELETE blocks
  *    tombstone a key until a later upsert resurrects it; a rollback
  *    COMMAND block hides the blocks of its target instant.
  *  - compaction rewrites each group's merged rows as a new base slice
  *    under a `.commit` instant (Hudi's compaction action); stale log
  *    files fall off because they bind to the superseded base instant.
  *
  * Scale: the log scan distributes one task per file slice; only dirs
  * holding incoming keys take writes; the collapse window shuffles
  * (partition, key) — the same MOR read tax [[VersionedTable.upsertMOR]]
  * documents natively.
  */
object HudiMor {

  /** Hidden log-file name: `.<fileId>_<baseInstant>.log.<version>_<token>`. */
  private val LogName =
    "^\\.([0-9a-f-]{36}(?:-\\d+)?)_(\\d{14}(?:\\d{3})?)\\.log\\.(\\d+)_(.+)$".r

  private final case class LogFile(dir: String, fileId: String,
      baseInstant: String, version: Int, rel: String)

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logFiles(fs: FileSystem, path: String): Seq[LogFile] = {
    val rootQ = fs.makeQualified(new Path(path)).toString
    val out = scala.collection.mutable.ArrayBuffer[LogFile]()
    def walk(d: Path): Unit = fs.listStatus(d).foreach { st =>
      val rel = fs.makeQualified(st.getPath).toString.stripPrefix(rootQ + "/")
      if (st.isDirectory) { if (!rel.startsWith(MetaDir)) walk(st.getPath) }
      else st.getPath.getName match {
        case LogName(fileId, baseInstant, version, _) =>
          val dir = rel.split("/").dropRight(1).mkString("/")
          out += LogFile(dir, fileId, baseInstant, version.toInt, rel)
        case _ => ()
      }
    }
    walk(new Path(path))
    out.toSeq
  }

  private def completed(fs: FileSystem, path: String,
      asOf: Option[String]): Set[String] =
    (HudiInterop.timelineInstants(fs, path, ".commit") ++
      HudiInterop.timelineInstants(fs, path, ".deltacommit"))
      .filter(i => asOf.forall(i <= _)).toSet

  // ---- avro <-> spark rows ----

  /** Avro schema for the log records: the table columns (meta + data),
    * every field a nullable union. Types beyond the engine's Hudi
    * surface refuse by NAME — a silently mis-encoded column would
    * corrupt every downstream reader.
    */
  private[sinks] def avroSchemaJson(st: StructType): String = {
    def atype(dt: DataType): String = dt match {
      case StringType => "\"string\""
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case BooleanType => "\"boolean\""
      case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
      case TimestampNTZType => "{\"type\":\"long\",\"logicalType\":\"local-timestamp-micros\"}"
      case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
      case other => throw new IllegalArgumentException(
        s"HudiMor: column type ${other.catalogString} has no avro log encoding here")
    }
    st.fields.map(f => s"""{"name":"${f.name}","type":["null",${atype(f.dataType)}],"default":null}""")
      .mkString(
        """{"type":"record","name":"graft_hudi_record","namespace":"graft","fields":[""",
        ",", "]}")
  }

  /** External Row value -> avro value, keyed on the Spark type. */
  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (t: java.sql.Timestamp, TimestampType) =>
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    case (t: java.time.Instant, TimestampType) =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (t: java.time.LocalDateTime, TimestampNTZType) =>
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (x, _) => x
  }

  /** Avro value -> external Row value. */
  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (micros: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue()))
    case (micros: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (x, _) => x
  }

  /** Live bytes for planner statistics: latest committed base slices +
    * every log file bound to them (conservative upper bound of the
    * merged size — over-estimating can only withhold a broadcast,
    * never mis-grant one). One FS walk, zero data IO.
    */
  private[sinks] def liveBytes(spark: SparkSession, path: String): Long = {
    val fs = fsFor(spark, path)
    val visible = completed(fs, path, None)
    val bases = HudiInterop.slices(fs, path)
      .filter(s => visible.contains(s.instant))
      .groupBy(s => (s.dir, s.fileId))
      .map { case (_, ss) => ss.maxBy(_.instant) }.toSeq
    val baseKeys = bases.map(s => ((s.dir, s.fileId), s.instant)).toMap
    val logs = logFiles(fs, path)
      .filter(l => baseKeys.get((l.dir, l.fileId)).contains(l.baseInstant))
    (bases.map(_.rel) ++ logs.map(_.rel))
      .map(r => fs.getFileStatus(new Path(s"$path/$r")).getLen).sum
  }

  /** The live file inventory for the `files` inspection table: latest
    * committed base slice per group plus every log file bound to it
    * (rel path, partition dir, fileId, instant — a log file reports its
    * binding base instant).
    */
  private[sinks] def liveFileInventory(spark: SparkSession,
      path: String): Seq[(String, String, String, String)] = {
    val fs = fsFor(spark, path)
    val visible = completed(fs, path, None)
    val bases = HudiInterop.slices(fs, path)
      .filter(s => visible.contains(s.instant))
      .groupBy(s => (s.dir, s.fileId))
      .map { case (_, ss) => ss.maxBy(_.instant) }.toSeq
    val baseKeys = bases.map(s => ((s.dir, s.fileId), s.instant)).toMap
    val logs = logFiles(fs, path)
      .filter(l => baseKeys.get((l.dir, l.fileId)).contains(l.baseInstant))
    bases.map(s => (s.rel, s.dir, s.fileId, s.instant)) ++
      logs.map(l => (l.rel, l.dir, l.fileId, l.baseInstant))
  }

  // ---- snapshot read ----

  /** Merged snapshot (base + visible log records collapsed), meta
    * columns included — same surface as the COW [[HudiInterop.read]].
    */
  def read(spark: SparkSession, path: String,
      asOf: Option[String] = None): DataFrame = {
    val fs = fsFor(spark, path)
    HudiInterop.requireV6Timeline(fs, path)
    val visible = completed(fs, path, asOf)
    require(visible.nonEmpty, s"no completed commits in $path (asOf=$asOf)")
    val bases = HudiInterop.slices(fs, path)
      .filter(s => visible.contains(s.instant))
      .groupBy(s => (s.dir, s.fileId))
      .map { case (_, ss) => ss.maxBy(_.instant) }.toSeq
    val logsByGroup = logFiles(fs, path).groupBy(l => (l.dir, l.fileId))
    // a log-only file group (no committed base) is a writer shape this
    // engine does not produce (inserts bootstrap base slices) and
    // cannot order against — refuse rather than dropping its records
    val baseGroups = bases.map(s => (s.dir, s.fileId)).toSet
    val orphans = logsByGroup.keys.filterNot(baseGroups.contains)
    require(orphans.isEmpty,
      s"HudiMor: log files without a committed base slice for group(s) " +
        s"${orphans.take(3).mkString(", ")} — log-only file groups " +
        "(index-backed inserts to logs) are not served here")
    val baseDf = spark.read.option("mergeSchema", "true")
      .parquet(bases.map(s => s"$path/${s.rel}"): _*)
    val schema = baseDf.schema
    val tasks: Seq[(String, Seq[String])] = bases.map { s =>
      val logs = logsByGroup.getOrElse((s.dir, s.fileId), Nil)
        .filter(_.baseInstant == s.instant).sortBy(_.version)
      (s.rel, logs.map(_.rel))
    }.filter(_._2.nonEmpty)
    if (tasks.isEmpty) return baseDf

    val sconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val root = path
    val visibleB = visible
    val schemaB = schema
    // one task per slice-with-logs: parse its log files in (version,
    // block) order, apply rollback commands, emit (row values, seq,
    // tombstone) — distribution scales with slice count, never a
    // driver-side byte
    val logRows = spark.sparkContext
      .parallelize(tasks, math.min(tasks.size, 256).max(1))
      .flatMap { case (baseRel, logRels) =>
        val fsx = new Path(root).getFileSystem(sconf.value)
        val blocks: Seq[(LogBlock, String)] = logRels.flatMap { rel =>
          HudiLogFormat.readBlocks(fsx, new Path(s"$root/$rel")).map(b => (b, rel))
        }
        val rolledBack: Set[String] = blocks.collect {
          case (b, _) if b.blockType == CommandBlock =>
            b.header.getOrElse(HudiLogFormat.TargetInstantTime, "")
        }.filter(_.nonEmpty).toSet
        def liveInstant(b: LogBlock): Boolean = {
          val t = b.header.getOrElse(HudiLogFormat.InstantTime, "")
          visibleB.contains(t) && !rolledBack.contains(t)
        }
        val dirOfBase = baseRel.split("/").dropRight(1).mkString("/")
        blocks.zipWithIndex.flatMap {
          case ((b, _), _) if b.blockType == CommandBlock => Nil
          case ((b, rel), seq) if b.blockType == AvroDataBlock && liveInstant(b) =>
            val recs = HudiLogFormat.avroDataRecords(b, rel)
            val blockFields = recs.headOption.map(_.getSchema).map { s =>
              import scala.jdk.CollectionConverters._
              s.getFields.asScala.map(_.name).toSet
            }.getOrElse(Set.empty)
            val unknown = blockFields -- schemaB.fieldNames.toSet
            require(unknown.isEmpty,
              s"HudiMor: log block in $rel carries column(s) " +
                s"${unknown.take(3).mkString(", ")} absent from the base " +
                "schema — log-side schema evolution is not served here")
            recs.map { r =>
              val vals = schemaB.fields.map { f =>
                val avroField = r.getSchema.getField(f.name)
                if (avroField == null) null
                else fromAvro(r.get(f.name), f.dataType)
              }
              Row.fromSeq(vals.toIndexedSeq :+ seq.toLong :+ false)
            }
          case ((b, rel), seq) if b.blockType == DeleteBlock && liveInstant(b) =>
            HudiLogFormat.deleteRecords(b, rel).map { d =>
              val vals = schemaB.fields.map { f =>
                if (f.name == "_hoodie_record_key") d.recordKey
                else if (f.name == "_hoodie_partition_path")
                  Option(d.partitionPath).filter(_.nonEmpty).getOrElse(dirOfBase)
                else null
              }
              Row.fromSeq(vals.toIndexedSeq :+ seq.toLong :+ true)
            }
          case ((b, _), _) if !liveInstant(b) &&
              (b.blockType == AvroDataBlock || b.blockType == DeleteBlock) => Nil
          case ((b, rel), _) => throw new IllegalArgumentException(
            s"HudiMor: unsupported log block type ${b.blockType} in $rel — " +
              "only avro-data (3), delete (1), and command (0) blocks are " +
              "served; hfile/parquet/cdc data blocks refuse rather than " +
              "resurrect overwritten rows")
        }
      }
    val logSchema = StructType(schema.fields :+
      StructField("__seq", LongType) :+ StructField("__del", BooleanType))
    val logDf = spark.createDataFrame(logRows, logSchema)
    val unioned = baseDf
      .withColumn("__seq", lit(-1L)).withColumn("__del", lit(false))
      .unionByName(logDf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_hoodie_partition_path"), col("_hoodie_record_key"))
      .orderBy(col("__seq").desc)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .filter(!col("__del"))
      .drop("__seq", "__del", "__rn")
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  // ---- delta-commit writers ----

  private def requireMor(fs: FileSystem, path: String, what: String): Unit = {
    require(HudiInterop.tableType(fs, path) == "MERGE_ON_READ",
      s"HudiMor: $what targets a MERGE_ON_READ table; this one is " +
        s"${HudiInterop.tableType(fs, path)} (use HudiInterop.upsert for COW)")
    HudiInterop.requireV6Timeline(fs, path)
  }

  private def ensureMorTable(fs: FileSystem, path: String, tableName: String): Unit = {
    val props = new Path(s"$path/$MetaDir/hoodie.properties")
    if (!fs.exists(props)) {
      fs.mkdirs(props.getParent)
      HudiInterop.writeFile(fs, props,
        s"""#Properties saved on table creation
           |hoodie.table.name=$tableName
           |hoodie.table.type=MERGE_ON_READ
           |hoodie.table.version=6
           |hoodie.timeline.layout.version=1
           |hoodie.datasource.write.hive_style_partitioning=true
           |hoodie.populate.meta.fields=true
           |""".stripMargin)
    }
  }

  private def allInstants(fs: FileSystem, path: String): Seq[String] =
    Seq(".commit", ".commit.requested", ".deltacommit", ".deltacommit.requested",
      ".clean", ".restore")
      .flatMap(HudiInterop.timelineInstants(fs, path, _))

  /** Keyed MOR upsert: rows for partition dirs WITHOUT a live file
    * group bootstrap base slices (their own deltacommit); rows for
    * existing groups append ONE avro log block per group under a
    * second deltacommit. Returns the last instant written. Within the
    * batch, (key, precombine) latest-wins
    * ([[HudiInterop.precombineBatch]]); ACROSS commits the later
    * delta commit wins on read — Hudi's default
    * OverwriteWithLatestAvroPayload.
    */
  def upsert(df: DataFrame, path: String, recordKey: String,
      precombine: String, partitionBy: Seq[String] = Nil,
      tableName: String = "graft_table"): String = {
    val spark = df.sparkSession
    val fs = fsFor(spark, path)
    HudiInterop.keyCols(recordKey).foreach(k => require(
      df.schema.fieldNames.contains(k), s"missing key col $k"))
    require(df.schema.fieldNames.contains(precombine), s"missing precombine $precombine")
    ensureMorTable(fs, path, tableName)
    requireMor(fs, path, "upsert")
    val batch = HudiInterop.precombineBatch(df, recordKey, precombine)
      .withColumn("__dir", HudiInterop.hivePath(partitionBy))
    val visible = completed(fs, path, None)
    val liveBase = HudiInterop.slices(fs, path)
      .filter(s => visible.contains(s.instant))
      .groupBy(s => (s.dir, s.fileId))
      .map { case (_, ss) => ss.maxBy(_.instant) }.toSeq
    val liveDirs = liveBase.map(_.dir).toSet
    val batchDirs = batch.select(col("__dir")).distinct()
      .collect().map(_.getString(0)).toSet
    val freshDirs = batchDirs -- liveDirs
    var last: String = null
    if (freshDirs.nonEmpty) {
      val fresh = batch.filter(col("__dir").isin(freshDirs.toSeq: _*)).drop("__dir")
      last = HudiInterop.commitSlices(fresh, path, recordKey, precombine,
        partitionBy, tableName, carryOver = None, action = "deltacommit")
    }
    val updateDirs = batchDirs intersect liveDirs
    if (updateDirs.nonEmpty) {
      val updates = batch.filter(col("__dir").isin(updateDirs.toSeq: _*))
      last = appendLogCommit(updates, path, recordKey, liveBase, logBlockFor = {
        (schemaJson, rows, instant, stamped) =>
          val schema = new Schema.Parser().parse(schemaJson)
          val recs = rows.map { r =>
            val rec = new GenericData.Record(schema)
            stamped.fields.foreach { f =>
              rec.put(f.name, toAvro(r.getAs[Any](f.name), f.dataType))
            }
            HudiLogFormat.encodeAvro(schema, rec)
          }
          LogBlock(AvroDataBlock,
            Map(HudiLogFormat.InstantTime -> instant,
              HudiLogFormat.SchemaKey -> schemaJson),
            HudiLogFormat.avroDataContent(recs))
      })
    }
    require(last != null, "HudiMor.upsert: empty batch")
    last
  }

  /** Keyed MOR delete: `keys` must carry the record-key columns (and
    * the partition columns when the table is partitioned — Hudi deletes
    * are (key, partition) pairs). Appends one DELETE block per affected
    * file group; keys in partitions without a group are no-ops.
    */
  def delete(keys: DataFrame, path: String, recordKey: String,
      partitionBy: Seq[String] = Nil): String = {
    val spark = keys.sparkSession
    val fs = fsFor(spark, path)
    requireMor(fs, path, "delete")
    val visible = completed(fs, path, None)
    val liveBase = HudiInterop.slices(fs, path)
      .filter(s => visible.contains(s.instant))
      .groupBy(s => (s.dir, s.fileId))
      .map { case (_, ss) => ss.maxBy(_.instant) }.toSeq
    val liveDirs = liveBase.map(_.dir).toSet
    val batch = keys
      .withColumn("__dir", HudiInterop.hivePath(partitionBy))
      .withColumn("__key", HudiInterop.keyStringExpr(recordKey))
      .select(col("__dir"), col("__key")).distinct()
      .filter(col("__dir").isin(liveDirs.toSeq: _*))
    appendLogCommit(batch, path, recordKey, liveBase, logBlockFor = {
      (_, rows, instant, _) =>
        LogBlock(DeleteBlock,
          Map(HudiLogFormat.InstantTime -> instant),
          HudiLogFormat.deleteContent(rows.map(r =>
            HudiLogFormat.DeleteRecord(r.getAs[String]("__key"),
              r.getAs[String]("__dir")))))
    }, stampMeta = false)
  }

  /** Shared delta-commit tail for [[upsert]] log blocks and [[delete]]
    * tombstone blocks: stamps meta columns (upserts), resolves each
    * dir's (fileId, baseInstant, next log version) on the driver, then
    * writes ONE log file per file group from the executors — the write
    * distributes one task per affected dir, never a driver byte.
    */
  private def appendLogCommit(batch: DataFrame, path: String, recordKey: String,
      liveBase: Seq[Slice],
      logBlockFor: (String, Seq[Row], String, StructType) => LogBlock,
      stampMeta: Boolean = true): String = {
    val spark = batch.sparkSession
    val fs = fsFor(spark, path)
    val batchDirs = batch.select(col("__dir")).distinct()
      .collect().map(_.getString(0)).toSet
    require(batchDirs.nonEmpty, "HudiMor: empty delta-commit batch")
    val instant = HudiInterop.nextInstant(allInstants(fs, path))
    HudiInterop.writeFile(fs,
      new Path(s"$path/$MetaDir/$instant.deltacommit.requested"), "")
    HudiInterop.writeFile(fs,
      new Path(s"$path/$MetaDir/$instant.deltacommit.inflight"), "{}")
    // only the dirs the batch touches take a log file (and stats entry)
    val groupByDir: Map[String, Slice] = liveBase
      .filter(s => batchDirs.contains(s.dir)).groupBy(_.dir).map {
        case (d, Seq(one)) => d -> one
        case (d, many) => throw new IllegalArgumentException(
          s"HudiMor: partition dir '$d' holds ${many.size} live file groups; " +
            "this writer maintains one group per dir — compact first")
      }
    val existingLogs = logFiles(fs, path)
      .groupBy(l => (l.dir, l.fileId, l.baseInstant))
      .map { case (k, ls) => k -> ls.map(_.version).max }
    val logNameByDir: Map[String, String] = groupByDir.map { case (d, s) =>
      val v = existingLogs.getOrElse((d, s.fileId, s.instant), 0) + 1
      d -> s".${s.fileId}_${s.instant}.log.${v}_0-0-0"
    }
    // dir -> log file name as a literal map so the stamp stays codegen'd
    val logNameExpr = {
      val mapping = logNameByDir.toSeq.flatMap { case (d, n) => Seq(lit(d), lit(n)) }
      map(mapping: _*)(col("__dir"))
    }
    val stamped =
      if (!stampMeta) batch
      else batch
        .withColumn("_hoodie_commit_time", lit(instant))
        .withColumn("_hoodie_commit_seqno",
          concat_ws("_", lit(instant), lit("0"),
            pmod(xxhash64(HudiInterop.keyStringExpr(recordKey)), lit(1000000L))
              .cast("string")))
        .withColumn("_hoodie_record_key", HudiInterop.keyStringExpr(recordKey))
        .withColumn("_hoodie_partition_path", col("__dir"))
        .withColumn("_hoodie_file_name", logNameExpr)
    val dataCols = stamped.columns.filterNot(c => c.startsWith("__"))
    val recordSchema = StructType(stamped.schema.fields
      .filter(f => dataCols.contains(f.name)))
    val schemaJson =
      if (stampMeta) avroSchemaJson(recordSchema) else ""
    val sconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val root = path
    val logNames = logNameByDir
    val blockFor = logBlockFor
    val stampedSchema = recordSchema
    stamped.repartition(col("__dir")).foreachPartition {
      (it: Iterator[Row]) =>
        it.toSeq.groupBy(_.getAs[String]("__dir")).foreach { case (dir, rows) =>
          val name = logNames.getOrElse(dir, throw new IllegalStateException(
            s"HudiMor: no live file group resolved for dir '$dir'"))
          val fsx = new Path(root).getFileSystem(sconf.value)
          val dirPath = if (dir.isEmpty) new Path(root) else new Path(s"$root/$dir")
          val block = blockFor(schemaJson, rows, instant, stampedSchema)
          // overwrite=true: a retried task rewrites the same (slice,
          // version) file idempotently; visibility is commit-gated
          val out = new DataOutputStream(fsx.create(new Path(dirPath, name), true))
          try HudiLogFormat.writeBlock(out, block) finally out.close()
        }
    }
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val statsJson = JObject("partitionToWriteStats" -> JObject(
      logNameByDir.toList.sortBy(_._1).map { case (d, n) =>
        d -> (JArray(JObject("fileId" -> JString(groupByDir(d).fileId),
          "path" -> JString(if (d.isEmpty) n else s"$d/$n")) :: Nil): JValue)
      }) :: ("operation" -> (JString("UPSERT"): JValue)) :: Nil)
    HudiInterop.writeFile(fs, new Path(s"$path/$MetaDir/$instant.deltacommit"),
      JsonMethods.pretty(JsonMethods.render(statsJson)))
    fs.delete(new Path(s"$path/$MetaDir/$instant.deltacommit.inflight"), false)
    fs.delete(new Path(s"$path/$MetaDir/$instant.deltacommit.requested"), false)
    instant
  }

  /** Compaction: materialize each file group's merged rows as a NEW
    * base slice (same fileId, fresh instant) under a `.commit` — Hudi's
    * compaction action. Record meta columns are PRESERVED (carried
    * rows keep their commit time, so incremental pulls stay exact);
    * superseded log files fall out of reads because they bind to the
    * old base instant. Returns the compaction instant.
    */
  def compact(spark: SparkSession, path: String,
      partitionBy: Seq[String] = Nil): String = {
    val fs = fsFor(spark, path)
    requireMor(fs, path, "compact")
    val merged = read(spark, path)
      .withColumn("__is_incoming", lit(0))
    // recordKey/precombine spelled through the already-stamped meta
    // columns: keyStringExpr(_hoodie_record_key) is the identity and
    // carryOver preserves every record's original meta values
    HudiInterop.commitSlices(merged, path,
      recordKey = "_hoodie_record_key", precombine = "_hoodie_commit_time",
      partitionBy = partitionBy, tableName = "graft_table",
      carryOver = Some(()), action = "commit", allowMor = true)
  }

  /** Driver-checked MOR round trip: orders bootstrap base slices
    * (deltacommit 1), a doubled-price slice lands as AVRO LOG BLOCKS
    * (deltacommit 2 — no base rewrite), every `% 7` key lands as a
    * DELETE block (deltacommit 3), and one frame reads the merged
    * snapshot totals plus the as-of-bootstrap totals — base + log +
    * tombstone collapse and time travel under one DuckDB hash gate.
    */
  def hudiMorRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val out = graft.Scratch.dir("graft-hudi-mor") + "/orders_mor"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
    val i1 = upsert(orders, out, recordKey = "o_orderkey",
      precombine = "o_orderdate", partitionBy = Seq("o_orderstatus"))
    upsert(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      out, recordKey = "o_orderkey", precombine = "o_orderdate",
      partitionBy = Seq("o_orderstatus"))
    delete(orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus")),
      out, recordKey = "o_orderkey", partitionBy = Seq("o_orderstatus"))
    val snap = HudiInterop.read(spark, out) // dispatches through HudiMor
    val latest = snap.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"))
    val asOf1 = read(spark, out, asOf = Some(i1)).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows_v1"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price_v1"))
    latest.join(asOf1, "o_orderstatus")
      .select(col("o_orderstatus"), col("n_rows"), col("sum_price"),
        col("n_rows_v1"), col("sum_price_v1"))
      .orderBy(col("o_orderstatus"))
  }

  val ops: Seq[graft.Op] = Seq(
    graft.Op("q_hudi_mor", hudiMorRoundTrip,
      Some("""
        WITH merged AS (
          SELECT o_orderstatus,
                 CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE NOT (o_orderkey % 7 = 0)),
        latest AS (
          SELECT o_orderstatus, count(*) AS n_rows,
                 cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
          FROM merged GROUP BY o_orderstatus),
        v1 AS (
          SELECT o_orderstatus, count(*) AS n_rows_v1,
                 cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price_v1
          FROM orders GROUP BY o_orderstatus)
        SELECT o_orderstatus, n_rows, sum_price, n_rows_v1, sum_price_v1
        FROM latest JOIN v1 USING (o_orderstatus)
        ORDER BY o_orderstatus""")))
}
