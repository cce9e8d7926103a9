package graft.sinks

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Iceberg v1 WIRE-FORMAT interop, from scratch against the public
  * table spec (iceberg.apache.org/spec) — no iceberg-spark runtime:
  * an Iceberg table is JSON table metadata (`metadata/vN.metadata.json`
  * + `version-hint.text`, the HadoopTables convention the reference's
  * `S3ToIcebergStreamJob.scala` uses), an avro MANIFEST LIST per
  * snapshot, avro MANIFEST files enumerating data files, and plain
  * parquet data. Avro ships with Spark, so all of it is writable here.
  *
  * What's implemented (spec-pinned): v1 metadata with schema field-ids,
  * snapshot log + parent lineage, append and overwrite commits (append
  * carries prior manifests forward in the new manifest list — the
  * spec's manifest reuse), time travel by snapshot-id, and the
  * `schema.name-mapping.default` property that lets REAL Iceberg
  * readers resolve Spark-written parquet (which has no embedded
  * field-ids) by column name — the spec's documented interop path for
  * foreign files. IDENTITY partition specs are emitted when
  * `partitionBy` is set: the spec's partition fields (field-ids
  * 1000+), a typed partition record per manifest entry, and
  * manifest-level partition pruning in [[readWhere]] (partition
  * values prune as exact min=max bounds through the same
  * [[FileStats]] evaluator as column stats). Data files KEEP the
  * identity source columns — the layout real Iceberg writers produce,
  * so readers never need metadata constants. Non-identity transforms
  * (day/bucket/truncate) stay with graft's native hidden
  * partitioning in [[PartitionTransforms]] / [[VersionedTable]].
  *
  * Scale: a commit appends one manifest + one manifest list + one
  * metadata JSON regardless of table size; reads resolve files from
  * manifests only (no listing).
  */
object IcebergInterop {

  private implicit val formats: Formats = DefaultFormats

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeFile(fs: FileSystem, p: Path, body: Array[Byte]): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(body) finally out.close()
  }

  // ---- schema: Spark <-> Iceberg JSON (field-ids assigned by position) ----

  private def icebergType(dt: DataType): JValue = dt match {
    case LongType => JString("long")
    case IntegerType => JString("int")
    case DoubleType => JString("double")
    case FloatType => JString("float")
    case StringType => JString("string")
    case BooleanType => JString("boolean")
    case DateType => JString("date")
    case TimestampType => JString("timestamptz")
    case TimestampNTZType => JString("timestamp")
    case d: DecimalType => JString(s"decimal(${d.precision}, ${d.scale})")
    case BinaryType => JString("binary")
    case other => throw new IllegalArgumentException(
      s"IcebergInterop: unsupported type ${other.simpleString} (flat primitive " +
        "schemas only — nested types are out of this module's scope)")
  }

  private def sparkType(t: String): DataType = t match {
    case "long" => LongType
    case "int" => IntegerType
    case "double" => DoubleType
    case "float" => FloatType
    case "string" => StringType
    case "boolean" => BooleanType
    case "date" => DateType
    case "timestamptz" => TimestampType
    case "timestamp" => TimestampNTZType
    case "binary" => BinaryType
    case d if d.startsWith("decimal") =>
      val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")").split(",\\s*")
      DecimalType(p.toInt, s.toInt)
    case other => throw new IllegalArgumentException(
      s"IcebergInterop: unsupported Iceberg type $other")
  }

  private def schemaJson(schema: StructType, schemaId: Int = 0): JObject = JObject(
    "type" -> JString("struct"),
    "schema-id" -> JInt(schemaId),
    // field-ids are POSITIONAL (1..n) — additive evolution only ever
    // appends fields, so existing ids stay stable and old manifests'
    // id-keyed stats remain valid
    "fields" -> JArray(schema.fields.zipWithIndex.toList.map { case (f, i) =>
      JObject("id" -> JInt(i + 1), "name" -> JString(f.name),
        "required" -> JBool(!f.nullable), "type" -> icebergType(f.dataType))
    }))

  private def nameMapping(schema: StructType): String =
    JsonMethods.compact(JsonMethods.render(JArray(
      schema.fields.zipWithIndex.toList.map { case (f, i) =>
        JObject("field-id" -> JInt(i + 1),
          "names" -> JArray(List(JString(f.name))))
      })))

  private def schemaFromJson(v: JValue): StructType = StructType(
    (v \ "fields").extract[List[JValue]].map { f =>
      // v3 default values: a field with a non-null initial-default must
      // surface that value for files written before the column existed
      // — returning null instead would be silently wrong, so refuse
      (f \ "initial-default") match {
        case JNothing | JNull => ()
        case d => throw new IllegalArgumentException(
          s"IcebergInterop: column ${(f \ "name").extract[String]} carries " +
            s"a v3 initial-default ($d) this reader does not apply")
      }
      StructField((f \ "name").extract[String],
        sparkType((f \ "type").extract[String]),
        nullable = !(f \ "required").extract[Boolean])
    })

  /** The metadata's CURRENT schema: real writers append evolved schemas
    * to the `schemas` list and point `current-schema-id` at the live
    * one — reading `schemas[0]` unconditionally would resurrect the
    * original schema on any foreign table that ever evolved. Falls back
    * to the head for graft-written (single-schema) metadata.
    */
  private def currentSchemaJson(meta: JValue): JValue = {
    val schemas = (meta \ "schemas").extractOrElse[List[JValue]](Nil)
    (meta \ "current-schema-id").extractOpt[Int]
      .flatMap(id => schemas.find(s => (s \ "schema-id").extractOpt[Int].contains(id)))
      .orElse(schemas.headOption)
      // v1 writers may carry only the singular `schema` field (the
      // `schemas` list arrived with v2) — fall back before refusing
      .orElse(Some(meta \ "schema").filter(_ != JNothing))
      .getOrElse(throw new IllegalArgumentException(
        "IcebergInterop: metadata carries neither a schemas list nor a schema field"))
  }

  private def currentSchema(meta: JValue): StructType =
    schemaFromJson(currentSchemaJson(meta))

  /** field-id → column name for the current schema — how an equality
    * delete's `equality_ids` resolve to join columns.
    */
  private def fieldIdToName(meta: JValue): Map[Int, String] =
    (currentSchemaJson(meta) \ "fields").extract[List[JValue]].map { f =>
      (f \ "id").extract[Int] -> (f \ "name").extract[String]
    }.toMap

  // ---- avro manifest shapes (field-id props per the spec) ----

  /** Avro type for an identity partition field. The supported set is
    * the types whose `cast(string)` round-trips exactly (the staging
    * dir token) — timestamps/decimals/binary must go through graft's
    * native hidden partitioning instead.
    */
  private def avroPartType(dt: DataType): String = dt match {
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case DoubleType => "\"double\""
    case FloatType => "\"float\""
    case StringType => "\"string\""
    case BooleanType => "\"boolean\""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case other => throw new IllegalArgumentException(
      s"IcebergInterop: identity partitioning on ${other.simpleString} is not " +
        "supported (int/long/double/float/string/boolean/date only)")
  }

  /** The manifest-entry schema with the table's typed partition record
    * (r102). Unpartitioned tables get the empty record, exactly the
    * pre-partitioning wire shape.
    */
  private def manifestEntrySchema(partFields: Seq[StructField]): org.apache.avro.Schema = {
    val pf = partFields.zipWithIndex.map { case (f, i) =>
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"IcebergInterop: partition column ${f.name} is not an avro-safe name")
      s"""{"name":"${f.name}","type":["null",${avroPartType(f.dataType)}],""" +
        s""""default":null,"field-id":${1000 + i}}"""
    }.mkString(",")
    new org.apache.avro.Schema.Parser().parse(
      ManifestEntryTemplate.replace("\"__PART_FIELDS__\"", pf))
  }

  private val ManifestEntryTemplate =
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":["__PART_FIELDS__"]}},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        {"name":"block_size_in_bytes","type":"long","field-id":105},
        {"name":"value_counts","field-id":109,"default":null,"type":["null",
          {"type":"array","logicalType":"map","items":{"type":"record","name":"k119_v120","fields":[
            {"name":"key","type":"int","field-id":119},
            {"name":"value","type":"long","field-id":120}]}}]},
        {"name":"null_value_counts","field-id":110,"default":null,"type":["null",
          {"type":"array","logicalType":"map","items":{"type":"record","name":"k121_v122","fields":[
            {"name":"key","type":"int","field-id":121},
            {"name":"value","type":"long","field-id":122}]}}]},
        {"name":"lower_bounds","field-id":125,"default":null,"type":["null",
          {"type":"array","logicalType":"map","items":{"type":"record","name":"k126_v127","fields":[
            {"name":"key","type":"int","field-id":126},
            {"name":"value","type":"bytes","field-id":127}]}}]},
        {"name":"upper_bounds","field-id":128,"default":null,"type":["null",
          {"type":"array","logicalType":"map","items":{"type":"record","name":"k129_v130","fields":[
            {"name":"key","type":"int","field-id":129},
            {"name":"value","type":"bytes","field-id":130}]}}]}
      ]}}
    ]}""".replace("\n", "")

  // ---- the spec's single-value serialization (Appendix D) for bounds ----

  private def boundBytes(v: Any, dt: DataType): Option[java.nio.ByteBuffer] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case IntegerType => Some(le(4).putInt(v.asInstanceOf[Int]).flip())
      case LongType => Some(le(8).putLong(v.asInstanceOf[Long]).flip())
      case FloatType => Some(le(4).putFloat(v.asInstanceOf[Float]).flip())
      case DoubleType => Some(le(8).putDouble(v.asInstanceOf[Double]).flip())
      case DateType => Some(le(4).putInt(v.asInstanceOf[Int]).flip())
      case TimestampType | TimestampNTZType =>
        Some(le(8).putLong(v.asInstanceOf[Long]).flip())
      case StringType =>
        Some(java.nio.ByteBuffer.wrap(v.toString.getBytes(StandardCharsets.UTF_8)))
      case _ => None // decimal/binary bounds out of scope — never pruned on
    }
  }

  private def boundValue(b: java.nio.ByteBuffer, dt: DataType): Option[Any] = {
    import java.nio.ByteOrder
    val buf = b.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case IntegerType | DateType if buf.remaining() == 4 => Some(buf.getInt)
      case LongType | TimestampType | TimestampNTZType if buf.remaining() == 8 =>
        Some(buf.getLong)
      case FloatType if buf.remaining() == 4 => Some(buf.getFloat)
      case DoubleType if buf.remaining() == 8 => Some(buf.getDouble)
      case StringType =>
        val arr = new Array[Byte](buf.remaining()); buf.get(arr)
        Some(org.apache.spark.unsafe.types.UTF8String.fromBytes(arr))
      case _ => None
    }
  }

  private val ManifestFileSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":["null","int"],"default":null,"field-id":517},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":515},
      {"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503},
      {"name":"added_data_files_count","type":["null","int"],"default":null,"field-id":504},
      {"name":"existing_data_files_count","type":["null","int"],"default":null,"field-id":505},
      {"name":"deleted_data_files_count","type":["null","int"],"default":null,"field-id":506}
    ]}""".replace("\n", ""))

  private[sinks] final case class DataFileRef(path: String, records: Long, bytes: Long,
      partValues: Seq[Option[String]] = Nil)

  /** Manifest-list record with the v2 fields stamped. `addedSnapshotId`
    * is boxed because carried foreign records may hold null.
    */
  private def listEntryRecord(path: String, len: Long,
      addedSnapshotId: java.lang.Long, content: Int, seq: Long): GenericRecord = {
    val r = new GenericData.Record(ManifestFileSchema)
    r.put("manifest_path", path)
    r.put("manifest_length", len)
    r.put("partition_spec_id", 0)
    r.put("content", content)
    r.put("sequence_number", seq)
    r.put("added_snapshot_id", addedSnapshotId)
    r
  }

  /** content of a manifest-list record: null/absent (v1) reads as 0 = data. */
  private def listContentOf(r: GenericRecord): Int =
    r.getSchema.getField("content") match {
      case null => 0
      case _ => Option(r.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
    }

  /** sequence number of a manifest-list record: null/absent (v1) is 0. */
  private def listSeqOf(r: GenericRecord): Long =
    r.getSchema.getField("sequence_number") match {
      case null => 0L
      case _ => Option(r.get("sequence_number")).map(_.asInstanceOf[Long]).getOrElse(0L)
    }

  /** Data sequence of a manifest ENTRY: the spec's inheritance rule —
    * an explicit entry-level `sequence_number` (or, for v2 rewritten
    * manifests, `file_sequence_number`) wins; null/absent inherits the
    * manifest-list record's sequence. Ignoring the entry level would
    * inflate EXISTING entries carried into a compacted manifest to the
    * NEW manifest's sequence and silently skip the position deletes
    * that legitimately target them.
    */
  private def entrySeqOf(e: GenericRecord, inherited: Long): Long = {
    def field(name: String): Option[Long] =
      e.getSchema.getField(name) match {
        case null => None
        case _ => Option(e.get(name)).map(_.asInstanceOf[Long])
      }
    field("sequence_number").orElse(field("file_sequence_number"))
      .getOrElse(inherited)
  }

  /** Manifest-entry schema for POSITION-DELETE manifests (v2 content=1):
    * the data_file record carries the spec's delete-file shape —
    * content=1 and the (file_path, pos) parquet the entry points at.
    */
  private val DeleteManifestEntrySchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],
         "default":null,"field-id":135}
      ]}}
    ]}""".replace("\n", ""))

  /** Stage `df`'s parquet files, then move them into `data/` under
    * commit-unique names. NOT dot-prefixed staging: Spark's hidden-path
    * filter would silently skip a ".stage" dir when reading it back for
    * the per-file record counts. Partitioned tables stage under a
    * SINGLE synthetic `__pdir` token (url-encoded values joined by
    * ','): only __pdir is dropped from the data files, so identity
    * source columns stay physically present — the layout the spec
    * expects from real writers.
    */
  private def stageDataFiles(df: DataFrame, path: String,
      partitionBy: Seq[String], fs: FileSystem,
      shape: Boolean = true): Seq[DataFileRef] = {
    val spark = df.sparkSession
    val stage = new Path(s"$path/metadata/stage-${java.util.UUID.randomUUID}")
    if (partitionBy.isEmpty)
      df.write.mode("overwrite").parquet(stage.toString)
    else {
      val token = concat(lit("v"), concat_ws(",", partitionBy.map(c =>
        coalesce(url_encode(col(c).cast("string")), lit(NullToken))): _*))
      // one writer task per partition dir (same shape + tasksPerPartition
      // salt knob as the Delta/graft-table writers): scattered upstream
      // tasks would otherwise write N_tasks × N_dirs sliver files, and
      // every later manifest walk/scan pays for them. OPTIMIZE passes
      // shape=false — its frames arrive pre-shaped (byte-targeted bins)
      // and a reshape would undo the binning.
      val tokened = df.withColumn("__pdir", token)
      (if (shape) VersionedTable.byPartitions(tokened, Seq("__pdir")) else tokened)
        .write.mode("overwrite").partitionBy("__pdir").parquet(stage.toString)
    }
    val stagedFiles: Seq[(org.apache.hadoop.fs.FileStatus, Seq[Option[String]])] =
      if (partitionBy.isEmpty)
        fs.listStatus(stage).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
          .map(st => (st, Nil))
      else fs.listStatus(stage).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("__pdir="))
        .flatMap { d =>
          val values = decodeToken(
            d.getPath.getName.stripPrefix("__pdir="), partitionBy.size)
          fs.listStatus(d.getPath).toSeq
            .filter(_.getPath.getName.endsWith(".parquet")).map((_, values))
        }
    // record counts from the parquet FOOTERS the writer just produced
    // (KBs per file on an IO thread pool) — a distributed re-scan of the
    // staged bytes would read every commit's data a SECOND time
    val counts = FileStats.fromFooters(spark,
      stagedFiles.map(_._1.getPath.toString), StructType(Nil))
      .map { case (p, st) => p -> st.numRecords.getOrElse(0L) }
    val moved = stagedFiles.zipWithIndex.map { case ((st, values), i) =>
      val name = f"00000-$i%05d-${java.util.UUID.randomUUID()}.parquet"
      // cosmetic hive-ish dir per partition tuple (readers use manifests)
      val subdir = partitionBy.zip(values).map { case (c, v) =>
        s"$c=${v.map(java.net.URLEncoder.encode(_, "UTF-8")).getOrElse("null")}"
      }.mkString("/")
      val dir = if (subdir.isEmpty) s"$path/data" else s"$path/data/$subdir"
      val dst = new Path(s"$dir/$name")
      fs.mkdirs(dst.getParent)
      require(fs.rename(st.getPath, dst), s"move failed: $dst")
      DataFileRef(s"$dir/$name",
        counts.getOrElse(FileStats.canon(st.getPath.toString), 0L), st.getLen,
        values)
    }
    fs.delete(stage, true)
    moved
  }

  // ---- identity partitioning plumbing ----

  /** Null marker inside the staging-dir token: `~` cannot appear in
    * url-encoded output (URLEncoder percent-escapes it), so it is
    * collision-free.
    */
  private val NullToken = "~"

  /** Decode one hive-escaped path segment (`%XX` pairs, the encoding
    * Spark's partitioned writer applies to directory names). Safe to
    * run over our url-encoded token because hive escaping always
    * rewrites a literal `%` to `%25` — decoding consumes exactly the
    * pairs escaping produced.
    */
  private def unescapeDirName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length)
        try { sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Staging token → decoded per-column raw string values (None = null).
    * Inverse of the `__pdir` expression built in [[write]].
    */
  private def decodeToken(token: String, n: Int): Seq[Option[String]] = {
    val parts = unescapeDirName(token).stripPrefix("v").split(",", -1)
    require(parts.length == n, s"partition token arity ${parts.length} != $n: $token")
    parts.toSeq.map {
      case NullToken => None
      case v => Some(java.net.URLDecoder.decode(v, "UTF-8"))
    }
  }

  /** Raw string partition value → the avro-record value for the
    * manifest's typed partition record (dates as epoch days, per the
    * spec's date representation).
    */
  private def partAvroValue(s: String, dt: DataType): Any = dt match {
    case IntegerType => s.toInt
    case LongType => s.toLong
    case DoubleType => s.toDouble
    case FloatType => s.toFloat
    case StringType => s
    case BooleanType => s.toBoolean
    case DateType => java.time.LocalDate.parse(s).toEpochDay.toInt
    case other => throw new IllegalArgumentException(
      s"IcebergInterop: unsupported partition type ${other.simpleString}")
  }

  /** Avro partition-record value → catalyst-internal value for the
    * pruning evaluator (UTF8String for strings; date epoch-days are
    * already DateType's internal form).
    */
  private def partInternal(v: Any): Any = v match {
    case u: org.apache.avro.util.Utf8 =>
      org.apache.spark.unsafe.types.UTF8String.fromString(u.toString)
    case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case other => other
  }

  /** The spec's partition-spec fields JSON (identity transforms,
    * field-ids from `firstFieldId`, source-id = schema field-id).
    */
  private def specFieldsJson(partFields: Seq[StructField],
      schema: StructType, firstFieldId: Int = 1000): JArray =
    JArray(partFields.zipWithIndex.toList.map { case (f, i) =>
      JObject("name" -> JString(f.name), "transform" -> JString("identity"),
        "source-id" -> JInt(schema.fieldIndex(f.name) + 1),
        "field-id" -> JInt(firstFieldId + i))
    })

  /** Partition-spec LINEAGE (the schema-lineage rule applied to specs —
    * Iceberg specs are immutable): an unchanged field set reuses the
    * prior default spec verbatim; a changed one (overwrite with a new
    * partitionBy) APPENDS a fresh spec-id with globally unique partition
    * field-ids and bumps default-spec-id — older snapshots' manifests
    * keep declaring their original spec-id, which still resolves to the
    * field set they were written under. Returns
    * (specs list, default-spec-id, current fields JSON, last-partition-id).
    */
  private def specLineage(prev: Option[JValue], partFields: Seq[StructField],
      schema: StructType): (List[JValue], Int, JArray, Int) = {
    val prevSpecs = prev.toSeq.flatMap(m =>
      (m \ "partition-specs").extractOrElse[List[JValue]](Nil)).toList
    val prevDefault = prev.flatMap(m =>
      (m \ "default-spec-id").extractOpt[Int]).getOrElse(0)
    val prevLastId = prev.flatMap(m =>
      (m \ "last-partition-id").extractOpt[Int]).getOrElse(999)
    // match on (name, transform) — NOT field/source ids: a foreign
    // writer's ids are arbitrary, and an unchanged foreign default spec
    // must be reused verbatim (ids intact), never re-minted
    val newSig = partFields.map(f => (f.name, "identity"))
    def sigOf(spec: JValue) = (spec \ "fields")
      .extractOrElse[List[JValue]](Nil).map(f =>
        ((f \ "name").extractOrElse[String](""),
          (f \ "transform").extractOrElse[String]("")))
    prevSpecs.find(s => (s \ "spec-id").extractOrElse[Int](-1) == prevDefault) match {
      case None =>
        val j = specFieldsJson(partFields, schema)
        (List(JObject("spec-id" -> JInt(0), "fields" -> j)), 0, j,
          999 + partFields.size)
      case Some(cur) if sigOf(cur) == newSig =>
        val fieldsJ = JArray((cur \ "fields").extractOrElse[List[JValue]](Nil))
        (prevSpecs, prevDefault, fieldsJ, prevLastId)
      case Some(_) =>
        val newId = prevSpecs.flatMap(s => (s \ "spec-id").extractOpt[Int])
          .foldLeft(-1)(_ max _) + 1
        val j = specFieldsJson(partFields, schema, firstFieldId = prevLastId + 1)
        (prevSpecs :+ (JObject("spec-id" -> JInt(newId), "fields" -> j): JValue),
          newId, j, prevLastId + partFields.size)
    }
  }

  /** Manifest header stamp for the CURRENT spec: (spec-id, fields JSON)
    * through [[specLineage]], so the id a manifest declares always
    * matches the spec the published metadata will resolve it to — both
    * sides derive it from the same prior metadata.
    */
  private def specStamp(meta: Option[JValue], partFields: Seq[StructField],
      schema: StructType): (String, String) = {
    val lineage = specLineage(meta, partFields, schema)
    (lineage._2.toString, JsonMethods.compact(JsonMethods.render(lineage._3)))
  }

  /** Identity partition fields of the table's default spec, resolved
    * to Spark types via source-id (ids are 1..n by construction).
    * Non-identity transform fields are skipped — they never prune
    * here, which is conservative.
    */
  private def partFieldsOf(meta: JValue, schema: StructType): Seq[StructField] = {
    val defId = (meta \ "default-spec-id").extractOrElse[Int](0)
    (meta \ "partition-specs").extractOrElse[List[JValue]](Nil)
      .find(s => (s \ "spec-id").extractOrElse[Int](-1) == defId)
      .toSeq.flatMap { s =>
        (s \ "fields").extractOrElse[List[JValue]](Nil).flatMap { f =>
          if ((f \ "transform").extractOrElse[String]("") != "identity") None
          else {
            val srcId = (f \ "source-id").extract[Int]
            schema.fields.lift(srcId - 1)
              .map(src => StructField((f \ "name").extract[String], src.dataType))
          }
        }
      }
  }

  private def writeAvro(fs: FileSystem, p: Path,
      schema: org.apache.avro.Schema, meta: Map[String, String],
      records: Seq[GenericRecord]): Long = {
    fs.mkdirs(p.getParent)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    val out = fs.create(p, true)
    w.create(schema, out)
    records.foreach(w.append)
    w.close()
    fs.getFileStatus(p).getLen
  }

  private def readAvro(fs: FileSystem, p: Path): Seq[GenericRecord] = {
    val local = java.io.File.createTempFile("graft-iceberg", ".avro")
    try {
      fs.copyToLocalFile(p, new Path(local.getAbsolutePath))
      val r = new DataFileReader[GenericRecord](local,
        new GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.toList finally r.close()
    } finally { local.delete(); () }
  }

  // ---- table metadata ----

  /** Does an Iceberg table exist at `path`? The bootstrap probe for
    * streaming upsert sinks (write the first batch, merge the rest).
    */
  def tableExists(spark: SparkSession, path: String): Boolean =
    currentVersion(fsFor(spark, path), path).isDefined

  private def currentVersion(fs: FileSystem, path: String): Option[Int] = {
    val hint = new Path(s"$path/metadata/version-hint.text")
    if (!fs.exists(hint)) None
    else {
      val in = fs.open(hint)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  private def readMetadata(fs: FileSystem, path: String, version: Int): JValue = {
    val in = fs.open(new Path(s"$path/metadata/v$version.metadata.json"))
    try JsonMethods.parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  /** Append or overwrite `df` as a new snapshot. Returns snapshot id.
    * `txn` = (appId, version) exactly-once token for streaming writers,
    * carried as a `graft.txn.<appId>` table property (the same
    * mechanism real streaming writers use via snapshot summaries):
    * replaying a batch whose version the table already recorded is a
    * no-op returning the current snapshot.
    */
  def write(df: DataFrame, path: String, overwrite: Boolean = false,
      txn: Option[(String, Long)] = None,
      partitionBy: Seq[String] = Nil, mergeSchema: Boolean = false): Long = {
    val spark = df.sparkSession
    val fs = fsFor(spark, path)
    val partFields = partitionBy.map { c =>
      val f = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"IcebergInterop: partition column $c not in schema"))
      avroPartType(f.dataType) // type gate up front
      StructField(f.name, f.dataType)
    }
    require(!df.schema.fieldNames.contains("__pdir"),
      "IcebergInterop: __pdir is reserved for the staging layout")
    val prev = currentVersion(fs, path).map(v => (v, readMetadata(fs, path, v)))
    prev.foreach { case (_, meta) =>
      val existing = currentSchema(meta)
      // mergeSchema accepts STRICTLY ADDITIVE drift: the table schema is
      // a prefix of the batch's and every new field is nullable (old
      // data files read the new columns as null). Appending at the end
      // keeps the positional field-ids of existing columns stable, so
      // old manifests' id-keyed stats stay valid — the evolution rule
      // the spec's id discipline exists for. Anything else refuses.
      val additive = mergeSchema &&
        df.schema.size > existing.size &&
        df.schema.take(existing.size).map(f => (f.name, f.dataType)) ==
          existing.map(f => (f.name, f.dataType)) &&
        df.schema.drop(existing.size).forall(_.nullable)
      require(overwrite || additive || existing.map(f => (f.name, f.dataType)) ==
          df.schema.map(f => (f.name, f.dataType)),
        s"IcebergInterop append: schema must match the table " +
          s"(table ${existing.simpleString}, batch ${df.schema.simpleString})" +
          (if (mergeSchema) " — mergeSchema accepts only nullable fields APPENDED at the end"
           else ""))
      require(overwrite ||
          partFieldsOf(meta, existing).map(_.name) == partitionBy,
        s"IcebergInterop append: partitionBy (${partitionBy.mkString(",")}) " +
          "must match the table's partition spec " +
          s"(${partFieldsOf(meta, existing).map(_.name).mkString(",")})")
    }
    val prevProps: Map[String, String] = prev.map(p =>
      (p._2 \ "properties").extractOrElse[Map[String, String]](Map.empty))
      .getOrElse(Map.empty)
    txn.foreach { case (appId, v) =>
      prev.foreach { case (_, meta) =>
        if (prevProps.get(s"graft.txn.$appId").exists(_.toLong >= v))
          return (meta \ "current-snapshot-id").extract[Long]
      }
    }
    val moved = stageDataFiles(df, path, partitionBy, fs)
    commitRefs(spark, fs, path, df.schema, moved, overwrite, txn, partFields,
      prev, prevProps)
  }

  /** Commit a set of already-materialized data files as the next
    * snapshot — the shared metadata tail of [[write]] (which stages
    * `df`'s files first) and [[commitExternal]] (which adopts files
    * that already exist elsewhere, the metadata-only CONVERT path).
    */
  private def commitRefs(spark: SparkSession, fs: FileSystem, path: String,
      schema: StructType, moved: Seq[DataFileRef], overwrite: Boolean,
      txn: Option[(String, Long)], partFields: Seq[StructField],
      prev: Option[(Int, JValue)], prevProps: Map[String, String]): Long = {
    val snapshotId = math.abs(java.util.UUID.randomUUID().getMostSignificantBits)
    val now = System.currentTimeMillis()
    val schemaJ = schemaJson(schema)
    val baseId =
      if (overwrite) None
      else prev.map(p => (p._2 \ "current-snapshot-id").extract[Long])
    val (listPath, newSeq, prevFormat) = writeSnapshotList(spark, fs, path,
      schema, partFields, moved, snapshotId, prev.map(_._2), baseId)

    publishMetadata(fs, path, prev, schema, partFields,
      prevProps ++ txn.map { case (a, v) => s"graft.txn.$a" -> v.toString },
      prevFormat, newSeq, snapshotId, now, listPath,
      if (overwrite) "overwrite" else "append",
      summaryExtra = Map(
        "added-data-files" -> moved.size.toString,
        "added-records" -> moved.map(_.records).sum.toString,
        "added-files-size" -> moved.map(_.bytes).sum.toString))
  }

  /** Write one append/overwrite snapshot's manifest + manifest list:
    * ONE distributed stats pass over `moved`, one new manifest stamped
    * with the TABLE's format version, and a manifest list carrying
    * `baseSnapshotId`'s live records (None = fresh table / overwrite).
    * The base is a parameter because a branch write carries the BRANCH
    * head's list, not main's. Returns (listPath, newSeq, formatVersion).
    */
  private def writeSnapshotList(spark: SparkSession, fs: FileSystem,
      path: String, schema: StructType, partFields: Seq[StructField],
      moved: Seq[DataFileRef], snapshotId: Long, prevMeta: Option[JValue],
      baseSnapshotId: Option[Long]): (String, Long, Int) = {
    // one distributed pass over the commit's files → the spec's
    // column-stats maps (keyed by field-id), the skipping metadata
    // real Iceberg planners prune on
    val statsByFile = FileStats.fromFooters(spark, moved.map(_.path), schema)
    // sequence machinery: v1 tables stay seq-free; once a row-level
    // delete upgraded the table to format-version 2, every commit bumps
    // the sequence and stamps its manifest with it (the spec's ordering
    // rule that scopes deletes to files that existed before them).
    // Sequences are TABLE-global (the spec's rule), so branch commits
    // bump the same counter as main commits.
    val prevFormat = prevMeta.map(m => (m \ "format-version").extract[Int])
      .getOrElse(1)
    val manifestPath = s"$path/metadata/${java.util.UUID.randomUUID()}-m0.avro"
    val entrySchema = manifestEntrySchema(partFields)
    val entries = buildEntries(moved, snapshotId, schema, partFields,
      statsByFile, entrySchema)
    val schemaJ = schemaJson(schema)
    val (specId, specJson) = specStamp(prevMeta, partFields, schema)
    val manifestLen = writeAvro(fs, new Path(manifestPath), entrySchema,
      Map("schema" -> JsonMethods.compact(JsonMethods.render(schemaJ)),
        "partition-spec" -> specJson,
        "partition-spec-id" -> specId,
        "format-version" -> prevFormat.toString),
      entries)
    val newSeq = if (prevFormat >= 2)
      prevMeta.map(m => (m \ "last-sequence-number").extractOrElse[Long](0L))
        .getOrElse(0L) + 1
    else 0L
    // manifest list: this manifest + every live manifest of the base
    // snapshot, each carried record keeping its content kind and
    // sequence number
    val carried: Seq[GenericRecord] = (prevMeta, baseSnapshotId) match {
      case (Some(meta), Some(base)) =>
        (meta \ "snapshots").extract[List[JValue]]
          .find(s => (s \ "snapshot-id").extract[Long] == base)
          .toSeq.flatMap(s =>
            readAvro(fs, new Path((s \ "manifest-list").extract[String])))
      case _ => Nil
    }
    val listPath = s"$path/metadata/snap-$snapshotId-1-${java.util.UUID.randomUUID()}.avro"
    val added = listEntryRecord(manifestPath, manifestLen, snapshotId,
      content = 0, seq = newSeq)
    val listRecords = added +: carried.map(r => listEntryRecord(
      r.get("manifest_path").toString,
      r.get("manifest_length").asInstanceOf[Long],
      r.get("added_snapshot_id").asInstanceOf[java.lang.Long],
      content = listContentOf(r), seq = listSeqOf(r)))
    writeAvro(fs, new Path(listPath), ManifestFileSchema,
      Map("format-version" -> prevFormat.toString), listRecords)
    (listPath, newSeq, prevFormat)
  }

  /** The shared metadata-JSON publish tail of every snapshot commit
    * ([[commitRefs]] appends/overwrites, [[deletePositions]] delete
    * snapshots): builds the new `vN.metadata.json` + version hint,
    * refusing a concurrent writer's already-claimed version.
    */
  /** v3 WRITE gate shared by every metadata publisher: reads serve v3
    * (deletion vectors included), but a commit from this writer would
    * skip v3's row-lineage assignment (first_row_id / next-row-id) and
    * real v3 readers would see corrupt lineage — refuse by name.
    */
  private def requireWritableFormat(meta: JValue): Unit = {
    val pf = (meta \ "format-version").extractOrElse[Int](1)
    require(pf <= 2,
      s"IcebergInterop: format-version $pf table — reads serve v3 " +
        "(deletion vectors included); writes and maintenance would " +
        "have to assign v3 row lineage, use the owning writer")
  }

  private def publishMetadata(fs: FileSystem, path: String,
      prev: Option[(Int, JValue)], schema: StructType,
      partFields: Seq[StructField], props: Map[String, String],
      formatVersion: Int, newSeq: Long, snapshotId: Long, now: Long,
      listPath: String, operation: String,
      summaryExtra: Map[String, String] = Map.empty): Long = {
    prev.foreach(p => requireWritableFormat(p._2))
    // schema lineage: an unchanged schema carries the prior `schemas`
    // list verbatim; a changed one (additive evolution, or overwrite's
    // schema replace) APPENDS under a fresh schema-id and points
    // current-schema-id at it — old snapshots keep their resolvable
    // history, the way real writers evolve
    val prevSchemaList = prev.toSeq.flatMap { p =>
      (p._2 \ "schemas").extractOrElse[List[JValue]](Nil) match {
        case Nil => (p._2 \ "schema") match {
          case JNothing => Nil
          case s => List(s)
        }
        case xs => xs
      }
    }
    val unchanged = prev.exists(p => currentSchema(p._2)
      .map(f => (f.name, f.dataType)) == schema.map(f => (f.name, f.dataType)))
    val (schemasJ, curSchemaId, schemaJ) =
      if (unchanged && prevSchemaList.nonEmpty) {
        val id = prev.flatMap(p =>
          (p._2 \ "current-schema-id").extractOpt[Int]).getOrElse(0)
        (prevSchemaList, id, currentSchemaJson(prev.get._2))
      } else if (prevSchemaList.nonEmpty) {
        val id = prevSchemaList
          .flatMap(s => (s \ "schema-id").extractOpt[Int]).foldLeft(-1)(_ max _) + 1
        val j = schemaJson(schema, id)
        (prevSchemaList :+ (j: JValue), id, j: JValue)
      } else (List(schemaJson(schema): JValue), 0, schemaJson(schema): JValue)
    val specLineageTuple = specLineage(prev.map(_._2), partFields, schema)
    val prevSnapshots = prev.toSeq.flatMap(_._2 \ "snapshots" match {
      case JArray(xs) => xs
      case _ => Nil
    })
    val parentId = prev.map(p => (p._2 \ "current-snapshot-id").extract[Long])
    val snapshot = JObject(
      "snapshot-id" -> JLong(snapshotId),
      "timestamp-ms" -> JLong(now),
      "summary" -> JObject(("operation" -> JString(operation)) ::
        summaryExtra.toList.map { case (k, v) => k -> (JString(v): JValue) }),
      "manifest-list" -> JString(listPath),
      "schema-id" -> JInt(curSchemaId)) ~~ parentId.map(p =>
        JObject("parent-snapshot-id" -> JLong(p))) ~~
      (if (formatVersion >= 2) Some(JObject("sequence-number" -> JLong(newSeq)))
       else None)
    val meta = JObject(
      "format-version" -> JInt(formatVersion),
      "table-uuid" -> JString(prev.map(p => (p._2 \ "table-uuid").extract[String])
        .getOrElse(java.util.UUID.randomUUID().toString)),
      "location" -> JString(path),
      "last-updated-ms" -> JLong(now),
      "last-sequence-number" -> JLong(newSeq),
      "last-column-id" -> JInt(schema.size),
      "schema" -> schemaJ,
      "schemas" -> JArray(schemasJ.toList),
      "current-schema-id" -> JInt(curSchemaId),
      "partition-spec" -> specLineageTuple._3,
      "partition-specs" -> JArray(specLineageTuple._1),
      "default-spec-id" -> JInt(specLineageTuple._2),
      "last-partition-id" -> JInt(specLineageTuple._4),
      "sort-orders" -> JArray(List(JObject(
        "order-id" -> JInt(0), "fields" -> JArray(Nil)))),
      "default-sort-order-id" -> JInt(0),
      "properties" -> JObject(
        (props + ("schema.name-mapping.default" -> nameMapping(schema)))
          .toList.map { case (k, v) => k -> (JString(v): JValue) }),
      "current-snapshot-id" -> JLong(snapshotId),
      // refs: carry branches/tags through, main follows the commit
      // (the spec keeps `main` = current snapshot)
      "refs" -> refsJson(prev.map(p => refsOf(p._2))
        .getOrElse(Map.empty) + ("main" -> (snapshotId, "branch"))),
      "snapshots" -> JArray((prevSnapshots :+ snapshot).toList),
      "snapshot-log" -> JArray((prev.toSeq.flatMap(_._2 \ "snapshot-log" match {
        case JArray(xs) => xs
        case _ => Nil
      }) :+ JObject("timestamp-ms" -> JLong(now),
        "snapshot-id" -> JLong(snapshotId))).toList))
    val newVersion = prev.map(_._1 + 1).getOrElse(1)
    val metaPath = new Path(s"$path/metadata/v$newVersion.metadata.json")
    require(!fs.exists(metaPath),
      s"Iceberg metadata v$newVersion already exists (concurrent writer)")
    writeFile(fs, metaPath, JsonMethods.pretty(JsonMethods.render(meta))
      .getBytes(StandardCharsets.UTF_8))
    writeFile(fs, new Path(s"$path/metadata/version-hint.text"),
      newVersion.toString.getBytes(StandardCharsets.UTF_8))
    snapshotId
  }

  /** Adopt data files that already exist OUTSIDE this table's tree as
    * its first snapshot — the metadata-only half of a cross-format
    * CONVERT (Iceberg's own `snapshot`/`migrate` procedures): no data
    * is copied; one manifest + manifest list + metadata JSON reference
    * the donor files by absolute path, and column stats come from ONE
    * distributed [[FileStats]] pass over them. Fresh locations only —
    * adopting into a live table would mix lifecycle owners (the donor
    * format still owns those files; see [[FormatConvert]] for the
    * ownership contract).
    */
  private[sinks] def commitExternal(spark: SparkSession, path: String,
      schema: StructType, files: Seq[DataFileRef]): Long = {
    val fs = fsFor(spark, path)
    require(currentVersion(fs, path).isEmpty,
      s"IcebergInterop.commitExternal: $path is already an Iceberg table " +
        "(metadata-only adoption targets a fresh location)")
    require(files.nonEmpty, "IcebergInterop.commitExternal: no data files")
    commitRefs(spark, fs, path, schema, files, overwrite = false, txn = None,
      partFields = Nil, prev = None, prevProps = Map.empty)
  }

  /** The current snapshot's live data files as (path, records, bytes),
    * plus the table schema — the inventory a metadata-only CONVERT
    * consumes. Identity-partitioned tables are fine: graft's writer
    * keeps identity source columns physically in the data files (the
    * real-writer layout), so the files are self-contained.
    */
  private[graft] def currentDataFiles(spark: SparkSession,
      path: String): (StructType, Seq[DataFileRef]) = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(
        s"not an Iceberg table (no metadata/version-hint.text): $path"))
    val meta = readMetadata(fs, path, version)
    val target = (meta \ "current-snapshot-id").extract[Long]
    val snap = (meta \ "snapshots").extract[List[JValue]]
      .find(s => (s \ "snapshot-id").extract[Long] == target)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $target not found in $path"))
    val schema = currentSchema(meta)
    requireNoDeleteManifests(fs, snap, "convert") // adoption is verbatim
    val refs = liveEntries(fs, snap).map { e =>
      val d = e.get("data_file").asInstanceOf[GenericRecord]
      DataFileRef(d.get("file_path").toString,
        d.get("record_count").asInstanceOf[Long],
        d.get("file_size_in_bytes").asInstanceOf[Long])
    }
    (schema, refs)
  }

  private implicit class JObjOps(private val o: JObject) {
    def ~~(other: Option[JObject]): JObject =
      other.map(x => JObject(o.obj ++ x.obj)).getOrElse(o)
  }

  /** A manifest entry's column-stats maps → the pruning evaluator's
    * shape. Field-ids resolve by position (ids are 1..n by construction
    * here and by convention for flat v1 schemas); missing or undecodable
    * bounds never prune. Identity partition values fold in as EXACT
    * min=max bounds (null → all-null), so partition pruning rides the
    * same conservative evaluator as column stats.
    */
  private def fileStatOf(d: GenericRecord, schema: StructType,
      partFields: Seq[StructField]): FileStats.FileStat = {
    def kvMap(field: String): Map[Int, Any] = d.get(field) match {
      case null => Map.empty
      case l: java.util.List[_] => l.asScala.map { r =>
        val rec = r.asInstanceOf[GenericRecord]
        rec.get("key").asInstanceOf[Int] -> rec.get("value")
      }.toMap
      case _ => Map.empty
    }
    val records = Option(d.get("record_count")).map(_.asInstanceOf[Long])
    val nulls = kvMap("null_value_counts")
    val lowers = kvMap("lower_bounds")
    val uppers = kvMap("upper_bounds")
    val cols = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      val id = i + 1
      val nc = nulls.get(id).map(_.asInstanceOf[Long])
      val mn = lowers.get(id).collect { case b: java.nio.ByteBuffer => b }
        .flatMap(boundValue(_, f.dataType))
      val mx = uppers.get(id).collect { case b: java.nio.ByteBuffer => b }
        .flatMap(boundValue(_, f.dataType))
      if (nc.isEmpty && mn.isEmpty && mx.isEmpty) None
      else Some(f.name -> FileStats.ColStats(mn, mx, nc,
        allNull = nc.isDefined && nc == records))
    }.toMap
    val partCols = d.get("partition") match {
      case rec: GenericRecord => partFields.flatMap { pf =>
        if (rec.getSchema.getField(pf.name) == null) None
        else Some(rec.get(pf.name) match {
          case null =>
            pf.name -> FileStats.ColStats(None, None, records, allNull = true)
          case v =>
            val iv = partInternal(v)
            pf.name -> FileStats.ColStats(Some(iv), Some(iv), Some(0L),
              allNull = false)
        })
      }.toMap
      case _ => Map.empty[String, FileStats.ColStats]
    }
    FileStats.FileStat(records, cols ++ partCols)
  }

  /** Snapshot read through the metadata → manifest-list → manifest
    * chain (never a directory listing). `snapshotId` time-travels to
    * any snapshot still in the metadata's snapshot list.
    */
  def read(spark: SparkSession, path: String,
      snapshotId: Option[Long] = None): DataFrame =
    readWhere(spark, path, where = None, snapshotId)

  /** [[read]] with file skipping: `where` prunes the data-file list on
    * the manifests' lower/upper bounds and null counts before any scan
    * task is planned, then is re-applied to the surviving rows. The
    * manifest chain means planning never lists a directory AND never
    * opens a pruned file — the spec's scale story, implemented.
    */
  def readWhere(spark: SparkSession, path: String, where: Option[Column],
      snapshotId: Option[Long] = None): DataFrame = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(
        s"not an Iceberg table (no metadata/version-hint.text): $path"))
    val meta = readMetadata(fs, path, version)
    require((meta \ "format-version").extract[Int] <= 3,
      "IcebergInterop: unknown format-version " +
        (meta \ "format-version").extract[Int])
    val target = snapshotId.getOrElse((meta \ "current-snapshot-id").extract[Long])
    val snap = (meta \ "snapshots").extract[List[JValue]]
      .find(s => (s \ "snapshot-id").extract[Long] == target)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $target not found in $path"))
    val schema = currentSchema(meta)
    val listRecs = readAvro(fs, new Path((snap \ "manifest-list").extract[String]))
    val (delRecs, dataRecs) = listRecs.partition(r => listContentOf(r) == 1)
    val dataFilesWithSeq = dataRecs.flatMap { r =>
      val seq = listSeqOf(r)
      readAvro(fs, new Path(r.get("manifest_path").toString)).collect {
        case e if e.get("status").asInstanceOf[Int] != 2 => // not DELETED
          (e.get("data_file").asInstanceOf[GenericRecord], entrySeqOf(e, seq))
      }
    }
    val seqByPath = dataFilesWithSeq
      .map { case (d, q) => d.get("file_path").toString -> q }.toMap
    val partFields = partFieldsOf(meta, schema)
    val (kept, _) = FileStats.prune(spark, schema, where, dataFilesWithSeq.map(_._1),
      (d: GenericRecord) => fileStatOf(d, schema, partFields))
    val files = kept.map(_.get("file_path").toString)
    // row-level delete files from content=1 manifests: each ENTRY says
    // whether it is a POSITION delete (data_file.content=1: a
    // (file_path,pos) parquet) or an EQUALITY delete (content=2: rows
    // of the equality_ids columns, how Flink CDC writers delete).
    // Conflating them — or ignoring an unknown kind — would silently
    // resurrect deleted rows, so anything else refuses by value.
    val delEntries = delRecs.flatMap { r =>
      val seq = listSeqOf(r)
      readAvro(fs, new Path(r.get("manifest_path").toString)).collect {
        case e if e.get("status").asInstanceOf[Int] != 2 =>
          val d = e.get("data_file").asInstanceOf[GenericRecord]
          val content = (d.getSchema.getField("content") match {
            case null => None
            case _ => Option(d.get("content")).map(_.asInstanceOf[Int])
          }).getOrElse(1)
          val eqIds: Seq[Int] = (d.getSchema.getField("equality_ids") match {
            case null => None
            case _ => Option(d.get("equality_ids"))
          }).map {
            case l: java.util.List[_] =>
              l.asScala.toSeq.map(x => x.asInstanceOf[Number].intValue)
            case a: org.apache.avro.generic.GenericData.Array[_] =>
              a.asScala.toSeq.map(x => x.asInstanceOf[Number].intValue)
          }.getOrElse(Nil)
          def optField(name: String): Option[AnyRef] =
            if (d.getSchema.getField(name) == null) None else Option(d.get(name))
          val fmt = Option(d.get("file_format")).map(_.toString.toUpperCase)
            .getOrElse("PARQUET")
          // v3 deletion vectors: a PUFFIN "file" whose manifest entry
          // points straight at the blob (referenced data file, content
          // offset, content size) — no footer parse needed
          val dv =
            if (fmt != "PUFFIN") None
            else Some((
              optField("referenced_data_file").map(_.toString),
              optField("content_offset").map(_.asInstanceOf[Number].longValue),
              optField("content_size_in_bytes").map(_.asInstanceOf[Number].longValue)))
          (d.get("file_path").toString, entrySeqOf(e, seq), content, eqIds, dv)
      }
    }
    delEntries.foreach { case (p2, _, c, _, dvOpt) =>
      require(c == 1 || c == 2,
        s"IcebergInterop: unknown delete-file content kind $c ($p2) — " +
          "refusing rather than resurrecting deleted rows")
      dvOpt.foreach { case (ref, off, len) =>
        require(c == 1, s"IcebergInterop: puffin delete $p2 with content kind $c")
        require(ref.isDefined && off.isDefined && len.isDefined,
          s"IcebergInterop: deletion vector $p2 is missing " +
            "referenced_data_file/content_offset/content_size_in_bytes — " +
            "refusing rather than scanning the puffin footer blind")
      }
    }
    val posDeletes = delEntries.collect {
      case (p2, q, 1, _, None) => (p2, q) }
    val dvDeletes = delEntries.collect {
      case (p2, q, 1, _, Some((Some(ref), Some(off), Some(len)))) =>
        (p2, q, ref, off, len) }
    val eqDeletes = delEntries.collect { case (p2, q, 2, ids, _) =>
      require(ids.nonEmpty,
        s"IcebergInterop: equality delete $p2 lists no equality_ids")
      val idMap = fieldIdToName(meta)
      (p2, q, ids.map(id => idMap.getOrElse(id,
        throw new IllegalArgumentException(
          s"IcebergInterop: equality delete $p2 references unknown field id $id"))))
    }
    // decode DVs on EXECUTORS (one task per vector — distributes with
    // the delete set, the same shape as Delta's DV read)
    val dvDf =
      if (dvDeletes.isEmpty) None
      else {
        import spark.implicits._
        val sconf = new SerializableHadoopConf(
          spark.sparkContext.hadoopConfiguration)
        val tasks = dvDeletes.map { case (pp, q, ref, off, len) =>
          (pp, q, ref, off, len) }
        Some(spark.createDataset(tasks)
          .repartition(math.min(tasks.size, 32))
          .flatMap { case (pp, q, ref, off, len) =>
            val fsx = new org.apache.hadoop.fs.Path(pp)
              .getFileSystem(sconf.value)
            IcebergDv.positions(fsx, pp, off, len)
              .map(pos => (normPathStr(ref), pos, q))
          }.toDF("__del_fp", "__del_pos", "__mseq"))
      }
    val out =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema)
      else if (posDeletes.isEmpty && eqDeletes.isEmpty && dvDf.isEmpty)
        spark.read.schema(schema).parquet(files: _*)
      else applyRowDeletes(spark, schema, files,
        files.map(f => f -> seqByPath.getOrElse(f, 0L)).toMap,
        posDeletes, eqDeletes, dvDf)
    where.map(out.filter).getOrElse(out)
  }

  /** Delete-file parquet shape per the spec (2147483546/2147483545 are
    * the reserved field-ids; column NAMES are what Spark parquet
    * resolves by).
    */
  private val DeleteFileSchema = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** ONE path-normalization rule for every side of the merge-on-read
    * join (`_metadata.file_path` URIs, manifest strings, delete-file
    * columns): the merge anti-join silently skips deletes if any side
    * spells a path differently, so the rule exists exactly once, in a
    * column and a string spelling sharing the same regex. (This is the
    * column-expressible subset of [[FileStats.canon]] — local `file:`
    * URIs collapse to plain paths; object-store URIs pass through
    * verbatim on every side, staying consistent.)
    */
  private val LocalUriPrefix = "^file:/+"
  private def normPathCol(c: Column): Column =
    regexp_replace(c, LocalUriPrefix, "/")
  private def normPathStr(s: String): String =
    s.replaceFirst(LocalUriPrefix, "/")
  private def normalizedFilePath: Column =
    normPathCol(col("_metadata.file_path"))

  /** Merge-on-read: anti-join the data rows against the position
    * deletes on (file path, row position), scoped by the spec's
    * sequence rule — a delete applies only to files whose data
    * sequence is <= the delete's. Row positions come from Spark's
    * `_metadata.row_index` (exact parquet row ordinals); the delete
    * set rides a broadcast (bounded: deletes are maintenance-compacted
    * away, never corpus-sized).
    */
  private def applyRowDeletes(spark: SparkSession, schema: StructType,
      files: Seq[String], dataSeqByPath: Map[String, Long],
      posDeletes: Seq[(String, Long)],
      eqDeletes: Seq[(String, Long, Seq[String])],
      dvDeletes: Option[DataFrame] = None): DataFrame = {
    val base = spark.read.schema(schema).parquet(files: _*)
      .withColumn("__fp", normalizedFilePath)
      .withColumn("__pos", col("_metadata.row_index"))
    val seqDf = spark.createDataFrame(
      dataSeqByPath.toSeq.map { case (p, q) =>
        org.apache.spark.sql.Row(normPathStr(p), q) }.asJava,
      StructType(Seq(StructField("__fp", StringType), StructField("__dseq", LongType))))
    val seqd = base.join(broadcast(seqDf), Seq("__fp"), "left")
    // position deletes and v3 deletion vectors share one anti-join:
    // both name (file, row ordinal, delete sequence) tuples
    val posFrames = posDeletes.map { case (p, q) =>
      spark.read.schema(DeleteFileSchema).parquet(p)
        .select(normPathCol(col("file_path")).as("__del_fp"),
          col("pos").as("__del_pos"), lit(q).as("__mseq"))
    } ++ dvDeletes.toSeq
    val afterPos =
      if (posFrames.isEmpty) seqd
      else {
        val delDf = posFrames.reduce(_ unionByName _)
        seqd.join(broadcast(delDf),
          col("__fp") === col("__del_fp") && col("__pos") === col("__del_pos") &&
            coalesce(col("__dseq"), lit(0L)) <= col("__mseq"),
          "left_anti")
      }
    // equality deletes: drop data rows whose equality columns match a
    // delete row (null-safely — the spec's IS NOT DISTINCT FROM
    // semantics) and whose data sequence is STRICTLY BELOW the
    // delete's (position deletes use <=, equality deletes use < —
    // an equality delete in the same commit as an insert must not
    // kill it)
    val afterEq = eqDeletes.foldLeft(afterPos) { case (df, (p, q, cols)) =>
      val eqSchema = StructType(cols.map(c => schema(c)))
      val delRows = spark.read.schema(eqSchema).parquet(p)
        .select(cols.map(c => col(c).as(s"__eq_$c")): _*)
      val cond = cols.map(c => col(c) <=> col(s"__eq_$c"))
        .reduce(_ && _) && coalesce(col("__dseq"), lit(0L)) < lit(q)
      df.join(broadcast(delRows), cond, "left_anti")
    }
    afterEq.select(schema.fieldNames.map(col): _*)
  }

  /** Merge-on-read DELETE for the wire format — Iceberg v2 POSITION
    * DELETES, the sibling of [[DeltaInterop.deleteDv]]: matching rows
    * are marked deleted in a sorted (file_path, pos) parquet delete
    * file + one content=1 manifest; the data parquet is never touched,
    * so cost is O(matched rows), not O(bytes of touched files). The
    * commit bumps the table's sequence number and (for a v1 table)
    * upgrades format-version to 2 — carried data manifests keep their
    * lower sequence, which is exactly what scopes the delete to files
    * that existed before it (later appends get a higher sequence and
    * are untouched, the spec's ordering rule [[applyPositionDeletes]]
    * enforces at read). Matching rows are found distributed over the
    * stats-pruned file set via `_metadata.row_index`; nothing
    * row-sized lands on the driver.
    *
    * Honest format note: the delete parquet carries the spec's column
    * NAMES (file_path, pos) but Spark does not stamp the reserved
    * parquet field-ids (2147483546/2147483545); graft's own reader and
    * name-mapping readers resolve it, strict field-id-only readers
    * would not.
    */
  def deletePositions(spark: SparkSession, path: String, where: Column): Long = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val schema = currentSchema(meta)
    val partFields = partFieldsOf(meta, schema)
    val curId = (meta \ "current-snapshot-id").extract[Long]
    val snap = (meta \ "snapshots").extract[List[JValue]]
      .find(s => (s \ "snapshot-id").extract[Long] == curId)
      .getOrElse(throw new IllegalStateException(s"snapshot $curId not in $path"))
    val listRecs = readAvro(fs, new Path((snap \ "manifest-list").extract[String]))
    val dataFiles = listRecs.filter(listContentOf(_) == 0).flatMap { r =>
      readAvro(fs, new Path(r.get("manifest_path").toString)).collect {
        case e if e.get("status").asInstanceOf[Int] != 2 =>
          e.get("data_file").asInstanceOf[GenericRecord]
      }
    }
    val (pruned, _) = FileStats.prune(spark, schema, Some(where), dataFiles,
      (d: GenericRecord) => fileStatOf(d, schema, partFields))
    if (pruned.isEmpty) return curId // no file can match: no-op
    val files = pruned.map(_.get("file_path").toString)
    val matches = spark.read.schema(schema).parquet(files: _*)
      .filter(coalesce(where, lit(false)))
      .select(normalizedFilePath.as("file_path"),
        col("_metadata.row_index").as("pos"))
    // the spec requires delete files sorted by (file_path, pos)
    val stage = new Path(s"$path/metadata/delstage-${java.util.UUID.randomUUID()}")
    matches.coalesce(1).sortWithinPartitions(col("file_path"), col("pos"))
      .write.parquet(stage.toString)
    val part = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("delete-file write produced no file"))
    // row count from the staged file's own FOOTER — the old
    // read-back count() was one extra Spark action per commit
    val nDeleted = FileStats.fromFooters(spark, Seq(part.toString),
        org.apache.spark.sql.types.StructType(Nil))
      .headOption.flatMap(_._2.numRecords).getOrElse(0L)
    if (nDeleted == 0L) { fs.delete(stage, true); return curId }
    val delPath = s"$path/data/delete-${java.util.UUID.randomUUID()}.parquet"
    fs.mkdirs(new Path(delPath).getParent)
    require(fs.rename(part, new Path(delPath)), "delete-file rename failed")
    fs.delete(stage, true)
    commitDeleteFile(fs, path, version, meta, schema, partFields,
      listRecs, delPath, nDeleted, contentKind = 1, eqIds = Nil)
  }

  /** Shared commit tail of [[deletePositions]] and [[deleteEquality]]:
    * one content=1 manifest referencing the freshly written delete
    * parquet (`contentKind` 1 = position, 2 = equality with its
    * `equality_ids`), the carried manifest list, a bumped sequence, and
    * the format-version-2 metadata publish.
    */
  private def commitDeleteFile(fs: FileSystem, path: String, version: Int,
      meta: JValue, schema: StructType, partFields: Seq[StructField],
      listRecs: Seq[GenericRecord], delPath: String, nRows: Long,
      contentKind: Int, eqIds: Seq[Int]): Long = {
    val delLen = fs.getFileStatus(new Path(delPath)).getLen
    val snapshotId = math.abs(java.util.UUID.randomUUID().getMostSignificantBits)
    val dfSchema = DeleteManifestEntrySchema.getField("data_file").schema()
    val dfRec = new GenericData.Record(dfSchema)
    dfRec.put("content", contentKind)
    dfRec.put("file_path", delPath)
    dfRec.put("file_format", "PARQUET")
    dfRec.put("partition",
      new GenericData.Record(dfSchema.getField("partition").schema()))
    dfRec.put("record_count", nRows)
    dfRec.put("file_size_in_bytes", delLen)
    if (eqIds.nonEmpty)
      dfRec.put("equality_ids",
        scala.jdk.CollectionConverters.SeqHasAsJava(
          eqIds.map(Integer.valueOf)).asJava)
    val entry = new GenericData.Record(DeleteManifestEntrySchema)
    entry.put("status", 1) // ADDED
    entry.put("snapshot_id", snapshotId)
    entry.put("data_file", dfRec)
    val manifestPath = s"$path/metadata/${java.util.UUID.randomUUID()}-d0.avro"
    val (specId, specJson) = specStamp(Some(meta), partFields, schema)
    val manifestLen = writeAvro(fs, new Path(manifestPath),
      DeleteManifestEntrySchema,
      Map("schema" -> JsonMethods.compact(JsonMethods.render(schemaJson(schema))),
        "partition-spec" -> specJson,
        "partition-spec-id" -> specId,
        "format-version" -> "2",
        "content" -> "deletes"),
      Seq(entry))
    val newSeq = (meta \ "last-sequence-number").extractOrElse[Long](0L) + 1
    val listPath =
      s"$path/metadata/snap-$snapshotId-1-${java.util.UUID.randomUUID()}.avro"
    val added = listEntryRecord(manifestPath, manifestLen, snapshotId,
      content = 1, seq = newSeq)
    val carried = listRecs.map(r => listEntryRecord(
      r.get("manifest_path").toString,
      r.get("manifest_length").asInstanceOf[Long],
      r.get("added_snapshot_id").asInstanceOf[java.lang.Long],
      content = listContentOf(r), seq = listSeqOf(r)))
    writeAvro(fs, new Path(listPath), ManifestFileSchema,
      Map("format-version" -> "2"), added +: carried)
    val prevProps = (meta \ "properties").extractOrElse[Map[String, String]](Map.empty)
    publishMetadata(fs, path, Some((version, meta)), schema, partFields,
      prevProps, formatVersion = 2, newSeq, snapshotId,
      System.currentTimeMillis(), listPath, "delete")
  }

  /** EQUALITY-delete write — the CDC-keyed DELETE, and the whole point
    * of the shape: every row whose `keys` columns match a row of
    * `keys` is deleted WITHOUT READING A SINGLE DATA FILE. On a 100 TB
    * table, deleting a set of primary keys writes one small parquet of
    * key rows + one manifest and commits; the cost is O(|keys|),
    * independent of table size (position deletes still scan the
    * stats-pruned files to find row ordinals; equality deletes don't
    * even do that). Readers apply it null-safely with the spec's
    * STRICT-< sequence rule, so later re-inserts of a deleted key
    * survive — exactly the upsert-stream semantics Flink CDC relies
    * on. Like [[deletePositions]], the commit bumps the sequence and
    * upgrades v1 tables to format-version 2.
    */
  def deleteEquality(spark: SparkSession, path: String, keys: DataFrame): Long = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val schema = currentSchema(meta)
    val partFields = partFieldsOf(meta, schema)
    val idByName = fieldIdToName(meta).map(_.swap)
    val eqIds = keys.schema.fields.toSeq.map { f =>
      val tf = schema.fields.find(_.name == f.name).getOrElse(
        throw new IllegalArgumentException(
          s"IcebergInterop deleteEquality: key column ${f.name} not in table schema"))
      require(tf.dataType == f.dataType,
        s"IcebergInterop deleteEquality: key ${f.name} is ${f.dataType.simpleString}, " +
          s"table has ${tf.dataType.simpleString}")
      idByName.getOrElse(f.name, throw new IllegalStateException(
        s"no field id for ${f.name}"))
    }
    require(eqIds.nonEmpty, "IcebergInterop deleteEquality: no key columns")
    val curId = (meta \ "current-snapshot-id").extract[Long]
    // the spec wants delete files sorted; keys dedup for cleanliness
    val stage = new Path(s"$path/metadata/eqstage-${java.util.UUID.randomUUID()}")
    keys.distinct().coalesce(1)
      .sortWithinPartitions(keys.schema.fieldNames.map(col): _*)
      .write.parquet(stage.toString)
    val part = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("eq-delete write produced no file"))
    // footer row count — not a read-back count() action (see deletePositional)
    val nKeys = FileStats.fromFooters(spark, Seq(part.toString),
        org.apache.spark.sql.types.StructType(Nil))
      .headOption.flatMap(_._2.numRecords).getOrElse(0L)
    if (nKeys == 0L) { fs.delete(stage, true); return curId }
    val delPath = s"$path/data/eqdelete-${java.util.UUID.randomUUID()}.parquet"
    fs.mkdirs(new Path(delPath).getParent)
    require(fs.rename(part, new Path(delPath)), "eq-delete rename failed")
    fs.delete(stage, true)
    val snap = (meta \ "snapshots").extract[List[JValue]]
      .find(s => (s \ "snapshot-id").extract[Long] == curId)
      .getOrElse(throw new IllegalStateException(s"snapshot $curId not in $path"))
    val listRecs = readAvro(fs, new Path((snap \ "manifest-list").extract[String]))
    commitDeleteFile(fs, path, version, meta, schema, partFields,
      listRecs, delPath, nKeys, contentKind = 2, eqIds = eqIds)
  }

  /** MERGE INTO on the Iceberg wire format — the MERGE-ON-READ shape
    * v2 engines write (Flink CDC's upsert spelling): instead of
    * rewriting matched files, ONE snapshot carries (a) an
    * EQUALITY-delete file holding the ON-key rows of every matched row
    * a clause updated or deleted, and (b) new data files with the
    * updated + inserted rows. The spec's sequence rule does the rest:
    * an equality delete applies only to data files with a STRICTLY
    * lower sequence, so the same snapshot's appends survive while
    * every older version of the touched keys dies. Cost is
    * O(matched + inserted rows) — no data file is rewritten, the true
    * 100 TB merge shape ([[DeltaInterop.merge]] is the COW spelling).
    *
    * Matched rows are found over the source keys' [min,max] envelope
    * ([[FileStats.keyEnvelope]], stats-pruned through [[readWhere]],
    * which also applies existing row-level deletes so a dead row can
    * never match). Clause semantics, `t.`/`s.` value references, and
    * the multiple-source-rows `raise_error` guard are
    * [[VersionedTable.merge]]'s, shared via [[MergeKernel]]. Returns
    * the committed snapshot id (the current id when a full no-op).
    */
  def merge(spark: SparkSession, path: String, source: DataFrame,
      on: Seq[String], clauses: Seq[VersionedTable.MergeClause],
      txn: Option[(String, Long)] = None): Long = {
    import org.apache.spark.sql.expressions.Window
    require(clauses.nonEmpty, "IcebergInterop merge: no clauses")
    require(on.nonEmpty, "IcebergInterop merge: empty ON key list")
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val schema = currentSchema(meta)
    val partFields = partFieldsOf(meta, schema)
    val curId = (meta \ "current-snapshot-id").extract[Long]
    // replayed streaming batch → no-op (graft.txn table property,
    // the same exactly-once token [[write]] stamps)
    val metaProps =
      (meta \ "properties").extractOrElse[Map[String, String]](Map.empty)
    txn.foreach { case (appId, v) =>
      if (metaProps.get(s"graft.txn.$appId").exists(_.toLong >= v))
        return curId
    }
    on.foreach(c => require(schema.fieldNames.contains(c),
      s"IcebergInterop merge: ON column $c not in table schema"))
    on.foreach(c => require(source.columns.contains(c),
      s"IcebergInterop merge: ON column $c not in source"))
    val idByName = fieldIdToName(meta).map(_.swap)
    val eqIds = on.map(c => idByName.getOrElse(c,
      throw new IllegalStateException(s"no field id for $c")))
    val t0 = FileStats.keyEnvelope(source.select(on.map(col): _*), on) match {
      case FileStats.Unmatchable =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case FileStats.Unbounded => readWhere(spark, path, None)
      case FileStats.Bounds(p) => readWhere(spark, path, Some(p))
    }
    val src = source.persist()
    try {
      val t = t0.withColumn("__te", lit(1)).alias("t")
      val s = src
        .withColumn("__scnt", count(lit(1)).over(
          Window.partitionBy(on.map(col): _*)))
        .withColumn("__se", lit(1)).alias("s")
      val j = t.join(s,
        on.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _),
        "full_outer").persist()
      val mc = MergeKernel.columns(schema, source.columns.toSet, on, clauses,
        "IcebergInterop merge")
      // keys to equality-delete: every matched row some clause acted on
      // (the filter's guard raises on duplicate source rows even when
      // nothing is appended — delete-only merges still validate)
      val dupGuard = when(col("s.__scnt") > 1,
        raise_error(concat(
          lit("IcebergInterop merge: multiple source rows match target key "),
          concat_ws(",", on.map(k => col(s"s.$k").cast("string")): _*)))
          .cast("boolean")).otherwise(lit(true))
      val delKeys = j.filter(mc.matched && mc.matchTag =!= "keep" && dupGuard)
        .select(on.map(k => col(s"t.$k").as(k)): _*).distinct()
      try {
        // append set: updated matched rows + inserted rows (the dup
        // guard is `picked`'s first branch and fires during staging)
        val appendRows = j.select(
          when(mc.matched && col("s.__scnt") > 1, mc.picked)
            .when(mc.matched && mc.matchTag === "update", mc.matchedResult)
            .when(col("t.__te").isNull, mc.notMatchedResult)
            .otherwise(lit(null).cast(StructType(schema.fields))).as("__r"))
          .filter(col("__r").isNotNull).select("__r.*")
        // Emptiness and the delete-key count both come from the STAGED
        // WRITES' own parquet footers — no count()/isEmpty probe actions
        // per micro-batch (guide §1: cut actions, not just task work).
        // Zero-row staged files (an empty unpartitioned write still emits
        // one) are dropped before any manifest references them.
        val moved0 = graft.JobLabel(spark, "iceberg.merge: stage appends") {
          stageDataFiles(appendRows, path, partFields.map(_.name), fs)
        }
        val (movedEmpty, moved) = moved0.partition(_.records == 0L)
        movedEmpty.foreach(r => fs.delete(new Path(r.path), false))
        // sorted equality-delete parquet of the ON-key rows; row count
        // read back from its footer
        val delStage = new Path(s"$path/metadata/eqstage-${java.util.UUID.randomUUID()}")
        graft.JobLabel(spark, "iceberg.merge: stage eq-deletes") {
          delKeys.coalesce(1).sortWithinPartitions(on.map(col): _*)
            .write.parquet(delStage.toString)
        }
        val delPart = fs.listStatus(delStage).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            "merge eq-delete write produced no file"))
        val nDel = FileStats.fromFooters(spark, Seq(delPart.toString),
            StructType(Nil))
          .headOption.flatMap(_._2.numRecords).getOrElse(0L)
        if (nDel == 0) fs.delete(delStage, true)
        if (nDel == 0 && moved.isEmpty) return curId // full no-op
        val prevFormat = (meta \ "format-version").extract[Int]
        val fmt = if (nDel > 0) 2 else prevFormat
        val newSeq = if (fmt >= 2)
          (meta \ "last-sequence-number").extractOrElse[Long](0L) + 1 else 0L
        val snapshotId =
          math.abs(java.util.UUID.randomUUID().getMostSignificantBits)
        val snap = (meta \ "snapshots").extract[List[JValue]]
          .find(x => (x \ "snapshot-id").extract[Long] == curId)
          .getOrElse(throw new IllegalStateException(
            s"snapshot $curId not in $path"))
        val listRecs = readAvro(fs,
          new Path((snap \ "manifest-list").extract[String]))
        val fresh = scala.collection.mutable.ArrayBuffer[GenericRecord]()
        if (moved.nonEmpty) {
          val statsByFile = FileStats.fromFooters(spark, moved.map(_.path), schema)
          val manifestPath = s"$path/metadata/${java.util.UUID.randomUUID()}-m0.avro"
          val entrySchema = manifestEntrySchema(partFields)
          val (specId, specJson) = specStamp(Some(meta), partFields, schema)
          val len = writeAvro(fs, new Path(manifestPath), entrySchema,
            Map("schema" -> JsonMethods.compact(JsonMethods.render(schemaJson(schema))),
              "partition-spec" -> specJson,
              "partition-spec-id" -> specId,
              "format-version" -> fmt.toString),
            buildEntries(moved, snapshotId, schema, partFields,
              statsByFile, entrySchema))
          fresh += listEntryRecord(manifestPath, len, snapshotId,
            content = 0, seq = newSeq)
        }
        if (nDel > 0) {
          val delPath = s"$path/data/eqdelete-${java.util.UUID.randomUUID()}.parquet"
          fs.mkdirs(new Path(delPath).getParent)
          require(fs.rename(delPart, new Path(delPath)), "eq-delete rename failed")
          fs.delete(delStage, true)
          val delLen = fs.getFileStatus(new Path(delPath)).getLen
          val dfSchema = DeleteManifestEntrySchema.getField("data_file").schema()
          val dfRec = new GenericData.Record(dfSchema)
          dfRec.put("content", 2)
          dfRec.put("file_path", delPath)
          dfRec.put("file_format", "PARQUET")
          dfRec.put("partition",
            new GenericData.Record(dfSchema.getField("partition").schema()))
          dfRec.put("record_count", nDel)
          dfRec.put("file_size_in_bytes", delLen)
          dfRec.put("equality_ids",
            scala.jdk.CollectionConverters.SeqHasAsJava(
              eqIds.map(Integer.valueOf)).asJava)
          val entry = new GenericData.Record(DeleteManifestEntrySchema)
          entry.put("status", 1) // ADDED
          entry.put("snapshot_id", snapshotId)
          entry.put("data_file", dfRec)
          val manifestPath = s"$path/metadata/${java.util.UUID.randomUUID()}-d0.avro"
          val (dSpecId, dSpecJson) = specStamp(Some(meta), partFields, schema)
          val len = writeAvro(fs, new Path(manifestPath),
            DeleteManifestEntrySchema,
            Map("schema" -> JsonMethods.compact(JsonMethods.render(schemaJson(schema))),
              "partition-spec" -> dSpecJson,
              "partition-spec-id" -> dSpecId,
              "format-version" -> "2",
              "content" -> "deletes"),
            Seq(entry))
          fresh += listEntryRecord(manifestPath, len, snapshotId,
            content = 1, seq = newSeq)
        }
        val carried = listRecs.map(r => listEntryRecord(
          r.get("manifest_path").toString,
          r.get("manifest_length").asInstanceOf[Long],
          r.get("added_snapshot_id").asInstanceOf[java.lang.Long],
          content = listContentOf(r), seq = listSeqOf(r)))
        val listPath =
          s"$path/metadata/snap-$snapshotId-1-${java.util.UUID.randomUUID()}.avro"
        writeAvro(fs, new Path(listPath), ManifestFileSchema,
          Map("format-version" -> fmt.toString), fresh.toSeq ++ carried)
        publishMetadata(fs, path, Some((version, meta)), schema, partFields,
          metaProps ++
            txn.map { case (a, v) => s"graft.txn.$a" -> v.toString },
          fmt, newSeq, snapshotId, System.currentTimeMillis(),
          listPath, "overwrite")
      } finally { j.unpersist(); () }
    } finally { src.unpersist(); () }
  }

  /** `foreachBatch` body for a STREAMING MERGE into the Iceberg wire
    * format — the Flink-CDC-style upsert sink: each micro-batch
    * commits one merge-on-read snapshot under its (appId, batchId)
    * `graft.txn` property, so replayed batches are no-ops and the
    * sink is exactly-once. Empty batches commit nothing.
    */
  def streamBatchMerger(path: String, on: Seq[String],
      clauses: Seq[VersionedTable.MergeClause],
      appId: String): (DataFrame, Long) => Unit = { (batch, batchId) =>
    graft.GraftSession.withMicroBatchDml(batch) {
      val persisted = batch.persist()
      try {
        if (!persisted.isEmpty) {
          merge(persisted.sparkSession, path, persisted, on, clauses,
            txn = Some((appId, batchId)))
          ()
        }
      } finally { persisted.unpersist(); () }
    }
  }

  /** The data files `where` cannot prune — spec/test introspection. */
  private[graft] def liveFilesWhere(spark: SparkSession, path: String,
      where: Option[Column]): Seq[String] = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).get
    val meta = readMetadata(fs, path, version)
    val target = (meta \ "current-snapshot-id").extract[Long]
    val snap = (meta \ "snapshots").extract[List[JValue]]
      .find(s => (s \ "snapshot-id").extract[Long] == target).get
    val schema = currentSchema(meta)
    val dataFiles = liveEntries(fs, snap)
      .map(_.get("data_file").asInstanceOf[GenericRecord])
    FileStats.prune(spark, schema, where, dataFiles,
      (d: GenericRecord) => fileStatOf(d, schema, partFieldsOf(meta, schema)))._1
      .map(_.get("file_path").toString)
  }

  /** Driver-checked round trip: orders append (snapshot 1), a derived
    * high-value slice appends (snapshot 2 — the manifest list must
    * carry snapshot 1's manifest forward), and the result reads both
    * snapshots back through the full metadata→manifest chain.
    */
  def icebergRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft-iceberg-rt") + "/orders_iceberg"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val s1 = write(orders, out)
    write(orders.filter(col("o_totalprice") > 200000.0), out)
    val latest = read(spark, out).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"))
    val v1 = read(spark, out, snapshotId = Some(s1)).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows_s1"))
    latest.join(v1, "o_orderstatus").orderBy(col("o_orderstatus"))
  }

  /** Driver-checked WRITE-AUDIT-PUBLISH round trip: orders bootstrap
    * `main`; a high-value slice stages on an `audit` BRANCH (spec v2
    * refs) — the pre-publish read of main proving the staged data is
    * invisible is pinned INTO the result — then [[fastForward]]
    * publishes atomically and the final read sees both. The staging
    * lane every production ingest wants: validate a candidate batch on
    * a branch, publish metadata-only or drop the ref, never a
    * half-visible table.
    */
  def icebergWapRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft-iceberg-wap") + "/orders_iceberg"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    write(orders, out)
    createBranch(spark, out, "audit")
    writeToBranch(orders.filter(col("o_totalprice") > 300000.0), out, "audit")
    val pre = read(spark, out).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_pre"))
    val audit = readRef(spark, out, "audit").groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_audit"))
    fastForward(spark, out, "audit")
    val published = read(spark, out).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"))
    published.join(pre, "o_orderstatus").join(audit, "o_orderstatus")
      .orderBy(col("o_orderstatus"))
  }

  /** Driver-checked POSITION-DELETE round trip: orders land as a v1
    * table; a soft delete (v2 upgrade, no parquet rewritten) drops the
    * high-value rows; a fresh append adds NEW rows matching the same
    * predicate, which the sequence rule must leave alive; a second
    * delete then prunes by key. The final aggregate pins the full
    * merge-on-read read path under the hash gate, including the
    * delete-scoping-by-sequence semantics.
    */
  def icebergPosDeleteRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft-iceberg-posdel") + "/orders_iceberg"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    write(orders, out)
    deletePositions(spark, out, col("o_totalprice") > 300000.0)
    // re-append the high-value slice: same values, HIGHER sequence —
    // the existing delete must not touch these rows
    write(orders.filter(col("o_totalprice") > 300000.0), out)
    deletePositions(spark, out, col("o_orderkey") % 5 === 0)
    read(spark, out).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Driver-checked EQUALITY-DELETE round trip: keyed delete of the
    * mod-9 orderkeys (no data file read), then a high-value re-append
    * whose rows — including re-inserted deleted keys — sit above the
    * delete's sequence and must all survive (strict-< rule). The final
    * aggregate pins the keyed merge-on-read path under the hash gate.
    */
  def icebergEqDeleteRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft-iceberg-eqdel") + "/orders_iceberg"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    write(orders, out)
    deleteEquality(spark, out,
      orders.filter(col("o_orderkey") % 9 === 0).select(col("o_orderkey")))
    write(orders.filter(col("o_totalprice") > 400000.0), out)
    read(spark, out).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_live"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Driver-checked MERGE INTO on the wire format: ONE statement
    * against the Iceberg orders table updates every 100th key (+100000
    * price), deletes every (100k+50)th, and inserts a negated copy of
    * every (100k+25)th — the same deterministic merge as `q_merge` /
    * `q_delta_merge`, here as one merge-on-read snapshot (equality
    * delete + appends, nothing rewritten). The read back applies the
    * sequence-scoped delete chain; the oracle reconstructs the end
    * state relationally.
    */
  def icebergMergeRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft-iceberg-merge") + "/orders_iceberg"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    write(orders, out, partitionBy = Seq("o_orderstatus"))
    val src = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("op", lit("U"))
      .unionByName(orders.filter(col("o_orderkey") % 100 === 50)
        .withColumn("op", lit("D")))
      .unionByName(orders.filter(col("o_orderkey") % 100 === 25)
        .withColumn("o_orderkey", -col("o_orderkey")).withColumn("op", lit("I")))
    merge(spark, out, src, on = Seq("o_orderkey"), clauses = Seq(
      VersionedTable.MatchedDelete(Some(col("s.op") === "D")),
      VersionedTable.MatchedUpdate(
        Map("o_totalprice" -> (col("s.o_totalprice") + lit(100000.0))),
        Some(col("s.op") === "U")),
      VersionedTable.NotMatchedInsert(cond = Some(col("s.op") === "I"))))
    read(spark, out)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** ADDED (status 1) manifest entries for freshly staged files: typed
    * partition record + the spec's column-stats maps (field-id keyed)
    * from the commit's one distributed stats pass.
    */
  private def buildEntries(moved: Seq[DataFileRef], snapshotId: Long,
      schema: StructType, partFields: Seq[StructField],
      statsByFile: Map[String, FileStats.FileStat],
      entrySchema: org.apache.avro.Schema): Seq[GenericRecord] = {
    val dataFileSchema = entrySchema.getField("data_file").schema()
    def kvItemSchema(field: String) =
      dataFileSchema.getField(field).schema().getTypes.get(1).getElementType
    def kvList(field: String, pairs: Seq[(Int, Any)]): java.util.List[GenericRecord] =
      pairs.map { case (k, v) =>
        val r = new GenericData.Record(kvItemSchema(field))
        r.put("key", k); r.put("value", v); r: GenericRecord
      }.asJava
    moved.map { f =>
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapshotId)
      val d = new GenericData.Record(dataFileSchema)
      d.put("file_path", f.path)
      d.put("file_format", "PARQUET")
      val partRec = new GenericData.Record(
        dataFileSchema.getField("partition").schema())
      partFields.zip(f.partValues).foreach { case (pf, v) =>
        partRec.put(pf.name, v.map(partAvroValue(_, pf.dataType)).orNull)
      }
      d.put("partition", partRec)
      d.put("record_count", f.records)
      d.put("file_size_in_bytes", f.bytes)
      d.put("block_size_in_bytes", 67108864L)
      statsByFile.get(FileStats.canon(f.path)).foreach { st =>
        val fields = schema.fields.zipWithIndex
        d.put("value_counts", kvList("value_counts",
          fields.map { case (_, i) => (i + 1) -> st.numRecords.getOrElse(0L) }.toSeq))
        d.put("null_value_counts", kvList("null_value_counts",
          fields.toSeq.flatMap { case (fld, i) =>
            st.cols.get(fld.name).flatMap(_.nullCount).map((i + 1) -> _) }))
        d.put("lower_bounds", kvList("lower_bounds",
          fields.toSeq.flatMap { case (fld, i) =>
            st.cols.get(fld.name).flatMap(_.min)
              .flatMap(boundBytes(_, fld.dataType)).map((i + 1) -> _) }))
        d.put("upper_bounds", kvList("upper_bounds",
          fields.toSeq.flatMap { case (fld, i) =>
            st.cols.get(fld.name).flatMap(_.max)
              .flatMap(boundBytes(_, fld.dataType)).map((i + 1) -> _) }))
      }
      e.put("data_file", d)
      e
    }
  }

  /** The live (status != DELETED) data-file entries of a snapshot,
    * with their manifest-entry records.
    */
  private def liveEntries(fs: FileSystem, snap: JValue): Seq[GenericRecord] =
    liveEntriesWithSeq(fs, snap).map(_._1)

  /** Live entries paired with their DATA sequence (entry-level override
    * or list-level inheritance) — what a v2 rewrite must carry forward.
    */
  private def liveEntriesWithSeq(fs: FileSystem, snap: JValue)
      : Seq[(GenericRecord, Long)] =
    readAvro(fs, new Path((snap \ "manifest-list").extract[String]))
      .filter(listContentOf(_) == 0) // data manifests only, never content=1
      .flatMap { r =>
        val seq = listSeqOf(r)
        readAvro(fs, new Path(r.get("manifest_path").toString))
          .map(e => (e, entrySeqOf(e, seq)))
      }
      .filter(_._1.get("status").asInstanceOf[Int] != 2)

  /** Refuse loudly when a v2 snapshot carries position-delete manifests:
    * callers that rewrite or adopt data files wholesale (compaction,
    * metadata-only CONVERT) would orphan the deletes and resurrect
    * deleted rows — silent corruption. The delete-aware read path
    * ([[readIceberg]]) applies them instead of refusing.
    */
  private def requireNoDeleteManifests(fs: FileSystem, snap: JValue,
      what: String): Unit = {
    val dels = readAvro(fs, new Path((snap \ "manifest-list").extract[String]))
      .count(listContentOf(_) == 1)
    require(dels == 0,
      s"IcebergInterop $what: snapshot carries $dels position-delete " +
        "manifest(s) (v2 content=1); rewrite the table through the " +
        "delete-aware reader first")
  }

  /** Partition tuple of a manifest entry (null-safe), for grouping. */
  private def partKeyOf(e: GenericRecord,
      partFields: Seq[StructField]): Seq[Option[Any]] = {
    val rec = e.get("data_file").asInstanceOf[GenericRecord]
      .get("partition").asInstanceOf[GenericRecord]
    partFields.map(pf =>
      if (rec.getSchema.getField(pf.name) == null) None
      else Option(rec.get(pf.name)).map {
        case u: org.apache.avro.util.Utf8 => u.toString
        case v => v
      })
  }

  /** Append a snapshot to the EXISTING table metadata (no schema/spec
    * change — maintenance commits), returning the new version. The
    * metadata JSON is the previous one with snapshot bookkeeping
    * updated, so every other field round-trips byte-compatible.
    */
  private def commitMaintenance(fs: FileSystem, path: String, version: Int,
      meta: JValue, snapshotId: Long, listPath: String,
      operation: String, dropSnapshotIds: Set[Long] = Set.empty,
      newSeq: Option[Long] = None): Int = {
    requireWritableFormat(meta)
    val now = System.currentTimeMillis()
    val parent = (meta \ "current-snapshot-id").extract[Long]
    val snapshot = JObject(
      "snapshot-id" -> JLong(snapshotId),
      "parent-snapshot-id" -> JLong(parent),
      "timestamp-ms" -> JLong(now),
      "summary" -> JObject("operation" -> JString(operation)),
      "manifest-list" -> JString(listPath),
      "schema-id" -> JInt(0)) ~~
      // v2 requires a sequence-number on every snapshot
      newSeq.map(q => JObject("sequence-number" -> JLong(q)))
    val keptSnaps = (meta \ "snapshots").extract[List[JValue]]
      .filterNot(s => dropSnapshotIds.contains((s \ "snapshot-id").extract[Long]))
    val keptLog = (meta \ "snapshot-log").extractOrElse[List[JValue]](Nil)
      .filterNot(s => dropSnapshotIds.contains((s \ "snapshot-id").extract[Long]))
    refsOf(meta).foreach { case (name, (id, _)) =>
      require(name == "main" || !dropSnapshotIds.contains(id),
        s"IcebergInterop: maintenance would drop snapshot $id still " +
          s"referenced by ref '$name' — dropRef first")
    }
    val updated = JObject(meta.asInstanceOf[JObject].obj.map {
      case ("last-updated-ms", _) => "last-updated-ms" -> (JLong(now): JValue)
      case ("last-sequence-number", v) =>
        "last-sequence-number" -> newSeq.map(q => JLong(q): JValue).getOrElse(v)
      case ("current-snapshot-id", _) =>
        "current-snapshot-id" -> (JLong(snapshotId): JValue)
      case ("refs", _) => // `main` follows current (spec rule)
        "refs" -> refsJson(refsOf(meta) + ("main" -> (snapshotId, "branch")))
      case ("snapshots", _) =>
        "snapshots" -> (JArray(keptSnaps :+ snapshot): JValue)
      case ("snapshot-log", _) =>
        "snapshot-log" -> (JArray(keptLog :+ JObject(
          "timestamp-ms" -> JLong(now),
          "snapshot-id" -> JLong(snapshotId))): JValue)
      case other => other
    })
    val newVersion = version + 1
    val metaPath = new Path(s"$path/metadata/v$newVersion.metadata.json")
    require(!fs.exists(metaPath),
      s"Iceberg metadata v$newVersion already exists (concurrent writer)")
    writeFile(fs, metaPath, JsonMethods.pretty(JsonMethods.render(updated))
      .getBytes(StandardCharsets.UTF_8))
    writeFile(fs, new Path(s"$path/metadata/version-hint.text"),
      newVersion.toString.getBytes(StandardCharsets.UTF_8))
    newVersion
  }

  /** The current snapshot's ancestor chain, root-first (the streaming
    * tail's clock: position = depth). None for an empty/absent table.
    */
  def snapshotChain(spark: SparkSession, path: String): Option[Seq[Long]] = {
    val fs = fsFor(spark, path)
    currentVersion(fs, path).map { version =>
      val meta = readMetadata(fs, path, version)
      val byId = (meta \ "snapshots").extract[List[JValue]]
        .map(s => (s \ "snapshot-id").extract[Long] -> s).toMap
      val chain = scala.collection.mutable.ArrayBuffer[Long]()
      var cursor: Option[Long] = Some((meta \ "current-snapshot-id").extract[Long])
      while (cursor.isDefined && byId.contains(cursor.get)) {
        chain.prepend(cursor.get)
        cursor = (byId(cursor.get) \ "parent-snapshot-id").extractOpt[Long]
      }
      chain.toSeq
    }
  }

  /** Rows ADDED by the snapshots in `(fromSnapshot, toSnapshot]`,
    * resolved by walking the parent chain back from `toSnapshot` — the
    * streaming-tail window. `append` snapshots emit their status-ADDED
    * files; `replace` (compaction) snapshots emit nothing; `overwrite`
    * is not expressible as an append and fails loudly unless
    * `ignoreChanges`. A broken parent chain (the range was expired)
    * also fails loudly — restart the stream from a fresh checkpoint.
    */
  def appendsBetween(spark: SparkSession, path: String,
      fromSnapshot: Option[Long], toSnapshot: Long,
      ignoreChanges: Boolean = false): DataFrame = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val schema = currentSchema(meta)
    val byId = (meta \ "snapshots").extract[List[JValue]]
      .map(s => (s \ "snapshot-id").extract[Long] -> s).toMap
    // walk to the range start; collect in commit order
    val chain = scala.collection.mutable.ArrayBuffer[JValue]()
    var cursor: Option[Long] = Some(toSnapshot)
    while (cursor.isDefined && !fromSnapshot.contains(cursor.get)) {
      val s = byId.getOrElse(cursor.get, throw new IllegalStateException(
        s"IcebergInterop appendsBetween: snapshot ${cursor.get} not in metadata " +
          "(expired?) — restart the stream from a fresh checkpoint"))
      chain.prepend(s)
      cursor = (s \ "parent-snapshot-id").extractOpt[Long]
    }
    require(cursor.isDefined == fromSnapshot.isDefined,
      s"IcebergInterop appendsBetween: $fromSnapshot is not an ancestor of $toSnapshot")
    val files = chain.toSeq.flatMap { s =>
      val sid = (s \ "snapshot-id").extract[Long]
      val op = (s \ "summary" \ "operation").extractOrElse[String]("append")
      if (op == "replace") Nil // maintenance: no new rows
      else {
        require(op == "append" || ignoreChanges,
          s"IcebergInterop appendsBetween: snapshot $sid is a '$op' — not " +
            "expressible as an append; set ignoreChanges=true to re-emit rows")
        readAvro(fs, new Path((s \ "manifest-list").extract[String]))
          .filter(listContentOf(_) == 0) // never adopt delete parquet as data
          .flatMap(r => readAvro(fs, new Path(r.get("manifest_path").toString)))
          .filter(e => e.get("status").asInstanceOf[Int] == 1 &&
            e.get("snapshot_id") == sid)
          .map(_.get("data_file").asInstanceOf[GenericRecord]
            .get("file_path").toString)
      }
    }
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
    else spark.read.schema(schema).parquet(files.distinct: _*)
  }

  /** rewrite_data_files (bin-packing compaction): every partition tuple
    * holding more than one live file rewrites into one; untouched
    * files carry into the new snapshot as EXISTING (status 0) entries
    * keeping their stats verbatim. The new snapshot's manifest list
    * references ONE manifest covering the whole live file set —
    * operation `replace`, rows unchanged. The streaming-sink pair:
    * one snapshot per micro-batch means file count grows with stream
    * age unless a compactor runs beside it.
    */
  /** Collapse accumulated row-level deletes into clean parquet: the
    * current state (position AND equality deletes applied by the read
    * path) rewrites as an overwrite snapshot with no carried
    * manifests, so [[compact]] and [[expireSnapshots]] — which refuse
    * delete-bearing snapshots rather than orphan/resurrect — can run
    * again. The Iceberg spelling of `rewrite_data_files` with
    * delete-file removal, and the operational pair of
    * [[deletePositions]]/[[deleteEquality]]: soft deletes accumulate
    * cheaply between collapses, then one rewrite amortizes them.
    */
  def collapseDeletes(spark: SparkSession, path: String): Long = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val partCols = partFieldsOf(meta, currentSchema(meta)).map(_.name)
    write(read(spark, path), path, overwrite = true, partitionBy = partCols)
  }

  def compact(spark: SparkSession, path: String): Long =
    compact(spark, path, zorderBy = Nil)

  /** `rewrite_data_files` with the SORT/Z-ORDER strategy when `zorderBy`
    * is non-empty: every live file rewrites clustered on the interleaved
    * quantile-bucketed Morton key, so manifest bounds become tight
    * hyper-rectangles and range predicates on any z-column prune through
    * [[readWhere]] — Iceberg's own zorder rewrite trade.
    */
  def compact(spark: SparkSession, path: String, zorderBy: Seq[String],
      filesPerPartition: Int = 16,
      targetFileBytes: Option[Long] = None): Long = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val schema = currentSchema(meta)
    val partFields = partFieldsOf(meta, schema)
    zorderBy.foreach(c => require(
      schema.fieldNames.contains(c) && !partFields.exists(_.name == c),
      s"compact zorderBy: $c must be a non-partition data column"))
    val current = (meta \ "current-snapshot-id").extract[Long]
    val snap = (meta \ "snapshots").extract[List[JValue]]
      .find(s => (s \ "snapshot-id").extract[Long] == current).get
    requireNoDeleteManifests(fs, snap, "compact") // rewrite orphans deletes
    val prevFormat = (meta \ "format-version").extract[Int]
    val newSeq = if (prevFormat >= 2)
      (meta \ "last-sequence-number").extractOrElse[Long](0L) + 1 else 0L
    val entries = liveEntriesWithSeq(fs, snap)
    val grouped = entries.groupBy(e => partKeyOf(e._1, partFields))
    // z-order re-clusters EVERYTHING; plain bin-packing touches only
    // partitions that can pack smaller
    val multi =
      if (zorderBy.nonEmpty) grouped
      else grouped.filter(_._2.size > 1)
    if (multi.isEmpty) return current
    val untouched = grouped.filterNot(g => multi.contains(g._1)).values.flatten.toSeq
    val touchedPaths = multi.values.flatten.toSeq.map(
      _._1.get("data_file").asInstanceOf[GenericRecord].get("file_path").toString)
    val frame = spark.read.schema(schema).parquet(touchedPaths: _*)
    val packed =
      if (zorderBy.nonEmpty) {
        import graft.functions.ZOrder
        val bounds = zorderBy.map(c => ZOrder.quantileBoundaries(frame, c))
        val zkey = ZOrder.zorderKey(zorderBy.map(col), bounds,
          bits = math.min(8, 63 / zorderBy.size))
        val keys = partFields.map(f => col(f.name)) :+ col("__z")
        frame.withColumn("__z", zkey)
          .repartitionByRange(
            math.max(multi.size, filesPerPartition), keys: _*)
          .sortWithinPartitions(keys: _*)
          .drop("__z")
      }
      else targetFileBytes match {
        case Some(target) =>
          // byte-targeted bin-packing: ceil(bytes/target) files per
          // partition — a huge partition never packs into one file.
          // Range partitioning keeps distinct (partition, salt) keys
          // apart (hash would birthday-collide them).
          val nOut = multi.map { case (pv, es) =>
            val bytes = es.map(_._1.get("data_file")
              .asInstanceOf[GenericRecord].get("file_size_in_bytes")
              .asInstanceOf[java.lang.Long].longValue()).sum
            pv -> math.max(1L, (bytes + target - 1) / target).toInt
          }
          val modExpr = nOut.foldLeft(lit(1)) { case (acc, (pv, n)) =>
            val hit = partFields.zip(pv).map { case (pf, v) =>
              col(pf.name) <=> v.map(x => lit(x).cast(pf.dataType))
                .getOrElse(lit(null).cast(pf.dataType))
            }.reduceOption(_ && _).getOrElse(lit(true))
            when(hit, lit(n)).otherwise(acc)
          }
          frame
            .withColumn("__salt",
              pmod((rand(7) * 1000000).cast("int"), modExpr))
            .repartitionByRange(nOut.values.sum,
              (partFields.map(f => col(f.name)) :+ col("__salt")): _*)
            .drop("__salt")
        case None if partFields.isEmpty => frame.coalesce(1)
        case None =>
          frame.repartition(multi.size, partFields.map(f => col(f.name)): _*)
      }
    val moved = stageDataFiles(packed, path, partFields.map(_.name), fs,
      shape = false)
    val snapshotId = math.abs(java.util.UUID.randomUUID().getMostSignificantBits)
    val statsByFile = FileStats.fromFooters(spark, moved.map(_.path), schema)
    val entrySchema = manifestEntrySchema(partFields)
    val newEntries = buildEntries(moved, snapshotId, schema, partFields,
      statsByFile, entrySchema) ++
      untouched.map { case (old, oldSeq) =>
        val e = new GenericData.Record(entrySchema)
        e.put("status", 0) // EXISTING
        e.put("snapshot_id", old.get("snapshot_id"))
        // entry-level sequence: an EXISTING entry carried into the
        // rewritten manifest must keep its ORIGINAL data sequence, or
        // v2 readers would inflate it to the new list-level sequence
        // and skip the deletes that legitimately target it (the rule
        // the foreign fixture pins)
        if (prevFormat >= 2) {
          e.put("sequence_number", oldSeq)
          e.put("file_sequence_number", oldSeq)
        }
        e.put("data_file", old.get("data_file"))
        e
      }
    val manifestPath = s"$path/metadata/${java.util.UUID.randomUUID()}-m0.avro"
    val (specId, specJson) = specStamp(Some(meta), partFields, schema)
    val manifestLen = writeAvro(fs, new Path(manifestPath), entrySchema,
      Map("schema" -> JsonMethods.compact(JsonMethods.render(schemaJson(schema))),
        "partition-spec" -> specJson,
        "partition-spec-id" -> specId, "format-version" -> prevFormat.toString),
      newEntries)
    val listPath = s"$path/metadata/snap-$snapshotId-1-${java.util.UUID.randomUUID()}.avro"
    val listRec = listEntryRecord(manifestPath, manifestLen, snapshotId,
      content = 0, seq = newSeq)
    writeAvro(fs, new Path(listPath), ManifestFileSchema,
      Map("format-version" -> prevFormat.toString), Seq(listRec))
    commitMaintenance(fs, path, version, meta, snapshotId, listPath, "replace",
      newSeq = if (prevFormat >= 2) Some(newSeq) else None)
    snapshotId
  }

  /** expire_snapshots: drop all but the newest `keepLast` snapshots
    * from the metadata and physically delete every manifest list,
    * manifest, and data file referenced ONLY by the expired ones.
    * Time travel to an expired snapshot stops working — the spec's
    * documented trade; current reads are untouched. Returns
    * (expired snapshot count, deleted data-file count).
    */
  def expireSnapshots(spark: SparkSession, path: String,
      keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "expireSnapshots: keepLast must be >= 1")
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    requireWritableFormat(meta)
    // foreign metadata lists snapshots in ARBITRARY order (the foreign
    // fixture pins one out of order) — "last" means newest by sequence
    // then timestamp, never list position
    val all = (meta \ "snapshots").extract[List[JValue]]
      .sortBy(s => ((s \ "sequence-number").extractOrElse[Long](0L),
        (s \ "timestamp-ms").extractOrElse[Long](0L)))
    if (all.size <= keepLast) return (0, 0)
    // branch heads / tags survive expiry regardless of age — a ref is a
    // promise the snapshot stays readable until the ref itself drops
    val refHeads = refsOf(meta).values.map(_._1).toSet
    val (keepRefd, rest) = all.partition(s =>
      refHeads.contains((s \ "snapshot-id").extract[Long]))
    val keep = (keepRefd ++ rest.takeRight(
      math.max(0, keepLast - keepRefd.size)))
      .sortBy(s => ((s \ "sequence-number").extractOrElse[Long](0L),
        (s \ "timestamp-ms").extractOrElse[Long](0L)))
    val keepIds = keep.map(s => (s \ "snapshot-id").extract[Long]).toSet
    val expired = all.filterNot(s =>
      keepIds.contains((s \ "snapshot-id").extract[Long]))
    if (expired.isEmpty) return (0, 0)
    val current = (meta \ "current-snapshot-id").extract[Long]
    require(keep.exists(s => (s \ "snapshot-id").extract[Long] == current),
      "expireSnapshots: the current snapshot must survive")
    def listsOf(snaps: Seq[JValue]): Seq[String] =
      snaps.map(s => (s \ "manifest-list").extract[String])
    def manifestsOf(lists: Seq[String]): Set[String] =
      lists.flatMap(l => readAvro(fs, new Path(l))
        .map(_.get("manifest_path").toString)).toSet
    def filesOf(manifests: Set[String]): Set[String] =
      manifests.flatMap(m => readAvro(fs, new Path(m)).map(
        _.get("data_file").asInstanceOf[GenericRecord].get("file_path").toString))
    val keepManifests = manifestsOf(listsOf(keep))
    val keepFiles = filesOf(keepManifests)
    val deadManifests = manifestsOf(listsOf(expired)) -- keepManifests
    val deadFiles = filesOf(deadManifests) -- keepFiles
    deadFiles.foreach(f => fs.delete(new Path(f), false))
    deadManifests.foreach(m => fs.delete(new Path(m), false))
    listsOf(expired).foreach(l => fs.delete(new Path(l), false))
    val expiredIds = expired.map(s => (s \ "snapshot-id").extract[Long]).toSet
    // a metadata-only commit: same current snapshot, expired ones gone
    val keptLog = (meta \ "snapshot-log").extractOrElse[List[JValue]](Nil)
      .filterNot(s => expiredIds.contains((s \ "snapshot-id").extract[Long]))
    val updated = JObject(meta.asInstanceOf[JObject].obj.map {
      case ("last-updated-ms", _) =>
        "last-updated-ms" -> (JLong(System.currentTimeMillis()): JValue)
      case ("snapshots", _) => "snapshots" -> (JArray(keep.toList): JValue)
      case ("snapshot-log", _) => "snapshot-log" -> (JArray(keptLog): JValue)
      case other => other
    })
    val newVersion = version + 1
    val metaPath = new Path(s"$path/metadata/v$newVersion.metadata.json")
    require(!fs.exists(metaPath),
      s"Iceberg metadata v$newVersion already exists (concurrent writer)")
    writeFile(fs, metaPath, JsonMethods.pretty(JsonMethods.render(updated))
      .getBytes(StandardCharsets.UTF_8))
    writeFile(fs, new Path(s"$path/metadata/version-hint.text"),
      newVersion.toString.getBytes(StandardCharsets.UTF_8))
    (expired.size, deadFiles.size)
  }

  /** `rewrite_manifests`: collapse the current snapshot's DATA
    * manifests into ONE, as a metadata-only `replace` snapshot — no
    * data parquet moves. Every merged entry lands status=EXISTING with
    * its EXPLICIT per-entry `sequence_number` (entry field-id 3), so
    * the v2 delete-scoping rule keeps working: an equality delete
    * still applies only to data files whose original sequence is
    * strictly below it, wherever their entry now lives. Delete
    * manifests are carried untouched.
    *
    * This is the planning-cost maintenance op: a streaming table that
    * commits once a minute accrues 1440 manifests a day, and every
    * read opens ALL of them before pruning a single data file — at
    * 100 TB the manifest walk, not the data, becomes the read
    * planner's bottleneck. Collapsing restores O(1) metadata reads;
    * the superseded manifests age out via [[expireSnapshots]] /
    * [[removeOrphanFiles]].
    *
    * Honest coverage note: entries are re-encoded through graft's own
    * entry schema; a foreign manifest whose record shape diverges
    * fails the deep-copy loudly rather than dropping fields.
    * Returns the number of manifests merged (0 = nothing to do).
    */
  def rewriteManifests(spark: SparkSession, path: String): Int = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val schema = currentSchema(meta)
    val partFields = partFieldsOf(meta, schema)
    val curId = (meta \ "current-snapshot-id").extract[Long]
    val snap = (meta \ "snapshots").extract[List[JValue]]
      .find(s => (s \ "snapshot-id").extract[Long] == curId)
      .getOrElse(throw new IllegalStateException(s"snapshot $curId not in $path"))
    val listRecs = readAvro(fs, new Path((snap \ "manifest-list").extract[String]))
    val (delRecs, dataRecs) = listRecs.partition(r => listContentOf(r) == 1)
    if (dataRecs.size <= 1) return 0
    val entrySchema = manifestEntrySchema(partFields)
    val dfSchema = entrySchema.getField("data_file").schema()
    val gd = org.apache.avro.generic.GenericData.get()
    val merged: Seq[GenericRecord] = dataRecs.flatMap { r =>
      val inherited = listSeqOf(r)
      readAvro(fs, new Path(r.get("manifest_path").toString)).collect {
        case e if e.get("status").asInstanceOf[Int] != 2 => // not DELETED
          val ne = new GenericData.Record(entrySchema)
          ne.put("status", 0) // EXISTING
          ne.put("snapshot_id", e.get("snapshot_id"))
          ne.put("sequence_number", entrySeqOf(e, inherited))
          ne.put("data_file",
            try gd.deepCopy(dfSchema,
              e.get("data_file").asInstanceOf[GenericRecord])
            catch { case ex: Exception => throw new IllegalArgumentException(
              "IcebergInterop rewriteManifests: foreign manifest entry " +
                s"shape diverges from the table schema (${ex.getMessage}) — " +
                "refusing rather than dropping fields", ex) })
          ne: GenericRecord
      }
    }
    val fmt = (meta \ "format-version").extract[Int]
    val manifestPath = s"$path/metadata/${java.util.UUID.randomUUID()}-m0.avro"
    val (specId, specJson) = specStamp(Some(meta), partFields, schema)
    val manifestLen = writeAvro(fs, new Path(manifestPath), entrySchema,
      Map("schema" -> JsonMethods.compact(JsonMethods.render(schemaJson(schema))),
        "partition-spec" -> specJson,
        "partition-spec-id" -> specId,
        "format-version" -> fmt.toString),
      merged)
    val newSeq = if (fmt >= 2)
      Some((meta \ "last-sequence-number").extractOrElse[Long](0L) + 1)
    else None
    val snapshotId = math.abs(java.util.UUID.randomUUID().getMostSignificantBits)
    val listPath =
      s"$path/metadata/snap-$snapshotId-1-${java.util.UUID.randomUUID()}.avro"
    val mergedEntry = listEntryRecord(manifestPath, manifestLen, snapshotId,
      content = 0, seq = newSeq.getOrElse(0L))
    val carried = delRecs.map(r => listEntryRecord(
      r.get("manifest_path").toString,
      r.get("manifest_length").asInstanceOf[Long],
      r.get("added_snapshot_id").asInstanceOf[java.lang.Long],
      content = listContentOf(r), seq = listSeqOf(r)))
    writeAvro(fs, new Path(listPath), ManifestFileSchema,
      Map("format-version" -> fmt.toString), mergedEntry +: carried)
    commitMaintenance(fs, path, version, meta, snapshotId, listPath,
      "replace", newSeq = newSeq)
    dataRecs.size
  }

  /** `remove_orphan_files`: physically delete data/manifest files under
    * the table root that NO retained metadata version references —
    * crash debris a failed stage or lost commit race left behind (the
    * rename-based commit protocol makes such debris unreferenced by
    * construction, never corrupt). The reachable set unions EVERY
    * `vN.metadata.json`'s snapshots (manifest list → manifests → data +
    * delete files, all statuses and content kinds), so time travel to
    * any retained version stays intact; [[expireSnapshots]] is the op
    * that shrinks that set first. `olderThanMs` (default 3 days, the
    * real procedure's default) protects still-uncommitted writers.
    * Candidates are `.parquet`/`.avro` files only — `*.metadata.json` /
    * `version-hint.text` are the log itself. Returns the deleted count.
    *
    * Scale: one driver-side metadata walk (bounded by manifest count,
    * memoized per manifest) + one tree listing per maintenance run.
    */
  def removeOrphanFiles(spark: SparkSession, path: String,
      olderThanMs: Long = 3L * 24 * 3600 * 1000): Int = {
    require(olderThanMs >= 0, "removeOrphanFiles: negative grace period")
    val fs = fsFor(spark, path)
    require(currentVersion(fs, path).isDefined,
      s"not an Iceberg table (no metadata/version-hint.text): $path")
    def keyOf(p: String): String =
      FileStats.canon(fs.makeQualified(new Path(p)).toString)
    val reachable = scala.collection.mutable.Set[String]()
    val visitedManifests = scala.collection.mutable.Set[String]()
    val metaDir = new Path(s"$path/metadata")
    val versions = fs.listStatus(metaDir).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d+\\.metadata\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".metadata.json").toInt).sorted
    versions.foreach { v =>
      val meta = readMetadata(fs, path, v)
      (meta \ "snapshots").extractOrElse[List[JValue]](Nil).foreach { s =>
        val list = (s \ "manifest-list").extract[String]
        reachable += keyOf(list)
        // an OLD metadata version may reference lists/manifests a later
        // expireSnapshots already deleted — skip those: every file that
        // was reachable ONLY through an expired snapshot was that
        // expire's GC target already, and files still live re-enter the
        // set through the current snapshots' intact lists
        if (fs.exists(new Path(list)))
          readAvro(fs, new Path(list)).foreach { r =>
            val m = r.get("manifest_path").toString
            reachable += keyOf(m)
            if (visitedManifests.add(keyOf(m)) && fs.exists(new Path(m)))
              readAvro(fs, new Path(m)).foreach { e =>
                reachable += keyOf(e.get("data_file")
                  .asInstanceOf[GenericRecord].get("file_path").toString)
              }
          }
      }
    }
    // files the manifests marked visited already contributed their
    // entries; now walk the tree for unreferenced candidates
    val cutoff = System.currentTimeMillis() - olderThanMs
    var deleted = 0
    def walk(d: Path): Unit = fs.listStatus(d).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory) walk(st.getPath)
      else if ((name.endsWith(".parquet") || name.endsWith(".avro")) &&
          !reachable.contains(keyOf(st.getPath.toString)) &&
          st.getModificationTime < cutoff) {
        fs.delete(st.getPath, false)
        deleted += 1
      }
    }
    walk(new Path(path))
    deleted
  }

  /** `rollback_to_snapshot`: a metadata-only new version whose
    * `current-snapshot-id` points back at `snapshotId` (which must
    * still be retained). Nothing is deleted — the rolled-past snapshots
    * stay in the list and remain time-travelable until
    * [[expireSnapshots]]. Returns the new metadata version.
    */
  def rollbackTo(spark: SparkSession, path: String, snapshotId: Long): Int = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    requireWritableFormat(meta)
    val ids = (meta \ "snapshots").extractOrElse[List[JValue]](Nil)
      .map(s => (s \ "snapshot-id").extract[Long])
    require(ids.contains(snapshotId),
      s"rollbackTo: snapshot $snapshotId not retained " +
        s"(have ${ids.mkString(", ")})")
    val now = System.currentTimeMillis()
    val logEntry: JValue = JObject(
      "timestamp-ms" -> JLong(now), "snapshot-id" -> JLong(snapshotId))
    val hadLog = (meta \ "snapshot-log") != JNothing
    val updated0 = JObject(meta.asInstanceOf[JObject].obj.map {
      case ("last-updated-ms", _) =>
        "last-updated-ms" -> (JLong(now): JValue)
      case ("current-snapshot-id", _) =>
        "current-snapshot-id" -> (JLong(snapshotId): JValue)
      case ("refs", _) => // `main` follows current (spec rule)
        "refs" -> refsJson(refsOf(meta) + ("main" -> (snapshotId, "branch")))
      case ("snapshot-log", v) => "snapshot-log" ->
        (JArray(v.extractOrElse[List[JValue]](Nil) :+ logEntry): JValue)
      case other => other
    })
    val updated = if (hadLog) updated0
      else JObject(updated0.obj :+
        ("snapshot-log" -> (JArray(List(logEntry)): JValue)))
    val newVersion = version + 1
    val metaPath = new Path(s"$path/metadata/v$newVersion.metadata.json")
    require(!fs.exists(metaPath),
      s"Iceberg metadata v$newVersion already exists (concurrent writer)")
    writeFile(fs, metaPath, JsonMethods.pretty(JsonMethods.render(updated))
      .getBytes(StandardCharsets.UTF_8))
    writeFile(fs, new Path(s"$path/metadata/version-hint.text"),
      newVersion.toString.getBytes(StandardCharsets.UTF_8))
    newVersion
  }

  /** Live data bytes at a snapshot from the manifests'
    * `file_size_in_bytes` (metadata only) — the planner-statistics
    * number for broadcast decisions.
    */
  def liveBytes(spark: SparkSession, path: String,
      snapshotId: Option[Long] = None): Long = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val target = snapshotId.getOrElse((meta \ "current-snapshot-id").extract[Long])
    (meta \ "snapshots").extract[List[JValue]]
      .find(s => (s \ "snapshot-id").extract[Long] == target)
      .map(snap => liveEntries(fs, snap).map(_.get("data_file")
        .asInstanceOf[GenericRecord].get("file_size_in_bytes")
        .asInstanceOf[Long]).sum)
      .getOrElse(0L)
  }

  /** Iceberg's INSPECTION tables (`t.snapshots`, `t.files`,
    * `t.manifests`, `t.refs`, `t.history`) as DataFrames — the
    * operational surface every Iceberg runbook scripts against
    * (retention audits, small-file monitoring, ref inventories).
    * Metadata-only: snapshots/history/refs read the table JSON,
    * manifests reads the current manifest list, files walks the current
    * snapshot's manifests — never a data byte.
    */
  def metadataTable(spark: SparkSession, path: String, table: String): DataFrame = {
    import spark.implicits._
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val curId = (meta \ "current-snapshot-id").extract[Long]
    def snaps = (meta \ "snapshots").extractOrElse[List[JValue]](Nil)
    def currentSnap = snaps.find(s => (s \ "snapshot-id").extract[Long] == curId)
    table match {
      case "snapshots" =>
        snaps.map { s =>
          ((s \ "snapshot-id").extract[Long],
            (s \ "parent-snapshot-id").extractOpt[Long],
            (s \ "timestamp-ms").extractOrElse[Long](0L),
            (s \ "summary" \ "operation").extractOrElse[String]("append"),
            (s \ "sequence-number").extractOpt[Long],
            (s \ "manifest-list").extract[String])
        }.toDF("snapshot_id", "parent_id", "committed_at_ms", "operation",
          "sequence_number", "manifest_list")
          .orderBy(col("committed_at_ms"), col("snapshot_id"))
      case "history" =>
        (meta \ "snapshot-log").extractOrElse[List[JValue]](Nil).map { e =>
          ((e \ "timestamp-ms").extract[Long],
            (e \ "snapshot-id").extract[Long])
        }.zipWithIndex
          .map { case ((ts, id), i) => (i, ts, id, snaps.exists(s =>
            (s \ "snapshot-id").extract[Long] == id)) }
          .toDF("ordinal", "made_current_at_ms", "snapshot_id", "is_retained")
      case "refs" =>
        refsOf(meta).toSeq.sortBy(_._1).map { case (n, (id, t)) => (n, t, id) }
          .toDF("name", "type", "snapshot_id")
      case "manifests" =>
        currentSnap.toSeq.flatMap { s =>
          readAvro(fs, new Path((s \ "manifest-list").extract[String])).map { r =>
            (r.get("manifest_path").toString,
              r.get("manifest_length").asInstanceOf[Long],
              listContentOf(r), listSeqOf(r),
              Option(r.get("added_snapshot_id"))
                .map(_.asInstanceOf[Long]).getOrElse(0L))
          }
        }.toDF("path", "length", "content", "sequence_number",
          "added_snapshot_id").orderBy(col("path"))
      case "files" =>
        currentSnap.toSeq.flatMap(s => liveEntries(fs, s)).map { e =>
          val d = e.get("data_file").asInstanceOf[GenericRecord]
          (d.get("file_path").toString,
            d.get("record_count").asInstanceOf[Long],
            d.get("file_size_in_bytes").asInstanceOf[Long],
            e.get("status").asInstanceOf[Int])
        }.toDF("file_path", "record_count", "file_size_in_bytes", "status")
          .orderBy(col("file_path"))
      case other => throw new IllegalArgumentException(
        s"IcebergInterop: unknown metadata table '$other' — have " +
          "snapshots, history, refs, manifests, files")
    }
  }

  // ---- refs: branches and tags (spec v2 `refs`) ----

  /** The metadata's `refs` map as name → (snapshot-id, type). A table
    * written before refs existed has none; `main` is implicitly the
    * current snapshot (the spec's rule), surfaced here explicitly.
    */
  private def refsOf(meta: JValue): Map[String, (Long, String)] = {
    val explicit = (meta \ "refs") match {
      case JObject(fields) => fields.map { case (name, r) =>
        name -> ((r \ "snapshot-id").extract[Long],
          (r \ "type").extractOrElse[String]("branch"))
      }.toMap
      case _ => Map.empty[String, (Long, String)]
    }
    explicit.get("main") match {
      case Some(_) => explicit
      case None => (meta \ "current-snapshot-id").extractOpt[Long]
        .fold(explicit)(c => explicit + ("main" -> (c, "branch")))
    }
  }

  private def refsJson(refs: Map[String, (Long, String)]): JValue =
    JObject(refs.toList.sortBy(_._1).map { case (name, (id, tpe)) =>
      name -> (JObject("snapshot-id" -> JLong(id),
        "type" -> JString(tpe)): JValue)
    })

  /** All refs of the table, `main` included. */
  def refs(spark: SparkSession, path: String): Map[String, (Long, String)] = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    refsOf(readMetadata(fs, path, version))
  }

  /** Field-preserving metadata-only commit that replaces the refs map —
    * the shared tail of create/drop/fast-forward. `alsoCurrent`
    * additionally flips current-snapshot-id + snapshot-log (the
    * fast-forward spelling).
    */
  private def commitRefsOnly(fs: FileSystem, path: String, version: Int,
      meta: JValue, newRefs: Map[String, (Long, String)],
      alsoCurrent: Option[Long]): Int = {
    requireWritableFormat(meta)
    val now = System.currentTimeMillis()
    val hadRefs = (meta \ "refs") != JNothing
    val logEntry = alsoCurrent.map(id => JObject(
      "timestamp-ms" -> JLong(now), "snapshot-id" -> JLong(id)))
    val updated0 = JObject(meta.asInstanceOf[JObject].obj.map {
      case ("last-updated-ms", _) => "last-updated-ms" -> (JLong(now): JValue)
      case ("refs", _) => "refs" -> refsJson(newRefs)
      case ("current-snapshot-id", v) => "current-snapshot-id" ->
        alsoCurrent.map(id => JLong(id): JValue).getOrElse(v)
      case ("snapshot-log", v) => "snapshot-log" -> (JArray(
        v.extractOrElse[List[JValue]](Nil) ++ logEntry.toList): JValue)
      case other => other
    })
    val updated = if (hadRefs) updated0
      else JObject(updated0.obj :+ ("refs" -> refsJson(newRefs)))
    val newVersion = version + 1
    val metaPath = new Path(s"$path/metadata/v$newVersion.metadata.json")
    require(!fs.exists(metaPath),
      s"Iceberg metadata v$newVersion already exists (concurrent writer)")
    writeFile(fs, metaPath, JsonMethods.pretty(JsonMethods.render(updated))
      .getBytes(StandardCharsets.UTF_8))
    writeFile(fs, new Path(s"$path/metadata/version-hint.text"),
      newVersion.toString.getBytes(StandardCharsets.UTF_8))
    newVersion
  }

  private def createRef(spark: SparkSession, path: String, name: String,
      tpe: String, at: Option[Long]): Long = {
    require(name.nonEmpty && name != "main",
      s"IcebergInterop: cannot create ref '$name'")
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val existing = refsOf(meta)
    require(!existing.contains(name),
      s"IcebergInterop: ref '$name' already exists")
    val target = at.getOrElse((meta \ "current-snapshot-id").extract[Long])
    val ids = (meta \ "snapshots").extractOrElse[List[JValue]](Nil)
      .map(s => (s \ "snapshot-id").extract[Long])
    require(ids.contains(target),
      s"IcebergInterop: snapshot $target not retained; cannot ref it")
    commitRefsOnly(fs, path, version, meta,
      existing + (name -> (target, tpe)), alsoCurrent = None)
    target
  }

  /** A BRANCH: an independently-advancing head ([[writeToBranch]]) —
    * the write-audit-publish staging lane. Metadata-only; returns the
    * snapshot the branch starts at.
    */
  def createBranch(spark: SparkSession, path: String, name: String,
      at: Option[Long] = None): Long = createRef(spark, path, name, "branch", at)

  /** A TAG: an immutable named snapshot (release pinning). */
  def createTag(spark: SparkSession, path: String, name: String,
      at: Option[Long] = None): Long = createRef(spark, path, name, "tag", at)

  def dropRef(spark: SparkSession, path: String, name: String): Unit = {
    require(name != "main", "IcebergInterop: cannot drop 'main'")
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val existing = refsOf(meta)
    require(existing.contains(name), s"IcebergInterop: no ref '$name'")
    commitRefsOnly(fs, path, version, meta, existing - name,
      alsoCurrent = None)
    ()
  }

  /** Read the table as of a named ref (`main`, a branch head, a tag). */
  def readRef(spark: SparkSession, path: String, name: String): DataFrame = {
    val r = refs(spark, path).getOrElse(name,
      throw new IllegalArgumentException(s"IcebergInterop: no ref '$name'"))
    read(spark, path, snapshotId = Some(r._1))
  }

  /** Append `df` to a BRANCH: the new snapshot's parent and carried
    * manifest list are the branch head's, the branch ref advances, and
    * `main`/current-snapshot-id/snapshot-log stay untouched — readers
    * of the table see nothing until [[fastForward]] publishes. The
    * write-audit-publish lane: stage candidate data on an `audit`
    * branch, validate it there ([[readRef]]), then publish atomically.
    * Sequence numbers stay table-global per the spec. Returns the new
    * snapshot id.
    */
  def writeToBranch(df: DataFrame, path: String, branch: String): Long = {
    val spark = df.sparkSession
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(
        s"not an Iceberg table: $path (bootstrap main with write first)"))
    val meta = readMetadata(fs, path, version)
    val allRefs = refsOf(meta)
    val (head, tpe) = allRefs.getOrElse(branch,
      throw new IllegalArgumentException(
        s"IcebergInterop: no branch '$branch' (createBranch first)"))
    require(tpe == "branch", s"IcebergInterop: ref '$branch' is a $tpe — " +
      "tags are immutable")
    val schema = currentSchema(meta)
    val partFields = partFieldsOf(meta, schema)
    require(schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)),
      s"IcebergInterop branch append: schema must match the table " +
        s"(table ${schema.simpleString}, batch ${df.schema.simpleString})")
    val moved = stageDataFiles(df, path, partFields.map(_.name), fs)
    val snapshotId = math.abs(java.util.UUID.randomUUID().getMostSignificantBits)
    val now = System.currentTimeMillis()
    val (listPath, newSeq, fmt) = writeSnapshotList(spark, fs, path, schema,
      partFields, moved, snapshotId, Some(meta), baseSnapshotId = Some(head))
    val snapshot = JObject(
      "snapshot-id" -> JLong(snapshotId),
      "parent-snapshot-id" -> JLong(head),
      "timestamp-ms" -> JLong(now),
      "summary" -> JObject(
        "operation" -> JString("append"),
        "added-data-files" -> JString(moved.size.toString),
        "added-records" -> JString(moved.map(_.records).sum.toString),
        "added-files-size" -> JString(moved.map(_.bytes).sum.toString)),
      "manifest-list" -> JString(listPath),
      "schema-id" -> JInt(0)) ~~
      (if (fmt >= 2) Some(JObject("sequence-number" -> JLong(newSeq))) else None)
    val hadRefs = (meta \ "refs") != JNothing
    val newRefs = allRefs + (branch -> (snapshotId, "branch"))
    val updated0 = JObject(meta.asInstanceOf[JObject].obj.map {
      case ("last-updated-ms", _) => "last-updated-ms" -> (JLong(now): JValue)
      case ("last-sequence-number", v) => "last-sequence-number" ->
        (if (fmt >= 2) JLong(newSeq): JValue else v)
      case ("snapshots", v) => "snapshots" -> (JArray(
        v.extractOrElse[List[JValue]](Nil) :+ (snapshot: JValue)): JValue)
      case ("refs", _) => "refs" -> refsJson(newRefs)
      case other => other
    })
    val updated = if (hadRefs) updated0
      else JObject(updated0.obj :+ ("refs" -> refsJson(newRefs)))
    val newVersion = version + 1
    val metaPath = new Path(s"$path/metadata/v$newVersion.metadata.json")
    require(!fs.exists(metaPath),
      s"Iceberg metadata v$newVersion already exists (concurrent writer)")
    writeFile(fs, metaPath, JsonMethods.pretty(JsonMethods.render(updated))
      .getBytes(StandardCharsets.UTF_8))
    writeFile(fs, new Path(s"$path/metadata/version-hint.text"),
      newVersion.toString.getBytes(StandardCharsets.UTF_8))
    snapshotId
  }

  /** PUBLISH a branch: fast-forward `main` to the branch head —
    * metadata-only, atomic, and only when main is an ancestor of the
    * head (anything else is not a fast-forward; refuse rather than
    * silently dropping main-side commits). Returns the published
    * snapshot id.
    */
  def fastForward(spark: SparkSession, path: String, branch: String): Long = {
    val fs = fsFor(spark, path)
    val version = currentVersion(fs, path).getOrElse(
      throw new IllegalArgumentException(s"not an Iceberg table: $path"))
    val meta = readMetadata(fs, path, version)
    val allRefs = refsOf(meta)
    val (head, tpe) = allRefs.getOrElse(branch,
      throw new IllegalArgumentException(s"IcebergInterop: no ref '$branch'"))
    require(tpe == "branch", s"IcebergInterop: '$branch' is a $tpe")
    val current = (meta \ "current-snapshot-id").extract[Long]
    if (head == current) return current // already published
    val byId = (meta \ "snapshots").extractOrElse[List[JValue]](Nil)
      .map(s => (s \ "snapshot-id").extract[Long] -> s).toMap
    var cursor = Option(head)
    var isAncestor = false
    while (cursor.isDefined && !isAncestor) {
      if (cursor.get == current) isAncestor = true
      else cursor = byId.get(cursor.get)
        .flatMap(s => (s \ "parent-snapshot-id").extractOpt[Long])
    }
    require(isAncestor,
      s"IcebergInterop fastForward: main ($current) is not an ancestor of " +
        s"'$branch' ($head) — diverged histories need a real merge")
    commitRefsOnly(fs, path, version, meta,
      allRefs + ("main" -> (head, "branch")), alsoCurrent = Some(head))
    head
  }

  /** Driver-checked identity-partitioned table: write orders
    * partitioned by status, then a partition-pruned + stats-pruned
    * read-back — the scan plans only the `F` partition's files (the
    * pruning itself is spec-asserted; the oracle pins the result).
    */
  def icebergPartitionedRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft-iceberg-part") + "/orders_part"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"),
        col("o_totalprice"))
    write(orders, out, partitionBy = Seq("o_orderstatus"))
    readWhere(spark, out,
      Some(col("o_orderstatus") === "F" && col("o_totalprice") > 100000.0))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"),
        min(col("o_orderdate")).as("first_date"))
      .orderBy(col("o_orderstatus"))
  }

  /** Driver-checked maintenance round trip: three disjoint appends,
    * rewrite_data_files packs the partitions, expire_snapshots(1)
    * drops the pre-compaction history and GCs its orphans — the
    * read-back aggregate must equal plain orders, maintenance
    * invisible to results.
    */
  def icebergMaintenanceRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("graft-iceberg-maint") + "/orders_iceberg"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    for (m <- 0L to 2L)
      write(orders.filter(col("o_orderkey") % 3 === m), out,
        partitionBy = Seq("o_orderstatus"))
    compact(spark, out)
    expireSnapshots(spark, out, keepLast = 1)
    read(spark, out).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  val ops: Seq[graft.Op] = Seq(
    graft.Op("q_iceberg_maintenance", icebergMaintenanceRoundTrip,
      Some("""
        SELECT o_orderstatus, count(*) AS n_rows,
               cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),
    graft.Op("q_iceberg_partitioned", icebergPartitionedRoundTrip,
      Some("""
        SELECT o_orderstatus, count(*) AS n_rows,
               cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
               min(o_orderdate) AS first_date
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),
    // delete (price>300k), re-append that slice at a higher sequence,
    // delete key%5==0: the net live set is exactly orders minus the
    // key%5 rows — anything else means the sequence rule or the
    // merge-on-read join is wrong
    graft.Op("q_iceberg_merge", icebergMergeRoundTrip,
      Some("""
        SELECT * FROM (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 100000
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 100 <> 50
          UNION ALL
          SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 100 = 25)
        ORDER BY o_orderkey""")),
    graft.Op("q_iceberg_posdelete", icebergPosDeleteRoundTrip,
      Some("""
        SELECT o_orderstatus, count(*) AS n_live,
               cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_orderkey % 5 <> 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),
    graft.Op("q_iceberg_eqdelete", icebergEqDeleteRoundTrip,
      Some("""
        WITH survivors AS (
          SELECT o_orderstatus, o_totalprice FROM orders
          WHERE o_orderkey % 9 <> 0
          UNION ALL
          SELECT o_orderstatus, o_totalprice FROM orders
          WHERE o_totalprice > 400000.0)
        SELECT o_orderstatus, count(*) AS n_live,
               cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        FROM survivors
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),
    graft.Op("q_iceberg_wap", icebergWapRoundTrip,
      Some("""
        WITH staged AS (
          SELECT o_orderstatus, o_totalprice FROM orders
          WHERE o_totalprice > 300000.0),
        published AS (
          SELECT o_orderstatus, o_totalprice FROM orders
          UNION ALL SELECT o_orderstatus, o_totalprice FROM staged)
        SELECT p.o_orderstatus, p.n_rows, p.sum_price, b.n_pre, a.n_audit
        FROM (SELECT o_orderstatus, count(*) AS n_rows,
                cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
              FROM published GROUP BY o_orderstatus) p
        JOIN (SELECT o_orderstatus, count(*) AS n_pre
              FROM orders GROUP BY o_orderstatus) b USING (o_orderstatus)
        JOIN (SELECT o_orderstatus, count(*) AS n_audit
              FROM published GROUP BY o_orderstatus) a USING (o_orderstatus)
        ORDER BY o_orderstatus""")),
    graft.Op("q_iceberg_roundtrip", icebergRoundTrip,
      Some("""
        WITH appended AS (
          SELECT o_orderstatus, o_totalprice FROM orders
          UNION ALL
          SELECT o_orderstatus, o_totalprice FROM orders
          WHERE o_totalprice > 200000.0),
        latest AS (
          SELECT o_orderstatus, count(*) AS n_rows,
                 cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
          FROM appended GROUP BY o_orderstatus),
        s1 AS (
          SELECT o_orderstatus, count(*) AS n_rows_s1
          FROM orders GROUP BY o_orderstatus)
        SELECT o_orderstatus, n_rows, sum_price, n_rows_s1
        FROM latest JOIN s1 USING (o_orderstatus)
        ORDER BY o_orderstatus""")))
}
