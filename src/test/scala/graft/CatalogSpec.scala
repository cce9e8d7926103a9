package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sinks.{PartitionTransforms, VersionedTable}

/** SQL-catalog face (`GraftCatalog`): DDL/DML over versioned tables by
  * identifier. A unique namespace per run keeps the shared tmp warehouse
  * collision-free.
  */
class CatalogSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private val ns = s"t${System.nanoTime()}"
  spark.sql(s"CREATE NAMESPACE graft.$ns")

  private def rows(sql: String): Seq[Row] = spark.sql(sql).collect().toSeq

  test("create / insert / select round trip on an identity-partitioned table") {
    spark.sql(
      s"CREATE TABLE graft.$ns.events (id BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    // empty table reads as zero rows with the declared schema
    assert(spark.table(s"graft.$ns.events").isEmpty)
    assert(spark.table(s"graft.$ns.events").columns.toSeq == Seq("id", "p", "v"))
    spark.sql(s"INSERT INTO graft.$ns.events VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    spark.sql(s"INSERT INTO graft.$ns.events VALUES (3, 'a', 3.0)")
    assert(rows(s"SELECT id, p, v FROM graft.$ns.events ORDER BY id") ==
      Seq(Row(1L, "a", 1.0), Row(2L, "b", 2.0), Row(3L, "a", 3.0)))
    // filtered read (pushes through the V1 relation into readPruned)
    assert(rows(s"SELECT id FROM graft.$ns.events WHERE p = 'a' ORDER BY id") ==
      Seq(Row(1L), Row(3L)))
  }

  test("INSERT OVERWRITE replaces the snapshot; history keeps the old one") {
    spark.sql(s"CREATE TABLE graft.$ns.ow (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO graft.$ns.ow VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT OVERWRITE graft.$ns.ow VALUES (9, 'c')")
    assert(rows(s"SELECT k, p FROM graft.$ns.ow") == Seq(Row(9L, "c")))
    // the pre-overwrite snapshot is still readable by version
    assert(rows(s"SELECT k FROM graft.$ns.ow VERSION AS OF 2 ORDER BY k") ==
      Seq(Row(1L), Row(2L)))
  }

  test("static-partition INSERT OVERWRITE replaces only that partition") {
    spark.sql(s"CREATE TABLE graft.$ns.sp (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO graft.$ns.sp VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT OVERWRITE graft.$ns.sp PARTITION (p = 'a') (SELECT 10 AS k)")
    assert(rows(s"SELECT k, p FROM graft.$ns.sp ORDER BY k") ==
      Seq(Row(2L, "b"), Row(10L, "a")))
  }

  test("DELETE FROM and TRUNCATE") {
    spark.sql(s"CREATE TABLE graft.$ns.del (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO graft.$ns.del VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    spark.sql(s"DELETE FROM graft.$ns.del WHERE k = 2")
    assert(rows(s"SELECT k FROM graft.$ns.del ORDER BY k") == Seq(Row(1L), Row(3L)))
    spark.sql(s"TRUNCATE TABLE graft.$ns.del")
    assert(spark.table(s"graft.$ns.del").isEmpty)
    // schema survives the truncate
    assert(spark.table(s"graft.$ns.del").columns.toSeq == Seq("k", "p"))
  }

  test("DELETE on an unpartitioned table") {
    spark.sql(s"CREATE TABLE graft.$ns.flat (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO graft.$ns.flat VALUES (1, 'x'), (2, 'y'), (3, 'z')")
    spark.sql(s"DELETE FROM graft.$ns.flat WHERE v >= 'y'")
    assert(rows(s"SELECT k FROM graft.$ns.flat") == Seq(Row(1L)))
  }

  test("time travel: VERSION AS OF and TIMESTAMP AS OF") {
    spark.sql(s"CREATE TABLE graft.$ns.tt (k BIGINT)")
    spark.sql(s"INSERT INTO graft.$ns.tt VALUES (1)")
    spark.sql(s"INSERT INTO graft.$ns.tt VALUES (2)")
    assert(rows(s"SELECT k FROM graft.$ns.tt VERSION AS OF 2 ORDER BY k") ==
      Seq(Row(1L)))
    assert(rows(s"SELECT count(*) AS n FROM graft.$ns.tt TIMESTAMP AS OF '2099-01-01'") ==
      Seq(Row(2L)))
  }

  test("hidden partitioning DDL: days + bucket transforms recorded in the log") {
    spark.sql(
      s"""CREATE TABLE graft.$ns.hp (id BIGINT, ts TIMESTAMP, v DOUBLE)
          PARTITIONED BY (days(ts), bucket(4, id))""")
    spark.sql(
      s"""INSERT INTO graft.$ns.hp VALUES
          (1, TIMESTAMP '2024-01-01 10:00:00', 1.0),
          (2, TIMESTAMP '2024-01-02 11:00:00', 2.0),
          (3, TIMESTAMP '2024-01-02 12:00:00', 3.0)""")
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val spec = VersionedTable.activePartitionSpec(spark, s"$warehouse/$ns/hp")
    assert(spec == Seq(PartitionTransforms.Day("ts"), PartitionTransforms.Bucket("id", 4)))
    // raw-column predicates still answer exactly (pruning is invisible)
    assert(rows(s"SELECT id FROM graft.$ns.hp WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' " +
      "ORDER BY id") == Seq(Row(2L), Row(3L)))
    // a second insert keeps the layout
    spark.sql(s"INSERT INTO graft.$ns.hp VALUES (4, TIMESTAMP '2024-01-03 01:00:00', 4.0)")
    assert(rows(s"SELECT count(*) AS n FROM graft.$ns.hp") == Seq(Row(4L)))
  }

  test("CTAS, SHOW TABLES, ALTER TABLE properties, RENAME, DROP") {
    spark.sql(s"CREATE TABLE graft.$ns.src AS SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(k, p)")
    assert(rows(s"SELECT k, p FROM graft.$ns.src ORDER BY k") ==
      Seq(Row(1, "a"), Row(2, "b")))
    assert(rows(s"SHOW TABLES IN graft.$ns").map(_.getString(1)).contains("src"))
    spark.sql(s"ALTER TABLE graft.$ns.src SET TBLPROPERTIES ('owner.team' = 'graft')")
    val desc = rows(s"SHOW TBLPROPERTIES graft.$ns.src")
    assert(desc.exists(r => r.getString(0) == "owner.team" && r.getString(1) == "graft"))
    // the rename target is resolved in the SOURCE's catalog — no catalog prefix
    spark.sql(s"ALTER TABLE graft.$ns.src RENAME TO $ns.dst")
    assert(rows(s"SELECT count(*) AS n FROM graft.$ns.dst") == Seq(Row(2L)))
    spark.sql(s"DROP TABLE graft.$ns.dst")
    assert(!rows(s"SHOW TABLES IN graft.$ns").map(_.getString(1)).contains("dst"))
  }

  test("DataFrame writeTo API composes with path-level table ops") {
    spark.sql(s"CREATE TABLE graft.$ns.mix (k BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "p", "v")
      .writeTo(s"graft.$ns.mix").append()
    // upsert through the PATH api — the catalog read sees the same log
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    VersionedTable.upsert(spark, s"$warehouse/$ns/mix",
      Seq((1L, "a", 9L)).toDF("k", "p", "v"), key = "k", precombine = "v",
      partitionCols = Seq("p"))
    assert(rows(s"SELECT k, v FROM graft.$ns.mix ORDER BY k") ==
      Seq(Row(1L, 9L), Row(2L, 1L)))
  }

  test("SQL UPDATE rewrites matching rows, assignments see the original row") {
    spark.sql(s"CREATE TABLE graft.$ns.up (k BIGINT, p STRING, a BIGINT, b BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO graft.$ns.up VALUES (1, 'x', 10, 20), (2, 'x', 30, 40), (3, 'y', 50, 60)")
    // simultaneous assignment: a,b swap for the matching row only
    spark.sql(s"UPDATE graft.$ns.up SET a = b, b = a WHERE k = 1")
    assert(rows(s"SELECT k, a, b FROM graft.$ns.up ORDER BY k") ==
      Seq(Row(1L, 20L, 10L), Row(2L, 30L, 40L), Row(3L, 50L, 60L)))
    // updating the partition column moves the row between directories
    spark.sql(s"UPDATE graft.$ns.up SET p = 'z' WHERE k = 2")
    assert(rows(s"SELECT k FROM graft.$ns.up WHERE p = 'z'") == Seq(Row(2L)))
    assert(rows(s"SELECT count(*) AS n FROM graft.$ns.up WHERE p = 'x'") == Seq(Row(1L)))
    // the pre-update snapshot survives
    assert(rows(s"SELECT a FROM graft.$ns.up VERSION AS OF 2 WHERE k = 1") == Seq(Row(10L)))
  }

  test("SQL UPDATE on a hidden-partitioned table re-derives the layout") {
    spark.sql(s"""CREATE TABLE graft.$ns.uph (id BIGINT, ts TIMESTAMP, v BIGINT)
                  PARTITIONED BY (days(ts))""")
    spark.sql(s"""INSERT INTO graft.$ns.uph VALUES
        (1, TIMESTAMP '2024-01-01 10:00:00', 1),
        (2, TIMESTAMP '2024-01-02 10:00:00', 2)""")
    // moving ts across days must move the row to the new day directory
    spark.sql(s"UPDATE graft.$ns.uph SET ts = TIMESTAMP '2024-01-05 00:30:00' WHERE id = 1")
    assert(rows(s"SELECT id FROM graft.$ns.uph WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'") ==
      Seq(Row(1L)))
    assert(rows(s"SELECT count(*) AS n FROM graft.$ns.uph") == Seq(Row(2L)))
  }

  test("SQL MERGE INTO: update, delete, and insert clauses in order") {
    spark.sql(s"CREATE TABLE graft.$ns.mt (k BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO graft.$ns.mt VALUES (1, 'a', 1), (2, 'a', 2), (3, 'b', 3)")
    Seq((1L, "a", 100L), (2L, "a", -1L), (9L, "b", 9L)).toDF("k", "p", "v")
      .createOrReplaceTempView("mt_src")
    spark.sql(
      s"""MERGE INTO graft.$ns.mt t USING mt_src s
          ON t.k = s.k AND t.p = s.p
          WHEN MATCHED AND s.v < 0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = s.v + t.v
          WHEN NOT MATCHED THEN INSERT *""")
    assert(rows(s"SELECT k, p, v FROM graft.$ns.mt ORDER BY k") ==
      Seq(Row(1L, "a", 101L), Row(3L, "b", 3L), Row(9L, "b", 9L)))
    // duplicate source keys raise (standard MERGE cardinality error)
    Seq((3L, "b", 1L), (3L, "b", 2L)).toDF("k", "p", "v")
      .createOrReplaceTempView("mt_dup")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO graft.$ns.mt t USING mt_dup s
                    ON t.k = s.k AND t.p = s.p
                    WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(e.getMessage.contains("multiple source rows"))
  }

  test("SQL MERGE guards: ON shape and hidden-partitioned targets") {
    spark.sql(s"CREATE TABLE graft.$ns.mg (k BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO graft.$ns.mg VALUES (1, 'a', 1)")
    Seq((1L, "a", 2L)).toDF("k", "p", "v").createOrReplaceTempView("mg_src")
    // ON not covering the partition column is rejected, not silently scoped
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO graft.$ns.mg t USING mg_src s ON t.k = s.k
                    WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(e.getMessage.contains("partition columns"))
  }

  test("SQL MERGE INTO a hidden-partitioned table matches on exact raw columns") {
    spark.sql(
      s"""CREATE TABLE graft.$ns.mh (id BIGINT, ts TIMESTAMP, v BIGINT)
          PARTITIONED BY (days(ts))""")
    spark.sql(
      s"""INSERT INTO graft.$ns.mh VALUES
          (1, TIMESTAMP '2024-01-10 08:00:00', 1),
          (2, TIMESTAMP '2024-01-10 09:00:00', 2),
          (3, TIMESTAMP '2024-02-01 00:00:00', 3)""")
    // same id+day but DIFFERENT ts must NOT match (exact SQL equality,
    // not day granularity): id=2's source ts differs by a second
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-10 08:00:00"), 10L),
      (2L, java.sql.Timestamp.valueOf("2024-01-10 09:00:01"), 20L),
      (4L, java.sql.Timestamp.valueOf("2024-03-05 12:00:00"), 40L)
    ).toDF("id", "ts", "v").createOrReplaceTempView("mh_src")
    spark.sql(
      s"""MERGE INTO graft.$ns.mh t USING mh_src s
          ON t.id = s.id AND t.ts = s.ts
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT *""")
    assert(rows(s"SELECT id, v FROM graft.$ns.mh ORDER BY id, v") ==
      Seq(Row(1L, 10L), Row(2L, 2L), Row(2L, 20L), Row(3L, 3L), Row(4L, 40L)))
    // layout stayed hidden-partitioned: the new row landed in its day dir
    val t = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array(ns), "mh"))
      .asInstanceOf[org.apache.spark.sql.graft.catalog.GraftTable]
    assert(VersionedTable.read(spark, t.path).inputFiles
      .exists(_.contains("__p_ts=2024-03-05")))
    // ON missing the raw transform column is rejected, not day-scoped
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO graft.$ns.mh t USING mh_src s ON t.id = s.id
                    WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(e.getMessage.contains("partition columns"))
  }

  test("ALTER TABLE ADD COLUMNS widens the schema without touching files") {
    spark.sql(s"CREATE TABLE graft.$ns.ac (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO graft.$ns.ac VALUES (1, 'a'), (2, 'b')")
    val filesBefore = spark.table(s"graft.$ns.ac").inputFiles.toSet
    spark.sql(s"ALTER TABLE graft.$ns.ac ADD COLUMNS (score DOUBLE, note STRING)")
    // old rows surface the new columns as null; no file was rewritten
    assert(rows(s"SELECT id, p, score, note FROM graft.$ns.ac ORDER BY id") ==
      Seq(Row(1L, "a", null, null), Row(2L, "b", null, null)))
    assert(spark.table(s"graft.$ns.ac").inputFiles.toSet == filesBefore)
    // new writes carry the new columns; both generations read together
    spark.sql(s"INSERT INTO graft.$ns.ac VALUES (3, 'a', 0.5, 'ok')")
    assert(rows(s"SELECT id, score, note FROM graft.$ns.ac WHERE id = 3") ==
      Seq(Row(3L, 0.5, "ok")))
    // the pre-ALTER snapshot keeps its narrower schema
    assert(spark.sql(s"SELECT * FROM graft.$ns.ac VERSION AS OF 2").columns.toSeq ==
      Seq("id", "p"))
    // guards: existing name (case-variant), NOT NULL
    val dup = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$ns.ac ADD COLUMNS (ID BIGINT)")
    }
    assert(dup.getMessage.contains("already exists"))
    val nn = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$ns.ac ADD COLUMNS (req BIGINT NOT NULL)")
    }
    assert(nn.getMessage.contains("nullable"))
  }

  test("SQL DELETE with a predicate source filters cannot express") {
    spark.sql(s"CREATE TABLE graft.$ns.dx (k BIGINT, txt STRING)")
    spark.sql(s"INSERT INTO graft.$ns.dx VALUES (1, 'keep'), (2, 'drop-me'), (3, 'also drop')")
    spark.sql(s"DELETE FROM graft.$ns.dx WHERE txt LIKE '%drop%' OR length(txt) > 40")
    assert(rows(s"SELECT k FROM graft.$ns.dx") == Seq(Row(1L)))
  }

  test("DML on an empty table is a no-op, not a crash") {
    spark.sql(s"CREATE TABLE graft.$ns.empty (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(s"TRUNCATE TABLE graft.$ns.empty")
    spark.sql(s"DELETE FROM graft.$ns.empty WHERE k = 1")
    spark.sql(s"UPDATE graft.$ns.empty SET k = 2 WHERE k = 1")
    // static-partition overwrite into an empty table still inserts
    spark.sql(s"INSERT OVERWRITE graft.$ns.empty PARTITION (p = 'a') (SELECT 5 AS k)")
    assert(rows(s"SELECT k, p FROM graft.$ns.empty") == Seq(Row(5L, "a")))
    // truncate-then-truncate (zero live files again)
    spark.sql(s"TRUNCATE TABLE graft.$ns.empty")
    spark.sql(s"TRUNCATE TABLE graft.$ns.empty")
    assert(spark.table(s"graft.$ns.empty").isEmpty)
  }

  test("DML reaches rows in the null partition directory") {
    spark.sql(s"CREATE TABLE graft.$ns.np (k BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO graft.$ns.np VALUES (1, 'a', 1), (2, NULL, 2), (3, NULL, 3)")
    spark.sql(s"UPDATE graft.$ns.np SET v = v + 10 WHERE k >= 2")
    assert(rows(s"SELECT k, v FROM graft.$ns.np ORDER BY k") ==
      Seq(Row(1L, 1L), Row(2L, 12L), Row(3L, 13L)))
    spark.sql(s"DELETE FROM graft.$ns.np WHERE p IS NULL AND k = 3")
    assert(rows(s"SELECT k FROM graft.$ns.np ORDER BY k") == Seq(Row(1L), Row(2L)))
  }

  test("cached reads refresh after catalog DML") {
    spark.sql(s"CREATE TABLE graft.$ns.cache (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO graft.$ns.cache VALUES (1, 1), (2, 2)")
    val df = spark.table(s"graft.$ns.cache")
    df.cache()
    assert(df.count() == 2)
    spark.sql(s"UPDATE graft.$ns.cache SET v = 99 WHERE k = 1")
    assert(df.filter($"k" === 1).select("v").collect().toSeq == Seq(Row(99L)))
    spark.sql(s"INSERT INTO graft.$ns.cache VALUES (3, 3)")
    assert(df.count() == 3)
    spark.sql(s"DELETE FROM graft.$ns.cache WHERE k = 2")
    assert(df.count() == 2)
    df.unpersist()
  }

  test("months/years/truncate partition transforms via DDL") {
    spark.sql(
      s"""CREATE TABLE graft.$ns.myt (id BIGINT, ts TIMESTAMP, cat STRING, grp BIGINT)
          PARTITIONED BY (months(ts), truncate(2, cat))""")
    spark.sql(
      s"""INSERT INTO graft.$ns.myt VALUES
          (1, TIMESTAMP '2024-01-15 00:00:00', 'alpha', 10),
          (2, TIMESTAMP '2024-02-15 00:00:00', 'alps',  20),
          (3, TIMESTAMP '2024-02-16 00:00:00', 'beta',  30)""")
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    assert(VersionedTable.activePartitionSpec(spark, s"$warehouse/$ns/myt") ==
      Seq(PartitionTransforms.Month("ts"), PartitionTransforms.TruncateStr("cat", 2)))
    assert(rows(s"SELECT id FROM graft.$ns.myt WHERE ts >= TIMESTAMP '2024-02-01 00:00:00' " +
      "AND cat >= 'al' AND cat < 'am' ORDER BY id") == Seq(Row(2L)))
    spark.sql(
      s"""CREATE TABLE graft.$ns.yr (id BIGINT, ts TIMESTAMP, grp BIGINT)
          PARTITIONED BY (years(ts), truncate(10, grp))""")
    spark.sql(
      s"""INSERT INTO graft.$ns.yr VALUES
          (1, TIMESTAMP '2023-06-01 00:00:00', 7),
          (2, TIMESTAMP '2024-06-01 00:00:00', 17)""")
    assert(VersionedTable.activePartitionSpec(spark, s"$warehouse/$ns/yr") ==
      Seq(PartitionTransforms.Year("ts"), PartitionTransforms.TruncateNum("grp", 10L)))
    assert(rows(s"SELECT id FROM graft.$ns.yr WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' " +
      "AND grp >= 10 AND grp < 20") == Seq(Row(2L)))
  }

  test("DML reaches timestamp and numeric-string partition directories") {
    // java.sql.Timestamp.toString renders '...:00.0', which names no dir;
    // the engine must render partition values the way the WRITER did
    spark.sql(s"CREATE TABLE graft.$ns.tsp (k BIGINT, ts TIMESTAMP, v BIGINT) PARTITIONED BY (ts)")
    spark.sql(s"INSERT INTO graft.$ns.tsp VALUES " +
      "(1, TIMESTAMP '2024-01-01 10:00:00', 1), (2, TIMESTAMP '2024-01-02 10:00:00', 2)")
    spark.sql(s"DELETE FROM graft.$ns.tsp WHERE k = 1")
    assert(rows(s"SELECT k FROM graft.$ns.tsp") == Seq(Row(2L)))
    spark.sql(s"UPDATE graft.$ns.tsp SET v = 9 WHERE k = 2")
    assert(rows(s"SELECT v FROM graft.$ns.tsp") == Seq(Row(9L)))
    // numeric-parseable STRING partition values: dir-value inference would
    // retype p as INT and scope the rewrite to 'p=1' — no such directory
    spark.sql(s"CREATE TABLE graft.$ns.nsp (k BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO graft.$ns.nsp VALUES (1, '01', 1), (2, '02', 2)")
    spark.sql(s"DELETE FROM graft.$ns.nsp WHERE p = '01'")
    assert(rows(s"SELECT k FROM graft.$ns.nsp") == Seq(Row(2L)))
    spark.sql(s"UPDATE graft.$ns.nsp SET v = 7 WHERE p = '02'")
    assert(rows(s"SELECT v FROM graft.$ns.nsp") == Seq(Row(7L)))
  }

  test("PARTITIONED BY resolves column names case-insensitively, keeping the schema spelling") {
    spark.sql(s"CREATE TABLE graft.$ns.ci (id BIGINT, Cat STRING) PARTITIONED BY (CAT)")
    spark.sql(s"INSERT INTO graft.$ns.ci VALUES (1, 'x'), (2, 'y')")
    assert(rows(s"SELECT id FROM graft.$ns.ci WHERE Cat = 'x'") == Seq(Row(1L)))
    spark.sql(s"DELETE FROM graft.$ns.ci WHERE Cat = 'y'")
    assert(rows(s"SELECT id FROM graft.$ns.ci") == Seq(Row(1L)))
    spark.sql(s"CREATE TABLE graft.$ns.ci2 (id BIGINT, Ts TIMESTAMP) PARTITIONED BY (days(TS))")
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    assert(VersionedTable.activePartitionSpec(spark, s"$warehouse/$ns/ci2") ==
      Seq(PartitionTransforms.Day("Ts")))
  }

  test("catalog guards: duplicate create, missing table, time-travel writes") {
    spark.sql(s"CREATE TABLE graft.$ns.g (k BIGINT)")
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      spark.sql(s"CREATE TABLE graft.$ns.g (k BIGINT)")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM graft.$ns.nope")
    }
    spark.sql(s"INSERT INTO graft.$ns.g VALUES (1)")
    // writes must target the live table, not a snapshot
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.$ns.g VERSION AS OF 1 VALUES (2)")
    }
  }

  test("SqlShell: quote-aware splitting and a scripted DDL->DML->SELECT lifecycle") {
    import graft.tools.SqlShell
    assert(SqlShell.split("SELECT 1; SELECT ';';\n-- comment; not a stmt\nSELECT 2") ==
      Seq("SELECT 1", "SELECT ';'", "SELECT 2"))
    val ns = "shell" + java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val script =
      s"""CREATE NAMESPACE graft.$ns;
         |CREATE TABLE graft.$ns.t (id BIGINT, s STRING, v DOUBLE);
         |INSERT INTO graft.$ns.t VALUES (1, 'a;b', 10.0), (2, 'c', 20.0), (3, 'd', 30.0);
         |DELETE FROM graft.$ns.t WHERE id = 2;
         |UPDATE graft.$ns.t SET v = v * 2 WHERE id = 1;
         |SELECT id, s, v FROM graft.$ns.t ORDER BY id;
         |""".stripMargin
    val results = SqlShell.runScript(spark, script)
    assert(results.size == 6)
    val got = results.last.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a;b", 20.0), (3L, "d", 30.0)),
      "the quoted ';' must survive splitting and the DML must apply")
  }

  test("catalog tables report live bytes; small join sides auto-broadcast") {
    spark.sql(s"CREATE TABLE graft.$ns.dim (k BIGINT, name STRING)")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES (1, 'one'), (2, 'two')")
    spark.sql(s"CREATE TABLE graft.$ns.fact (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (1, 1.0), (2, 2.0), (1, 3.0)")
    val joined = spark.table(s"graft.$ns.fact")
      .join(spark.table(s"graft.$ns.dim"), "k")
    // the stats fix is WHAT makes this a BroadcastHashJoin: without the
    // sizeInBytes override both sides report defaultSizeInBytes and the
    // planner falls back to sort-merge
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"expected an auto-broadcast join, got:\n$physical")
    assert(joined.count() == 3)
    // the wire formats report through their own metadata too
    val dims = java.nio.file.Files.createTempDirectory("graft-szd").toFile + "/t"
    Seq((1L, "a")).toDF("k", "s").write.format("graft-delta")
      .option("path", dims).save()
    val rel = spark.read.format("graft-delta").option("path", dims).load()
    val sz = rel.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sz > 0 && sz < 1000000, s"delta relation should report ~file bytes, got $sz")
  }

  test("maintenance SQL: OPTIMIZE, DESCRIBE HISTORY, VACUUM RETAIN") {
    spark.sql(s"CREATE TABLE graft.$ns.mx (id BIGINT, p STRING) PARTITIONED BY (p)")
    // 6 single-partition inserts fragment partition 'a' into 6 files
    (1 to 6).foreach(i =>
      spark.sql(s"INSERT INTO graft.$ns.mx VALUES ($i, 'a')"))
    val hist0 = rows(s"DESCRIBE HISTORY graft.$ns.mx")
    assert(hist0.size == 7 && hist0.map(_.getString(2)).count(_ == "append") == 6)
    val v = rows(s"OPTIMIZE graft.$ns.mx").head.getLong(0)
    assert(v > 0, "optimize commits a compaction version")
    assert(rows(s"SELECT sum(id) FROM graft.$ns.mx").head.getLong(0) == 21L)
    // vacuum keeps only the latest version's files; old reads now refuse,
    // current reads are untouched
    val deleted = rows(s"VACUUM graft.$ns.mx RETAIN 1 VERSIONS").head.getLong(0)
    assert(deleted > 0, "fragmented pre-compaction files must be reclaimed")
    assert(rows(s"SELECT sum(id) FROM graft.$ns.mx").head.getLong(0) == 21L)
    // history survives the vacuum (the log is not data files)
    assert(rows(s"DESCRIBE HISTORY graft.$ns.mx").size == 8)
    // a non-graft ident refuses loudly; plain SQL still parses through
    intercept[Exception] { spark.sql(s"OPTIMIZE graft.$ns.absent").collect() }
    assert(rows("SELECT 1 + 1").head.getInt(0) == 2)
  }

  test("OPTIMIZE ZORDER BY clusters files so range predicates prune") {
    spark.sql(s"CREATE TABLE graft.$ns.zx (a BIGINT, b BIGINT, v DOUBLE)")
    // shuffled landing: every file covers the full (a, b) range
    val n = 4096
    val rows0 = (0 until n).map(i => ((i * 2654435761L) % n, i.toLong, i * 1.0))
    rows0.toDF("a", "b", "v").repartition(8)
      .createOrReplaceTempView("zx_src")
    spark.sql(s"INSERT INTO graft.$ns.zx SELECT * FROM zx_src")
    val v = rows(s"OPTIMIZE graft.$ns.zx ZORDER BY (a, b)").head.getLong(0)
    assert(v > 0)
    // rows exact after the rewrite
    assert(rows(s"SELECT count(*), sum(a) FROM graft.$ns.zx").head ==
      Row(n.toLong, rows0.map(_._1).sum))
    // a tight corner range now plans fewer files than exist (file-level
    // stats pruning through the engine's own pruned-read path)
    val path =
      s"${spark.conf.get("spark.sql.catalog.graft.warehouse")}/$ns/zx"
    val (_, corner, all) = VersionedTable.readPruned(spark, path,
      col("a") < 200L && col("b") < 200L)
    assert(all > 1, s"zorder should write several clustered files, got $all")
    assert(corner < all, s"corner planned $corner of $all files — nothing pruned")
  }
}
