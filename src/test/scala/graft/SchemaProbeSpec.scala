package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** Testdata drift tripwire: asserts every table loads with exactly the
  * dtypes the operator suite assumes, failing loudly WITH THE TABLE NAME.
  *
  * Why it exists: the generator once switched `events.ts` from parquet
  * TIMESTAMP(NANOS) (read as int64 under `nanosAsLong`) to timestamp[us]
  * — and the drift surfaced as 14 scattered DATATYPE_MISMATCH query
  * errors, 4 silently-wrong streaming results, and 14 failing specs
  * instead of one targeted failure. This spec is the targeted failure:
  * if a table's physical encoding changes again, the FIRST red line
  * names the table and the column, and [[Tables.normalizeTs]] (or the
  * operator contract) is where to look.
  */
class SchemaProbeSpec extends SparkSpec {

  private def probe(name: String, expected: (String, DataType)*): Unit = {
    val df =
      if (name == "events") Tables.events(spark, sf)
      else Tables.table(spark, sf, name)
    val got = df.schema.map(f => f.name -> f.dataType).toMap
    expected.foreach { case (colName, dt) =>
      assert(got.contains(colName),
        s"TESTDATA DRIFT: table '$name' lost column '$colName' " +
          s"(loaded columns: ${got.keys.toSeq.sorted.mkString(", ")})")
      assert(got(colName) == dt,
        s"TESTDATA DRIFT: $name.$colName loaded as ${got(colName)}, " +
          s"operators assume $dt — fix the loader contract in Tables " +
          "(see Tables.normalizeTs for the ts precedent), not each operator")
    }
  }

  test("events loads with the normalized operator contract") {
    // the loader must hand operators session-zoned TimestampType whatever
    // physical ts shape (int64 nanos / timestamp[us] NTZ) the file carries
    probe("events",
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
  }

  test("relational tables load with the dtypes the query battery assumes") {
    probe("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType)
    probe("lineitem",
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType)
    probe("customer", "c_custkey" -> LongType, "c_nationkey" -> IntegerType)
    probe("supplier", "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    probe("part", "p_partkey" -> LongType)
    probe("nation", "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)
    probe("region", "r_regionkey" -> IntegerType)
  }

  test("llm-pipeline tables load with the dtypes the dedup/ANN family assumes") {
    probe("documents", "doc_id" -> LongType, "text" -> StringType)
    probe("embeddings", "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true))
  }

  test("date-bearing columns: drift in temporal encodings is named, not scattered") {
    // these loaded as TIMESTAMP_NTZ when green-lit; operators only apply
    // date functions to them, which accept both NTZ and TIMESTAMP — but a
    // move to e.g. int64 or DATE must surface here first
    val tolerated: Set[DataType] = Set(TimestampNTZType, TimestampType, DateType)
    Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate").foreach {
      case (t, c) =>
        val dt = Tables.table(spark, sf, t).schema
          .find(_.name == c).map(_.dataType)
        dt.foreach { d =>
          assert(tolerated.contains(d),
            s"TESTDATA DRIFT: $t.$c loaded as $d — temporal operators " +
              "assume a timestamp/date family dtype")
        }
    }
  }
}
