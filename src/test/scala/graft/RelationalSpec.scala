package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("pricingSummary: group cardinality and exact sums vs SQL") {
    val df = Relational.pricingSummary(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 6) // |returnflag| x |linestatus|
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter("l_shipdate <= timestamp'1998-09-01 00:00:00'").count()
    assert(total == expected)
  }

  test("scanCount matches raw parquet count") {
    val n = Relational.scanCount(spark, sf).collect()(0).getAs[Long]("n_rows")
    assert(n == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("filterAgg pushes predicates to the parquet scan") {
    val plan = Relational.filterAgg(spark, sf).queryExecution.executedPlan
    val formatted = Relational.filterAgg(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters"), "expected parquet pushdown metadata")
    assert(formatted.contains("l_shipdate"), s"shipdate filter should reach the scan:\n$formatted")
  }

  test("starJoin broadcasts both dimension tables (no shuffle join)") {
    val df = Relational.starJoin(spark, sf)
    df.collect() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected 2 broadcast hash joins:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"dim joins must not shuffle:\n$plan")
  }

  test("windowRank keeps at most 3 per nation, rank starts at 1") {
    val rows = Relational.windowRank(spark, sf).collect()
    val byNation = rows.groupBy(_.getAs[Int]("c_nationkey"))
    assert(byNation.values.forall(_.length <= 3))
    assert(byNation.values.forall(_.map(_.getAs[Int]("rk")).min == 1))
  }

  test("antiJoin: no customer in result has an F order") {
    val anti = Relational.antiJoin(spark, sf).collect().map(_.getAs[Long]("c_custkey")).toSet
    val withF = spark.read.parquet(s"$sf/orders.parquet")
      .filter("o_orderstatus = 'F'").select("o_custkey")
      .collect().map(_.getAs[Long]("o_custkey")).toSet
    assert(anti.intersect(withF).isEmpty)
  }

  test("rollup emits ALL sentinel rows plus grand total") {
    val rows = Relational.rollupAgg(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[String]("returnflag") == "ALL"
      && r.getAs[String]("linestatus") == "ALL")
    assert(grand.length == 1)
    val leafCnt = rows.filter(r => r.getAs[String]("returnflag") != "ALL"
      && r.getAs[String]("linestatus") != "ALL").map(_.getAs[Long]("cnt")).sum
    assert(grand(0).getAs[Long]("cnt") == leafCnt)
  }
}
