package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Lineage
import graft.plans.Lineage.SourceCol

class LineageSpec extends AnyFunSuite with SparkTestBase {

  test("aggregate lineage: measures trace to fact columns, count(*) to nothing") {
    val lin = Lineage.of(Queries.q1Agg(spark, sf))
    assert(lin("sum_qty") == Set(SourceCol("lineitem", "l_quantity")))
    assert(lin("sum_disc_price") ==
      Set(SourceCol("lineitem", "l_extendedprice"), SourceCol("lineitem", "l_discount")))
    assert(lin("count_order").isEmpty, "count(*) must have empty provenance")
    assert(lin("l_returnflag") == Set(SourceCol("lineitem", "l_returnflag")))
  }

  test("multi-join lineage: outputs trace through the dimension chain") {
    val lin = Lineage.of(Queries.qStarJoin(spark, sf))
    assert(lin("r_name") == Set(SourceCol("region", "r_name")))
    assert(lin("revenue") ==
      Set(SourceCol("lineitem", "l_extendedprice"), SourceCol("lineitem", "l_discount")))
  }

  test("window + explode lineage") {
    val rk = Lineage.of(Queries.qTopkGrouped(spark, sf))("rk")
    assert(rk.contains(SourceCol("events", "value")) &&
      rk.contains(SourceCol("events", "event_type")))
    // explode output derives from the generator's input column
    val wc = Lineage.of(Queries.qExplodeWordcount(spark, sf))
    val wordProv = wc.collectFirst { case (k, v) if k != "n" && v.nonEmpty => v }
    assert(wordProv.exists(_.exists(_.table == "documents")))
  }

  test("dependsOn answers the masking-audit question") {
    val masked = Queries.qMaskProject(spark, sf)
    // the masking projection removes confidential columns entirely:
    // no output may depend on them
    assert(!Lineage.dependsOn(masked, "documents", "source"))
    assert(!Lineage.dependsOn(masked, "documents", "n_chars"))
    assert(Lineage.dependsOn(masked, "documents", "text"))
  }

  test("union merges provenance from both branches") {
    val li = Tables.lineitem(spark, sf)
    val u = li.select(col("l_quantity").as("v"))
      .unionByName(li.select(col("l_tax").as("v")))
      .agg(sum(col("v").cast("decimal(18,2)")).as("s"))
    assert(Lineage.of(u)("s") ==
      Set(SourceCol("lineitem", "l_quantity"), SourceCol("lineitem", "l_tax")))
  }

  test("subquery lineage: dependence through scalar/EXISTS plans is not cleared") {
    val s = spark
    Tables.orders(s, sf).createOrReplaceTempView("lin_orders")
    Tables.customer(s, sf).createOrReplaceTempView("lin_customer")
    // output only names o_orderkey, but which rows survive is decided
    // by c_acctbal inside the EXISTS — a PII audit must see it
    val exists = s.sql(
      """SELECT o_orderkey FROM lin_orders o
        |WHERE EXISTS (SELECT 1 FROM lin_customer c
        |  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)""".stripMargin)
    assert(Lineage.dependsOn(exists, "customer", "c_acctbal"),
      "EXISTS filter column escaped the audit")
    // scalar subquery in the projection: value flows into the output
    val scalar = s.sql(
      """SELECT o_orderkey,
        |  (SELECT max(c_acctbal) FROM lin_customer c
        |   WHERE c.c_custkey = o.o_custkey) AS bal
        |FROM lin_orders o""".stripMargin)
    assert(Lineage.of(scalar)("bal").contains(SourceCol("customer", "c_acctbal")))
    assert(Lineage.dependsOn(scalar, "customer", "c_custkey"))
  }

  test("unmodeled operators fail closed: minted attributes answer dependsOn=true") {
    import spark.implicits._
    // typed map mints entirely new attributes the walk cannot model —
    // provenance must be Unknown, and dependsOn must refuse to clear
    // ANY column rather than falsely report independence
    val df = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .as[(Long, String)].map { case (id, t) => (id * 2, t.length) }
      .toDF("k", "len")
    assert(Lineage.of(df).values.exists(_.contains(Lineage.Unknown)))
    assert(Lineage.dependsOn(df, "documents", "text"),
      "fail-closed contract: unknown derivation must not clear text")
  }
}
