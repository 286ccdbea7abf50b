package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The loader contract: `events.ts` is epoch-nanos LongType no matter
  * which physical parquet type the driver's testdata generation used
  * (timestamp[ns] in rounds 1-8, timestamp[us] from round 9). A
  * regeneration of the testdata must never ripple into the 14
  * ts-consuming catalog queries again. */
class TablesSpec extends AnyFunSuite with SparkTestBase {

  test("driver testdata events.ts loads as epoch-nanos LongType") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    val f = df.schema.fields.find(_.name == "ts").get
    assert(f.dataType == LongType, s"ts is ${f.dataType}")
    // sanity: values are epoch NANOS (year-2000+ data ⇒ > 9.4e17),
    // not micros/millis/seconds
    val mn = df.agg(min(col("ts"))).head().getLong(0)
    assert(mn > 940000000000000000L, s"min ts $mn is not nanos-scale")
  }

  test("a us-precision timestamp ts column normalizes to the same nanos") {
    val tmp = Files.createTempDirectory("graft-tables").toString
    // Spark writes timestamp columns as us-precision parquet (the
    // round-9+ testdata generation); 1700000000.123456s epoch
    spark.sql("SELECT timestamp_micros(1700000000123456) AS ts, 1L AS event_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Tables.events(spark, tmp)
    assert(got.schema("ts").dataType == LongType)
    assert(got.head().getAs[Long]("ts") == 1700000000123456000L)
  }

  test("loader does not leak the NTZ-inference conf to other readers") {
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val before = spark.conf.get(key)
    Tables.events(spark, "/root/testdata/sf0.001")
    assert(spark.conf.get(key) == before,
      s"$key leaked: was $before, now ${spark.conf.get(key)}")
    // and the leak would be observable: a fresh NTZ-typed parquet read
    // outside the loader still infers TIMESTAMP_NTZ (default true)
    if (before == "true") {
      val tmp = Files.createTempDirectory("graft-ntz").toString
      spark.sql("SELECT timestamp_ntz '2024-01-01 00:00:00' AS t")
        .write.mode("overwrite").parquet(s"$tmp/t.parquet")
      assert(spark.read.parquet(s"$tmp/t.parquet").schema("t").dataType
        == org.apache.spark.sql.types.TimestampNTZType)
    }
  }

  test("the epoch-nanos ts rewrite is keyed to the events table only") {
    val tmp = Files.createTempDirectory("graft-tables-other").toString
    spark.sql("SELECT timestamp_micros(1700000000123456) AS ts, 1L AS k")
      .write.mode("overwrite").parquet(s"$tmp/audit.parquet")
    val got = Tables.table(spark, tmp, "audit")
    assert(got.schema("ts").dataType
      == org.apache.spark.sql.types.TimestampType,
      s"non-events ts was rewritten to ${got.schema("ts").dataType}")
  }

  test("tables without a ts column pass through untouched") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    assert(!li.schema.fieldNames.contains("ts"))
    assert(li.count() > 0)
  }
}
