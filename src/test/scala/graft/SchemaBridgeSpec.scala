package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Masking
import graft.sources.{AvroSchemaBridge, SchemaRegistry}

class SchemaBridgeSpec extends AnyFunSuite with SparkTestBase {

  // shape mirrors the reference's annotated producer schema
  // (firebase/tests/__init__.py:257-1160): nullable unions, nested
  // record, @aether_extended_type / @aether_masking annotations
  private val avro =
    """{
      | "type": "record", "name": "Entity", "fields": [
      |  {"name": "id", "type": "string"},
      |  {"name": "beds", "type": ["null", "int"]},
      |  {"name": "created", "type": ["null", "string"],
      |   "@aether_extended_type": "dateTime"},
      |  {"name": "ssn", "type": ["null", "string"],
      |   "@aether_masking": "secret"},
      |  {"name": "geometry", "type": ["null", {
      |    "type": "record", "name": "Geo", "fields": [
      |      {"name": "latitude", "type": ["null", "float"]},
      |      {"name": "longitude", "type": ["null", "float"]}]}],
      |   "@aether_extended_type": "geopoint"},
      |  {"name": "open_days", "type": ["null",
      |    {"type": "array", "items": ["null", "string"]}]}
      |]}""".stripMargin

  test("avro record maps to StructType with nullability and annotations") {
    val st = AvroSchemaBridge.parse(avro)
    assert(st.fieldNames.toSeq ==
      Seq("id", "beds", "created", "ssn", "geometry", "open_days"))
    assert(!st("id").nullable && st("beds").nullable)
    assert(st("beds").dataType == IntegerType)
    assert(st("created").dataType == StringType) // dateTime stays string + metadata
    assert(st("created").metadata.getString("aether_extended_type") == "dateTime")
    assert(st("ssn").metadata.getString("aether_masking") == "secret")
    val geo = st("geometry").dataType.asInstanceOf[StructType]
    assert(geo("latitude").dataType == FloatType)
    assert(st("open_days").dataType ==
      ArrayType(StringType, containsNull = true))
  }

  test("bridged annotations drive the masking operator") {
    import scala.jdk.CollectionConverters._
    val st = AvroSchemaBridge.parse(avro)
    val row: org.apache.spark.sql.Row = org.apache.spark.sql.Row(
      "e1", 2, "2020-01-01T00:00:00", "123-45-6789", null, null)
    val df = spark.createDataFrame(Seq(row).asJava, st)
    val masked = Masking.maskColumns(df, emitLevel = "public")
    assert(!masked.columns.contains("ssn"))
    assert(masked.columns.contains("beds"))
  }

  test("schema registry detects new/unchanged/changed per topic") {
    val reg = new SchemaRegistry
    assert(reg.observe("t1", avro) == reg.New)
    assert(reg.observe("t1", avro) == reg.Unchanged)
    val evolved = avro.replace("\"beds\"", "\"beds_renamed\"")
    val out = reg.observe("t1", evolved)
    assert(out.isInstanceOf[reg.Changed])
    assert(reg.schemaOf("t1").get.fieldNames.contains("beds_renamed"))
  }

  test("fingerprint ignores irrelevant formatting") {
    val spaced = avro.replace("\n", "\n  ")
    assert(AvroSchemaBridge.fingerprint(avro) == AvroSchemaBridge.fingerprint(spaced))
  }

  test("extended-type mapping: dateTime casts to timestamp behind the flag (config.py:56-62)") {
    import scala.jdk.CollectionConverters._
    val st = AvroSchemaBridge.parse(avro)
    val rows = Seq(
      org.apache.spark.sql.Row("a", Integer.valueOf(1), "2020-03-11T11:14:32Z",
        "s", null, null),
      org.apache.spark.sql.Row("b", null, null, null, null, null))
    val df = spark.createDataFrame(rows.asJava, st)
    // default path: untouched (parity with the reference, which ships
    // ISO strings through)
    assert(df.schema("created").dataType == StringType)
    val mapped = AvroSchemaBridge.castExtendedTypes(df)
    assert(mapped.schema("created").dataType == TimestampType)
    assert(mapped.schema == AvroSchemaBridge.extendedTarget(st))
    // value parses to the real instant; nulls stay null
    val got = mapped.select("created").collect().map(r => Option(r.get(0)))
    assert(got(0).get.toString.startsWith("2020-03-11"))
    assert(got(1).isEmpty)
    // geopoint struct and annotations survive
    assert(mapped.schema("geometry").metadata.getString("aether_extended_type") == "geopoint")
    assert(mapped.schema("created").metadata.getString("aether_extended_type") == "dateTime")
  }
}
