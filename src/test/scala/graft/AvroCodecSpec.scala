package graft

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AvroColumns._
import graft.operators.Masking
import graft.streaming.Pipeline

/** Decode correctness is proven against avro-core itself: the golden
  * test builds bytes with GenericDatumWriter directly (not via our
  * encoder), so an encode/decode bug pair can't cancel out. */
class AvroCodecSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val fullSchema =
    """{"type":"record","name":"Rec","fields":[
      |  {"name":"i","type":"int"},
      |  {"name":"l","type":"long"},
      |  {"name":"f","type":"float"},
      |  {"name":"d","type":"double"},
      |  {"name":"b","type":"boolean"},
      |  {"name":"s","type":"string"},
      |  {"name":"bin","type":"bytes"},
      |  {"name":"e","type":{"type":"enum","name":"E","symbols":["RED","BLUE"]}},
      |  {"name":"opt","type":["null","string"]},
      |  {"name":"arr","type":{"type":"array","items":"long"}},
      |  {"name":"m","type":{"type":"map","values":"long"}},
      |  {"name":"nested","type":{"type":"record","name":"Inner","fields":[
      |    {"name":"x","type":"long"},
      |    {"name":"tags","type":{"type":"array","items":"string"}}]}}
      |]}""".stripMargin

  test("golden decode: bytes written by avro-core come back as typed struct") {
    val schema = new Schema.Parser().parse(fullSchema)
    val inner = new GenericData.Record(schema.getField("nested").schema())
    inner.put("x", 7L)
    inner.put("tags", java.util.List.of("a", "b"))
    val rec = new GenericData.Record(schema)
    rec.put("i", 42)
    rec.put("l", 3000000000L)
    rec.put("f", 1.5f)
    rec.put("d", 2.25)
    rec.put("b", true)
    rec.put("s", "héllo")
    rec.put("bin", java.nio.ByteBuffer.wrap(Array[Byte](1, 2, 3)))
    rec.put("e", new GenericData.EnumSymbol(schema.getField("e").schema(), "BLUE"))
    rec.put("opt", null)
    rec.put("arr", java.util.List.of(10L, 20L))
    rec.put("m", java.util.Map.of("k1", 1L, "k2", 2L))
    rec.put("nested", inner)
    val buf = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().directBinaryEncoder(buf, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()

    val row = Seq(buf.toByteArray).toDF("value")
      .select(avro_decode(col("value"), fullSchema).as("r"))
      .select($"r.i", $"r.l", $"r.f", $"r.d", $"r.b", $"r.s", $"r.bin", $"r.e",
        $"r.opt", $"r.arr", $"r.m", $"r.nested.x", $"r.nested.tags")
      .head()
    assert(row.getInt(0) == 42)
    assert(row.getLong(1) == 3000000000L)
    assert(row.getFloat(2) == 1.5f)
    assert(row.getDouble(3) == 2.25)
    assert(row.getBoolean(4))
    assert(row.getString(5) == "héllo")
    assert(row.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(row.getString(7) == "BLUE")
    assert(row.isNullAt(8))
    assert(row.getSeq[Long](9) == Seq(10L, 20L))
    assert(row.getMap[String, Long](10) == Map("k1" -> 1L, "k2" -> 2L))
    assert(row.getLong(11) == 7L)
    assert(row.getSeq[String](12) == Seq("a", "b"))
  }

  test("schema evolution: old-writer bytes decode under the new reader contract") {
    // v1 producer schema; v2 adds a defaulted field and drops one —
    // the reference handles this by re-caching the carried schema per
    // message (artifacts.py:314-318); here Avro schema resolution
    // reads v1 bytes under the v2 contract
    val v1 = """{"type":"record","name":"E","fields":[
      |{"name":"id","type":"string"},
      |{"name":"legacy","type":["null","string"],"default":null},
      |{"name":"n","type":"long"}]}""".stripMargin.replace("\n", "")
    val v2 = """{"type":"record","name":"E","fields":[
      |{"name":"id","type":"string"},
      |{"name":"n","type":"long"},
      |{"name":"added","type":["null","string"],"default":null}]}"""
      .stripMargin.replace("\n", "")
    val s1 = new Schema.Parser().parse(v1)
    val rec = new GenericData.Record(s1)
    rec.put("id", "doc-1"); rec.put("legacy", "bye"); rec.put("n", 9L)
    val buf = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().directBinaryEncoder(buf, null)
    new GenericDatumWriter[GenericData.Record](s1).write(rec, enc)
    enc.flush()

    val row = Seq(buf.toByteArray).toDF("value")
      .select(graft.functions.AvroColumns
        .avro_decode_evolved(col("value"), v2, v1).as("r"))
      .select($"r.id", $"r.n", $"r.added").head()
    assert(row.getString(0) == "doc-1")
    assert(row.getLong(1) == 9L)
    assert(row.isNullAt(2)) // added field takes its default
  }

  test("encode → decode round-trips every supported shape incl. nulls") {
    val df = Seq(
      (1, 2L, 0.5f, 0.25, false, "x", Array[Byte](9), Option("y"),
        Seq(1L), Map("a" -> 1L), (5L, Seq("t"))),
      (2, 3L, 1.5f, 1.25, true, "z", Array[Byte](8, 7), Option.empty[String],
        Seq.empty[Long], Map.empty[String, Long], (6L, Seq.empty[String])))
      .toDF("i", "l", "f", "d", "b", "s", "bin", "opt", "arr", "m", "nested")
      // enum column can't come from a Scala tuple; add it as a literal
      .withColumn("e", when($"i" === 1, lit("RED")).otherwise(lit("BLUE")))
      .select(struct($"i", $"l", $"f", $"d", $"b", $"s", $"bin", $"e", $"opt",
        $"arr", $"m", struct($"nested._1".as("x"), $"nested._2".as("tags")).as("nested")).as("r"))
    val back = df
      .select(avro_decode(avro_encode($"r", fullSchema), fullSchema).as("r"))
    assert(back.select(to_json($"r")).as[String].collect().toSeq ==
      df.select(to_json($"r")).as[String].collect().toSeq)
  }

  test("decodeAvro flattens payload, keeps kafka_topic, and masking sees annotations") {
    val schemaJson =
      """{"type":"record","name":"Doc","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"name","type":["null","string"]},
        |  {"name":"ssn","type":["null","string"],"@aether_masking":"secret"}
        |]}""".stripMargin
    val raw = Seq((1L, "alice", "123-45-6789"), (2L, "bob", "987-65-4321"))
      .toDF("id", "name", "ssn")
      .select(lit("tnt.people").as("kafka_topic"),
        avro_encode(struct($"id", $"name", $"ssn"), schemaJson).as("value"))
    val decoded = Pipeline.decodeAvro(raw, schemaJson)
    assert(decoded.columns.toSeq == Seq("kafka_topic", "id", "name", "ssn"))
    // the @aether_masking annotation survives the decode into metadata
    val masked = Masking.maskColumns(
      decoded.select($"id", $"name", $"ssn"), emitLevel = "confidential")
    assert(masked.columns.toSeq == Seq("id", "name"))
    assert(masked.orderBy($"id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "alice"), (2L, "bob")))
  }

  test("decodeAvro plans exactly one decode regardless of field count") {
    val schemaJson =
      """{"type":"record","name":"Doc","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"name","type":["null","string"]},
        |  {"name":"ssn","type":["null","string"]}
        |]}""".stripMargin
    // a file-backed input: over a LocalRelation the optimizer would
    // evaluate the whole decode eagerly and leave nothing to count
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toString
    Seq((1L, "alice", "x")).toDF("id", "name", "ssn")
      .select(lit("tnt.people").as("kafka_topic"),
        avro_encode(struct($"id", $"name", $"ssn"), schemaJson).as("value"))
      .write.mode("overwrite").parquet(dir)
    val decoded = Pipeline.decodeAvro(spark.read.parquet(dir), schemaJson)
    val nDecodes = decoded.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case e: graft.functions.AvroDecodeExpr => e
      })
    }.flatten.size
    assert(nDecodes == 1, s"expected 1 AvroDecodeExpr in the plan, got $nDecodes")
  }

  test("decodeAvro rejects payload fields colliding with carried columns") {
    val schemaJson =
      """{"type":"record","name":"Doc","fields":[
        |  {"name":"kafka_topic","type":"string"},
        |  {"name":"id","type":"long"}
        |]}""".stripMargin
    val raw = Seq((1L, "t")).toDF("id", "t")
      .select(lit("tnt.x").as("kafka_topic"),
        avro_encode(struct(lit("a").as("kafka_topic"), $"id"), schemaJson).as("value"))
    val e = intercept[IllegalArgumentException](Pipeline.decodeAvro(raw, schemaJson))
    assert(e.getMessage.contains("kafka_topic"))
  }

  test("q_avro_decode: decoded values equal the original parquet columns") {
    val direct = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"source", $"n_chars",
        size(split($"text", " ")).cast("long").as("n_words"),
        substring($"text", 1, 40).as("prefix"))
      .orderBy($"doc_id")
    val viaAvro = Queries.qAvroDecode(spark, sf)
    assert(viaAvro.collect().toSeq == direct.collect().toSeq)
  }
}
