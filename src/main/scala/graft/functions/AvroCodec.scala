package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.AvroSchemaBridge

/** Binary Avro payload ⇄ Catalyst struct codec — the `from_avro` /
  * `to_avro` equivalent the environment's jar set lacks (no spark-avro),
  * built directly on avro-core which IS on the classpath.
  *
  * This is the head of the reference's data path: every Kafka message
  * value is a binary-Avro document that the reference deserializes
  * before filtering/masking (reference: firebase/app/artifacts.py:270-272
  * — messages arrive Avro-decoded from the SDK's spavro reader; schema
  * per topic, artifacts.py:221,314-318). Here the decode is a Catalyst
  * expression, so it runs distributed inside the projection with no
  * shuffle, and the decoded struct carries the `@aether_*` annotations
  * from [[AvroSchemaBridge]] so masking works on decoded payloads.
  *
  * Scale notes: per-row avro-core decode with reused
  * BinaryDecoder/GenericRecord buffers (no per-row allocation of the
  * codec machinery); CodegenFallback is deliberate — the expression is
  * a leaf-level pure function whose cost is the avro decode itself,
  * not the eval dispatch (same call as spark-avro's AvroDataToCatalyst,
  * which is also non-codegen).
  *
  * Supported Avro shapes mirror [[AvroSchemaBridge]]: records, [null,T]
  * unions, string/int/long/float/double/boolean/bytes, arrays, maps,
  * enums (as strings).
  */
object AvroCodec {

  /** Avro generic datum → Catalyst value converter for `s`. Built once
    * per (expression, thread); the returned closure is allocation-lean. */
  private[functions] def decoder(s: Schema): Any => Any = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported: $s")
      val inner = decoder(nonNull.head)
      v => if (v == null) null else inner(v)
    case Schema.Type.STRING | Schema.Type.ENUM =>
      v => UTF8String.fromString(v.toString)
    case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
         Schema.Type.DOUBLE | Schema.Type.BOOLEAN =>
      identity
    case Schema.Type.BYTES =>
      v => {
        val bb = v.asInstanceOf[ByteBuffer].duplicate()
        val out = new Array[Byte](bb.remaining())
        bb.get(out)
        out
      }
    case Schema.Type.ARRAY =>
      val el = decoder(s.getElementType)
      v => {
        val in = v.asInstanceOf[java.util.Collection[Any]]
        val out = new Array[Any](in.size)
        var i = 0
        val it = in.iterator()
        while (it.hasNext) {
          val x = it.next()
          out(i) = if (x == null) null else el(x); i += 1
        }
        new GenericArrayData(out)
      }
    case Schema.Type.MAP =>
      val vl = decoder(s.getValueType)
      v => {
        val in = v.asInstanceOf[java.util.Map[Any, Any]]
        val ks = new Array[Any](in.size)
        val vs = new Array[Any](in.size)
        var i = 0
        val it = in.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          ks(i) = UTF8String.fromString(e.getKey.toString)
          vs(i) = if (e.getValue == null) null else vl(e.getValue)
          i += 1
        }
        new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
      }
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.map(f => decoder(f.schema())).toArray
      v => {
        val r = v.asInstanceOf[GenericRecord]
        val out = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          val x = r.get(i)
          out(i) = if (x == null) null else fields(i)(x); i += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
      }
    case other => throw new UnsupportedOperationException(s"avro type $other")
  }

  /** Catalyst value → Avro generic datum converter for (`s`, `dt`). */
  private[functions] def encoder(s: Schema, dt: DataType): Any => Any =
    (s.getType, dt) match {
      case (Schema.Type.UNION, _) =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"only [null, T] unions supported: $s")
        val inner = encoder(nonNull.head, dt)
        v => if (v == null) null else inner(v)
      case (Schema.Type.STRING, StringType) => v => v.toString
      case (Schema.Type.ENUM, StringType) =>
        v => new GenericData.EnumSymbol(s, v.toString)
      case (Schema.Type.INT, IntegerType) | (Schema.Type.LONG, LongType) |
           (Schema.Type.FLOAT, FloatType) | (Schema.Type.DOUBLE, DoubleType) |
           (Schema.Type.BOOLEAN, BooleanType) =>
        identity
      case (Schema.Type.BYTES, BinaryType) =>
        v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val el = encoder(s.getElementType, et)
        v => {
          val in = v.asInstanceOf[ArrayData]
          val out = new java.util.ArrayList[Any](in.numElements())
          var i = 0
          while (i < in.numElements()) {
            out.add(if (in.isNullAt(i)) null else el(in.get(i, et))); i += 1
          }
          out
        }
      case (Schema.Type.MAP, MapType(StringType, vt, _)) =>
        val vl = encoder(s.getValueType, vt)
        v => {
          val in = v.asInstanceOf[MapData]
          val out = new java.util.LinkedHashMap[String, Any](in.numElements() * 2)
          val ks = in.keyArray(); val vs = in.valueArray()
          var i = 0
          while (i < in.numElements()) {
            out.put(ks.getUTF8String(i).toString,
              if (vs.isNullAt(i)) null else vl(vs.get(i, vt)))
            i += 1
          }
          out
        }
      case (Schema.Type.RECORD, st: StructType) =>
        val fields = s.getFields.asScala.map { f =>
          val idx = st.fieldIndex(f.name())
          (idx, st.fields(idx).dataType, encoder(f.schema(), st.fields(idx).dataType))
        }.toArray
        v => {
          val row = v.asInstanceOf[InternalRow]
          val rec = new GenericData.Record(s)
          var i = 0
          while (i < fields.length) {
            val (idx, fdt, conv) = fields(i)
            rec.put(i, if (row.isNullAt(idx)) null else conv(row.get(idx, fdt)))
            i += 1
          }
          rec
        }
      case other =>
        throw new UnsupportedOperationException(s"avro/catalyst pair $other")
    }
}

/** binary (Avro datum bytes) → struct. The READER schema
  * (`schemaJson`) is fixed at plan time and determines the output
  * struct; heterogeneous topics branch per topic upstream (same
  * branching the reference does by caching one schema per topic).
  *
  * Schema evolution (A17): when the bytes were WRITTEN under an older
  * schema, pass it as `writerSchemaJson` — Avro schema resolution
  * reads old bytes under the new contract (added fields take their
  * defaults, removed fields are skipped). The streaming flow is:
  * `SchemaRegistry.observe` surfaces `Changed`, the supervisor
  * restarts the query with the re-derived plan, and in-flight batches
  * written under the previous schema decode through this resolution
  * path. (The reference re-caches the carried schema per message and
  * its `_update_topic` is a no-op — artifacts.py:314-318,378-380.) */
case class AvroDecodeExpr(child: Expression, schemaJson: String,
    writerSchemaJson: Option[String] = None)
    extends UnaryExpression with CodegenFallback {

  override lazy val dataType: DataType = AvroSchemaBridge.parse(schemaJson)
  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): AvroDecodeExpr =
    copy(child = newChild)

  /** Per-thread decode state: reader + decoder + record reuse buffers.
    * Conversion copies every value out before the next read, so reuse
    * is safe; ThreadLocal because an expression instance may be shared
    * by the driver and task threads. */
  @transient private lazy val local = ThreadLocal.withInitial { () =>
    val reader = new Schema.Parser().parse(schemaJson)
    val writer = writerSchemaJson.map(new Schema.Parser().parse(_)).getOrElse(reader)
    new AvroDecodeExpr.State(new GenericDatumReader[GenericRecord](writer, reader),
      AvroCodec.decoder(reader))
  }

  override def nullSafeEval(input: Any): Any = {
    val st = local.get()
    st.decoder = DecoderFactory.get()
      .binaryDecoder(input.asInstanceOf[Array[Byte]], st.decoder)
    st.record = st.reader.read(st.record, st.decoder)
    st.conv(st.record)
  }
}

object AvroDecodeExpr {
  private final class State(val reader: GenericDatumReader[GenericRecord],
                            val conv: Any => Any) {
    var decoder: BinaryDecoder = _
    var record: GenericRecord = _
  }
}

/** struct → binary (Avro datum bytes) under `schemaJson` — the sink
  * side of the codec and the fixture-builder for tests/queries. */
case class AvroEncodeExpr(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): AvroEncodeExpr =
    copy(child = newChild)

  @transient private lazy val local = ThreadLocal.withInitial { () =>
    val schema = new Schema.Parser().parse(schemaJson)
    require(child.dataType.isInstanceOf[StructType],
      s"avro_encode input must be a struct, got ${child.dataType}")
    new AvroEncodeExpr.State(new GenericDatumWriter[Any](schema),
      AvroCodec.encoder(schema, child.dataType))
  }

  override def nullSafeEval(input: Any): Any = {
    val st = local.get()
    st.buf.reset()
    st.encoder = EncoderFactory.get().directBinaryEncoder(st.buf, st.encoder)
    st.writer.write(st.conv(input), st.encoder)
    st.encoder.flush()
    st.buf.toByteArray
  }
}

object AvroEncodeExpr {
  private final class State(val writer: GenericDatumWriter[Any],
                            val conv: Any => Any) {
    val buf = new ByteArrayOutputStream(256)
    var encoder: BinaryEncoder = _
  }
}

/** Column facade. */
object AvroColumns {
  /** from_avro equivalent: binary column → struct under the Avro
    * schema, with `@aether_*` annotations on the struct fields. */
  def avro_decode(value: Column, schemaJson: String): Column =
    ColumnBridge.column(AvroDecodeExpr(ColumnBridge.expression(value), schemaJson))

  /** Evolution-aware decode: bytes written under `writerSchemaJson`,
    * read under `readerSchemaJson` via Avro schema resolution. */
  def avro_decode_evolved(value: Column, readerSchemaJson: String,
      writerSchemaJson: String): Column =
    ColumnBridge.column(AvroDecodeExpr(ColumnBridge.expression(value),
      readerSchemaJson, Some(writerSchemaJson)))

  /** to_avro equivalent: struct column → Avro datum bytes. */
  def avro_encode(record: Column, schemaJson: String): Column =
    ColumnBridge.column(AvroEncodeExpr(ColumnBridge.expression(record), schemaJson))
}
