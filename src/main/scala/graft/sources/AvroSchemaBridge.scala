package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.spark.sql.types._

/** Avro (JSON) schema ⇄ Spark StructType bridge preserving the
  * reference's `@aether_*` annotations in StructField.metadata
  * (reference: extended-type mapping firebase/app/config.py:56-62;
  * annotated producer schema firebase/tests/__init__.py:257-1160 with
  * `@aether_extended_type`, `@aether_masking`, `@aether_lookup`
  * props; schema carried per message and cached per topic,
  * artifacts.py:221,314-318).
  *
  * Faithful choices:
  *  - every reference field is a ["null", T] union ⇒ nullable field;
  *  - `dateTime`-annotated strings stay StringType + metadata (the
  *    reference passes them through untyped, config.py:56-57);
  *  - unknown annotations are preserved verbatim so masking levels the
  *    engine doesn't know about still round-trip.
  */
object AvroSchemaBridge {
  private val AnnotationPrefix = "@aether_"

  def parse(avroJson: String): StructType =
    toStruct(new Schema.Parser().parse(avroJson))

  def toStruct(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"not a record: $schema")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable, metadata = annotations(f))
    }.toArray)
  }

  private def annotations(f: Schema.Field): Metadata = {
    val b = new MetadataBuilder()
    f.getObjectProps.asScala.foreach {
      case (k, v) if k.startsWith(AnnotationPrefix) =>
        b.putString(k.stripPrefix("@"), String.valueOf(v))
      case _ =>
    }
    b.build()
  }

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      val nullable = branches.exists(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported: $s")
      (toSparkType(nonNull.head)._1, nullable)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.RECORD => (toStruct(s), false)
    case Schema.Type.ARRAY =>
      val (el, elNullable) = toSparkType(s.getElementType)
      (ArrayType(el, containsNull = elNullable), false)
    case Schema.Type.MAP =>
      val (v, vNullable) = toSparkType(s.getValueType)
      (MapType(StringType, v, valueContainsNull = vNullable), false)
    case Schema.Type.ENUM => (StringType, false)
    case other => throw new UnsupportedOperationException(s"avro type $other")
  }

  // ---- extended-type mapping (A-table gap #5) --------------------------

  /** Aether extended-type mapping (reference: AETHER_TYPES,
    * firebase/app/config.py:56-62): `dateTime` → date/timestamp,
    * `geopoint`/`group` → object (already structs here), `select`/
    * `select1` → keyword (already string/array-of-string). Only
    * `dateTime` changes the Spark type, so the mapping is exposed as
    * an OPT-IN cast — the reference itself ships ISO strings through
    * untouched (the consumer never applies its own table), and parity
    * with it requires default-off. */
  def isDateTime(m: Metadata): Boolean =
    m.contains("aether_extended_type") &&
      m.getString("aether_extended_type") == "dateTime"

  /** The schema [[castExtendedTypes]] produces: dateTime-annotated
    * strings become TimestampType, recursively through structs and
    * arrays; all metadata survives. */
  def extendedTarget(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      val dt = f.dataType match {
        case StringType if isDateTime(f.metadata) => TimestampType
        case st: StructType => extendedTarget(st)
        case ArrayType(st: StructType, n) => ArrayType(extendedTarget(st), n)
        case other => other
      }
      f.copy(dataType = dt)
    })

  /** Apply the extended-type mapping to a decoded DataFrame:
    * ANSI-cast every dateTime-annotated string column (ISO-8601, the
    * reference's wire format — tests/__init__.py:291-299) to
    * TimestampType, walking nested structs and arrays of structs. */
  def castExtendedTypes(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    def conv(c: Column, f: StructField): Column = f.dataType match {
      case StringType if isDateTime(f.metadata) => c.cast(TimestampType)
      case st: StructType =>
        val rebuilt = struct(st.fields.toIndexedSeq.map(sf =>
          conv(c.getField(sf.name), sf).as(sf.name, sf.metadata)): _*)
        when(c.isNull, lit(null).cast(extendedTarget(st))).otherwise(rebuilt)
      case ArrayType(st: StructType, _) =>
        transform(c, x => {
          val rebuilt = struct(st.fields.toIndexedSeq.map(sf =>
            conv(x.getField(sf.name), sf).as(sf.name, sf.metadata)): _*)
          when(x.isNull, lit(null).cast(extendedTarget(st))).otherwise(rebuilt)
        })
      case _ => c
    }
    df.select(df.schema.fields.toIndexedSeq.map(f =>
      conv(col(f.name), f).as(f.name, f.metadata)): _*)
  }

  /** Schema fingerprint for the per-topic plan cache / change
    * detection (A17): canonical parsing-form fingerprint. */
  def fingerprint(avroJson: String): Long =
    org.apache.avro.SchemaNormalization.parsingFingerprint64(
      new Schema.Parser().parse(avroJson))
}

/** Per-topic schema registry with change detection (reference A17:
  * compares the incoming message's schema with the cached one,
  * artifacts.py:314-318 — the reference just logs and no-ops;
  * we surface the change so the caller can re-plan the projection). */
final class SchemaRegistry {
  private val byTopic = scala.collection.concurrent.TrieMap[String, (Long, StructType)]()

  sealed trait Outcome
  case object Unchanged extends Outcome
  case object New extends Outcome
  final case class Changed(previous: StructType) extends Outcome

  def observe(topic: String, avroJson: String): Outcome = synchronized {
    val fp = AvroSchemaBridge.fingerprint(avroJson)
    byTopic.get(topic) match {
      case Some((oldFp, _)) if oldFp == fp => Unchanged
      case Some((_, oldSchema)) =>
        byTopic.update(topic, (fp, AvroSchemaBridge.parse(avroJson)))
        Changed(oldSchema)
      case None =>
        byTopic.update(topic, (fp, AvroSchemaBridge.parse(avroJson)))
        New
    }
  }

  def schemaOf(topic: String): Option[StructType] = byTopic.get(topic).map(_._2)
}
