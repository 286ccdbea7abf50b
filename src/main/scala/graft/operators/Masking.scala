package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Field-level masking: classification-annotation-driven column pruning
  * (reference: firebase/app/artifacts.py:359-370 — the SDK strips
  * fields whose `@aether_masking` annotation is more restrictive than
  * the subscription's emit level, given an ordered low→high levels
  * list; defaults in firebase/conf/consumer/kafka.json:8-9).
  *
  * Spark-first shape: the classification lives in
  * `StructField.metadata`, and masking is a pure projection — Catalyst
  * column-prunes the dropped fields all the way into the parquet/Avro
  * scan, so masked fields are never even read. Works recursively on
  * nested structs.
  */
object Masking {
  val DefaultAnnotation = "aether_masking"
  val DefaultLevels: Seq[String] = Seq("public", "confidential", "secret", "top secret", "ufos")

  /** Attach classification annotations (metadata) to top-level fields. */
  def annotate(df: DataFrame, classifications: Map[String, String],
               annotation: String = DefaultAnnotation): DataFrame = {
    val cols = df.schema.fields.map { f =>
      classifications.get(f.name) match {
        case Some(level) =>
          val md = new MetadataBuilder().withMetadata(f.metadata)
            .putString(annotation, level).build()
          col(f.name).as(f.name, md)
        case None => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The masking projection as (name, expression) pairs over `schema`:
    * one entry per surviving top-level field, with nested structs
    * rebuilt WITHOUT their masked subfields. Callers that need to
    * combine masking with other columns (e.g. the streaming pipeline's
    * routing metadata) must select these expressions — selecting the
    * original columns by name would silently undo the nested pruning. */
  def maskProjection(schema: StructType,
                     emitLevel: String,
                     maskLevels: Seq[String] = DefaultLevels,
                     annotation: String = DefaultAnnotation): Seq[(String, Column)] = {
    val emitIdx = maskLevels.indexOf(emitLevel)
    require(emitIdx >= 0, s"emit level $emitLevel not in $maskLevels")

    def allowed(md: Metadata): Boolean =
      !md.contains(annotation) || {
        val lvl = md.getString(annotation)
        val i = maskLevels.indexOf(lvl)
        i >= 0 && i <= emitIdx
      }

    def prune(field: StructField, path: Column): Option[Column] =
      if (!allowed(field.metadata)) None
      else field.dataType match {
        case st: StructType =>
          val kids = st.fields.flatMap(f => prune(f, path.getField(f.name)).map(_.as(f.name, f.metadata)))
          if (kids.isEmpty) None else Some(struct(kids.toIndexedSeq: _*))
        case _ => Some(path)
      }

    schema.fields.toIndexedSeq.flatMap { f =>
      prune(f, col(f.name)).map(c => f.name -> c.as(f.name, f.metadata))
    }
  }

  /** Keep only fields whose classification is at or below `emitLevel`
    * in the ordered `maskLevels` (low→high). Unannotated fields pass
    * (matching the SDK: only classified fields are maskable). */
  def maskColumns(df: DataFrame,
                  emitLevel: String,
                  maskLevels: Seq[String] = DefaultLevels,
                  annotation: String = DefaultAnnotation): DataFrame =
    df.select(maskProjection(df.schema, emitLevel, maskLevels, annotation).map(_._2): _*)
}
