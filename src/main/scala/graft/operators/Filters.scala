package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate filters (reference A4/A6): the per-topic JSONPath
  * membership filter (firebase/app/artifacts.py:345-358; config keys
  * fixtures/examples.py:43-45) and the emit-flag gate
  * (conf/consumer/kafka.json:7).
  *
  * All `filter_field_path` expressions — from the reference's observed
  * simple dotted paths (`operational_status`) up to the jsonpath-ng
  * subset (wildcards, indexes, slices, `..`, bracketed predicates) —
  * compile through [[graft.functions.JsonPath]] into pure Catalyst
  * expressions against the static schema; for dotted paths the
  * optimizer collapses them to plain nested-field references that push
  * into the scan.
  */
object Filters {

  /** The reference's membership filter: keep rows where ANY value
    * matched by the JSONPath is in `passValues` (string-compared).
    * A path matching nothing in the schema keeps no rows. */
  def fieldPathCondition(schema: org.apache.spark.sql.types.StructType,
                         path: String, passValues: Seq[String]): Column =
    graft.functions.JsonPath.passPredicate(schema, path, passValues)

  /** Filter rows by [[fieldPathCondition]].
    * `filter_required=false` ⇒ identity (examples.py:43). */
  def fieldPathFilter(df: DataFrame, path: String, passValues: Seq[String],
                      required: Boolean = true): DataFrame =
    if (!required) df
    else df.filter(fieldPathCondition(df.schema, path, passValues))

  /** Same, for a JSON-string column: JSONPath via get_json_object
    * (codegen'd, no UDF). `path` is e.g. "$.k". */
  def jsonPathFilter(df: DataFrame, jsonCol: Column, path: String,
                     passValues: Seq[String]): DataFrame =
    df.filter(get_json_object(jsonCol, path).isin(passValues: _*))
}
