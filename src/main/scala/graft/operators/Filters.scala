package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate filters (reference A4/A6): the per-topic JSONPath
  * membership filter (firebase/app/artifacts.py:345-358; config keys
  * fixtures/examples.py:43-45) and the emit-flag gate
  * (conf/consumer/kafka.json:7).
  *
  * Observed reference configs use simple dotted field paths
  * (`operational_status`), so the fast path is a native `col()` /
  * `get_json_object` predicate that Catalyst pushes into the scan.
  */
object Filters {

  /** Filter rows whose value at a dotted struct path is in passValues.
    * `filter_required=false` ⇒ identity (examples.py:43). */
  def fieldPathFilter(df: DataFrame, path: String, passValues: Seq[String],
                      required: Boolean = true): DataFrame =
    if (!required) df
    else df.filter(col(path).cast("string").isin(passValues: _*))

  /** Same, for a JSON-string column: JSONPath via get_json_object
    * (codegen'd, no UDF). `path` is e.g. "$.k". */
  def jsonPathFilter(df: DataFrame, jsonCol: Column, path: String,
                     passValues: Seq[String]): DataFrame =
    df.filter(get_json_object(jsonCol, path).isin(passValues: _*))
}
