package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Column-facade for graft's custom expressions. */
object GraftFunctions {
  /** Python json.dumps(sort_keys=True) canonical serialization. */
  def canonical_json(c: Column): Column =
    ColumnBridge.column(CanonicalJsonExpr(ColumnBridge.expression(c)))

  /** The reference's 64-bit document hash: md5 hexdigest of the
    * canonical JSON, truncated to 16 hex chars
    * (reference: firebase/app/utils.py:29-33). */
  def canonical_hash(c: Column): Column =
    substring(md5(canonical_json(c)), 1, 16)
}
