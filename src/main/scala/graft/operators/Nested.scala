package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Nested path get/replace on struct columns (reference A26:
  * get_nested / replace_nested dict walkers, firebase/app/utils.py:
  * 42-57 — used for config data and emit-flag paths). Spark-native:
  * `col("a.b.c")` reads, chained `withField` writes. */
object Nested {
  /** Read a dotted path. */
  def getPath(path: String): Column = col(path)

  /** Replace the value at a dotted path inside a struct column,
    * preserving every other field (recursive withField). */
  def withPath(structCol: Column, path: String, value: Column): Column = {
    val parts = path.split("\\.")
    require(parts.nonEmpty, "empty path")
    structCol.withField(parts.mkString("."), value)
  }
}
