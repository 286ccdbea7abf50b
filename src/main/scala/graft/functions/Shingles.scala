package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingles of a text column in ONE fused,
  * codegen'd expression.
  *
  * Replaces the declarative
  * `array_distinct(transform(sequence(1, size(w)-n+1), i ->
  * concat(element_at(w,i), ' ', ...)))` formulation, which runs the
  * whole lambda chain through the Catalyst interpreter: measured at
  * sf0.1, shingling 5000 ~300-char docs cost ~6 s inside a Generate
  * (explode) pipeline — ~25 µs per shingle of pure interpretation
  * overhead — versus milliseconds as a single JIT'd loop. Every
  * consumer in the dedup family (minhash signatures, LSH bands,
  * n-gram Jaccard verify, SimHash, the exact similarity join) sits
  * downstream of this expression, so it is the family's shared cost
  * center.
  *
  * Semantics are IDENTICAL to the old formulation (the DuckDB oracle
  * CTE mirrors it): split on single spaces keeping empties, emit
  * n-word windows joined by one space when the doc has ≥ n words,
  * dedup preserving first occurrence, empty array otherwise.
  */
case class ShinglesExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression, n: Int,
    dropEmpty: Boolean = false, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): ShinglesExpr =
    copy(child = newChild)

  /** Shared by interpreted eval and codegen (one virtual call per ROW;
    * the loop is plain JVM code the JIT compiles). */
  def shingle(text: UTF8String): ArrayData = {
    // identical tokenization to split(text, " "): single-space regex,
    // limit -1 (keeps empty tokens, including trailing); dropEmpty
    // matches filter(split(...), t -> t != '')
    val raw = text.toString.split(" ", -1)
    val words = if (dropEmpty) raw.filter(_.nonEmpty) else raw
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out0 = new java.util.LinkedHashSet[String]()
    val outN = new scala.collection.mutable.ArrayBuffer[Any]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      if (distinct) out0.add(sb.toString)
      else outN += UTF8String.fromString(sb.toString)
      i += 1
    }
    if (!distinct) return new GenericArrayData(outN.toArray)
    val out = new Array[Any](out0.size())
    val it = out0.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[ShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.shingle($in);")
  }
}

object Shingles {
  /** Fused distinct word-n-gram shingles (see [[ShinglesExpr]]). */
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(text), n))

  /** ALL n-word windows (duplicates kept, empty tokens dropped) —
    * the windowed-span form duplicated-span detection and n-gram LM
    * scoring consume. */
  def wordWindows(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(text), n,
      dropEmpty = true, distinct = false))
}
