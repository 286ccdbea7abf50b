package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused multi-pattern substring counter: ONE pass over the document
  * bytes per pattern, counting leftmost non-overlapping occurrences of
  * every pattern in a fixed list, returned as one aligned long array.
  *
  * The declarative alternative — N `replace`/`regexp_count` column
  * expressions — materializes N rewritten copies of every document
  * per row (each `replace` allocates the full stripped string just to
  * measure its length). This expression allocates nothing per row but
  * the N-slot count array; the byte scans are plain JVM loops the JIT
  * compiles, and the expression composes inside whole-stage codegen
  * like the other graft expressions.
  *
  * Semantics: byte-wise leftmost non-overlapping matching (after a
  * match the scan resumes AFTER the matched span), which is exactly
  * what the SQL idiom `(len(s) - len(replace(s, p, ''))) / len(p)`
  * counts on both engines — that identity is the oracle.
  *
  * The pattern list is bounded and compile-time-constant per plan
  * (a blocklist/lexicon, not data), so a per-pattern memchr-style
  * scan — O(N·L) worst case — beats building an Aho–Corasick
  * automaton for the N this is built for (≲ a few dozen); swap in an
  * automaton only if N grows to hundreds.
  */
case class MultiPatternCountExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty")

  @transient private lazy val patBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes("UTF-8")).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternCountExpr = copy(child = newChild)

  def countAll(text: UTF8String): GenericArrayData = {
    val t = text.getBytes
    val out = new Array[Any](patBytes.length)
    var pi = 0
    while (pi < patBytes.length) {
      val p = patBytes(pi)
      var cnt = 0L
      var i = 0
      val limit = t.length - p.length
      while (i <= limit) {
        var j = 0
        while (j < p.length && t(i + j) == p(j)) j += 1
        if (j == p.length) { cnt += 1; i += p.length }
        else i += 1
      }
      out(pi) = cnt
      pi += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    countAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mpExpr", this,
      classOf[MultiPatternCountExpr].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.countAll($in);")
  }
}

object MultiPattern {
  /** Occurrence counts of each pattern in `text`, aligned with the
    * pattern list (see [[MultiPatternCountExpr]]). */
  def countAll(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternCountExpr(
      ColumnBridge.expression(text), patterns))
}
