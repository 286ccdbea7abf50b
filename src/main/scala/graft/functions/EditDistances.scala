package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein distance (Lowrance–Wagner): edit
  * distance whose operations are insert, delete, substitute, and
  * transposition of adjacent characters — unlike the restricted
  * "optimal string alignment" variant, a transposed block may be
  * edited again, so dl("CA","ABC") = 2 (not OSA's 3). This matches
  * DuckDB's `damerau_levenshtein` exactly (verified on the canonical
  * discriminating inputs), which is what makes the operator
  * oracle-checkable.
  *
  * Spark ships `levenshtein` but no transposition-aware distance; for
  * entity resolution over human-keyed strings, transpositions are the
  * single most common typo class, so treating them as one edit (not
  * two) is what the blocking literature recommends.
  *
  * Execution shape: a plain `BinaryExpression` whose codegen emits one
  * static-shaped call on a referenced object — the loop itself is
  * straight JVM code the JIT compiles, and the expression composes
  * inside whole-stage codegen exactly like Spark's own `levenshtein`
  * (which calls `UTF8String.levenshteinDistance` the same way).
  * Cost is O(|a|·|b|) time and O(|a|·|b|) space per row — callers must
  * bound operand length (the catalog query compares fixed 40-char
  * prefixes inside sorted-neighborhood blocks, never whole documents).
  *
  * Character model: UTF-8 BYTES, which is exactly DuckDB's view
  * (measured: damerau_levenshtein('é','e') = 2 — one per byte of the
  * two-byte é). Operating on `UTF8String.getBytes` directly therefore
  * matches the oracle on ALL inputs (not just ASCII) while skipping
  * the String/char[] copies, and bounds the last-occurrence table to
  * a flat int[256] — no per-row boxing map.
  */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshteinExpr =
    copy(left = newLeft, right = newRight)

  /** Shared by interpreted eval and codegen. */
  def dl(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.getBytes
    val b = ub.getBytes
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // (n+2) x (m+2) Lowrance–Wagner table, flat row-major, ONE
    // allocation. n/m are BYTE lengths: the callers' 40-char prefix
    // bound means ≤160 bytes per side in the 4-byte-UTF-8 worst case,
    // i.e. a ≤162×162 int table ≈ 105 KB per row at the extreme (a
    // few KB on the ASCII-dominant common path) — still allocation-
    // bounded and GC-friendly, but not "a few KB" unconditionally
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    // da(c) = last row index where byte c occurred in `a`; zero-init
    // IS the algorithm's sentinel row 0
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a(i - 1)
      j = 1
      while (j <= m) {
        val bj = b(j - 1)
        val k = da(bj & 0xFF)
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var mn = sub
        if (ins < mn) mn = ins
        if (del < mn) mn = del
        if (tra < mn) mn = tra
        d((i + 1) * w + j + 1) = mn
        j += 1
      }
      da(ai & 0xFF) = i
      i += 1
    }
    d((n + 1) * w + m + 1)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    dl(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dlExpr", this,
      classOf[DamerauLevenshteinExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.dl($a, $b);")
  }
}

object EditDistances {
  /** Unrestricted Damerau–Levenshtein distance between two string
    * columns (see [[DamerauLevenshteinExpr]]). */
  def damerauLevenshtein(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshteinExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
