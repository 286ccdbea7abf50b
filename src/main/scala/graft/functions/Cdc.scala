package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking by a gear rolling hash, as ONE fused
  * codegen'd expression.
  *
  * Fixed-offset blocks (the q_paragraph_dedup unit) lose all
  * alignment after a single insertion; content-defined breakpoints
  * (the LBFS rolling-fingerprint idea — Muthitacharoen et al., "A
  * Low-Bandwidth Network File System", SOSP 2001 — modernized by
  * gear hashing in FastCDC, Xia et al., USENIX ATC 2016, both public
  * papers) cut wherever the LOCAL content says so, so two documents
  * sharing a long span produce byte-identical chunks for that span
  * no matter where it sits in either document.
  *
  * Semantics (exactly mirrored by the DuckDB oracle): scanning the
  * text left to right with h₀ = 0,
  * hᵢ = (2·hᵢ₋₁ + gear(cᵢ)) mod 2³², gear(c) = (c·2654435761) mod 2³²
  * (Knuth's multiplicative mixer on the char code), position i is a
  * breakpoint iff hᵢ ≡ 0 (mod 2⁵) — expected chunk 32 chars — and
  * the end of the text always closes the final chunk. Because the
  * shift drops a char's influence after 32 steps, hᵢ is a pure
  * function of the last 32 chars: breakpoints are content-LOCAL
  * (shift-invariant), which is the whole dedup property, and also
  * what lets the oracle compute hᵢ positionally as
  * Σ gear(cⱼ)·2^(i−j) mod 2³² with no sequential fold. No min/max
  * chunk-length clamps: they would re-introduce cut-to-cut
  * sequential dependence for a marginal size-distribution win.
  *
  * One JIT'd loop per row (same design as [[ShinglesExpr]]) — the
  * declarative formulation would be an O(n·32) interpreted lambda
  * chain per document. */
case class GearChunksExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): GearChunksExpr =
    copy(child = newChild)

  private val Mod: Long = 1L << 32
  private val MaskBits: Long = (1L << 5) - 1

  /** Shared by interpreted eval and codegen. */
  def chunks(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      val gear = (s.charAt(i).toLong * 2654435761L) % Mod
      h = (h * 2 + gear) % Mod
      if ((h & MaskBits) == 0L) {
        out += UTF8String.fromString(s.substring(start, i + 1))
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromString(s.substring(start, n))
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gearCdc", this, classOf[GearChunksExpr].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.chunks($in);")
  }
}

object Cdc {
  /** Gear-hash content-defined chunks (see [[GearChunksExpr]]). */
  def gearChunks(text: Column): Column =
    ColumnBridge.column(GearChunksExpr(ColumnBridge.expression(text)))
}
