package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exact integer dot product of two array<bigint> columns.
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) -> x*y), 0, +)` in the
  * similarity hot path: higher-order-function lambdas are interpreted
  * per element, while this expression is a single fused loop with
  * whole-stage codegen — the difference is ~an order of magnitude on
  * wide embeddings.
  */
case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += xs.getLong(i) * ys.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** All banded-LSH keys of a quantized vector in ONE fused expression.
  *
  * Equivalent to `bands × bandSize` separate `dot_long(qv, planeLit) >
  * 0` trees — but those inline one 64-element array literal per plane,
  * so at production widths (192 planes for the near-dup blocker) the
  * plan carries ~12k literal nodes and analysis/codegen dominates the
  * query. Here the ±1 plane matrix rides along as ONE referenced
  * constant (flattened row-major) and the whole signature is a single
  * fused loop: key `b` has bit `j` set iff
  * `dot(qv, plane[b*bandSize+j]) > 0`.
  */
case class BandKeysExpr(child: Expression, planesFlat: IndexedSeq[Long],
    dim: Int, bandSize: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // the case-class parameter is an immutable Seq (element-wise
  // equals/hashCode) so Catalyst canonicalization and plan-equality
  // caching recognize two instances built from the same planes; a
  // bare Array would compare by reference and defeat both. The
  // primitive array below is what eval/codegen actually index.
  private lazy val planesArr: Array[Long] = planesFlat.toArray

  private val nPlanes = planesFlat.length / dim
  require(nPlanes % bandSize == 0, s"$nPlanes planes not divisible into bands of $bandSize")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def withNewChildInternal(newChild: Expression): BandKeysExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    val n = math.min(qv.numElements(), dim)
    val keys = new Array[Long](nPlanes / bandSize)
    var p = 0
    while (p < nPlanes) {
      var dot = 0L
      var d = 0
      while (d < n) {
        dot += qv.getLong(d) * planesArr(p * dim + d)
        d += 1
      }
      if (dot > 0) keys(p / bandSize) |= (1L << (p % bandSize))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planesFlat", planesArr, "long[]")
    nullSafeCodeGen(ctx, ev, qv => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($qv.numElements(), $dim);
         |long[] $keys = new long[${nPlanes / bandSize}];
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  long $dot = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += $qv.getLong($d) * $planesRef[$p * $dim + $d];
         |  }
         |  if ($dot > 0) $keys[$p / $bandSize] |= (1L << ($p % $bandSize));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }
}

object VectorOps {
  def dot_long(a: Column, b: Column): Column =
    ColumnBridge.column(DotLongExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Banded hyperplane LSH keys (see [[BandKeysExpr]]). */
  def band_keys(qv: Column, planes: Seq[Seq[Int]], bandSize: Int): Column = {
    val dim = planes.head.length
    require(planes.forall(_.length == dim), "ragged plane matrix")
    ColumnBridge.column(BandKeysExpr(ColumnBridge.expression(qv),
      planes.flatten.map(_.toLong).toIndexedSeq, dim, bandSize))
  }
}
