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

/** Squared L2 distance between a quantized vector and a RATIONAL
  * centroid kept as (coordinate-sum array, member count):
  *
  *   dist² = Σ_i (x_i − s_i/n)²  =  Σ_i (n·x_i − s_i)²  /  n²
  *
  * The right-hand form is why this expression exists: the numerator is
  * an exact integer sum — associative, partition-order-independent —
  * and the single final division has exact integer operands, so the
  * resulting double is bit-identical across engines (the oracle
  * computes the same numerator in SQL). A float centroid would make
  * every k-means assignment depend on the reduction order of the
  * centroid mean. Overflow bound: |n·x − s| ≤ 2·n·maxq, so the sum
  * stays in range while n·maxq < ~2^31·√dim⁻¹ — with maxq ≈ 578
  * (quantize scale 1000, unit-norm-ish embeddings) that is clusters
  * up to ~10⁸ members, far beyond any per-cluster population a sane k
  * leaves at 100 TB. Fused loop + codegen like [[DotLongExpr]].
  */
case class KMeansDist2Expr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): KMeansDist2Expr =
    copy(first = f, second = s, third = t)

  override def nullSafeEval(qvAny: Any, sumsAny: Any, nAny: Any): Any = {
    val qv = qvAny.asInstanceOf[ArrayData]
    val sums = sumsAny.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Long]
    val d = math.min(qv.numElements(), sums.numElements())
    var num = 0L
    var i = 0
    while (i < d) {
      val diff = n * qv.getLong(i) - sums.getLong(i)
      num += diff * diff
      i += 1
    }
    java.lang.Double.valueOf(num.toDouble / (n * n).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qv, sums, n) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val num = ctx.freshName("num")
      val diff = ctx.freshName("diff")
      s"""
         |int $d = Math.min($qv.numElements(), $sums.numElements());
         |long $num = 0L;
         |for (int $i = 0; $i < $d; $i++) {
         |  long $diff = $n * $qv.getLong($i) - $sums.getLong($i);
         |  $num += $diff * $diff;
         |}
         |${ev.value} = (double) $num / (double) ($n * $n);
       """.stripMargin
    })
}

object VectorOps {
  def dot_long(a: Column, b: Column): Column =
    ColumnBridge.column(DotLongExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact rational-centroid squared distance (see [[KMeansDist2Expr]]). */
  def kmeans_dist2(qv: Column, sums: Column, n: Column): Column =
    ColumnBridge.column(KMeansDist2Expr(ColumnBridge.expression(qv),
      ColumnBridge.expression(sums), ColumnBridge.expression(n)))

  /** Banded hyperplane LSH keys (see [[BandKeysExpr]]). */
  def band_keys(qv: Column, planes: Seq[Seq[Int]], bandSize: Int): Column = {
    val dim = planes.head.length
    require(planes.forall(_.length == dim), "ragged plane matrix")
    ColumnBridge.column(BandKeysExpr(ColumnBridge.expression(qv),
      planes.flatten.map(_.toLong).toIndexedSeq, dim, bandSize))
  }
}
