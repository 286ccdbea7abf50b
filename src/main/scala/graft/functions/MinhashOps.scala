package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** All k minhashes of a base-hash array in ONE fused expression.
  *
  * Equivalent to k separate `array_min(transform(hs, h -> (a_i*h+b_i)
  * % p))` columns — but those are interpreted higher-order lambdas,
  * k·|hs| boxed evaluations per row; at k=64 the signature stage
  * dominates the whole dedup family. Here the (a, b) coefficient
  * vectors ride along as referenced constants and the signature is a
  * single codegen'd two-level loop (same pattern as
  * [[BandKeysExpr]]). Returns NULL for an empty input array,
  * matching `array_min` of an empty transform.
  */
case class MinhashSigExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    a: IndexedSeq[Long], b: IndexedSeq[Long], p: Long)
    extends UnaryExpression {

  private lazy val aArr: Array[Long] = a.toArray
  private lazy val bArr: Array[Long] = b.toArray
  private val k = a.length
  require(b.length == k, "coefficient vectors must have equal length")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input ⇒ null signature

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): MinhashSigExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (aArr(j) * h + bArr(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }
}

/** First-8-hex-chars-of-md5 base hash of every shingle in one fused
  * expression: element-wise `conv(substr(md5(t), 1, 8), 16, 10)` —
  * i.e. the first 4 digest bytes as an unsigned big-endian 32-bit
  * value — without the per-element interpreted lambda a
  * `transform(sh, t -> ...)` pays (the md5 inside a higher-order
  * function is evaluated through the Catalyst interpreter per
  * element; at ~300 shingles/doc that interpretation dominates the
  * whole minhash stage). The digest instance is thread-local: the
  * expression object is shared by concurrent tasks. */
case class Md5Head8Expr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): Md5Head8Expr =
    copy(child = newChild)

  @transient private lazy val digests =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Shared by interpreted eval and codegen (one virtual call per ROW,
    * not per element — the loop itself is plain JVM code). */
  def hashAll(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val md = digests.get()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(input.getUTF8String(i).getBytes)
      out(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    hashAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5head8", this, classOf[Md5Head8Expr].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.hashAll($in);")
  }
}

object MinhashOps {
  /** Fused k-hash minhash signature (see [[MinhashSigExpr]]). */
  def minhash_signature(hs: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinhashSigExpr(ColumnBridge.expression(hs),
      a.toIndexedSeq, b.toIndexedSeq, p))

  /** Fused per-element md5 base hash (see [[Md5Head8Expr]]). */
  def md5_head8(sh: Column): Column =
    ColumnBridge.column(Md5Head8Expr(ColumnBridge.expression(sh)))
}
