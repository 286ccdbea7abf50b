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

/** All LSH band keys of a base-hash array in ONE fused expression —
  * the k minhash minima AND the per-band md5 keys in a single
  * evaluation, so no plan shape can ever re-evaluate the signature
  * chain per band (the r19 wide-extract trap: an expensive expression
  * referenced by k outputs of one codegen stage may be inlined k
  * times; measured ~44× per row once an exchange reshaped the dedup
  * fill stage). Built for the banding-only consumers
  * (q_incremental_dedup, the streaming LSH maintainers) that
  * previously computed the full signature and extracted 64 columns
  * just to md5 them in groups of 4.
  *
  * Value parity with the fused-extract pipeline is EXACT, including
  * the degenerate rows: band_key(b) = lowercase-hex md5 of the UTF-8
  * concatenation of the band's `rows` minima as decimal strings —
  * identical to md5(concat(cast(m_i AS STRING)...)) — and a NULL or
  * empty base-hash array (doc with < n words, or null text) yields an
  * array of `bands` NULL keys, exactly as element_at(NULL, i) nulled
  * every m_i and md5(concat(NULL..)) nulled every key. The expression
  * is therefore never null itself and always emits `bands` elements,
  * so a posexplode produces the same 16 rows per doc the old
  * explode(array(struct...)) did. */
case class MinhashBandKeysExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    a: IndexedSeq[Long], b: IndexedSeq[Long], p: Long, rows: Int)
    extends UnaryExpression {

  private lazy val aArr: Array[Long] = a.toArray
  private lazy val bArr: Array[Long] = b.toArray
  private val k = a.length
  private val nBands = k / rows
  require(b.length == k, "coefficient vectors must have equal length")
  require(rows >= 1 && k % rows == 0, "rows must divide k")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false // null input ⇒ array of null keys

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): MinhashBandKeysExpr =
    copy(child = newChild)

  @transient private lazy val digests =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Shared by interpreted eval and codegen; handles NULL input. */
  def bands(input: ArrayData): ArrayData = {
    if (input == null || input.numElements() == 0)
      return new GenericArrayData(new Array[Any](nBands)) // nBands nulls
    val n = input.numElements()
    val minima = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = input.getLong(i)
      var j = 0
      while (j < k) {
        val v = (aArr(j) * h + bArr(j)) % p
        if (v < minima(j)) minima(j) = v
        j += 1
      }
      i += 1
    }
    val md = digests.get()
    val sb = new java.lang.StringBuilder(rows * 20)
    val out = new Array[Any](nBands)
    var bi = 0
    while (bi < nBands) {
      sb.setLength(0)
      var j = bi * rows
      while (j < (bi + 1) * rows) { sb.append(minima(j)); j += 1 }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var ci = 0
      while (ci < 16) {
        hex(2 * ci) = hexDigits((d(ci) >> 4) & 0xF)
        hex(2 * ci + 1) = hexDigits(d(ci) & 0xF)
        ci += 1
      }
      out(bi) = org.apache.spark.unsafe.types.UTF8String
        .fromString(new String(hex))
      bi += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    bands(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("minhashBandKeys", this,
      classOf[MinhashBandKeysExpr].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.bands(${childGen.isNull} ?
            null : (org.apache.spark.sql.catalyst.util.ArrayData) ${childGen.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
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

  /** Fused signature + LSH band keys (see [[MinhashBandKeysExpr]]). */
  def minhash_band_keys(hs: Column, a: Seq[Long], b: Seq[Long], p: Long,
      rows: Int): Column =
    ColumnBridge.column(MinhashBandKeysExpr(ColumnBridge.expression(hs),
      a.toIndexedSeq, b.toIndexedSeq, p, rows))
}
