package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Packed-bitmap intersection popcount (judge brief r17 → r18 #6).
  *
  * `popcount(a & b)` over two bitmaps packed as BinaryType byte
  * arrays, word-at-a-time (8 bytes per step via Platform.getLong).
  * Replaces the dense-triangle tier's per-word LONG COLUMNS — where a
  * ceil(n/64)-word bitmap costs 2·words row fields through every
  * broadcast-join materialization and a words-term codegen sum — with
  * ONE binary field per side and a tight fused loop: the probe row
  * shrinks from 2+2·words fields to 4, and the generated code is a
  * single loop instead of a words-long expression chain.
  *
  * Layout contract: both sides must be packed NATIVE-endian via
  * `Platform.putLong` — i.e. produced by [[PackLongsExpr]] (or another
  * `Platform.getLong`-compatible packer). AND+popcount is invariant to
  * byte order only when the two layouts MATCH; intersecting a
  * big-endian `CAST(long AS BINARY)`-concat bitmap with `pack_longs`
  * output would silently miscount on little-endian hosts (both sides
  * BinaryType, no type error). A length mismatch
  * intersects the common prefix (callers pack both sides to the same
  * width by construction); trailing non-multiple-of-8 bytes are
  * ignored (packed bitmaps are whole words by construction).
  */
case class PackedAndPopcountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_and_popcount needs (binary, binary), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedAndPopcountExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length) & ~7
    var i = 0
    var acc = 0L
    while (i < n) {
      acc += java.lang.Long.bitCount(
        org.apache.spark.unsafe.Platform.getLong(x,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i) &
          org.apache.spark.unsafe.Platform.getLong(y,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i))
      i += 8
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.length, $b.length) & ~7;
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i += 8) {
         |  $acc += java.lang.Long.bitCount(
         |    org.apache.spark.unsafe.Platform.getLong($a,
         |      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $i)
         |    & org.apache.spark.unsafe.Platform.getLong($b,
         |      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Pack N LONG words into one BinaryType bitmap (8·N bytes,
  * native-endian via Platform — the popcount side reads the same
  * layout, so endianness cancels). NULL words pack as 0L.
  *
  * CodegenFallback on purpose: packing runs once per adjacency ROW
  * (|V| rows), never in the per-edge probe loop — interpreted eval is
  * noise there, and it sidesteps ANSI's CAST(BIGINT AS BINARY) ban. */
case class PackLongsExpr(children: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("pack_longs needs all-BIGINT inputs")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PackLongsExpr =
    copy(children = newChildren)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val out = new Array[Byte](children.size * 8)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      org.apache.spark.unsafe.Platform.putLong(out,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i * 8L,
        if (v == null) 0L else v.asInstanceOf[Long])
      i += 1
    }
    out
  }
}

/** `popcount(adj[aid] & adj[bid])` against a BROADCAST adjacency
  * array — the dense-triangle probe with ZERO joins: the per-node
  * packed bitmaps (bounded to ≤32 MB by the dense-tier gate that
  * already broadcast them twice as join sides) ride along as one
  * torrent-broadcast array, and the probe is a single projection over
  * the directed edge list. Removes both broadcast hash joins and
  * their 2·bitmap row materialization per edge — the structure the
  * r17 profile showed dominating the tier. */
case class BitmapLookupPopcountExpr(left: Expression, right: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]])
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bitmap_lookup_popcount needs (bigint, bigint) node ids")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapLookupPopcountExpr =
    copy(left = newLeft, right = newRight)

  private def popcntAnd(x: Array[Byte], y: Array[Byte]): Long = {
    val n = math.min(x.length, y.length) & ~7
    var i = 0
    var acc = 0L
    while (i < n) {
      acc += java.lang.Long.bitCount(
        org.apache.spark.unsafe.Platform.getLong(x,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i) &
          org.apache.spark.unsafe.Platform.getLong(y,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i))
      i += 8
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val adj = bc.value
    java.lang.Long.valueOf(popcntAnd(
      adj(a.asInstanceOf[Long].toInt), adj(b.asInstanceOf[Long].toInt)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("adjBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    // dereference the broadcast ONCE per task, not per row
    val adjVar = ctx.addMutableState("byte[][]", "adjArr",
      v => s"$v = (byte[][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $x = $adjVar[(int) $a];
         |byte[] $y = $adjVar[(int) $b];
         |int $n = Math.min($x.length, $y.length) & ~7;
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i += 8) {
         |  $acc += java.lang.Long.bitCount(
         |    org.apache.spark.unsafe.Platform.getLong($x,
         |      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $i)
         |    & org.apache.spark.unsafe.Platform.getLong($y,
         |      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
}

object BitmapOps {
  /** Column facade: popcount of the AND of two packed binary bitmaps. */
  def packed_and_popcount(a: Column, b: Column): Column =
    ColumnBridge.column(PackedAndPopcountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column facade: pack LONG word columns into one binary bitmap. */
  def pack_longs(words: Seq[Column]): Column =
    ColumnBridge.column(PackLongsExpr(words.map(ColumnBridge.expression)))

  /** Column facade: joinless popcount(adj[aid] & adj[bid]) via a
    * broadcast adjacency array. */
  def lookup_and_popcount(aid: Column, bid: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]]): Column =
    ColumnBridge.column(BitmapLookupPopcountExpr(
      ColumnBridge.expression(aid), ColumnBridge.expression(bid), bc))
}
