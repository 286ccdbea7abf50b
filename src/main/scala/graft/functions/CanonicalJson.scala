package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical JSON serialization matching Python's
  * `json.dumps(obj, sort_keys=True)` byte-for-byte, so that
  * `md5(canonical_json(doc))[:16]` reproduces the reference's document
  * hash (reference: firebase/app/utils.py:29-33 — key-sorted JSON →
  * md5 hexdigest truncated to 16 hex chars).
  *
  * Python formatting rules reproduced here:
  *  - separators `", "` / `": "`, keys sorted by unicode codepoint;
  *  - `ensure_ascii=True`: every char > 0x7E escaped as `\\uXXXX`
  *    (astral chars as surrogate pairs), controls as `\\n \\r \\t \\b
  *    \\f` or `\\u00XX`;
  *  - floats rendered with Python `repr` (shortest round-trip digits;
  *    fixed notation for decimal exponent in [-4, 15], else
  *    `d.dddde±XX` with ≥2 exponent digits);
  *  - ints without decimal point; bools `true`/`false`; null `null`.
  *
  * Implemented as a Catalyst Expression (interpreted eval via
  * CodegenFallback — it sits next to an md5/substr which stay in
  * codegen; the expression itself is a pure per-row function with no
  * allocation beyond the output buffer, so it stays cheap and fully
  * distributed).
  */
case class CanonicalJsonExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression): CanonicalJsonExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val sb = new java.lang.StringBuilder(64)
    render(input, child.dataType, sb)
    UTF8String.fromString(sb.toString)
  }

  private def render(v: Any, dt: DataType, sb: java.lang.StringBuilder): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case StringType => renderString(v.asInstanceOf[UTF8String].toString, sb)
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case ByteType | ShortType | IntegerType | LongType => sb.append(v.toString)
      case FloatType => sb.append(PyFloat.repr(v.asInstanceOf[Float].toDouble))
      case DoubleType => sb.append(PyFloat.repr(v.asInstanceOf[Double]))
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        // python dict keys sort by codepoint
        val order = st.fields.zipWithIndex.sortBy(_._1.name)(CodepointOrdering)
        sb.append('{')
        var first = true
        order.foreach { case (f, i) =>
          if (!first) sb.append(", ")
          first = false
          renderString(f.name, sb)
          sb.append(": ")
          render(if (row.isNullAt(i)) null else row.get(i, f.dataType), f.dataType, sb)
        }
        sb.append('}')
      case at: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(", ")
          render(if (arr.isNullAt(i)) null else arr.get(i, at.elementType), at.elementType, sb)
          i += 1
        }
        sb.append(']')
      case mt: MapType =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray(); val vals = m.valueArray()
        val n = m.numElements()
        // python sort_keys sorts non-string dict keys by NATIVE value
        // (then str()-ifies); only string keys sort by codepoint
        val idx: Seq[Int] = mt.keyType match {
          case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
            (0 until n).sortBy(i => keyNumeric(keys.get(i, mt.keyType)))
          case BooleanType =>
            (0 until n).sortBy(i => keys.getBoolean(i)) // false < true
          case _ =>
            (0 until n).sortBy(i => keyString(keys.get(i, mt.keyType), mt.keyType))(CodepointOrdering)
        }
        sb.append('{')
        var first = true
        idx.foreach { i =>
          if (!first) sb.append(", ")
          first = false
          renderString(keyString(keys.get(i, mt.keyType), mt.keyType), sb)
          sb.append(": ")
          render(if (vals.isNullAt(i)) null else vals.get(i, mt.valueType), mt.valueType, sb)
        }
        sb.append('}')
      case other =>
        throw new UnsupportedOperationException(
          s"canonical_json: unsupported type $other (reference documents are JSON-shaped)")
    }
  }

  // BigDecimal so long keys beyond 2^53 still sort exactly
  private def keyNumeric(k: Any): BigDecimal = k match {
    case b: Byte => BigDecimal(b.toInt)
    case s: Short => BigDecimal(s.toInt)
    case i: Int => BigDecimal(i)
    case l: Long => BigDecimal(l)
    case f: Float => BigDecimal.decimal(f.toDouble)
    case d: Double => BigDecimal.decimal(d)
  }

  private def keyString(k: Any, dt: DataType): String = dt match {
    case StringType => k.asInstanceOf[UTF8String].toString
    case FloatType => PyFloat.repr(k.asInstanceOf[Float].toDouble)
    case DoubleType => PyFloat.repr(k.asInstanceOf[Double])
    case BooleanType => if (k.asInstanceOf[Boolean]) "true" else "false"
    case _ => k.toString
  }

  private def renderString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}

/** Sorts java Strings by unicode codepoint (Python `sorted` semantics);
  * differs from String.compareTo only when astral chars meet
  * [U+E000, U+FFFF] — cheap to get exactly right. */
object CodepointOrdering extends Ordering[String] {
  override def compare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }
}

/** Python `repr(float)` on the JVM: correctly-rounded SHORTEST digits,
  * reformatted to Python's fixed / scientific notation rules.
  *
  * NB: java.lang.Double.toString on JDK < 19 is round-trip-safe but
  * NOT shortest (JDK-4511638) — e.g. it prints 17 digits where CPython
  * prints 16 — so the digits are derived instead via BigDecimal
  * half-even rounding at increasing precision until the value
  * round-trips (the same result CPython's shortest-repr produces). */
object PyFloat {
  def repr(d: Double): String = {
    // Non-finite values follow Python json.dumps ("NaN"/"Infinity"/
    // "-Infinity"), NOT repr ("nan"/"inf"/"-inf"): the consumer is the
    // canonical-JSON hash, whose reference serializer is json.dumps
    // (utils.py:29-33). tools/ReprCheck special-cases these.
    if (d.isNaN) return "NaN"
    if (d == Double.PositiveInfinity) return "Infinity"
    if (d == Double.NegativeInfinity) return "-Infinity"
    val neg = (java.lang.Double.doubleToRawLongBits(d) < 0)
    val a = math.abs(d)
    if (a == 0.0) return if (neg) "-0.0" else "0.0"

    // shortest correctly-rounded decimal: round the exact binary value
    // to k significant digits (half-even), keep the first k that parses
    // back to the same double
    val exact = new java.math.BigDecimal(a)
    var digits: String = null
    var e: Int = 0
    var k = 1
    while (digits == null && k <= 17) {
      val r = exact.round(new java.math.MathContext(k, java.math.RoundingMode.HALF_EVEN))
      if (r.doubleValue() == a) {
        val unscaled = r.unscaledValue().toString
        e = unscaled.length - 1 - r.scale()
        // strip trailing zeros (rounding can leave them)
        var end = unscaled.length
        while (end > 1 && unscaled.charAt(end - 1) == '0') end -= 1
        digits = unscaled.substring(0, end)
      }
      k += 1
    }
    require(digits != null, s"no 17-digit repr round-trips for $a")

    val sb = new java.lang.StringBuilder(32)
    if (neg) sb.append('-')
    if (e >= -4 && e < 16) {
      if (e >= 0) {
        if (digits.length > e + 1) {
          sb.append(digits, 0, e + 1).append('.').append(digits, e + 1, digits.length)
        } else {
          sb.append(digits)
          var k = digits.length
          while (k <= e) { sb.append('0'); k += 1 }
          sb.append(".0")
        }
      } else {
        sb.append("0.")
        var k = -1
        while (k > e) { sb.append('0'); k -= 1 }
        sb.append(digits)
      }
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
      sb.append('e')
      if (e >= 0) sb.append('+') else sb.append('-')
      val ae = math.abs(e)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    }
    sb.toString
  }
}
