package graft.tools

import scala.io.Source

import graft.functions.PyFloat

/** Bulk parity check of PyFloat.repr against CPython.
  * Input: CSV lines `<longBitsHex>,<python repr>` (produced by a
  * driver-side python script). Prints mismatches and a summary. */
object ReprCheck {
  def main(args: Array[String]): Unit = {
    val src = Source.fromFile(args(0))
    var n = 0L; var bad = 0L
    try src.getLines().foreach { line =>
      val Array(bitsHex, expected) = line.split(",", 2)
      val d = java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(bitsHex, 16))
      // PyFloat renders non-finite values as json.dumps does
      // ("NaN"/"Infinity"), not as repr ("nan"/"inf") — normalize the
      // CPython-repr expectation so only finite digits are compared
      val got =
        if (d.isNaN || d.isInfinite)
          (if (d.isNaN) "nan" else if (d > 0) "inf" else "-inf")
        else PyFloat.repr(d)
      n += 1
      if (got != expected) {
        bad += 1
        if (bad <= 10) println(s"MISMATCH bits=$bitsHex python=$expected scala=$got")
      }
    } finally src.close()
    println(s"checked=$n mismatches=$bad")
  }
}
