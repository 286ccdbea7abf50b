package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PyFloat

/** Property tests for the Python-repr float formatter backing the
  * canonical hash: round-trip exactness and format invariants across
  * the full double range (deterministic seeds; no scalatest-plus
  * bridge in the offline cache, so Gen is driven directly). */
class PyFloatPropertySpec extends AnyFunSuite {

  private val anyDouble: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e3, 1e3),
    Gen.choose(-1e18, 1e18),
    Gen.choose(-1e-10, 1e-10),
    Gen.choose(Double.MinValue, Double.MaxValue),
    // bit-pattern doubles: covers subnormals and extreme exponents
    Gen.choose(Long.MinValue, Long.MaxValue)
      .map(java.lang.Double.longBitsToDouble))

  private def samples(n: Int): Seq[Double] =
    (0 until n).flatMap(i => anyDouble.apply(Gen.Parameters.default, Seed(i.toLong)))
      .filterNot(d => d.isNaN || d.isInfinity)

  test("repr round-trips exactly (shortest representation parses back)") {
    samples(5000).foreach { d =>
      val s = PyFloat.repr(d)
      assert(java.lang.Double.parseDouble(s) == d, s"repr($d) = $s")
    }
  }

  test("format matches Python rules: scientific shape and fixed-point dot") {
    samples(5000).filter(_ != 0.0).foreach { d =>
      val s = PyFloat.repr(d)
      if (s.contains("e")) {
        assert(s.matches("-?\\d(\\.\\d+)?e[+-]\\d{2,}"), s"repr($d) = $s")
      } else {
        assert(s.contains("."), s"repr($d) = $s")
        val e10 = math.floor(math.log10(math.abs(d))).toInt
        if (e10 > -4 && e10 < 15) assert(!s.contains("e"), s"repr($d) = $s")
      }
    }
  }

  test("negative zero and sign preservation") {
    assert(PyFloat.repr(-0.0) == "-0.0")
    samples(2000).filter(_ < 0).foreach { d =>
      assert(PyFloat.repr(d).startsWith("-"), s"repr($d)")
    }
  }
}
