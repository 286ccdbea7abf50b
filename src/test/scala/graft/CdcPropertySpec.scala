package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the gear-CDC expression on arbitrary strings —
  * the QueriesSpec referee covers real catalog documents; this covers
  * the edges (empty, single char, long runs of one char, non-ASCII
  * BMP chars) with an independent scala reimplementation of the
  * recurrence, plus the two properties the operator exists for:
  * lossless segmentation and shift-invariance of interior cuts.
  * (Deterministic seeds; Gen driven directly — same offline-cache
  * constraint as ShinglesPropertySpec.) */
class CdcPropertySpec extends AnyFunSuite with SparkTestBase {

  private val Mod = 4294967296L

  private def refChunks(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var h = 0L; var start = 0
    s.indices.foreach { i =>
      h = (h * 2 + (s.charAt(i).toLong * 2654435761L) % Mod) % Mod
      if ((h & 31L) == 0L) { out += s.substring(start, i + 1); start = i + 1 }
    }
    if (start < s.length) out += s.substring(start)
    out.toSeq
  }

  private val text: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.stringOfN(1, Gen.alphaChar),
    Gen.chooseNum(1, 200).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)),
    Gen.chooseNum(1, 200).flatMap(n => Gen.stringOfN(n, Gen.const('x'))),
    Gen.chooseNum(1, 120).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(' ', 'a', 'é', 'λ', '9'))))

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => text.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("expression == independent recurrence; chunks concatenate losslessly") {
    import spark.implicits._
    val texts = samples(500)
    val got = texts.toDF("t")
      .select(col("t"), graft.functions.Cdc.gearChunks(col("t")).as("ch"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    texts.foreach { t =>
      assert(got(t) == refChunks(t), s"diverged on '${t.take(40)}'")
      assert(got(t).mkString("") == t, s"lossy on '${t.take(40)}'")
    }
  }

  test("interior cuts are shift-invariant (the dedup property)") {
    import spark.implicits._
    // append an arbitrary prefix; once the 32-char window has flushed
    // the prefix's influence, every later cut position must coincide
    val bases = samples(300).filter(_.length > 80)
    val prefixed = bases.map(b => ("zqv7" + b, b))
    val all = (bases ++ prefixed.map(_._1)).distinct
    val chunks = all.toDF("t")
      .select(col("t"), graft.functions.Cdc.gearChunks(col("t")).as("ch"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    prefixed.foreach { case (p, b) =>
      // cut positions measured from the END of the string
      def tailCuts(s: String): Set[Int] = {
        var pos = 0
        chunks(s).init.map { c => pos += c.length; s.length - pos }.toSet
      }
      val stable = tailCuts(b).filter(_ <= b.length - 36)
      val stableP = tailCuts(p)
      stable.foreach { c =>
        assert(stableP.contains(c),
          s"cut at end-offset $c lost after prefixing (len=${b.length})")
      }
    }
  }
}
