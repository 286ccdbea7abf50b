package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the fused ShinglesExpr must agree with the
  * declarative split/transform/array_distinct formulation it replaced
  * on arbitrary text — including adversarial whitespace runs, empty
  * tokens, and pathological duplication (deterministic seeds; Gen is
  * driven directly, no scalatest-plus bridge in the offline cache). */
class ShinglesPropertySpec extends AnyFunSuite with SparkTestBase {

  private val word: Gen[String] = Gen.oneOf(
    Gen.oneOf("a", "b", "ab", "xyz", "Zq", "0", "-"),
    Gen.stringOfN(3, Gen.alphaNumChar),
    Gen.const("")) // empty tokens = consecutive/leading/trailing spaces
  private val text: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => text.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("fused shingles ≡ declarative formulation on random text (n=2,3)") {
    import spark.implicits._
    val df = samples(400).toDF("text").withColumn("w", split(col("text"), " "))
    for (n <- Seq(2, 3)) {
      val concatParts = (0 until n).map(k => s"element_at(w, i + $k)").mkString(", ' ', ")
      val decl = when(size(col("w")) >= n,
        array_distinct(expr(
          s"transform(sequence(1, size(w) - ${n - 1}), i -> concat($concatParts))")))
        .otherwise(array().cast("array<string>"))
      df.select(col("text"),
          graft.functions.Shingles.shingles(col("text"), n).as("f"), decl.as("d"))
        .collect().foreach { r =>
          assert(r.getSeq[String](1) == r.getSeq[String](2),
            s"n=$n text='${r.getString(0)}'")
        }
    }
  }

  test("wordWindows ≡ declarative windows on random text") {
    import spark.implicits._
    val df = samples(400).toDF("text")
    val W = 3
    val decl = expr(
      s"""CASE WHEN size(filter(split(text, ' '), t -> t != '')) >= $W
         |THEN transform(
         |  sequence(0, size(filter(split(text, ' '), t -> t != '')) - $W),
         |  i -> array_join(slice(filter(split(text, ' '), t -> t != ''), i+1, $W), ' '))
         |ELSE array() END""".stripMargin).cast("array<string>")
    df.select(col("text"),
        graft.functions.Shingles.wordWindows(col("text"), W).as("f"), decl.as("d"))
      .collect().foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2), s"text='${r.getString(0)}'")
      }
  }
}
