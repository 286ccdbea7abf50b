package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShinglesSpec extends AnyFunSuite with SparkTestBase {

  /** The declarative formulation ShinglesExpr replaced — kept here as
    * the semantic reference the fused expression must match. */
  private def declarativeShingles(n: Int) = {
    val concatParts = (0 until n).map(k => s"element_at(w, i + $k)").mkString(", ' ', ")
    when(size(col("w")) >= n,
      array_distinct(expr(s"transform(sequence(1, size(w) - ${n - 1}), i -> concat($concatParts))")))
      .otherwise(array().cast("array<string>"))
  }

  test("fused shingles match the declarative formulation on corner cases") {
    import spark.implicits._
    val texts = Seq(
      "a b c d e",            // plain
      "a b c a b c a b c",    // duplicate shingles — dedup, first-occurrence order
      "a b",                  // shorter than n → empty
      "",                     // empty string → single empty token
      "a  b c",               // double space → empty middle token kept
      "a b c ",               // trailing space → trailing empty token kept
      " a b c",               // leading space
      "one two three four"
    ).toDF("text").withColumn("w", split(col("text"), " "))
    val both = texts.select(
      graft.functions.Shingles.shingles(col("text"), 3).as("fused"),
      declarativeShingles(3).as("decl"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"fused=${r.getSeq[String](0)} decl=${r.getSeq[String](1)}")
    }
  }

  test("wordWindows matches the declarative windowed form (dups kept, empties dropped)") {
    import spark.implicits._
    val texts = Seq(
      "a b c d e f g h i j",
      "x y x y x y",          // duplicate windows must be KEPT
      "a  b   c d",           // empty tokens dropped before windowing
      "one two",              // shorter than W → empty
      ""
    ).toDF("text")
    val W = 3
    val decl = expr(
      s"""CASE WHEN size(filter(split(text, ' '), t -> t != '')) >= $W
         |THEN transform(
         |  sequence(0, size(filter(split(text, ' '), t -> t != '')) - $W),
         |  i -> array_join(slice(filter(split(text, ' '), t -> t != ''), i+1, $W), ' '))
         |ELSE array() END""".stripMargin).cast("array<string>")
    texts.select(graft.functions.Shingles.wordWindows(col("text"), W).as("f"),
        decl.as("d"))
      .collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"fused=${r.getSeq[String](0)} decl=${r.getSeq[String](1)}")
      }
  }

  test("fused shingles match for n=2 and n=1") {
    import spark.implicits._
    val texts = Seq("x y z", "x", "p q p q").toDF("text")
      .withColumn("w", split(col("text"), " "))
    for (n <- Seq(1, 2)) {
      texts.select(graft.functions.Shingles.shingles(col("text"), n).as("f"),
          declarativeShingles(n).as("d"))
        .collect().foreach { r =>
          assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
        }
    }
  }
}
