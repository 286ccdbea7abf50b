package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus edge cases for q_bpe_merges (ADVICE r13 #1): a
  * vocabulary that collapses before the 5 configured rounds must emit
  * the completed rounds — matching the oracle's scalar-subquery
  * degradation — not throw on an empty `head`.
  */
class BpeEdgeSpec extends AnyFunSuite with SparkTestBase {

  private def corpusDir(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    texts.toDF("text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("vocab collapsing before round 5 emits completed rounds, no crash") {
    // every word is "ab": round 1 merges the only pair ("a b", freq 5),
    // then no word has two symbols left — rounds 2-5 are exhausted
    val dir = corpusDir(Seq("ab ab ab", "ab ab"))
    val out = SparkEntry.queries("q_bpe_merges")(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getString(1) == "a b")
    assert(out(0).getLong(2) == 5L)
  }

  test("corpus with no multi-char words emits zero merges, no crash") {
    val dir = corpusDir(Seq("a b c", "x y"))
    val out = SparkEntry.queries("q_bpe_merges")(spark, dir).collect()
    assert(out.isEmpty)
  }
}
