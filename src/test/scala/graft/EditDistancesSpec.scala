package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EditDistances

class EditDistancesSpec extends AnyFunSuite with SparkTestBase {

  private def dl(a: String, b: String): Int = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(EditDistances.damerauLevenshtein(col("a"), col("b")).as("d"))
      .head().getInt(0)
  }

  test("unrestricted DL matches the canonical discriminating cases") {
    // the case that separates true DL from optimal-string-alignment:
    // CA -> AC -> ABC is 2 edits (OSA forbids editing a transposed
    // block and reports 3). DuckDB's damerau_levenshtein returns 2.
    assert(dl("CA", "ABC") == 2)
    assert(dl("ABC", "CA") == 2)
    // adjacent transposition is ONE edit (levenshtein would say 2)
    assert(dl("ab", "ba") == 1)
    assert(dl("abcdef", "abcfed") == 2)
    // degenerate cases
    assert(dl("", "") == 0)
    assert(dl("", "abc") == 3)
    assert(dl("abc", "") == 3)
    assert(dl("same", "same") == 0)
    // plain substitution / insertion still behave like levenshtein
    assert(dl("kitten", "sitting") == 3)
    // byte-level semantics, exactly DuckDB's: the two-byte é costs 2
    // against the one-byte e, and swapping 'éa' -> 'aé' moves bytes
    assert(dl("é", "e") == 2)
    assert(dl("éa", "aé") == 2)
  }

  test("DL is symmetric and bounded by levenshtein on a corpus sample") {
    import spark.implicits._
    val pairs = Tables.documents(spark, sf)
      .select(substring(col("text"), 1, 20).as("a"),
        substring(col("text"), 21, 20).as("b"))
      .limit(50)
    val rows = pairs.select(
        EditDistances.damerauLevenshtein(col("a"), col("b")).as("ab"),
        EditDistances.damerauLevenshtein(col("b"), col("a")).as("ba"),
        levenshtein(col("a"), col("b")).as("lev"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "DL must be symmetric")
      assert(r.getInt(0) <= r.getInt(2), "DL never exceeds levenshtein")
    }
  }

  test("q_dedup_damerau emits bounded sorted-neighborhood pairs only") {
    val rows = Queries.qDedupDamerau(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    // pair volume is bounded by the rank-window construction
    assert(rows.length <= 2 * n)
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Long]("dl") <= 22L)
    }
    // deterministic
    val again = Queries.qDedupDamerau(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q_link_prediction: RA scores positive, pairs canonical, top-25") {
    val rows = Queries.qLinkPrediction(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    // descending score with (sa, sb) tiebreak
    val scores = rows.map(_.getAs[Long]("ra_ppm"))
    assert(scores.sameElements(scores.sortBy(-_)))
    rows.foreach { r =>
      assert(r.getAs[Long]("sa") < r.getAs[Long]("sb"))
      assert(r.getAs[Long]("ra_ppm") > 0)
      // each shared low-degree part contributes at most 10^6/2 ppm
      assert(r.getAs[Long]("ra_ppm") <= r.getAs[Long]("n_shared") * 500000L)
    }
  }
}
