package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KMeans, Similarity}

/** Lloyd's k-means with exact rational centroids + SemDeDup blocking. */
class KMeansSpec extends AnyFunSuite with SparkTestBase {

  private def quantizedVecs = Similarity.quantized(Tables.embeddings(spark, sf))
    .select(col("vec_id"), col("qv"))

  test("every vector gets exactly one cluster in [0, k)") {
    val a = KMeans.assign(quantizedVecs, 8, 2).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(a.count() == n)
    assert(a.select(countDistinct(col("vec_id"))).head().getLong(0) == n)
    val cl = a.select(col("cluster")).distinct().collect().map(_.getLong(0))
    assert(cl.forall(c => c >= 0 && c < 8))
  }

  test("assignment is the argmin: no other centroid is strictly closer") {
    // recompute all distances against the FINAL centroids by re-running
    // the update from the final assignment's predecessor — instead,
    // verify the invariant directly: for the returned assignment,
    // dist2 to the chosen cluster <= dist2 of that vector to any
    // cluster under the same centroid table. Reconstruct the centroid
    // table from the assignment's own (cluster, dist2=0 members).
    // Simpler exact check: run 1 iteration (pure seed centroids, known
    // closed form) and compare to a driver-side brute force.
    val vecs = quantizedVecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val seeds = vecs.keys.toSeq.sorted.take(8)
    val got = KMeans.assign(quantizedVecs, 8, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    got.foreach { case (id, cl, d2) =>
      val x = vecs(id)
      val dists = seeds.zipWithIndex.map { case (sid, ci) =>
        val s = vecs(sid)
        val num = x.indices.map { i =>
          val diff = x(i) - s(i); diff.toDouble * diff.toDouble
        }.sum
        (num, ci.toLong)
      }
      val (bestD, bestC) = dists.minBy(t => (t._1, t._2))
      assert(cl == bestC, s"vec $id: got cluster $cl want $bestC")
      assert(d2 == bestD, s"vec $id: got dist2 $d2 want $bestD")
    }
  }

  test("iterating strictly reduces (or keeps) total within-cluster dist2") {
    val d1 = KMeans.assign(quantizedVecs, 8, 1)
      .agg(sum(col("dist2"))).head().getDouble(0)
    val d2 = KMeans.assign(quantizedVecs, 8, 2)
      .agg(sum(col("dist2"))).head().getDouble(0)
    assert(d2 <= d1, s"iteration increased cost: $d1 -> $d2")
  }

  test("semantic dup pairs are within-cluster, ordered, above threshold") {
    val pairs = KMeans.semanticDupPairs(Tables.embeddings(spark, sf), 8, 2, 0.4)
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(1) < r.getLong(2))
      assert(r.getDouble(3) >= 0.4)
    }
    // pairs must agree with the assignment's cluster for both sides
    val cl = KMeans.assign(quantizedVecs, 8, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { r =>
      assert(cl(r.getLong(1)) == r.getLong(0) && cl(r.getLong(2)) == r.getLong(0))
    }
  }
}
