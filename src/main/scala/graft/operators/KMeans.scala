package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over quantized embeddings — the
  * clustering stage of semantic curation (SemDeDup-style semantic
  * dedup, embedding-space domain balancing, IVF index training).
  *
  * Determinism design: centroids are never floats. A centroid is the
  * exact RATIONAL (Σ coordinate-sums : array<bigint>, member count n),
  * so the update step is an integer aggregation — associative,
  * partition-order-independent — and the assignment distance
  * Σ(n·x−s)²/n² is one exact-operand double division per (vector,
  * centroid) pair ([[graft.functions.KMeansDist2Expr]]). Every
  * iteration is therefore bit-reproducible across engines, partition
  * counts, and retries — which is what lets the DuckDB oracle
  * hash-match an iterative clustering.
  *
  * Scale shape, per iteration: assignment = broadcast of the k
  * centroids (k rows of dim bigints — KBs) against the vector table,
  * fused-loop distance, ONE hash-agg argmin keyed by vec_id (no
  * window, no sort); update = posexplode to (cluster, coord) partial
  * sums with map-side combine — the only shuffles are the two
  * aggregations, both on keys with bounded cardinality (n_vectors and
  * k·dim). Seeding: the k lowest vec_ids (deterministic); real
  * deployments would k-means++ sample, the iteration machinery is
  * identical. Empty clusters keep their previous centroid.
  */
object KMeans {

  /** (vec_id, qv) → final (vec_id, cluster, dist2) after `iters`
    * Lloyd iterations from the k lowest-id seeds. `dist2` is the
    * exact squared quantized-space distance to the final centroid. */
  def assign(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one assignment pass")
    val base = vectors.select(col("vec_id"), col("qv")).cache()

    // seeds: the k lowest vec_ids, cluster = seed rank. The window runs
    // on k pre-limited rows, not the corpus.
    var cents = base.orderBy(col("vec_id")).limit(k)
      .withColumn("cluster",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("long"))
      .select(col("cluster"), col("qv").as("sums"), lit(1L).as("n"))

    def assignment(c: DataFrame): DataFrame = {
      val scored = base.crossJoin(broadcast(c))
        .withColumn("dist2",
          graft.functions.VectorOps.kmeans_dist2(col("qv"), col("sums"), col("n")))
      // argmin as ONE hash aggregation: min over (dist2, cluster)
      // structs orders by dist2 then cluster id — the tie-break — with
      // map-side partial min, no per-vector sort window.
      scored
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist2"), col("cluster"))).as("best"))
        .select(col("vec_id"), col("best.cluster").as("cluster"),
          col("best.dist2").as("dist2"))
    }

    for (_ <- 1 until iters) {
      val assigned = assignment(cents).join(base, "vec_id")
      val updated = assigned
        .select(col("cluster"), posexplode(col("qv")).as(Seq("i", "x")))
        .groupBy(col("cluster"), col("i")).agg(sum(col("x")).as("sx"))
        .groupBy(col("cluster"))
        .agg(expr("transform(sort_array(collect_list(struct(i, sx))), s -> s.sx)").as("sums"))
        .join(assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n")), "cluster")
      // empty clusters (nothing assigned) keep their previous centroid
      cents = cents.select(col("cluster"),
          col("sums").as("prev_sums"), col("n").as("prev_n"))
        .join(updated, Seq("cluster"), "left")
        .select(col("cluster"),
          coalesce(col("sums"), col("prev_sums")).as("sums"),
          coalesce(col("n"), col("prev_n")).as("n"))
    }
    assignment(cents)
  }

  /** SemDeDup: within each final k-means cell, exact pairwise cosine
    * over the (small) cell population; pairs at or above `minCos` are
    * semantic duplicates — keep the lower id. The cell is the blocking
    * key: k is chosen so cells stay small (SemDeDup uses k ≈ n/1000),
    * making the within-cell self-join the candidate generator and the
    * only shuffle beyond clustering itself. */
  def semanticDupPairs(vectors: DataFrame, k: Int, iters: Int,
      minCos: Double): DataFrame = {
    val q = Similarity.quantized(vectors)
      .select(col("vec_id"), col("qv"), col("norm2"))
    val cells = assign(q, k, iters).select(col("vec_id"), col("cluster"))
    val sided = q.join(cells, "vec_id")
    val a = sided.select(col("cluster"), col("vec_id").as("id_a"),
      col("qv").as("qa"), col("norm2").as("na"))
    val b = sided.select(col("cluster"), col("vec_id").as("id_b"),
      col("qv").as("qb"), col("norm2").as("nb"))
    a.join(b, "cluster")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", Similarity.cosine(
        graft.functions.VectorOps.dot_long(col("qa"), col("qb")),
        col("na"), col("nb")))
      .filter(col("cos_sim") >= minCos)
      .select(col("cluster"), col("id_a"), col("id_b"), col("cos_sim"))
  }
}
