package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation: exact
  * (content-hash groupBy), MinHash+LSH near-dup candidates, exact
  * n-gram Jaccard verification over LSH candidates, and SimHash with
  * pigeonhole band blocking.
  *
  * Scale design: no O(n²) pairwise stage anywhere — candidate
  * generation is always a shuffle on a banding key (LSH band hash or
  * simhash byte-chunk), after which verification joins touch only the
  * candidate set. All token/shingle/signature work is per-row
  * projection (codegen'd array lambdas), no explode-shuffle.
  */
object Dedup {

  /** df + `sh` column: distinct word-n-gram shingles of textCol. Rows
    * with fewer than n tokens get an empty shingle set. */
  def withShingles(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val concatParts = (0 until n).map(k => s"element_at(w, i + $k)").mkString(", ' ', ")
    df.withColumn("w", split(col(textCol), " "))
      .withColumn("sh",
        when(size(col("w")) >= n,
          array_distinct(expr(s"transform(sequence(1, size(w) - ${n - 1}), i -> concat($concatParts))")))
        .otherwise(array().cast("array<string>")))
      .drop("w")
  }

  /** Universal-hash family for minhash: h_i(x) = (a_i·x + b_i) mod p
    * over a 32-bit md5-derived base hash. ONE md5 per shingle instead
    * of k — the md5 is the cost center at scale; the k derived hashes
    * are three integer ops each. No overflow: a_i < 2^30, x < 2^32 ⇒
    * a_i·x + b_i < 2^63.
    *
    * Operating point (see DEDUP_TUNING.md): k=64 hashes banded as
    * b=16 bands × r=4 rows. S-curve threshold (1/b)^(1/r) =
    * (1/16)^(1/4) = 0.5 — matched to the 0.5-jaccard verify filter —
    * with collision prob at background jaccard 0.2 of
    * 1-(1-0.2⁴)^16 ≈ 2.5% (the old 4×2 banding collided at ~15%,
    * which goes quadratic on Zipfian-vocabulary corpora). sim_est
    * granularity is 1/64. */
  val MinhashP: Long = 2147483647L // 2^31 - 1
  val MinhashK: Int = 64
  val LshRows: Int = 4
  val LshBands: Int = MinhashK / LshRows // 16

  /** splitmix64 finalizer — a fixed, public mixing constant set; used
    * only to derive the 64 (a_i, b_i) coefficient literals below, so
    * both the Spark plan and the generated DuckDB oracle SQL embed
    * identical decimal constants. */
  private def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  /** a_i: odd, in [1, 2^30) — nonzero mod p, no 64-bit overflow. */
  val MinhashA: Seq[Long] = (0 until MinhashK).map(i => (mix64(i.toLong) & 0x3FFFFFFFL) | 1L)
  /** b_i: in [0, p). */
  val MinhashB: Seq[Long] = (0 until MinhashK).map(i => (mix64(1000L + i.toLong) & 0x7FFFFFFFL) % MinhashP)
  require(MinhashA.distinct.size == MinhashK && MinhashB.distinct.size == MinhashK,
    "minhash coefficient collision — change the mixer seeds")

  /** df + m0..m{k-1} bigint minhash columns over the `sh` column.
    * The k minima are computed by ONE fused codegen'd expression
    * ([[graft.functions.MinhashSigExpr]]) — k separate interpreted
    * `array_min(transform(...))` lambdas cost k·|sh| boxed evals per
    * row and dominate the dedup family at k=64 — then extracted as
    * columns in a SECOND projection (CollapseProject keeps the two
    * apart because merging would duplicate the non-cheap signature
    * expression k times). Per-element semantics are identical, so the
    * DuckDB oracle (generated from the same A/B/P constants) still
    * hash-matches. */
  def withMinhashSignature(df: DataFrame, k: Int = MinhashK): DataFrame = {
    val withBase = df.withColumn("_hs",
      graft.functions.MinhashOps.md5_head8(col("sh")))
    val withSig = withBase.withColumn("_sig",
      graft.functions.MinhashOps.minhash_signature(col("_hs"),
        MinhashA.take(k), MinhashB.take(k), MinhashP))
    val minCols = (0 until k).map(i => element_at(col("_sig"), i + 1).as(s"m$i"))
    withSig.select(col("*") +: minCols: _*).drop("_hs", "_sig")
  }

  /** df + (band_idx, band_key) exploded rows: bands of `rows` adjacent
    * minhashes, keyed by md5 of their concatenation. */
  def withLshBands(df: DataFrame, k: Int = MinhashK, rows: Int = LshRows): DataFrame = {
    val nBands = k / rows
    val bandKeys = (0 until nBands).map { b =>
      val ms = (b * rows until (b + 1) * rows).map(i => col(s"m$i").cast("string"))
      struct(lit(b).as("band_idx"), md5(concat(ms: _*)).as("band_key"))
    }
    df.withColumn("band", explode(array(bandKeys: _*)))
      .withColumn("band_idx", col("band.band_idx"))
      .withColumn("band_key", col("band.band_key"))
      .drop("band")
  }

  /** Distinct candidate pairs (id_a < id_b) sharing any LSH band.
    * The join key (band_idx, band_key) is the blocking key — this is
    * the only shuffle in the pipeline. */
  def lshCandidatePairs(banded: DataFrame, idCol: String): DataFrame = {
    val a = banded.select(col(idCol).as("id_a"), col("band_idx"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact Jaccard over two distinct-element array columns; integer
    * set sizes divided in double — bit-exact across engines. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Connected components over verified near-dup pairs → the cluster
    * step a dedup pipeline needs after pair generation: every doc maps
    * to its component's MIN id (the canonical keep-representative;
    * drop rows where node != label to dedup).
    *
    * Algorithm: min-label propagation with pointer jumping. Each round
    * (1) every node takes the min of its own and its neighbors'
    * labels, then (2) relabels through its label's label
    * (label := label(label), valid because a node's label is always
    * the id of a node in the same component and labels only
    * decrease). The jump makes chain-shaped components — which DO
    * occur in templated corpora — converge in O(log diameter) rounds
    * instead of O(diameter), so maxIters=20 covers any realistic
    * component (2^20-diameter chains) rather than silently splitting
    * long chains. If the fixpoint is still not reached at maxIters the
    * method THROWS instead of returning partial labels: callers hold
    * an oracle-exact contract and a split component is a wrong answer,
    * not a degraded one.
    *
    * Each round is two shuffles on node id (neighbor-min + jump) plus
    * a scalar convergence count. Lineage is truncated per round:
    * `localCheckpoint` by default (fast, executor-local blocks — fine
    * single-node); pass `reliableCheckpointDir` on a real cluster so
    * an executor loss mid-iteration replays from durable storage
    * instead of killing the job. Deterministic: min() is
    * associative/commutative, so the fixpoint is partition-order
    * independent. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20, reliableCheckpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    reliableCheckpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def persistRound(df: DataFrame): DataFrame =
      if (reliableCheckpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct().cache()
    var labels = persistRound(edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")))
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      val neighborMin = edges
        .join(labels.select(col("node").as("v"), col("label").as("vlabel")), "v")
        .groupBy(col("u").as("node")).agg(min(col("vlabel")).as("nmin"))
      // the previous label rides along as `old` so the convergence
      // check below is a scan of the checkpointed frame — not the
      // extra join-back-to-labels (one more shuffle per round) it
      // would otherwise take
      val relabeled = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      // pointer jump: label := min(label, label(label)); label(label)
      // exists whenever label != node and is always in-component.
      // Skipped in round 1 — star-shaped components (the near-dup
      // norm) finish on plain neighbor-min alone, so the jump's extra
      // shuffle only starts paying once a chain survives a round.
      val next = persistRound(
        if (iters == 0) relabeled
        else relabeled.join(
            relabeled.select(col("node").as("label"), col("label").as("ll")),
            Seq("label"), "left")
          .select(col("node"), col("old"),
            least(col("label"), coalesce(col("ll"), col("label"))).as("label")))
      relabeled.unpersist()
      changed = next.filter(col("label") =!= col("old")).count()
      labels = next.drop("old")
      iters += 1
    }
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          s"($changed labels still moving): component diameter exceeds 2^$maxIters " +
          "or the pair graph is pathological; raise maxIters")
    labels
  }

  /** Survivor selection — the last stage of a dedup pipeline: given
    * cluster-labeled rows (`idCol`, `repCol` from
    * [[connectedComponents]], plus a `qualityCol`), keep exactly one
    * row per cluster: highest quality, ties broken by smallest id so
    * the choice is deterministic on any engine and partition order.
    * Adds `cluster_size` so callers can report how many near-dups each
    * survivor displaced.
    *
    * Scale shape: both windows partition on the cluster key, so the
    * cost is one shuffle on `repCol` with per-partition state bounded
    * by the largest cluster. Near-dup clusters are small by
    * construction (they only contain verified near-identical docs), so
    * there is no skew hazard even at 100 TB; a pathological mega-
    * cluster would first have failed the convergence guard above. */
  def survivors(labeled: DataFrame, idCol: String, repCol: String,
      qualityCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSize = Window.partitionBy(col(repCol))
    val wRank = Window.partitionBy(col(repCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    labeled
      .withColumn("cluster_size", count(lit(1)).over(wSize))
      .withColumn("_rn", row_number().over(wRank))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
