package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite with SparkTestBase {

  /** Reference triangle counter: brute-force over a driver-side edge
    * set — O(n·m), fine for test graphs. */
  private def bruteCounts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((u, v) <- edges; w <- adj(u) if w > v && adj(v).contains(w)) {
      counts(u) += 1; counts(v) += 1; counts(w) += 1
    }
    counts.toMap
  }

  private def edgeDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("u", "v")
  }

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // a graph with hubs, a clique, a triangle-free path, and an isolated
  // edge — exercises zero-count filtering and skewed degrees
  private val testEdges: Seq[(Long, Long)] = {
    val clique = for (i <- 0L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val hub = (10L to 30L).map(x => (7L, x)) ++ (11L to 25L).map(x => (8L, x)) ++
      Seq((7L, 8L)) // hub-hub edge closes triangles via shared leaves 11..25
    val path = Seq((40L, 41L), (41L, 42L), (42L, 43L))
    val lone = Seq((50L, 51L))
    clique ++ hub ++ path ++ lone
  }

  test("dense bitmap path matches brute force") {
    val e = edgeDf(testEdges)
    val got = toMap(Graph.triangleCounts(e, denseMaxNodes = 1000))
    val want = bruteCounts(testEdges).filter(_._2 > 0)
    assert(got == want)
  }

  test("oriented wedge path matches brute force and the dense path") {
    val e = edgeDf(testEdges)
    val oriented = toMap(Graph.orientedTriangles(e))
    val want = bruteCounts(testEdges).filter(_._2 > 0)
    assert(oriented == want)
    // forcing the gate below |V| switches to the oriented plan and
    // must not change the answer
    val viaGate = toMap(Graph.triangleCounts(e, denseMaxNodes = 3))
    assert(viaGate == want)
  }

  test("bitmap ids span word boundaries (graph wider than 64 nodes)") {
    // ring of 130 nodes with chords: triangles (i, i+1, i+2)
    val n = 130L
    val ring = (0L until n).map(i => (i, (i + 1) % n))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val chords = (0L until n).map(i => (i, (i + 2) % n))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val edges = (ring ++ chords).distinct
    val got = toMap(Graph.triangleCounts(edgeDf(edges), denseMaxNodes = 1000))
    val want = bruteCounts(edges).filter(_._2 > 0)
    assert(got == want)
    // every ring node sits in exactly 3 triangles (i-2,i-1,i), (i-1,i,i+1), (i,i+1,i+2)
    assert(got.values.toSet == Set(3L))
  }

  test("k-core peel cascades on a path graph and converges") {
    // a 10-node path has NO 2-core: endpoints peel one pair per round
    // (the adversarial O(n)-round cascade)
    val path = (0L until 9L).map(i => (i, i + 1))
    assert(Graph.kcorePeel(edgeDf(path), 2).count() == 0)
    // bounded rounds stop mid-cascade: 2 rounds strip 2 nodes per end
    val after2 = Graph.kcorePeel(edgeDf(path), 2, maxRounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after2.keySet == (2L to 7L).toSet, s"got $after2")
    assert(after2(2L) == 1 && after2(7L) == 1 && after2(4L) == 2)
    // a 4-clique with a pendant: the pendant (and only it) peels at k=3
    val clique = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val core = Graph.kcorePeel(edgeDf(clique :+ (3L, 9L)), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("k-core production cap reports non-convergence; fixpoint reports converged") {
    // 30-node path, k=2: full peel needs ~15 rounds, so a 2-round cap
    // must stop early AND say so (the kcorePeel default then logs the
    // warning on this exact status)
    val path = (0L until 29L).map(i => (i, i + 1))
    val (capped, convergedAtCap, roundsAtCap) =
      Graph.kcorePeelWithStatus(edgeDf(path), 2, maxRounds = 2)
    assert(!convergedAtCap && roundsAtCap == 2)
    // capped result is the 2-round peel state: 2 nodes stripped per end
    assert(capped.collect().map(_.getLong(0)).toSet == (2L to 27L).toSet)
    // the default cap (50) covers this cascade: converged, empty core
    val (fix, convergedDefault, _) =
      Graph.kcorePeelWithStatus(edgeDf(path), 2, Graph.DefaultMaxRounds)
    assert(convergedDefault && fix.count() == 0)
  }

  test("k-core intermediate rounds release their checkpoint blocks") {
    // Dataset.unpersist is a silent no-op on locally-checkpointed
    // rounds; Rounds.persist's release thunk frees them via the
    // underlying RDD. A 16-round peel must therefore leave at most the
    // FINAL round registered with the block manager — not one RDD per
    // round (~rounds× edge-set copies of storage at cluster scale).
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val path = (0L until 29L).map(i => (i, i + 1))
    val (res, converged, rounds) =
      Graph.kcorePeelWithStatus(edgeDf(path), 2, maxRounds = 0)
    assert(converged && rounds >= 14, s"expected a long cascade, got $rounds")
    res.count()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"${leaked.size} persisted RDDs survive a $rounds-round peel " +
        "(expected at most the final round); round releases are not firing")
  }

  test("bfsHops labels minimal hops and releases intermediate rounds") {
    import spark.implicits._
    val sc = spark.sparkContext
    // undirected path 0-1-2-3-4-5 with shortcut 0-3 (directed both ways)
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (0L, 3L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val sources = Seq(0L).toDF("node")
    val before = sc.getPersistentRDDs.keySet
    val res = Graph.bfsHops(edges, sources, maxHops = 5)
    val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shortcut makes 3 a 1-hop node, so 4 is 2 and 5 is 3; 2 stays 2
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L,
      4L -> 2L, 5L -> 3L))
    // storage contract (r20 one-job rounds): only the FINAL round may
    // stay registered, and it must be the blocks the returned
    // relation reads; releaseOf must then free it deterministically
    val own = res.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    val leaked = sc.getPersistentRDDs.keySet -- before
    val foreign = leaked.filterNot(own)
    assert(foreign.isEmpty,
      s"persisted RDDs $foreign survive a 5-round BFS but are not " +
        "blocks the returned relation reads; round releases are not firing")
    assert(leaked.size <= 1,
      s"${leaked.size} persisted RDDs survive a 5-round BFS " +
        "(expected at most the final round)")
    operators.Rounds.releaseOf(res)()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "releaseOf(bfs result) must unpersist the final round")
  }

  test("dense-blocked tier: per-component bitmaps match brute force; gate order pinned") {
    // 3 disjoint copies of the test graph: total nodes exceed the
    // dense gate, every component fits it -> dense-blocked
    val copies = (0 to 2).flatMap(c =>
      testEdges.map { case (u, v) => (u + 100L * c, v + 100L * c) })
    val want = (0 to 2).flatMap(c =>
      bruteCounts(testEdges).filter(_._2 > 0)
        .map { case (n, t) => (n + 100L * c) -> t }).toMap
    val (blocked, p1) = Graph.triangleCountsWithPath(edgeDf(copies),
      denseMaxNodes = 60)
    assert(p1 == "dense-blocked", s"expected dense-blocked, got $p1")
    assert(toMap(blocked) == want)
    spark.catalog.clearCache()
    // a component larger than the gate (the 23-node hub component)
    // forces sparse ...
    assert(Graph.triangleCountsWithPath(edgeDf(copies),
      denseMaxNodes = 10)._2 == "sparse")
    spark.catalog.clearCache()
    // ... and so does an adjacency-table byte cap too small to hold
    // totalNodes x ceil(cmax/64) words
    assert(Graph.triangleCountsWithPath(edgeDf(copies),
      denseMaxNodes = 60, maxAdjBytes = 64L)._2 == "sparse")
    spark.catalog.clearCache()
  }

  test("adaptive gates dispatch by measured size, pinned by name") {
    import spark.implicits._
    // triangles: 4 distinct nodes vs a denseMaxNodes=3 gate
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 2L))
    assert(Graph.triangleCountsWithPath(edgeDf(square), denseMaxNodes = 3)._2
      == "sparse")
    assert(Graph.triangleCountsWithPath(edgeDf(square), denseMaxNodes = 4)._2
      == "dense")
    // CC: the 5M driver-edge gate, scaled down to 1 edge
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val (ufLabels, m1) = graft.operators.Dedup
      .connectedComponentsWithMethod(pairs, "a", "b", driverEdgeLimit = 2L)
    val (starLabels, m2) = graft.operators.Dedup
      .connectedComponentsWithMethod(pairs, "a", "b", driverEdgeLimit = 1L)
    assert(m1 == "union-find" && m2 == "star-contraction")
    // and both sides of the gate agree on the labeling
    assert(toMap(ufLabels) == toMap(starLabels))
    // non-long keys can never take the driver path
    val strPairs = Seq(("a", "b")).toDF("a", "b")
    assert(graft.operators.Dedup
      .connectedComponentsWithMethod(strPairs, "a", "b")._2 == "star-contraction")
  }

  test("triangle-free graph yields no rows") {
    val star = (1L to 10L).map(x => (0L, x))
    assert(Graph.triangleCounts(edgeDf(star), denseMaxNodes = 1000).count() == 0)
    assert(Graph.orientedTriangles(edgeDf(star)).count() == 0)
  }

  test("persistCounted: one relation materializes, counts, and releases") {
    import spark.implicits._
    import graft.operators.Rounds
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = (0L until 100L).toDF("x")
    // unfiltered count
    val (out, release, n) = Rounds.persistCounted(df, reliable = false)
    assert(n == 100L)
    // the checkpoint is materialized: reading it back needs no lineage
    assert(out.agg(sum(col("x"))).head.getLong(0) == 4950L)
    // predicate count matches a separate filter-count, from ONE job
    val (out2, release2, n2) = Rounds.persistCounted(
      df.select(col("x"), (col("x") % 2).as("r")), reliable = false,
      pred = Some(col("r") === 1L))
    assert(n2 == 50L && out2.count() == 100L)
    // empty relation: pred-count is 0, not a null NPE
    val (out3, release3, n3) = Rounds.persistCounted(
      df.filter(col("x") < 0L), reliable = false,
      pred = Some(col("x") === 1L))
    assert(n3 == 0L && out3.count() == 0L)
    release(); release2(); release3()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "persistCounted release thunks must unpersist the round's blocks")
  }
}
