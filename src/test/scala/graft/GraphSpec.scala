package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Planted-graph asserts for the graph_* family: a 3-cycle with a chord
  * plus a detached pendant pair — small enough to verify every count by
  * hand, structured enough to exercise orientation, exclusion, and
  * component logic.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  // 1→2, 2→3, 3→1 (cycle), 1→3 (chord), 4→5 (pendant component)
  private lazy val edges =
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 5L)).toDF("src", "dst")

  test("degrees counts both directions per node") {
    val d = GraphQueries.degrees(edges).orderBy("node")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(d === Seq((1L, 2L, 1L, 3L), (2L, 1L, 1L, 2L), (3L, 1L, 2L, 3L),
      (4L, 1L, 0L, 1L), (5L, 0L, 1L, 1L)))
  }

  test("triangle count via degree orientation, wedges, clustering") {
    // und = {1-2, 2-3, 1-3, 4-5}: one triangle; wedges = 3·C(2,2)=3;
    // clustering = 3·1/3 = 1.0 → 1_000_000 ppm
    val r = GraphQueries.triangles(edges).collect().head
    assert(r === Row(1L, 3L, 1000000L))
  }

  test("two-hop excludes self and direct neighbors, dedups paths") {
    // 1: {3 via 2} is direct, {1 via 3} is self → no row
    // 2: {1 via 3} → 1;  3: {2 via 1} → 1 ({3 via 1} is self)
    val r = GraphQueries.twoHop(edges).orderBy("src")
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((2L, 1L), (3L, 1L)))
  }

  test("pagerank fixed point on a pure cycle is the uniform rank") {
    // 1→2→3→1: out_deg=1 everywhere, so rank/3 is invariant:
    // base + 85·(10^12/3)//100 = 50e9 + 283333333333 = 10^12/3 exactly.
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = GraphQueries.pagerank(s, cyc).as[(Long, Long)].collect().toSeq
    assert(r === Seq((1L, 333333333333L), (2L, 333333333333L), (3L, 333333333333L)))
  }

  test("pagerank: sink node collects chord mass, dangling mass drops") {
    // On the planted graph node 3 has in-edges from 1 (deg 2) and 2 — its
    // rank must strictly exceed node 2's (single in-edge of half weight).
    val r = GraphQueries.pagerank(s, edges).as[(Long, Long)].collect().toMap
    assert(r(3L) > r(2L) && r(1L) > 0L && r(5L) > r(4L))
  }

  test("personalized pagerank: mass restarts at seeds, unreachable non-seeds stay zero") {
    // 10 → 2 → 3 (10 is the only seed); 5 → 6 disconnected non-seeds
    val e = Seq((10L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val r = GraphQueries.personalizedPagerank(s, e)
      .as[(Long, Long)].collect().toMap
    val base = (15L * 1000000000000L / 100L) / 1L
    assert(r(10L) === base, "the seed's steady rank is exactly the teleport term")
    assert(r(2L) > 0L && r(3L) > 0L, "downstream of the seed collects walk mass")
    assert(r(5L) === 0L && r(6L) === 0L,
      "a component with no seed must hold zero mass at every iteration")
    assert(r(2L) > r(3L), "rank decays with distance from the seed")
  }

  test("label propagation converges to component minima") {
    val r = GraphQueries.labelProp(edges).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)))
  }

  test("k-core peels chains, keeps the clique, and cascades removals") {
    // 4-clique {1,2,3,4} (each degree 3) + a chain 4—5—6: 6 peels (deg 1),
    // then 5 (deg drops to 1) — the cascade the iteration exists for
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val e = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val r = GraphQueries.kcore(e).as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"only the 4-clique survives the 3-core, at degree 3: $r")
  }

  test("hub cap: non-binding cap is exact; binding cap bounds wedges deterministically") {
    // the sf0.001 synthetic graph: max undirected degree well under 64, so
    // cap=64 must reproduce the uncapped result EXACTLY on all three ops
    val real = GraphQueries.edges(s, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(GraphQueries.commonNeighbors(real, Some(64))) ===
      rows(GraphQueries.commonNeighbors(real)),
      "cap above the max degree must not change commonNeighbors")
    assert(rows(GraphQueries.resourceAlloc(real, Some(64))) ===
      rows(GraphQueries.resourceAlloc(real)),
      "cap above the max degree must not change resourceAlloc")
    assert(rows(GraphQueries.twoHop(real, Some(64))) ===
      rows(GraphQueries.twoHop(real)),
      "cap above the max degree must not change twoHop")
    // star hub 0—{1..6} plus edge 1—2: shared-neighbor volume through the
    // hub is C(6,2)=15 pairs uncapped; cap=3 keeps the hub's 3
    // lowest-(deg, id) spokes {3,4,5} (deg(1)=deg(2)=2 sorts after the
    // deg-1 spokes) → exactly C(3,2)=3 hub pairs, repeatably
    val star = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
      .union(Seq((1L, 2L)).toDF("src", "dst"))
    val capped = GraphQueries.commonNeighbors(star, Some(3))
      .collect().map(_.toSeq).toSet
    val capped2 = GraphQueries.commonNeighbors(star, Some(3))
      .collect().map(_.toSeq).toSet
    assert(capped === capped2, "capped candidate set must be deterministic")
    val hubPairs = capped.filter { r =>
      val (a, c) = (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long])
      a >= 1L && c >= 1L } // spoke pairs — only shared neighbor is the hub
    assert(hubPairs.map(r => (r.head, r(1))) === Set((3L, 4L), (3L, 5L), (4L, 5L)),
      s"cap=3 keeps the deterministic lowest-(deg,id) spokes {3,4,5}: $capped")
    assert(GraphQueries.commonNeighbors(star, None)
      .filter($"a" >= 1L && $"c" >= 1L).count() === 15L,
      "uncapped star: C(6,2)=15 spoke pairs through the hub")
  }

  test("star contraction labels the planted components by their min id") {
    val r = GraphQueries.starContractCC(edges).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)))
  }

  test("star contraction is diameter-independent where fixed-round label-prop is not") {
    // a 41-node path 0—1—…—40: diameter 40. Fixed-round labelProp(8)
    // only sees 8 hops (node 40 still holds 32); star contraction reaches
    // the true component min in O(log²) rounds.
    val path = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val star = GraphQueries.starContractCC(path)
      .as[(Long, Long)].collect().toMap
    assert(star.size === 41 && star.values.forall(_ === 0L),
      s"every path node must collapse to component min 0: $star")
    val lp8 = GraphQueries.labelProp(path)
      .as[(Long, Long)].collect().toMap
    assert(lp8(40L) === 32L,
      "8-round min-label propagation must stop 8 hops in — the contrast " +
        "that motivates the star-contraction operator")
  }

  test("star contraction result is one row per node and matches converged label-prop") {
    val real = GraphQueries.edges(s, "/root/testdata/sf0.001")
    val star = GraphQueries.starContractCC(real)
    val n = GraphQueries.nodes(real).count()
    assert(star.count() === n, "exactly one label per node")
    // converged truth via 16 label-prop rounds (diameter at sf0.001 ≪ 16)
    val truth = GraphQueries.labelProp(real, 16)
      .as[(Long, Long)].collect().toMap
    assert(star.as[(Long, Long)].collect().toMap === truth)
  }

  test("edge synthesis is distinct, self-loop-free, and ~30% selective") {
    val e = GraphQueries.edges(s, "/root/testdata/sf0.001")
    val n = e.count()
    assert(n > 0 && e.distinct().count() === n)
    assert(e.filter($"src" === $"dst").count() === 0L)
  }
}
