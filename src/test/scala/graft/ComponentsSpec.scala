package graft

import graft.ext.Components

/** Connected components: multi-hop chains, separate components, cycles,
  * and the loud non-convergence failure. */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain needs multi-hop propagation to one component") {
    // path 1-2-3-4-5 plus transposed-order edges: min label must travel
    val got = cc(Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate minima; cycles converge") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 1L), // triangle
      (10L, 11L), (11L, 12L), // path
      (20L, 21L))) // lone pair
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got.size == 8) // only nodes with an edge appear
  }

  test("representative is the global component minimum, any edge order") {
    val got = cc(Seq((7L, 9L), (9L, 3L), (3L, 8L), (8L, 2L)))
    assert(got.values.toSet == Set(2L))
  }

  test("applyClusters keeps canonical members and unclustered docs") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (9L, "z"))
      .toDF("doc_id", "text")
    val clusters = Components.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")) // cluster {1,2,3}, rep 1
    val kept = Components.applyClusters(docs, "doc_id", clusters)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 9L)) // rep survives; 4 and 9 untouched
  }

  test("applyClustersBest keeps the highest score, ties to smallest id") {
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 2L), (9L, 7L))
      .toDF("doc_id", "len")
    val clusters = Components.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")) // cluster {1,2,3}
    val kept = Components.applyClustersBest(docs, "doc_id", clusters, "len")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 2 and 3 tie at score 9 -> smaller id 2 wins; min-id would keep 1
    assert(kept == Set(2L, 4L, 9L))
  }

  test("non-convergence within maxIter fails loudly") {
    val e = intercept[IllegalStateException] {
      cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  private def pr(edges: Seq[(String, String, Long)],
                 iters: Int): Map[String, Long] =
    Components.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iters)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("pageRank matches a hand-stepped integer power iteration") {
    // a -> b (w 1), b -> a (w 1): symmetric 2-node graph, N = 2
    // r0 = 5e8 each; every iteration: base 75e6 + (5e8*85*1) div (100*1)
    //   = 75_000_000 + 425_000_000 = 500_000_000 — an exact fixpoint
    val got = pr(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 3)
    assert(got == Map("a" -> 500000000L, "b" -> 500000000L))
  }

  test("pageRank: sinks collect rank, dangling mass drops, mass bounded") {
    // star into a sink: a->c, b->c, c has no out-edges (dangling)
    val got = pr(Seq(("a", "c", 2L), ("b", "c", 1L)), iters = 3)
    // sources only ever hold the teleport base after iteration 1
    val base = 15L * 1000000000L / (100L * 3L)
    assert(got("a") == base && got("b") == base)
    assert(got("c") > got("a")) // the sink accumulates
    // dangling c re-emits nothing: total mass strictly below scale
    assert(got.values.sum < 1000000000L)
  }

  test("pageRank: higher in-weight means higher rank, deterministic") {
    val edges = Seq(("a", "b", 9L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L))
    val r1 = pr(edges, iters = 3)
    val r2 = pr(edges, iters = 3)
    assert(r1 == r2)                 // bit-identical across runs
    assert(r1("b") > r1("c"))        // 90% of a's vote vs 10%
  }

  test("pageRank rejects bad iteration and scale bounds loudly") {
    val e = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException](
      Components.pageRank(e, "src", "dst", "w", iters = 0))
    intercept[IllegalArgumentException](
      Components.pageRank(e, "src", "dst", "w", iters = 21))
    intercept[IllegalArgumentException](
      Components.pageRank(e, "src", "dst", "w", iters = 3, scale = 10L))
  }
}
