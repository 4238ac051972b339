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

  test("non-convergence within maxIter fails loudly") {
    val e = intercept[IllegalStateException] {
      cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
