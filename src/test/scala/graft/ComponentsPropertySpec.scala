package graft

import graft.ext.Components
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property: distributed min-label propagation equals a classic union-find
  * on random graphs (self-loops, parallel edges, many components). */
object ComponentsPropertySpec extends Properties("components") {

  // each case runs a full iterative Spark job chain (checkpoints + counts);
  // 30 random graphs give the coverage without dominating the suite's time
  override def overrideParameters(p: org.scalacheck.Test.Parameters):
      org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(30)

  private lazy val spark = TestSpark.spark

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 24) // node id space
    m <- Gen.choose(1, 40) // edge count
    es <- Gen.listOfN(m,
      Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
  } yield es

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical representative = min member, which union-by-min maintains
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  property("equals union-find on random multigraphs") =
    Prop.forAll(genEdges) { edges =>
      import spark.implicits._
      val got = Components.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(edges)
      (got == want) :| s"got $got\nwant $want"
    }
}
