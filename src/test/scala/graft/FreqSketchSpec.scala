package graft

import graft.ext.FreqSketch
import org.apache.spark.sql.functions._

/** Count-min sketch: portable fold values, bounded state, the count-min
  * overestimate bound, and pre-aggregated-insert ≡ streaming-insert. */
class FreqSketchSpec extends SparkSpec {

  test("termCounts: exact occurrence counts, empty tokens dropped") {
    import spark.implicits._
    val d = Seq((1L, " x  y x"), (2L, "y")).toDF("doc_id", "text")
    val out = FreqSketch.termCounts(d, "text").orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // "" from the leading/double spaces never reaches the counts
    assert(out == Seq(("x", 2L), ("y", 2L)))
  }

  test("sketch cells replay the Rabin–Karp fold by hand") {
    import spark.implicits._
    // fold("a") = 97 under every row (97 < each modulus and < width),
    // fold("ab", a=31) = (97*31 + 98) % p = 3105
    val counts = Seq(("a", 3L), ("ab", 1L)).toDF("term", "cnt")
    val out = FreqSketch.sketch(counts).orderBy("row", "cell").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.contains((0, 97L, 3L)))            // "a" row 0
    assert(out.contains((1, 97L, 3L)))            // same cell all rows
    assert(out.contains((2, 97L, 3L)))
    assert(out.contains((0, 3105L % 512L, 1L)))   // "ab" row 0
    // d=3 rows × ≤1 cell per distinct term here
    assert(out.size == 6)
  }

  test("sketch state is bounded by d·w and additive under pre-aggregation") {
    import spark.implicits._
    val d = (1 to 50).map(i => (i.toLong, s"t${i % 7} t${i % 7} filler"))
      .toDF("doc_id", "text")
    val sk = FreqSketch.sketch(FreqSketch.termCounts(d, "text"))
    assert(sk.count() <= 3L * FreqSketch.Width)
    // total mass per row == total token occurrences (insertion is additive)
    val perRow = sk.groupBy("row").agg(sum("cnt").as("mass"))
      .collect().map(r => r.getLong(1)).toSeq
    val totalToks = 150L // 50 docs × 3 non-empty tokens
    assert(perRow == Seq(totalToks, totalToks, totalToks))
  }

  test("estimateTopK: est ≥ exact always, equal when collision-free") {
    import spark.implicits._
    val d = (1 to 40).map(i => (i.toLong,
      ("hot " * (i % 3 + 1)) + s"term$i")).toDF("doc_id", "text")
    val out = FreqSketch.estimateTopK(d, "text", k = 5)
      .orderBy(col("exact_cnt").desc, col("term").asc).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.size == 5)
    assert(out.forall { case (_, exact, est) => est >= exact })
    // "hot" dominates: 40 docs × (1..3) occurrences = 80
    assert(out.head._1 == "hot" && out.head._2 == 80L)
    // 41 distinct terms over 3×512 cells: no all-three-rows collision
    assert(out.forall { case (_, exact, est) => est == exact })
  }
}
