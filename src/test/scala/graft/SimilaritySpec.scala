package graft

import graft.ext.Similarity
import graft.functions.VectorFunctions.array_dot
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 similarity search + the custom ArrayDot expression. */
class SimilaritySpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),   // identical to 0 -> cos 1
      (2L, Seq(0.0f, 1.0f, 0.0f), 0),   // orthogonal -> cos 0
      (3L, Seq(0.6f, 0.8f, 0.0f), 1),   // cos vs e1 = 0.6
      (4L, Seq(-1.0f, 0.0f, 0.0f), 1)   // opposite -> cos -1
    ).toDF("vec_id", "embedding", "label")
  }

  test("array_dot: float, double, and mixed inputs; codegen and eval agree") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0))).toDF("f", "d")
    val mixed = df.select(
      array_dot(col("f"), col("d")).as("fd"),
      array_dot(col("d"), col("d")).as("dd"),
      array_dot(col("f"), col("f")).as("ff")).head()
    assert(mixed.getDouble(0) == 32.0)
    assert(mixed.getDouble(1) == 77.0)
    assert(mixed.getDouble(2) == 14.0)
  }

  test("array_dot: length mismatch is null, null input is null") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(df.select(array_dot(col("a"), col("b"))).head().isNullAt(0))
    val withNull = df.select(array_dot(lit(null).cast("array<double>"), col("a")))
    assert(withNull.head().isNullAt(0))
  }

  test("array_dot rejects non-numeric-array inputs at analysis time") {
    import spark.implicits._
    val df = Seq((Seq("x"), Seq(1.0))).toDF("s", "d")
    intercept[Exception] {
      df.select(array_dot(col("s"), col("d"))).head()
    }
  }

  test("topK: exact scores, order, and tiebreak by id") {
    val out = Similarity.topK(vecs, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), k = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((0L, 1.0), (1L, 1.0), (3L, 0.6)))
  }

  test("topKPerGroup: k per label with rank column") {
    val out = Similarity.topKPerGroup(vecs, "vec_id", "embedding", "label",
      Seq(1.0, 0.0, 0.0), k = 1)
      .select("label", "vec_id", "rn").orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((0, 0L, 1L), (1, 3L, 1L)))
  }

  test("knnJoin: per-query top-k with self-match first, deterministic ties") {
    val out = Similarity.knnJoin(vecs, vecs.filter(col("vec_id") < 2),
        "vec_id", "embedding", "vec_id", "embedding", k = 2)
      .orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    // queries 0 and 1 are identical e1 vectors: both rank {0, 1} (cos 1.0
    // each, tie broken by cand_id) ahead of everything else
    assert(out == Seq((0L, 0L, 1.0, 1L), (0L, 1L, 1.0, 2L),
      (1L, 0L, 1.0, 1L), (1L, 1L, 1.0, 2L)))
    // plan shape: broadcast of the query batch, never a shuffled cross
    val plan = Similarity.knnJoin(vecs, vecs.filter(col("vec_id") < 2),
        "vec_id", "embedding", "vec_id", "embedding", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(900))
    assert(plan.contains("WindowGroupLimit"), plan.take(1800))
  }

  test("quantizeInt8: max-abs scaling, rounding, zero-vector guard") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)), // scale 1.0 -> 64 (63.5 rounds up), -127, 32
      (2L, Seq(0.0f, 0.0f, 0.0f))    // zero vector -> all zeros, no NaN
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(d, "vec_id", "embedding")
      .orderBy("vec_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 0L, 64L), (1L, 1L, -127L), (1L, 2L, 32L),
      (2L, 0L, 0L), (2L, 1L, 0L), (2L, 2L, 0L)))
  }

  test("nearDupPairs: threshold and exact cosine on known vectors") {
    val out = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((0L, 1L, 1.0)))
  }

  test("nearDupPairs: input cap fails loudly, pointing at the scale path") {
    val e = intercept[IllegalStateException] {
      Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.99, maxRows = 2L)
    }
    assert(e.getMessage.contains("lshCosinePairs"))
    // cap disabled -> same result as default
    val out = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.99,
        maxRows = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((0L, 1L, 1.0)))
  }

  test("lshCosinePairs finds the same high-sim pairs as brute force here") {
    val exact = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshCosinePairs(vecs, "vec_id", "embedding",
      dim = 3, threshold = 0.99, numPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors always share every hyperplane bucket -> full recall
    assert(lsh == exact)
  }

  test("centroids: per-group elementwise mean, order restored") {
    val out = Similarity.centroids(vecs, "embedding", "label")
      .orderBy("grp").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    assert(out.head._1 == 0)
    // the engine quantizes to 1e-10 (portable long sum) — tolerance compare
    out.head._2.zip(Seq(2.0 / 3, 1.0 / 3, 0.0)).foreach { case (got, e) =>
      assert(math.abs(got - e) < 1e-9, s"$got vs $e") }
    // 0.6f widens to 0.6000000238418579, not 0.6
    val exp = Seq((0.6f.toDouble - 1.0) / 2, 0.8f.toDouble / 2, 0.0)
    out(1)._2.zip(exp).foreach { case (got, e) =>
      assert(math.abs(got - e) < 1e-9, s"$got vs $e") }
  }

  test("ivfTopK probes only the nearest cells but finds the right vectors") {
    val out = Similarity.ivfTopK(vecs, "vec_id", "embedding", "label",
      Seq(1.0, 0.0, 0.0), k = 2, nprobe = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 1L)) // label-0 cell is nearest; its best two
  }

  test("pqEncode: separated labels self-assign with zero error; a vector " +
      "nearer the other cluster crosses over") {
    import spark.implicits._
    // label 0 lives at (1,1,..), label 1 at (9,9,..); 4 dims, 2 subspaces
    val d = Seq(
      (1L, Seq(1.0f, 1.0f, 1.0f, 1.0f), 0),
      (2L, Seq(1.0f, 1.0f, 1.0f, 1.0f), 0),
      (3L, Seq(9.0f, 9.0f, 9.0f, 9.0f), 1),
      // labeled 0 but sitting on cluster 1: codes must follow geometry.
      // Its pull makes centroid-0 = (3.67..), still nearer 9 than 3.67?
      // dist to c0 = (9-11/3)^2*2 ≈ 56.9; to c1 = 0 -> codes 1, not 0
      (4L, Seq(9.0f, 9.0f, 9.0f, 9.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.pqEncode(d, "vec_id", "embedding", "label", 2)
      .orderBy("vec_id", "sub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.length == 8)
    // vectors 3 and 4 sit exactly on centroid 1 -> code 1, d2 = 0
    assert(out.filter(r => r._1 == 3L || r._1 == 4L)
      .forall(r => r._3 == 1 && r._4 == 0.0))
    // vectors 1,2 are nearer their own centroid than centroid 1
    assert(out.filter(r => r._1 <= 2L).forall(_._3 == 0))
  }

  test("pqTopK: ADC ranks the query's own cluster highest, k bounds") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq(1.0f, 0.0f, 1.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f, 1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 9.0f, 0.0f, 9.0f), 1),
      (4L, Seq(0.0f, 9.0f, 0.0f, 9.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.pqTopK(d, "vec_id", "embedding", "label",
        numSub = 2, query = Seq(1.0, 0.0, 1.0, 0.0), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 3)
    // cluster-0 members reconstruct exactly to the query direction
    assert(out.take(2).map(_._1).toSet == Set(1L, 2L))
    assert(out.take(2).forall(_._2 == 1.0))
    assert(out(2)._2 < 1.0)
  }

  test("semDedupSurvivors: lower-id cosine-dup dropped, negation kept, " +
      "clusters isolated") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(2.0f, 0.0f), 0),  // scaled copy of 0 -> cos 1 -> dropped
      (2L, Seq(-1.0f, 0.0f), 0), // negation -> cos -1 -> kept
      (3L, Seq(1.0f, 0.0f), 1)   // same direction as 0 but OTHER cluster
    ).toDF("vec_id", "embedding", "label")
    val kept = Similarity.semDedupSurvivors(d, "vec_id", "embedding",
      "label", threshold = 0.99).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 3L))
  }

  test("semDedupSurvivors: degenerate clustering is rejected loudly") {
    import spark.implicits._
    val d = (0L to 9L).map(i => (i, Seq(i.toFloat, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalStateException](
      Similarity.semDedupSurvivors(d, "vec_id", "embedding", "label",
        threshold = 0.9, maxClusterRows = 5L))
    assert(e.getMessage.contains("largest cluster"))
  }

  test("normalizeUnit: 1e-4-quantized components of x/norm; zero vector -> 0s") {
    import spark.implicits._
    val d = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.normalizeUnit(d, "vec_id", "embedding")
      .orderBy("vec_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0L, 6000L), (1L, 1L, 8000L),
      (2L, 0L, 0L), (2L, 1L, 0L)))
  }
}
