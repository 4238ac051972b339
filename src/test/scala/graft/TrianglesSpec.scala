package graft

import graft.ext.{EntityResolution, Triangles}
import org.apache.spark.sql.functions._

/** Triangle enumeration semantics + the fuzzy-ER blocking/verify/argmin
  * contract, both against hand-checkable fixtures and in-memory models. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    Triangles.triangles(edges.toDF("src", "dst"), "src", "dst")
      .orderBy("a", "b", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("K4 yields its four triangles exactly once each") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tri(k4) == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
  }

  test("stars and paths have no triangles") {
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).isEmpty)
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
  }

  test("duplicate, reversed, and self-loop edges are normalized away") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(tri(noisy) == Seq((1L, 2L, 3L)))
  }

  test("random graphs match a brute-force model") {
    val rnd = new scala.util.Random(12L)
    val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
    val adj = edges.collect { case (u, v) if u != v => Set(u, v) }.toSet
    val nodes = adj.flatten.toSeq.sorted
    val want = for {
      (a, i) <- nodes.zipWithIndex
      b <- nodes.drop(i + 1) if adj(Set(a, b))
      c <- nodes.dropWhile(_ <= b) if adj(Set(a, c)) && adj(Set(b, c))
    } yield (a, b, c)
    assert(tri(edges) == want)
  }

  test("clustering coefficients match an in-memory model") {
    val rnd = new scala.util.Random(7L)
    val edges = Seq.fill(70)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
    val es = edges.collect { case (u, v) if u != v =>
      (math.min(u, v), math.max(u, v)) }.distinct
    val adj = es.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = adj.map { case (n, nbrs) =>
      val d = nbrs.size.toLong
      val tri = nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x)(y) }.toLong
      (n, (d, tri,
        if (d >= 2) Some((20000L * tri) / (d * (d - 1))) else None))
    }
    val got = Triangles.clusteringCoefficients(
        edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got == want)
  }

  test("kCore matches an in-memory peeling model on random graphs") {
    val rnd = new scala.util.Random(31L)
    val edges = Seq.fill(80)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    def model(k: Int): Map[Long, Long] = {
      var es = edges.collect { case (u, v) if u != v =>
        (math.min(u, v), math.max(u, v)) }.distinct
      var changed = true
      while (changed) {
        val deg = es.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val drop = deg.filter(_._2 < k).keySet
        changed = drop.nonEmpty
        es = es.filter(e => !drop(e._1) && !drop(e._2))
      }
      es.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
    }
    for (k <- Seq(2, 4, 6)) {
      val got = Triangles.kCore(edges.toDF("src", "dst"), "src", "dst", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model(k), s"k=$k")
    }
  }

  test("kCore refuses loudly when the round budget is too small") {
    // a path graph peels one node-pair layer per round under k=2
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Triangles.kCore(path, "src", "dst", k = 2, maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("coActivityEdges refuses an over-budget bucket loudly") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:30")
    val ev = (1L to 10L).map(u => (u, ts)).toDF("user_id", "ts")
    val e = intercept[IllegalArgumentException] {
      Triangles.coActivityEdges(ev, maxBucketUsers = 5L).collect()
    }
    assert(e.getMessage.contains("largest bucket holds 10"))
    assert(Triangles.coActivityEdges(ev, maxBucketUsers = 10L).count() == 45L)
  }

  test("coActivityEdges on an empty frame yields an empty edge list") {
    val ev = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
    assert(Triangles.coActivityEdges(ev).count() == 0L)
    assert(Triangles.coActivityEdgesSharded(ev, shards = 4).count() == 0L)
  }

  test("sharded co-activity edges equal the single-reducer formulation") {
    val rnd = new scala.util.Random(41L)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ev = Seq.fill(300)((rnd.nextInt(25).toLong + 1L,
        new java.sql.Timestamp(base + rnd.nextInt(5 * 60) * 1000L)))
      .toDF("user_id", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = canon(Triangles.coActivityEdges(ev))
    // equivalence must hold at every shard count, including S=1 (no
    // split) and S larger than the user population
    for (s <- Seq(1, 2, 3, 7, 64))
      assert(canon(Triangles.coActivityEdgesSharded(ev, shards = s)) == plain,
        s"shards=$s")
  }

  test("sharded co-activity guards on the per-task pair count") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:30")
    val ev = (1L to 100L).map(u => (u, ts)).toDF("user_id", "ts")
    val e = intercept[IllegalArgumentException] {
      Triangles.coActivityEdgesSharded(ev, shards = 2, maxTaskPairs = 100L)
        .collect()
    }
    assert(e.getMessage.contains("pairs per task"))
    assert(Triangles.coActivityEdgesSharded(ev, shards = 2,
      maxTaskPairs = 10000L).count() == 4950L)
  }

  test("coActivityEdgesAuto routes: plain under the cap, sharded over it") {
    val rnd = new scala.util.Random(43L)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ev = Seq.fill(200)((rnd.nextInt(20).toLong + 1L,
        new java.sql.Timestamp(base + rnd.nextInt(3 * 60) * 1000L)))
      .toDF("user_id", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = canon(Triangles.coActivityEdges(ev))
    // under the cap: the routed plan is the single pair join (no shard
    // explode generator anywhere in it)
    val under = Triangles.coActivityEdgesAuto(ev, maxBucketUsers = 10000L)
    assert(!under.queryExecution.executedPlan.toString.contains("explode"),
      "under-cap arm must be the plain pair join")
    assert(canon(under) == plain)
    // over the cap (forced by a cap of 1): the routed plan carries the
    // shard-pair explode — the PATH assertion behind the
    // graph_triangles_sharded CORRECTNESS entry — and the edge set is
    // unchanged
    val over = Triangles.coActivityEdgesAuto(ev, maxBucketUsers = 1L,
      shards = 3)
    assert(over.queryExecution.executedPlan.toString.contains("explode"),
      "over-cap arm must be the sharded formulation")
    assert(canon(over) == plain)
    // an empty frame routes the plain arm and stays empty
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
    assert(Triangles.coActivityEdgesAuto(empty, maxBucketUsers = 1L)
      .count() == 0L)
  }

  // ------------------------------------------------------- fuzzy ER
  test("ER resolves single-char corruptions to the closest clean row") {
    val clean = Seq((1L, "margaret hamilton"), (2L, "grace hopper"),
      (3L, "katherine johnson")).toDF("cid", "cn")
    val dirty = Seq((10L, "margret hamilton"), // deletion
      (11L, "grace hoppex"), // substitution
      (12L, "katherine johnsoon"), // insertion
      (13L, "totally unrelated")).toDF("did", "dn")
    val got = EntityResolution.resolve(dirty, "did", "dn", clean, "cid", "cn")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((10L, 1L, 1), (11L, 2L, 1), (12L, 3L, 1)))
  }

  test("a shared-deletion impostor at distance 2 is verified away") {
    // "abc" and "bcx" share the deletion variant "bc" (block hit) but
    // levenshtein("abc","bcx") = 2 — the verify step must drop the pair
    val clean = Seq((1L, "bcx")).toDF("cid", "cn")
    val dirty = Seq((10L, "abc")).toDF("did", "dn")
    assert(EntityResolution.resolve(dirty, "did", "dn", clean, "cid", "cn")
      .count() == 0L)
  }

  test("ER recall matches brute force at distance 1 on random strings") {
    val rnd = new scala.util.Random(77L)
    def word() = Seq.fill(3 + rnd.nextInt(4))(('a' + rnd.nextInt(3)).toChar)
      .mkString
    val cleanRows = (1L to 40L).map(i => (i, word()))
    val dirtyRows = (101L to 140L).map(i => (i, word()))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = dirtyRows.flatMap { case (id, dn) =>
      val ms = cleanRows.map { case (ck, cn) => (lev(dn, cn), ck) }
        .filter(_._1 <= 1)
      if (ms.isEmpty) None else Some((id, ms.min._2, ms.min._1))
    }
    val got = EntityResolution.resolve(dirtyRows.toDF("did", "dn"), "did",
        "dn", cleanRows.toDF("cid", "cn"), "cid", "cn")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  test("ER recall matches brute force at distance 2 on random strings") {
    val rnd = new scala.util.Random(78L)
    def word() = Seq.fill(3 + rnd.nextInt(5))(('a' + rnd.nextInt(3)).toChar)
      .mkString
    val cleanRows = (1L to 40L).map(i => (i, word()))
    val dirtyRows = (101L to 140L).map(i => (i, word()))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = dirtyRows.flatMap { case (id, dn) =>
      val ms = cleanRows.map { case (ck, cn) => (lev(dn, cn), ck) }
        .filter(_._1 <= 2)
      if (ms.isEmpty) None else Some((id, ms.min._2, ms.min._1))
    }
    val got = EntityResolution.resolve(dirtyRows.toDF("did", "dn"), "did",
        "dn", cleanRows.toDF("cid", "cn"), "cid", "cn", maxDist = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  test("ER refuses loudly when the measured pair budget trips") {
    // a planted hot key: every clean row is the SAME name, so the
    // variant-key join would be |dirty|x|clean| — the pricing aggregate
    // must catch it BEFORE the join launches
    val clean = (1L to 50L).map(i => (i, "aaaa")).toDF("cid", "cn")
    val dirty = (101L to 150L).map(i => (i, "aaab")).toDF("did", "dn")
    val e = intercept[IllegalArgumentException] {
      EntityResolution.resolve(dirty, "did", "dn", clean, "cid", "cn",
        maxCandidatePairs = 100L).count()
    }
    assert(e.getMessage.contains("candidate pairs"))
    assert(e.getMessage.contains("budget 100"))
    // the same fixture under a budget that covers it resolves fine
    assert(EntityResolution.resolve(dirty, "did", "dn", clean, "cid", "cn",
      maxCandidatePairs = 10000L).count() == 50L)
  }

  test("ER cascade short-circuits: an all-clean feed never runs stage 2") {
    // every dirty row matches exactly at stage 1, so the d=2 stage must
    // not launch. Pin: pick a pair budget BETWEEN the two stages'
    // measured candidate counts — resolve succeeding under it proves the
    // d=2 pricing never ran (it would have refused)
    val clean = (1L to 50L).map(i => (i, f"name$i%04d")).toDF("cid", "cn")
    val dirty = (1L to 50L).map(i => (i + 100L, f"name$i%04d"))
      .toDF("did", "dn")
    def pairs(nbhd: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column): Long =
      dirty.select(explode(nbhd(col("dn"))).as("k"))
        .groupBy("k").agg(count(lit(1)).as("dc"))
        .join(clean.select(explode(nbhd(col("cn"))).as("k"))
          .groupBy("k").agg(count(lit(1)).as("cc")), "k")
        .agg(coalesce(sum(col("dc") * col("cc")), lit(0L)))
        .head().getLong(0)
    val p1 = pairs(EntityResolution.deletionNeighborhood)
    val p2 = pairs(EntityResolution.deletionNeighborhood2)
    assert(p1 < p2, s"fixture must separate the stages: d1=$p1 d2=$p2")
    val got = EntityResolution.resolve(dirty, "did", "dn", clean, "cid",
        "cn", maxDist = 2, maxCandidatePairs = p1).orderBy("id").collect()
    assert(got.length == 50)
    assert(got.forall(_.getInt(2) == 0))
  }

  test("the distance-2 neighborhood handles degenerate short strings") {
    // 0- and 1-char names must not feed sequence(1, 0) its descending
    // trap: no pair keys, but the base + single-deletion keys survive
    val clean = Seq((1L, "a"), (2L, "")).toDF("cid", "cn")
    val dirty = Seq((10L, "ab"), (11L, "a"), (12L, "xyz"))
      .toDF("did", "dn")
    val got = EntityResolution.resolve(dirty, "did", "dn", clean, "cid",
        "cn", maxDist = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // "ab"->"a" dist 1 (ties to cid 1 over ""@2); "a"->"a" dist 0;
    // "xyz" is distance 3 from both — dropped
    assert(got == Seq((10L, 1L, 1), (11L, 1L, 0)))
  }
}
