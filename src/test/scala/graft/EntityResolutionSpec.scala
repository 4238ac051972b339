package graft

import graft.ext.EntityResolution
import org.apache.spark.sql.functions._

/** The fuzzy-ER staged cascade: blocking/verify/argmin semantics against
  * hand-checkable fixtures and brute-force models, plus the measured
  * pair-budget refusal and the all-clean stage-2 short-circuit. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

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
