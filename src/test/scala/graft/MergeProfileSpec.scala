package graft

import graft.ext.{Merge, Profile}
import org.apache.spark.sql.functions._

class MergeProfileSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)
  ).toDF("id", "name", "v")

  test("upsert applies latest-wins inserts, updates, and deletes") {
    val changes = Seq(
      (2L, "b2", 21L, "U", 1L),   // plain update
      (3L, "c2", 31L, "U", 1L),   // updated then deleted -> net delete
      (3L, "c3", 32L, "D", 2L),
      (5L, "e", 50L, "I", 1L),    // insert
      (5L, "e2", 51L, "U", 2L)    // later upsert of the same key wins
    ).toDF("id", "name", "v", "op", "seq")
    val out = Merge.upsert(base, changes, "id", "op", "seq")
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(out === Seq((1L, "a", 10L), (2L, "b2", 21L), (4L, "d", 40L),
      (5L, "e2", 51L)))
  }

  test("upsert same-seq tie breaks op-descending (U over D)") {
    val changes = Seq(
      (1L, "a2", 11L, "D", 5L),
      (1L, "a3", 12L, "U", 5L)
    ).toDF("id", "name", "v", "op", "seq")
    val out = Merge.upsert(base, changes, "id", "op", "seq")
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(out.toSeq === Seq((1L, "a3", 12L), (2L, "b", 20L),
      (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("upsert duplicate (key, seq, op) rows replay deterministically") {
    // two U-rows tie on every window key the scaladoc orders by; the
    // payload-hash tiebreak must pick the SAME survivor regardless of
    // input order or partition layout
    val a = (1L, "dup-a", 100L, "U", 9L)
    val b = (1L, "dup-b", 200L, "U", 9L)
    val runs = Seq(
      Seq(a, b).toDF("id", "name", "v", "op", "seq").repartition(1),
      Seq(b, a).toDF("id", "name", "v", "op", "seq").repartition(7),
      Seq(a, b, a, b).toDF("id", "name", "v", "op", "seq").repartition(3)
    ).map { feed =>
      Merge.upsert(base, feed, "id", "op", "seq")
        .filter(col("id") === 1L).as[(Long, String, Long)].collect().toSeq
    }
    assert(runs(0).size == 1)
    assert(Set("dup-a", "dup-b").contains(runs(0).head._2))
    assert(runs(1) == runs(0) && runs(2) == runs(0),
      s"tie survivor changed across layouts: $runs")
  }

  test("scd2 chains validity intervals; deletes close without emitting") {
    val changes = Seq(
      (1L, "v1", 10L, "I", 1L),   // two versions, second current
      (1L, "v2", 11L, "U", 3L),
      (2L, "w1", 20L, "I", 1L),   // created then deleted -> closed, no current
      (2L, "w2", 21L, "D", 2L),
      (3L, "x1", 30L, "I", 5L)    // single open version
    ).toDF("id", "name", "v", "op", "seq")
    val out = Merge.scd2(changes, "id", "op", "seq")
      .orderBy("id", "valid_from")
      .select("id", "name", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "v1", 1L, 3L, false), (1L, "v2", 3L, -1L, true),
      (2L, "w1", 1L, 2L, false),
      (3L, "x1", 5L, -1L, true)))
  }

  test("scd2 duplicate (key, seq) rows dedupe to one deterministic version") {
    val a = (1L, "dup-a", 1L, "U", 4L)
    val b = (1L, "dup-b", 2L, "U", 4L)
    val runs = Seq(
      Seq(a, b).toDF("id", "name", "v", "op", "seq").repartition(1),
      Seq(b, a).toDF("id", "name", "v", "op", "seq").repartition(5)
    ).map { feed =>
      Merge.scd2(feed, "id", "op", "seq")
        .select("id", "name", "valid_from", "is_current")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getBoolean(3))).toSeq
    }
    assert(runs(0).size == 1 && runs(0).head._4)
    assert(runs(1) == runs(0), s"dup survivor changed across layouts: $runs")
  }

  test("upsert rejects reserved column names and missing base columns") {
    val clash = base.withColumn("__rnk", lit(1))
    val feed = Seq((1L, "x", 1L, "U", 1L)).toDF("id", "name", "v", "op", "seq")
    intercept[IllegalArgumentException] {
      Merge.upsert(clash, feed.withColumn("__rnk", lit(1)), "id", "op", "seq")
    }
    intercept[IllegalArgumentException] {
      Merge.upsert(base, feed.drop("v"), "id", "op", "seq")
    }
  }

  test("profile reports nulls, distincts, and string min/max per column") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(2L), None), (Some(2L), Some("y")),
      (None, Some("x"))
    ).toDF("k", "s")
    val rows = Profile.columns(df, Seq("k", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, String, String)].collect()
    assert(rows(0) === (("k", 1L, 2L, "1", "2")))
    assert(rows(1) === (("s", 1L, 2L, "x", "y")))
  }

  test("columnsSketch: exact nulls/min/max, bounded registers, loud reject") {
    val df = Seq(
      (Some(10L), Some(1)), (Some(20L), Some(2)), (Some(20L), None),
      (None, Some(2))
    ).toDF("k", "i")
    val rows = Profile.columnsSketch(df, Seq("k", "i"))
      .orderBy("col_name").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("i", "k"))
    val i = rows(0); val k = rows(1)
    assert(i.getLong(1) == 1L && i.getString(5) == "1" && i.getString(6) == "2")
    assert(k.getLong(1) == 1L && k.getString(5) == "10" && k.getString(6) == "20")
    // register state is bounded; the RAW estimate (no small-range
    // correction, same surface as the certified agg_hll) is positive and
    // finite — tiny inputs read high by construction
    Seq(i, k).foreach { r =>
      assert(r.getLong(2) <= 64L)
      assert(r.getDouble(4) > 0.0 && !r.getDouble(4).isInfinite,
        s"estimate degenerate: $r")
    }
    // non-integral columns are rejected, not silently NULL-profiled
    val s = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException](Profile.columnsSketch(s, Seq("s")))
    val d = Seq((1L, 1.5)).toDF("k", "d")
    intercept[IllegalArgumentException](Profile.columnsSketch(d, Seq("d")))
  }

  test("columnsSketch plan has no expand-based exact distinct") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val plan = Profile.columnsSketch(df, Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("count(distinct"),
      s"sketch profile still plans an exact distinct:\n$plan")
  }

  test("profile scans the table once (single aggregate subtree)") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val plan = Profile.columns(df, Seq("k", "s"))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size === 1, s"expected one scan of the input, got:\n$plan")
  }
}
