package graft

import graft.ext.Olap
import org.apache.spark.sql.functions._

/** Multi-level OLAP aggregation on hand-checkable rows. */
class OlapSpec extends SparkSpec {

  private lazy val sales = {
    import spark.implicits._
    Seq(
      ("F", "HIGH", 10.5), ("F", "HIGH", 2.0), ("F", "LOW", 1.25),
      ("O", "HIGH", 100.0), ("O", "LOW", 0.0001)
    ).toDF("status", "prio", "amount")
  }

  test("rollupStats: per-pair, per-status subtotals, grand total, gid bits") {
    val rows = Olap.rollupStats(sales, Seq("status", "prio"), "amount")
      .orderBy("gid", "status", "prio").collect()
      .map(r => (r.getLong(4), Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getDouble(3)))
    // gid 0: the four (status, prio) pairs
    assert(rows(0) == (0L, Some("F"), Some("HIGH"), 2L, 12.5))
    assert(rows(1) == (0L, Some("F"), Some("LOW"), 1L, 1.25))
    // gid 1: prio rolled up
    assert(rows(4) == (1L, Some("F"), None, 3L, 13.75))
    // 0.0001 survives the 1e-4 quantization exactly
    assert(rows(5) == (1L, Some("O"), None, 2L, 100.0001))
    // gid 3: grand total
    assert(rows(6) == (3L, None, None, 5L, 113.7501))
    assert(rows.length == 7)
  }

  test("cubeStats: all four grouping sets, including status rolled up") {
    val rows = Olap.cubeStats(sales, Seq("status", "prio"), "amount")
      .collect().map(r => (r.getLong(4), Option(r.getString(0)),
        Option(r.getString(1)), r.getLong(2))).toSet
    assert(rows.contains((2L, None, Some("HIGH"), 3L))) // status aggregated away
    assert(rows.contains((2L, None, Some("LOW"), 2L)))
    assert(rows.contains((3L, None, None, 5L)))
    assert(rows.size == 4 + 2 + 2 + 1)
  }

  test("rollup/cube plan: one Expand, one aggregation exchange") {
    val plan = Olap.rollupStats(sales, Seq("status", "prio"), "amount")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(500))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan.take(1500))
  }

  test("pivotCounts: explicit columns, empty cells are 0") {
    val out = Olap.pivotCounts(sales, "prio", "status", Seq("F", "O", "P"))
      .orderBy("prio").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("HIGH", 2L, 1L, 0L), ("LOW", 1L, 1L, 0L)))
  }

  test("runningTotal: cumulative per partition in (order, tie) order") {
    import spark.implicits._
    val d = Seq((1L, 10L, 1, 1.10), (1L, 20L, 2, 2.20), (1L, 30L, 2, 0.70),
      (2L, 40L, 1, 5.00)).toDF("k", "id", "ord", "amt")
    val out = Olap.runningTotal(d, "k", "ord", "id", "amt")
      .orderBy("k", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
    // ties on ord=2 resolved by id: 20 before 30
    assert(out == Seq((1L, 10L, 1.10), (1L, 20L, 3.30), (1L, 30L, 4.00),
      (2L, 40L, 5.00)))
  }

  test("topNPerGroup: rank desc with tie-break, n-boundary deterministic") {
    import spark.implicits._
    val d = Seq(("a", 1L, 9.0), ("a", 2L, 9.0), ("a", 3L, 1.0),
      ("b", 4L, 5.0)).toDF("g", "id", "score")
    val out = Olap.topNPerGroup(d, "g", "score", "id", n = 2)
      .orderBy("g", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    // equal scores rank by id asc; id=3 (score 1.0) is cut
    assert(out == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 4L, 1L)))
  }

  test("distinctCounts: distinct vs total per group") {
    import spark.implicits._
    val ev = Seq(("click", 7L), ("click", 7L), ("click", 8L), ("view", 7L))
      .toDF("etype", "uid")
    val out = Olap.distinctCounts(ev, "etype", "uid")
      .orderBy("etype").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("click", 2L, 3L), ("view", 1L, 1L)))
  }

  test("groupingSets: exactly the requested subtotals, correct gid bits") {
    import spark.implicits._
    val d = Seq(("O", "HIGH", 1.0), ("O", "LOW", 2.0), ("F", "HIGH", 3.0))
      .toDF("st", "pr", "price")
    val out = Olap.groupingSetsStats(d,
        Seq(Seq("st", "pr"), Seq("st"), Seq("pr")), Seq("st", "pr"), "price")
      .orderBy("gid", "st", "pr").collect()
      .map(r => (Option(r.getString(0)).getOrElse("-"),
        Option(r.getString(1)).getOrElse("-"), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    // gid 0: (st,pr) cells; gid 1: (st) with pr nulled; gid 2: (pr) with
    // st nulled; NO grand-total row (that's what sets ((),...) would add)
    assert(out.toSeq == Seq(
      ("F", "HIGH", 1L, 3.0, 0L), ("O", "HIGH", 1L, 1.0, 0L),
      ("O", "LOW", 1L, 2.0, 0L),
      ("F", "-", 1L, 3.0, 1L), ("O", "-", 2L, 3.0, 1L),
      ("-", "HIGH", 2L, 4.0, 2L), ("-", "LOW", 1L, 2.0, 2L)))
  }

  test("topKStringAgg: k-first distinct values, sorted and joined") {
    import spark.implicits._
    val d = Seq(("a", "z"), ("a", "x"), ("a", "y"), ("a", "x"), ("a", "w"),
      ("b", "q")).toDF("g", "v")
    val out = Olap.topKStringAgg(d, "g", "v", k = 3).orderBy("g").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "w,x,y"), ("b", "q")))
    intercept[IllegalArgumentException](Olap.topKStringAgg(d, "g", "v", 0))
  }

  test("momentStats: exact cent-quantized mean and population variance") {
    import spark.implicits._
    // values 1.00, 2.00, 3.00 -> cents 100,200,300: mean 200, var 6666.6667
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0))
      .toDF("g", "v")
    val out = Olap.momentStats(d, "g", "v").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 3L, 200.0, 6666.6667), ("b", 1L, 500.0, 0.0)))
  }

  test("modeStats: most frequent wins, count ties break by value") {
    import spark.implicits._
    val d = Seq(("g1", "b"), ("g1", "b"), ("g1", "a"),
      ("g2", "z"), ("g2", "y")).toDF("g", "v")
    val out = Olap.modeStats(d, "g", "v").orderBy("g").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // g2: z and y tie at 1 -> y wins by value order
    assert(out.toSeq == Seq(("g1", "b", 2L), ("g2", "y", 1L)))
  }

  test("corrStats: perfect +/- correlation exact, zero variance -> null") {
    import spark.implicits._
    val d = Seq(
      ("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 30.0),
      ("down", 1.0, 30.0), ("down", 2.0, 20.0), ("down", 3.0, 10.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0)
    ).toDF("g", "x", "y")
    val out = Olap.corrStats(d, "g", "x", "y").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(out(0)._1 == "down" && out(0)._3 == -1.0)
    assert(out(1)._1 == "flat" && out(1)._3.isNaN)
    assert(out(2)._1 == "up" && out(2)._3 == 1.0)
  }

  test("moment states over disjoint slices merge to the full recompute") {
    import spark.implicits._
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 7.0))
      .toDF("g", "v")
    val full = Olap.momentStats(d, "g", "v").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val s1 = Olap.momentState(d.limit(2), "g", "v")
    val s2 = Olap.momentState(d.exceptAll(d.limit(2)), "g", "v")
    val merged = Olap.finalizeMoments(
        Olap.mergeMomentStates(Seq(s1, s2), "g"), "g")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(merged == full)
  }

  test("argExtremes: first/latest id per group, id tie-break on equal ts") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = Seq(
      (1L, 11L, ts("2024-01-02 00:00:00")),
      (1L, 12L, ts("2024-01-01 00:00:00")),
      // group 2: identical timestamps — the padded key must break the
      // tie by id, so first=21, last=23 on every run
      (2L, 23L, ts("2024-01-05 00:00:00")),
      (2L, 21L, ts("2024-01-05 00:00:00")),
      (2L, 22L, ts("2024-01-05 00:00:00"))
    ).toDF("g", "id", "t")
    val out = Olap.argExtremes(d, "g", "id", "t").orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 12L, 11L, "2024-01-02 00:00:00"),
      (2L, 3L, 21L, 23L, "2024-01-05 00:00:00")))
  }
}
