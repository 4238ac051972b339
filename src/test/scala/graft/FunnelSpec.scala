package graft

import graft.ext.Funnel

/** Ordered funnel semantics: step order matters, ties admit, counts are
  * non-increasing. */
class FunnelSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val events = {
    import spark.implicits._
    Seq(
      // user 1 completes A -> B in order
      (1L, "A", ts("2024-01-01 00:00:00")),
      (1L, "B", ts("2024-01-01 00:01:00")),
      // user 2 does B BEFORE A: reaches stage 1 only
      (2L, "B", ts("2024-01-01 00:00:00")),
      (2L, "A", ts("2024-01-01 00:01:00")),
      // user 3: B at the exact same instant as A — >= admits it
      (3L, "A", ts("2024-01-01 00:02:00")),
      (3L, "B", ts("2024-01-01 00:02:00")),
      // user 4 never does A: contributes nowhere
      (4L, "B", ts("2024-01-01 00:00:00"))
    ).toDF("uid", "etype", "ets")
  }

  test("ordered reach: B-before-A does not count as stage 2") {
    val out = Funnel.stages(events, "uid", "etype", "ets", Seq("A", "B"))
      .orderBy("stage").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // stage 1: users 1,2,3 did A; stage 2: users 1,3 did B at/after their A
    assert(out == Seq((1L, "A", 3L), (2L, "B", 2L)))
  }

  test("a step nobody reaches still emits a zero row") {
    val out = Funnel.stages(events, "uid", "etype", "ets",
        Seq("A", "B", "missing"))
      .orderBy("stage").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L), (2L, 2L), (3L, 0L)))
  }

  test("counts are non-increasing across stages") {
    val counts = Funnel.stages(events, "uid", "etype", "ets", Seq("A", "B"))
      .orderBy("stage").collect().map(_.getLong(2)).toSeq
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
  }

  test("latency: completers only, exact micros from first A to its B") {
    val out = Funnel.latency(events, "uid", "etype", "ets", Seq("A", "B"))
      .orderBy("uid").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // user 1: A at 00:00, B at 00:01 -> 60s; user 3: same-instant B
    // admitted at 0 latency; users 2 and 4 never complete -> absent
    assert(out == Seq(
      (1L, "2024-01-01 00:00:00", 60L * 1000000),
      (3L, "2024-01-01 00:02:00", 0L)))
  }
}
