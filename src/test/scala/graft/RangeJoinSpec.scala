package graft

import graft.ext.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join: boundary semantics, bucket
  * spanning, and the no-cross-product plan shape. */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val points = {
    import spark.implicits._
    Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // == start: included
      (2L, 10L, ts("2024-01-01 00:09:59")), // inside
      (3L, 10L, ts("2024-01-01 00:10:00")), // == end: excluded (half-open)
      (4L, 99L, ts("2024-01-01 00:05:00")), // wrong key
      (5L, 10L, ts("2024-01-01 00:14:30"))  // inside the second window only
    ).toDF("pid", "p_key", "p_ts")
  }

  private lazy val intervals = {
    import spark.implicits._
    Seq(
      (100L, 10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      // crosses a 600s bucket edge (00:10) — emitted into both buckets,
      // but each matching point must still appear exactly once
      (200L, 10L, ts("2024-01-01 00:09:00"), ts("2024-01-01 00:19:00"))
    ).toDF("iid", "i_key", "i_start", "i_end")
  }

  test("boundary semantics: start inclusive, end exclusive, key respected") {
    val out = RangeJoin.pointInInterval(points, intervals,
        "p_key", "i_key", "p_ts", "i_start", "i_end", bucketSeconds = 600L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out == Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L),
      (5L, 200L)))
  }

  test("no duplicate matches for intervals spanning multiple buckets") {
    val out = RangeJoin.pointInInterval(points, intervals,
        "p_key", "i_key", "p_ts", "i_start", "i_end", bucketSeconds = 600L)
      .groupBy("pid", "iid").count().filter(col("count") > 1).count()
    assert(out == 0L)
  }

  test("tiny buckets (wide replication) give identical matches") {
    val out = RangeJoin.pointInInterval(points, intervals,
        "p_key", "i_key", "p_ts", "i_start", "i_end", bucketSeconds = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out == Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L),
      (5L, 200L)))
  }

  test("plan: hash equi-join on (key, bucket) — no nested-loop product") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        "p_key", "i_key", "p_ts", "i_start", "i_end", bucketSeconds = 600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("runaway interval replication fails loudly, not with an OOM") {
    import spark.implicits._
    val openEnded = Seq(
      (300L, 10L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"))
    ).toDF("iid", "i_key", "i_start", "i_end")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, openEnded,
        "p_key", "i_key", "p_ts", "i_start", "i_end",
        bucketSeconds = 600L, maxBucketsPerInterval = 10000L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("buckets")), e.toString.take(400))
  }

  test("working-name collisions are rejected loudly") {
    import spark.implicits._
    val bad = intervals.withColumnRenamed("iid", "__pb")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, bad,
        "p_key", "i_key", "p_ts", "i_start", "i_end")
    }
    assert(e.getMessage.contains("__pb"))
  }

  test("overlapping column names are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, points,
        "p_key", "p_key", "p_ts", "p_ts", "p_ts")
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
