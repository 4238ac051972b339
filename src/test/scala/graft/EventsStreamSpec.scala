package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming shapes (readStream → transform → memory sink):
  * watermarked windowed aggregation and stateful sessionization. */
class EventsStreamSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hourlyCounts over a memory stream matches the batch expectation") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF.toDF("ts", "event_type", "value")
    val q = EventsStream.hourlyCounts(df)
      .writeStream.format("memory").queryName("hc")
      .outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:55:00"), "click", 2.0),
        (ts("2024-01-01 11:05:00"), "view", 3.0))
      q.processAllAvailable()
      val r = spark.table("hc").orderBy("hour", "event_type").collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3))).toSeq
      assert(r == Seq(
        ("2024-01-01 10:00:00", "click", 2L, 3.0),
        ("2024-01-01 11:00:00", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("dedupKeys: duplicates across micro-batches emit once (real state)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF.toDF("ts", "user_id", "event_type")
    val q = EventsStream.dedupKeys(df)
      .writeStream.format("memory").queryName("ddk")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 10:05:00"), 1L, "click"),
        (ts("2024-01-01 10:20:00"), 1L, "click"), // in-batch duplicate
        (ts("2024-01-01 10:30:00"), 2L, "view"))
      q.processAllAvailable()
      // a LATER batch repeats a key: only cross-batch STATE can drop it
      // (the batch-DISTINCT oracle cannot distinguish this case)
      mem.addData((ts("2024-01-01 10:45:00"), 1L, "click"),
        (ts("2024-01-01 11:05:00"), 1L, "click")) // new hour -> new key
      q.processAllAvailable()
      val r = spark.table("ddk").orderBy("hour", "user_id").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getString(2))).toSeq
      assert(r == Seq(
        ("2024-01-01 10:00:00", 1L, "click"),
        ("2024-01-01 10:00:00", 2L, "view"),
        ("2024-01-01 11:00:00", 1L, "click")))
    } finally q.stop()
  }

  test("sessionize: closed sessions emitted, open session held in state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStream.Evt]
    mem.addData(
      EventsStream.Evt(1L, ts("2024-01-01 10:00:00"), 1.0),
      EventsStream.Evt(1L, ts("2024-01-01 10:10:00"), 1.0),
      EventsStream.Evt(1L, ts("2024-01-01 11:30:00"), 1.0))
    // AvailableNow, not processAllAvailable: ProcessingTimeTimeout state
    // makes the engine keep scheduling no-data micro-batches (processing
    // time always advances), so a running query never quiesces —
    // processAllAvailable would hang. AvailableNow drains the pending data
    // and self-terminates.
    val q = EventsStream.sessionize(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000L), "query did not drain in time")
      val r = spark.table("sess").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq
      // the 10:00-10:10 session closed when 11:30 arrived (gap 80 min);
      // the 11:30 session is still open in state, not emitted
      assert(r == Seq((1L, 2L)))
    } finally q.stop()
  }

  test("viewToClickJoin: pairs within the gap, across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF.toDF("ts", "user_id", "event_type")
      .select(col("user_id"), col("ts"), col("event_type"))
    val q = EventsStream.viewToClickJoin(df, gapMinutes = 5)
      .writeStream.format("memory").queryName("vcj")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 10:00:00"), 1L, "view"),
        (ts("2024-01-01 10:03:00"), 1L, "click"),  // in gap -> pair
        (ts("2024-01-01 10:09:00"), 1L, "click"),  // past gap -> no pair
        (ts("2024-01-01 10:00:00"), 2L, "click"))  // other user -> no pair
      q.processAllAvailable()
      // a click in a LATER batch joins a buffered view: real join state
      mem.addData((ts("2024-01-01 10:04:00"), 1L, "click"))
      q.processAllAvailable()
      val r = spark.table("vcj").orderBy("click_t").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSeq
      assert(r == Seq(
        (1L, "2024-01-01 10:00:00", "2024-01-01 10:03:00"),
        (1L, "2024-01-01 10:00:00", "2024-01-01 10:04:00")))
    } finally q.stop()
  }

  test("viewToClickJoinOuter: null rows emit ONLY after the watermark passes the bound") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF.toDF("ts", "user_id", "event_type")
      .select(col("user_id"), col("ts"), col("event_type"))
    val q = EventsStream.viewToClickJoinOuter(df, gapMinutes = 5)
      .writeStream.format("memory").queryName("vcjo")
      .outputMode("append").start()
    def rows() = spark.table("vcjo")
      .orderBy(col("user_id"), col("view_t"),
        col("click_t").asc_nulls_first)
      .collect()
      .map(x => (x.getLong(0), x.getString(1), Option(x.getString(2))))
      .toSeq
    try {
      // u1's view matches; u2's view has NO click in its window
      mem.addData((ts("2024-01-01 10:00:00"), 1L, "view"),
        (ts("2024-01-01 10:03:00"), 1L, "click"),
        (ts("2024-01-01 10:00:00"), 2L, "view"))
      q.processAllAvailable()
      // matched pair emits; the unmatched view is PENDING — the
      // watermark (max event time, lateness 0) is 10:03, still inside
      // u2's [10:00, 10:05] window, so emitting NULL now would be wrong
      assert(rows() == Seq(
        (1L, "2024-01-01 10:00:00", Some("2024-01-01 10:03:00"))))
      // a later event pushes the watermark past the bound -> the null
      // row releases (and the new view is itself pending)
      mem.addData((ts("2024-01-01 10:30:00"), 3L, "view"),
        (ts("2024-01-01 10:30:00"), 3L, "click"))
      q.processAllAvailable()
      assert(rows() == Seq(
        (1L, "2024-01-01 10:00:00", Some("2024-01-01 10:03:00")),
        (2L, "2024-01-01 10:00:00", None),
        (3L, "2024-01-01 10:30:00", Some("2024-01-01 10:30:00"))))
    } finally q.stop()
  }
}
