package graft

import graft.ext.Events
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 events: JSON props, tumbling windows, sessionization,
  * broadcast joins. */
class EventsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val events = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.5, """{"k": 7}"""),
      (2L, ts("2024-01-01 10:10:00"), 100L, "click", 2.5, """{"k": 8}"""),
      (3L, ts("2024-01-01 11:05:00"), 100L, "view",  1.0, """{"k": 9}"""),
      (4L, ts("2024-01-01 10:20:00"), 200L, "error", 4.0, """{"j": 1}"""),
      (5L, ts("2024-01-01 10:59:59"), 200L, "click", 0.5, """{"k": 2}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("jsonProps extracts typed values; missing key is null") {
    val r = Events.jsonProps(events).orderBy("event_id").collect()
    assert(r.map(x => if (x.isNullAt(2)) -1L else x.getLong(2)).toSeq ==
      Seq(7L, 8L, 9L, -1L, 2L))
  }

  test("outliers: the spike is flagged, the bulk is not; BigInt-exact") {
    import spark.implicits._
    val rows = ((1L to 20L).map(i => (i, "g", 1.0 + (i % 3) * 0.1)) :+
      ((21L, "g", 250.0)) :+ ((22L, "h", 5.0))).toSeq
    val df = rows.toDF("event_id", "event_type", "value")
    val got = Events.outliers(df, "event_type", "value", sigmas = 3)
      .collect().map(_.getLong(0)).toSet
    // replicate the cleared-denominator test with BigInt (no precision cap)
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val vs = g.map(r => BigInt(math.floor(r._3 * 100 + 0.5).toLong))
      val (n, sv, svv) = (BigInt(vs.length), vs.sum, vs.map(v => v * v).sum)
      g.zip(vs).collect { case ((id, _, _), v)
        if (n * v - sv).pow(2) > 9 * (n * svv - sv * sv) => id }
    }.toSet
    assert(got == want && got == Set(21L)) // only the 250.0 spike
  }

  test("outliers: zero-variance group flags nothing") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, "g", 7.0)).toDF("event_id", "event_type", "value")
    assert(Events.outliers(df, "event_type", "value").count() == 0L)
  }

  test("madOutliers: robust where the z-score drowns — and hand-exact") {
    import spark.implicits._
    // 9 values at ~1.0 and TWO huge spikes: the spikes inflate sigma so
    // 3-sigma flags NEITHER, while the median/MAD flag both
    val rows = (1L to 9L).map(i => (i, "g", 1.0 + (i % 3) * 0.01)) ++
      Seq((10L, "g", 500.0), (11L, "g", 510.0))
    val df = rows.toDF("event_id", "event_type", "value")
    assert(Events.outliers(df, "event_type", "value", sigmas = 3)
      .count() == 0L)
    val mad = Events.madOutliers(df, "event_type", "value", k = 5)
      .collect().map(_.getLong(0)).toSet
    // med = 101 (cents), ad2 of the bulk <= 2, mad4 = 4; spikes ad2 ~ 1e5
    assert(mad == Set(10L, 11L))
  }

  test("madOutliers: even group, doubled-median arithmetic is exact") {
    import spark.implicits._
    // values 1,2,3,10 (cents 100,200,300,1000): med2 = 500 (median 2.5)
    // ad2: |200-500|=300, |400-500|=100, |600-500|=100, |2000-500|=1500
    // sorted ad2: 100,100,300,1500 -> mad4 = 100+300 = 400 (MAD 1.0)
    // k=3: flag 2*ad2 > 1200 -> only the 10.0 row
    val df = Seq((1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0),
      (4L, "g", 10.0)).toDF("event_id", "event_type", "value")
    val got = Events.madOutliers(df, "event_type", "value", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((4L, 1000L)))
  }

  test("madOutliers: zero MAD flags every deviating row, not nothing") {
    import spark.implicits._
    // >half identical -> MAD = 0: any deviation is infinitely many MADs
    val df = (Seq.fill(6)(7.0) :+ 7.01).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }
      .toDF("event_id", "event_type", "value")
    val got = Events.madOutliers(df, "event_type", "value", k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(6L))
  }

  test("hourly: tumbling window counts and exact decimal-accumulated sums") {
    val r = Events.hourly(events).orderBy("hour", "event_type").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3))).toSeq
    assert(r == Seq(
      ("2024-01-01 10:00:00", "click", 3L, 4.5),
      ("2024-01-01 10:00:00", "error", 1L, 4.0),
      ("2024-01-01 11:00:00", "view",  1L, 1.0)))
  }

  test("sessions: gap > 30 min starts a new session per user") {
    val r = Events.sessions(events, gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    // user 100: events at 10:00, 10:10 (one session), 11:05 (gap 55min -> new)
    // user 200: 10:20, 10:59:59 (gap 39:59 -> two sessions)
    assert(r == Seq((100L, 1L, 2L), (100L, 2L, 1L), (200L, 1L, 1L), (200L, 2L, 1L)))
  }

  test("sessions: boundary gap of exactly 30 min stays in-session") {
    import spark.implicits._
    val two = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0, "{}"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "a", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Events.sessions(two, 30).count() == 1)
  }

  test("enrichCustomer: two broadcast dim hops") {
    import spark.implicits._
    val cust = Seq((1L, "Alice", 10), (2L, "Bo", 20)).toDF("c_custkey", "c_name", "c_nationkey")
    val nat = Seq((10, "FRANCE", 1), (20, "PERU", 2)).toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((1, "EUROPE"), (2, "AMERICA")).toDF("r_regionkey", "r_name")
    val r = Events.enrichCustomer(cust, nat, reg).orderBy("c_custkey").collect()
      .map(x => (x.getLong(0), x.getString(2), x.getString(3))).toSeq
    assert(r == Seq((1L, "FRANCE", "EUROPE"), (2L, "PERU", "AMERICA")))
    // plan really broadcasts (no shuffle join for the dims)
    val plan = Events.enrichCustomer(cust, nat, reg)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("transitions: per-user lag pairs, cross-user pairs never counted") {
    val r = Events.transitions(events).orderBy("prev_type", "next_type")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
      .toSeq
    // user 100 (time order): click,click,view -> (click,click),(click,view)
    // user 200: error,click -> (error,click); no pair spans users
    assert(r == Seq(("click", "click", 1L), ("click", "view", 1L),
      ("error", "click", 1L)))
  }

  test("hourlyGrowth: per-type lag deltas; first hour stays null") {
    val r = Events.hourlyGrowth(events).orderBy("event_type", "hour")
      .collect().map(x => (x.getString(0).substring(11, 13), x.getString(1),
        x.getLong(2), if (x.isNullAt(3)) null else x.getLong(3)))
    // clicks: 10:00 has 3 (two user-100 + one user-200), 11:00 none;
    // view 11:00 first -> null delta; error 10:00 first -> null delta
    assert(r.toSeq == Seq(("10", "click", 3L, null), ("10", "error", 1L, null),
      ("11", "view", 1L, null)))
  }

  test("hourlyGrowth: delta and pct between consecutive hours") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 10:30:00"), 2L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 3L, "click", 0.0, "{}"),
      (4L, ts("2024-01-01 11:10:00"), 4L, "click", 0.0, "{}"),
      (5L, ts("2024-01-01 11:20:00"), 5L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.hourlyGrowth(ev).orderBy("hour").collect()
      .map(x => (x.getLong(2), if (x.isNullAt(3)) -99L else x.getLong(3),
        if (x.isNullAt(4)) -99.0 else x.getDouble(4)))
    assert(r.toSeq == Seq((2L, -99L, -99.0), (3L, 1L, 50.0)))
  }

  test("newVsReturning: first-seen day counts as new, later days returning") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "c", 0.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "c", 0.0, "{}"), // same day dup
      (3L, ts("2024-01-01 10:00:00"), 2L, "c", 0.0, "{}"),
      (4L, ts("2024-01-02 10:00:00"), 1L, "c", 0.0, "{}"), // returning
      (5L, ts("2024-01-02 10:00:00"), 3L, "c", 0.0, "{}")  // new on day 2
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.newVsReturning(ev).orderBy("day").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("2024-01-01", 2L, 2L, 0L),
      ("2024-01-02", 2L, 1L, 1L)))
  }

  test("stickiness: trailing-window distinct via contribution explode") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "c", 0.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 2L, "c", 0.0, "{}"),
      (3L, ts("2024-01-02 10:00:00"), 1L, "c", 0.0, "{}"),
      (4L, ts("2024-01-04 10:00:00"), 3L, "c", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.stickiness(ev, windowDays = 3).orderBy("day").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // day1: dau 2, mau(window d1) = 2; day2: dau 1, mau {1,2} = 2;
    // day4: dau 1, mau over d2-d4 = {1 (active d2), 3} = 2
    assert(r.toSeq == Seq(
      ("2024-01-01", 2L, 2L, 1000L),
      ("2024-01-02", 1L, 2L, 500L),
      ("2024-01-04", 1L, 2L, 500L)))
  }

  test("cumulativeUsers: first-seen counts accumulate; zero-new days kept") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "c", 0.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 2L, "c", 0.0, "{}"),
      (3L, ts("2024-01-02 10:00:00"), 1L, "c", 0.0, "{}"), // returning only
      (4L, ts("2024-01-03 10:00:00"), 3L, "c", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.cumulativeUsers(ev).orderBy("day").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("2024-01-01", 2L, 2L), ("2024-01-02", 0L, 2L),
      ("2024-01-03", 1L, 3L)))
  }

  test("interArrival: exact micro gaps per user, single-event users dropped") {
    import spark.implicits._
    val ev = events.union(Seq(
      (6L, ts("2024-01-01 12:00:00"), 300L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = Events.interArrival(ev).orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toSeq
    // user 100: gaps 10 min and 55 min; user 200: one 39:59 gap;
    // user 300 has a single event -> no row; the mean is the exact
    // integer (10^4 * sum) div count
    val tenMin = 600L * 1000000
    val g2 = 3300L * 1000000
    val u200 = 2399L * 1000000
    assert(r == Seq(
      (100L, 3L, 10000L * (tenMin + g2) / 2, tenMin, g2),
      (200L, 2L, 10000L * u200, u200, u200)))
    // dirty-data shape: one epoch-zero timestamp gives a ~54-year gap
    // whose naive 10^4 * sum overflows Long — the split identity must
    // still produce the exact floor(10^4 * sum / n)
    val dirty = Seq(
      (10L, java.sql.Timestamp.valueOf("1970-01-01 00:00:00"), 9L,
        "view", 1.0, "{}"),
      (11L, ts("2024-01-01 00:00:00"), 9L, "view", 1.0, "{}"),
      (12L, ts("2024-01-01 00:00:07"), 9L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val big = Events.interArrival(dirty).head()
    // gap from the actual Timestamp difference (JVM-timezone-proof)
    val gap1 = (ts("2024-01-01 00:00:00").getTime -
      java.sql.Timestamp.valueOf("1970-01-01 00:00:00").getTime) * 1000L
    val sum = gap1 + 7000000L
    assert(BigInt(10000) * BigInt(sum) > BigInt(Long.MaxValue)) // the trap
    val want = BigInt(10000) * BigInt(sum) / 2
    assert(BigInt(big.getLong(2)) == want)
  }

  test("retention: cohort = first active day, offsets count distinct users") {
    import spark.implicits._
    val ev = Seq(
      // user 1: active day 0 (twice — must count once) and day 2
      (1L, ts("2024-01-01 09:00:00"), 1L),
      (2L, ts("2024-01-01 23:00:00"), 1L),
      (3L, ts("2024-01-03 10:00:00"), 1L),
      // user 2: joins a day later, active that day only
      (4L, ts("2024-01-02 08:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val r = Events.retention(ev, "user_id", "ts")
      .orderBy("cohort_day", "day_offset").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq(("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  test("revenueByNation: quantized-exact revenue through three joins") {
    import spark.implicits._
    val li = Seq((1L, 100.0, 0.1), (1L, 50.0, 0.0), (2L, 10.0, 0.5))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Seq((1L, 7L), (2L, 8L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((7L, 30), (8L, 30)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((30, "PERU")).toDF("n_nationkey", "n_name")
    val r = Events.revenueByNation(li, ord, cust, nat).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
    assert(r == Seq(("PERU", 3L, 90.0 + 50.0 + 5.0)))
  }

  test("revenueBySegment: decimal-exact aggregation") {
    import spark.implicits._
    val orders = Seq((1L, 1L, 10.10), (2L, 1L, 20.20), (3L, 2L, 5.05))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val r = Events.revenueBySegment(orders, cust).orderBy("c_mktsegment")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
    assert(r == Seq(("BUILDING", 2L, 30.30), ("MACHINERY", 1L, 5.05)))
  }
}
