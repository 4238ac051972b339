package graft

import graft.ext.AsOf
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of join semantics: inclusive time boundary, deterministic tie-break,
  * left-outer nulls, and the no-join-operator plan shape. */
class AsOfSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val left = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, 10L, ts("2024-01-05 00:00:00")), // after two orders
      Row(2L, 10L, ts("2024-01-02 00:00:00")), // exactly AT an order time
      Row(3L, 10L, ts("2024-01-01 00:00:00")), // before every order
      Row(4L, 20L, ts("2024-01-05 00:00:00")), // key with tied-time orders
      Row(5L, 30L, ts("2024-01-05 00:00:00")) // key with no orders at all
    )),
    StructType(Seq(StructField("event_id", LongType),
      StructField("user_id", LongType), StructField("ts", TimestampType))))

  private lazy val right = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(100L, 10L, ts("2024-01-02 00:00:00"), 11.0),
      Row(101L, 10L, ts("2024-01-04 00:00:00"), 22.0),
      Row(200L, 20L, ts("2024-01-03 00:00:00"), 33.0),
      Row(201L, 20L, ts("2024-01-03 00:00:00"), 44.0) // same instant as 200
    )),
    StructType(Seq(StructField("o_id", LongType),
      StructField("cust", LongType), StructField("odate", TimestampType),
      StructField("price", DoubleType))))

  private def run() =
    AsOf.asofJoin(left, right, "user_id", "cust", "ts", "odate",
        valueCols = Seq("o_id", "price"), tieBreak = "o_id")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))

  test("picks latest at-or-before; boundary is inclusive; no match -> null") {
    val rows = run()
    assert(rows(0) == ((1L, Some(101L), Some(22.0)))) // latest of the two
    assert(rows(1) == ((2L, Some(100L), Some(11.0)))) // odate == ts matches
    assert(rows(2) == ((3L, None, None))) // before every order
    assert(rows(4) == ((5L, None, None))) // key never appears on the right
  }

  test("simultaneous right rows: largest tie-break wins, value cols agree") {
    val rows = run()
    // orders 200/201 share (key, time); 201 has the larger o_id, so BOTH
    // carried columns must come from 201 — never a mix of the two rows
    assert(rows(3) == ((4L, Some(201L), Some(44.0))))
  }

  test("NULL in a value column of the winning row must not tear columns") {
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10L, ts("2024-01-05 00:00:00")))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType))))
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(100L, 10L, ts("2024-01-02 00:00:00"), java.lang.Double.valueOf(11.0)),
        Row(101L, 10L, ts("2024-01-04 00:00:00"), null: java.lang.Double))),
      StructType(Seq(StructField("o_id", LongType),
        StructField("cust", LongType), StructField("odate", TimestampType),
        StructField("price", DoubleType))))
    val out = AsOf.asofJoin(l, r, "user_id", "cust", "ts", "odate",
      valueCols = Seq("o_id", "price"), tieBreak = "o_id").head()
    // the latest row (101) wins for BOTH columns: key 101, price NULL —
    // never key 101 with the stale price 11.0 from row 100
    assert(out.getLong(3) == 101L)
    assert(out.isNullAt(4))
  }

  test("NULL right keys/times never match; NULL left time yields NULL") {
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10L, ts("2024-01-05 00:00:00")),
        Row(2L, 10L, null: java.sql.Timestamp), // null event time
        Row(3L, null: java.lang.Long, ts("2024-01-05 00:00:00")))), // null key
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType))))
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(100L, 10L, null: java.sql.Timestamp, 1.0), // null right time
        Row(101L, null: java.lang.Long, ts("2024-01-01 00:00:00"), 2.0))), // null right key
      StructType(Seq(StructField("o_id", LongType),
        StructField("cust", LongType), StructField("odate", TimestampType),
        StructField("price", DoubleType))))
    val rows = AsOf.asofJoin(l, r, "user_id", "cust", "ts", "odate",
        valueCols = Seq("o_id"), tieBreak = "o_id")
      .orderBy("event_id").collect()
    assert(rows.length == 3) // left-outer: every left row survives
    assert(rows.forall(_.isNullAt(3))) // and none of them matched
  }

  test("forward as-of: earliest at-or-after, inclusive, smallest tie wins") {
    val rows = AsOf.asofJoinForward(left, right, "user_id", "cust", "ts",
        "odate", valueCols = Seq("o_id", "price"), tieBreak = "o_id")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
    assert(rows(0) == ((1L, None, None))) // after every order: no match
    assert(rows(1) == ((2L, Some(100L), Some(11.0)))) // odate == ts matches
    assert(rows(2) == ((3L, Some(100L), Some(11.0)))) // earliest of the two
    assert(rows(3) == ((4L, None, None))) // probe is after the tied orders
    assert(rows(4) == ((5L, None, None)))
    // tie case needs a probe BEFORE the tied instant: orders 200/201
    // share (key 20, 2024-01-03); the SMALLEST o_id wins forward, and
    // both carried columns come from that one row
    val probe = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(9L, 20L, ts("2024-01-01 00:00:00")))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType))))
    val tied = AsOf.asofJoinForward(probe, right, "user_id", "cust", "ts",
      "odate", valueCols = Seq("o_id", "price"), tieBreak = "o_id").head()
    assert(tied.getLong(3) == 200L && tied.getDouble(4) == 33.0)
  }

  test("forward as-of matches a brute-force model on random data") {
    val rnd = new scala.util.Random(19L)
    def t(day: Int) = ts(f"2024-01-${1 + day}%02d 00:00:00")
    val ls = (1L to 120L).map(i => (i, (rnd.nextInt(5) + 1).toLong,
      t(rnd.nextInt(20))))
    val rs = (1L to 90L).map(i => (i, (rnd.nextInt(5) + 1).toLong,
      t(rnd.nextInt(20)), rnd.nextInt(100).toDouble))
    import spark.implicits._
    val got = AsOf.asofJoinForward(
        ls.toDF("event_id", "user_id", "ts"),
        rs.toDF("o_id", "cust", "odate", "price"),
        "user_id", "cust", "ts", "odate",
        valueCols = Seq("o_id"), tieBreak = "o_id")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)))).toSeq
    val want = ls.map { case (id, k, lt) =>
      val ms = rs.filter(r => r._2 == k && !r._3.before(lt))
      (id, if (ms.isEmpty) None
           else Some(ms.minBy(r => (r._3.getTime, r._1))._1))
    }
    assert(got == want)
  }

  test("forward as-of: a NULL tie-break loses to any real tie, like backward") {
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 20L, ts("2024-01-01 00:00:00")))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType))))
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(java.lang.Long.valueOf(5L), 20L, ts("2024-01-03 00:00:00"), 1.0),
        Row(null: java.lang.Long, 20L, ts("2024-01-03 00:00:00"), 2.0))),
      StructType(Seq(StructField("o_id", LongType),
        StructField("cust", LongType), StructField("odate", TimestampType),
        StructField("price", DoubleType))))
    val out = AsOf.asofJoinForward(l, r, "user_id", "cust", "ts", "odate",
      valueCols = Seq("o_id", "price"), tieBreak = "o_id").head()
    // under plain desc the NULL-tie row sorted LAST and won; the
    // contract (smallest real tie-break, mirroring backward) wants 5
    assert(out.getLong(3) == 5L && out.getDouble(4) == 1.0)
  }

  test("forward as-of: NULL left time matches nothing (desc nulls-first)") {
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10L, null: java.sql.Timestamp))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType))))
    val out = AsOf.asofJoinForward(l, right, "user_id", "cust", "ts",
      "odate", valueCols = Seq("o_id"), tieBreak = "o_id").head()
    assert(out.isNullAt(3))
  }

  test("plan is a single-shuffle window merge — no join operator at all") {
    val plan = AsOf.asofJoin(left, right, "user_id", "cust", "ts", "odate",
      valueCols = Seq("o_id"), tieBreak = "o_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window"), plan.take(800))
    // exactly one exchange: the hash partition on the key for the window
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan.take(1200))
  }

  test("nearest direction: min |dt|, ties prefer backward, one shuffle") {
    val out = AsOf.asofJoinNearest(left, right, "user_id", "cust",
        "ts", "odate", valueCols = Seq("o_id", "price"),
        tieBreak = "o_id")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString)))
    assert(out.toSeq == Seq(
      (1L, Some("101")), // Jan 5: backward Jan 4 (1d) beats nothing fwd
      (2L, Some("100")), // exactly AT Jan 2: zero-distance backward
      (3L, Some("100")), // Jan 1: only forward (Jan 2) exists
      (4L, Some("201")), // Jan 5 vs two Jan 3 orders: backward, max tie
      (5L, None))) // no orders at all
    // equal |dt| both directions prefers backward: a probe at Jan 3
    // sits exactly between Jan 2 and Jan 4 for key 10
    val mid = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(9L, 10L, ts("2024-01-03 00:00:00")))),
      left.schema)
    val got = AsOf.asofJoinNearest(mid, right, "user_id", "cust",
        "ts", "odate", valueCols = Seq("o_id"), tieBreak = "o_id")
      .head().getLong(3)
    assert(got == 100L) // the backward Jan 2 order, not the Jan 4 one
    // the plan shape holds: both frames ride ONE exchange
    val plan = AsOf.asofJoinNearest(left, right, "user_id", "cust",
        "ts", "odate", valueCols = Seq("o_id"), tieBreak = "o_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(1200))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan.take(1200))
  }

  test("tolerance: matches beyond the staleness budget yield NULL") {
    val day = 86400L * 1000000L
    val rows = AsOf.asofJoin(left, right, "user_id", "cust", "ts", "odate",
        valueCols = Seq("o_id", "price"), tieBreak = "o_id",
        toleranceMicros = Some(day)) // 1 day
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3))))
    // event 1 (Jan 5): latest order Jan 4 — exactly 1 day, in budget
    assert(rows(0) == ((1L, Some(101L))))
    // event 2 (Jan 2): zero distance, in budget
    assert(rows(1) == ((2L, Some(100L))))
    // event 4 (Jan 5): latest order Jan 3 — 2 days, OVER budget -> NULL
    assert(rows(3) == ((4L, None)))
    // forward mirror: event 3 (Jan 1) -> Jan 2 order is 1 day ahead
    val fwd = AsOf.asofJoinForward(left, right, "user_id", "cust", "ts",
        "odate", valueCols = Seq("o_id"), tieBreak = "o_id",
        toleranceMicros = Some(day))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3))))
    assert(fwd(2) == ((3L, Some(100L)))) // 1 day ahead, in budget
    assert(fwd(1) == ((2L, Some(100L)))) // exact, in budget
    // tighten to half a day: both drop out
    val tight = AsOf.asofJoinForward(left, right, "user_id", "cust", "ts",
        "odate", valueCols = Seq("o_id"), tieBreak = "o_id",
        toleranceMicros = Some(day / 2))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3))))
    assert(tight(2) == ((3L, None)))
    assert(tight(1) == ((2L, Some(100L)))) // exact match distance 0 stays
  }

  test("allowExactMatches = false: the boundary becomes strict") {
    // event 2 sits exactly AT order 100's time: inclusive matches it,
    // strict must fall back to nothing earlier (there is none)
    val strict = AsOf.asofJoin(left, right, "user_id", "cust", "ts",
        "odate", valueCols = Seq("o_id"), tieBreak = "o_id",
        allowExactMatches = false)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3))))
    assert(strict(1) == ((2L, None)))
    assert(strict(0) == ((1L, Some(101L)))) // strictly-earlier unaffected
    // forward strict: event 2's exact order excluded -> next is Jan 4
    val fstrict = AsOf.asofJoinForward(left, right, "user_id", "cust",
        "ts", "odate", valueCols = Seq("o_id"), tieBreak = "o_id",
        allowExactMatches = false)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3))))
    assert(fstrict(1) == ((2L, Some(101L))))
  }

  test("nearest: tolerance applies per direction BEFORE the pick; strict excludes exact") {
    val day = 86400L * 1000000L
    // probe at Jan 3 for key 10: backward Jan 2 (1d), forward Jan 4 (1d).
    // With tolerance covering both, backward wins the equal-distance tie.
    val mid = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(9L, 10L, ts("2024-01-03 00:00:00")))), left.schema)
    val both = AsOf.asofJoinNearest(mid, right, "user_id", "cust", "ts",
      "odate", valueCols = Seq("o_id"), tieBreak = "o_id",
      toleranceMicros = Some(day)).head()
    assert(both.getLong(3) == 100L)
    // zero tolerance: neither candidate within budget -> NULL
    val none = AsOf.asofJoinNearest(mid, right, "user_id", "cust", "ts",
      "odate", valueCols = Seq("o_id"), tieBreak = "o_id",
      toleranceMicros = Some(0L)).head()
    assert(none.isNullAt(3))
    // strict: a zero-distance match (event 2 at Jan 2) is excluded from
    // BOTH directions; nearest falls to the Jan 4 order (2 days fwd)
    val strict = AsOf.asofJoinNearest(left, right, "user_id", "cust",
        "ts", "odate", valueCols = Seq("o_id"), tieBreak = "o_id",
        allowExactMatches = false)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3))))
    assert(strict(1) == ((2L, Some(101L))))
  }

  test("differential: tolerance only NULLs — in-budget rows equal the untolerated join") {
    val rnd = new scala.util.Random(41L)
    def t(day: Int) = ts(f"2024-01-${1 + day}%02d 00:00:00")
    import spark.implicits._
    val ls = (1L to 150L).map(i =>
      (i, (rnd.nextInt(6) + 1).toLong, t(rnd.nextInt(25))))
    val rs = (1L to 80L).map(i =>
      (i, (rnd.nextInt(6) + 1).toLong, t(rnd.nextInt(25)), rnd.nextDouble()))
    val l = ls.toDF("event_id", "user_id", "ts")
    val r = rs.toDF("o_id", "cust", "odate", "price")
    val tol = 3L * 86400L * 1000000L // 3 days
    val plain = AsOf.asofJoin(l, r, "user_id", "cust", "ts", "odate",
        valueCols = Seq("o_id"), tieBreak = "o_id")
      .orderBy("event_id").collect()
      .map(x => (x.getLong(0), x.getTimestamp(2), Option(x.get(3))))
    val withTol = AsOf.asofJoin(l, r, "user_id", "cust", "ts", "odate",
        valueCols = Seq("o_id"), tieBreak = "o_id",
        toleranceMicros = Some(tol))
      .orderBy("event_id").collect()
      .map(x => (x.getLong(0), Option(x.get(3))))
    val rTime = rs.map(x => x._1 -> x._3.getTime).toMap
    plain.zip(withTol).foreach { case ((id, lts, m), (id2, m2)) =>
      assert(id == id2)
      m match {
        case Some(oid) =>
          val inBudget =
            (lts.getTime - rTime(oid.asInstanceOf[Long])) * 1000L <= tol
          // within budget the tolerated join must return the SAME row;
          // over budget it must return NULL — never a different row
          assert(m2 == (if (inBudget) m else None), s"event $id")
        case None => assert(m2.isEmpty, s"event $id")
      }
    }
  }

  test("broadcast exec honors tolerance and strict boundary identically") {
    val day = 86400L * 1000000L
    val viaExec = graft.plans.AsOfPhys.asofJoinBroadcast(left, right,
        "user_id", "cust", "ts", "odate", valueCols = Seq("o_id"),
        tieBreak = "o_id", toleranceMicros = Some(day),
        allowExactMatches = false)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3))))
    val viaMerge = AsOf.asofJoin(left, right, "user_id", "cust", "ts",
        "odate", valueCols = Seq("o_id"), tieBreak = "o_id",
        toleranceMicros = Some(day), allowExactMatches = false)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3))))
    assert(viaExec.toSeq == viaMerge.toSeq)
    // and the strict+tolerated answer itself: event 2's exact match is
    // excluded, event 1 keeps its 1-day-old match, event 4 (2 days) drops
    assert(viaMerge.toSeq == Seq((1L, Some(101L)), (2L, None), (3L, None),
      (4L, None), (5L, None)))
  }
}
