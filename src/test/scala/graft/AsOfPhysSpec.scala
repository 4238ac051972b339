package graft

import graft.ext.AsOf
import graft.plans.{AsOfJoinExec, AsOfPhys}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The custom physical as-of operator (logical node + strategy +
  * broadcast-binary-search exec) must be plan-visibly custom, shuffle-free
  * on the probe side, and bit-identical to the merge-window compose. */
class AsOfPhysSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val left = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, 10L, ts("2024-01-05 00:00:00")),
      Row(2L, 10L, ts("2024-01-02 00:00:00")), // exactly AT an order time
      Row(3L, 10L, ts("2024-01-01 00:00:00")), // before every order
      Row(4L, 20L, ts("2024-01-05 00:00:00")), // tied-time orders
      Row(5L, 30L, ts("2024-01-05 00:00:00")), // key with no orders
      Row(6L, null, ts("2024-01-05 00:00:00")), // NULL key: left-outer null
      Row(7L, 10L, null) // NULL time: left-outer null
    )),
    StructType(Seq(StructField("event_id", LongType),
      StructField("user_id", LongType), StructField("ts", TimestampType))))

  private lazy val right = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(100L, 10L, ts("2024-01-02 00:00:00"), 11.0),
      Row(101L, 10L, ts("2024-01-04 00:00:00"), 22.0),
      Row(200L, 20L, ts("2024-01-03 00:00:00"), 33.0),
      Row(201L, 20L, ts("2024-01-03 00:00:00"), 44.0), // same instant as 200
      Row(300L, null, ts("2024-01-01 00:00:00"), 55.0), // NULL key: never matches
      Row(301L, 10L, null, 66.0) // NULL time: never matches
    )),
    StructType(Seq(StructField("o_id", LongType),
      StructField("cust", LongType), StructField("odate", TimestampType),
      StructField("price", DoubleType))))

  private def runPhys() =
    AsOfPhys.asofJoinBroadcast(left, right, "user_id", "cust", "ts", "odate",
        valueCols = Seq("o_id", "price"), tieBreak = "o_id")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))

  test("inclusive boundary, largest-tie wins, NULL key/time semantics") {
    val rows = runPhys()
    assert(rows(0) == ((1L, Some(101L), Some(22.0))))
    assert(rows(1) == ((2L, Some(100L), Some(11.0)))) // odate == ts matches
    assert(rows(2) == ((3L, None, None)))
    assert(rows(3) == ((4L, Some(201L), Some(44.0)))) // both cols from 201
    assert(rows(4) == ((5L, None, None)))
    assert(rows(5) == ((6L, None, None))) // NULL left key survives, no match
    assert(rows(6) == ((7L, None, None))) // NULL left time survives, no match
  }

  test("plan contains AsOfJoinExec and NO exchange on the probe side") {
    val df = AsOfPhys.asofJoinBroadcast(left, right, "user_id", "cust",
      "ts", "odate", valueCols = Seq("price"), tieBreak = "o_id")
    val plan = df.queryExecution.executedPlan
    val execs = plan.collect { case e: AsOfJoinExec => e }
    assert(execs.length == 1, s"expected one AsOfJoinExec in:\n$plan")
    // the probe (left) subtree must be exchange-free: the whole point of
    // the broadcast exec is that the fact side never shuffles
    val probeExchanges = execs.head.left.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(probeExchanges.isEmpty, s"probe side shuffled:\n${execs.head.left}")
  }

  test("differential vs the merge-window compose on randomized data") {
    val rnd = new scala.util.Random(20260814L)
    val base = ts("2024-01-01 00:00:00").getTime
    def randTs() = new java.sql.Timestamp(base + rnd.nextInt(1000) * 60000L)
    val lRows = (1L to 400L).map(i =>
      Row(i, rnd.nextInt(8).toLong, randTs()))
    val rRows = (1L to 300L).map(i =>
      Row(i, rnd.nextInt(8).toLong, randTs(), rnd.nextInt(100).toDouble))
    val l = spark.createDataFrame(spark.sparkContext.parallelize(lRows, 4),
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType))))
    val r = spark.createDataFrame(spark.sparkContext.parallelize(rRows, 3),
      StructType(Seq(StructField("o_id", LongType),
        StructField("cust", LongType), StructField("odate", TimestampType),
        StructField("price", DoubleType))))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").collect().map(row =>
        (row.getLong(0), Option(row.get(3)), Option(row.get(4)))).toSeq
    val phys = canon(AsOfPhys.asofJoinBroadcast(l, r, "user_id", "cust",
      "ts", "odate", valueCols = Seq("o_id", "price"), tieBreak = "o_id"))
    val merge = canon(AsOf.asofJoin(l, r, "user_id", "cust", "ts", "odate",
      valueCols = Seq("o_id", "price"), tieBreak = "o_id"))
    assert(phys == merge)
  }

  test("left-side filters push through the custom node; asof_* stay above") {
    val joined = AsOfPhys.asofJoinBroadcast(left, right, "user_id", "cust",
      "ts", "odate", valueCols = Seq("o_id", "price"), tieBreak = "o_id")
    val df = joined.where(col("event_id") > 2 && col("asof_price") > 20.0)
    val plan = df.queryExecution.executedPlan
    val exec = plan.collect { case e: AsOfJoinExec => e }.head
    // the event_id predicate must sit BELOW the exec on the probe side...
    val below = exec.left.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition.sql
    }
    assert(below.exists(_.contains("event_id")),
      s"probe-side filter not pushed below AsOfJoinExec:\n$plan")
    // ...and the produced-column predicate must NOT have been pushed
    assert(!below.exists(_.contains("asof_price")), s"illegal push:\n$plan")
    // semantics unchanged vs filtering the collected result
    val want = joined.collect().filter(r =>
      r.getLong(0) > 2 && !r.isNullAt(4) && r.getDouble(4) > 20.0)
      .map(_.getLong(0)).sorted.toSeq
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == want)
  }

  test("string keys hash and match identically to the compose") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rnd = new scala.util.Random(99L)
    val base = ts("2024-01-01 00:00:00").getTime
    def randTs() = new java.sql.Timestamp(base + rnd.nextInt(500) * 60000L)
    val keys = Seq("alpha", "beta", "gamma", "delta")
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 120L).map(i => Row(i, keys(rnd.nextInt(4)), randTs())), 3),
      StructType(Seq(StructField("event_id", LongType),
        StructField("k", StringType), StructField("ts", TimestampType))))
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 80L).map(i => Row(i, keys(rnd.nextInt(4)), randTs(),
          rnd.nextInt(50).toDouble)), 2),
      StructType(Seq(StructField("o_id", LongType),
        StructField("k", StringType), StructField("odate", TimestampType),
        StructField("price", DoubleType))))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").collect()
        .map(row => (row.getLong(0), Option(row.get(3)))).toSeq
    val phys = canon(AsOfPhys.asofJoinBroadcast(l, r, "k", "k", "ts",
      "odate", valueCols = Seq("price"), tieBreak = "o_id"))
    val merge = canon(graft.ext.AsOf.asofJoin(l, r, "k", "k", "ts",
      "odate", valueCols = Seq("price"), tieBreak = "o_id"))
    assert(phys == merge)
  }

  test("auto routing: broadcast exec under the cap, merge compose above") {
    val under = AsOfPhys.asofJoinAuto(left, right, "user_id", "cust", "ts",
      "odate", valueCols = Seq("price"), tieBreak = "o_id")
    assert(under.queryExecution.executedPlan
      .collect { case e: AsOfJoinExec => e }.nonEmpty)
    val over = AsOfPhys.asofJoinAuto(left, right, "user_id", "cust", "ts",
      "odate", valueCols = Seq("price"), tieBreak = "o_id",
      maxBuildRows = 1L)
    assert(over.queryExecution.executedPlan
      .collect { case e: AsOfJoinExec => e }.isEmpty)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").collect()
        .map(r => (r.getLong(0), Option(r.get(3)))).toSeq
    assert(canon(under) == canon(over)) // one answer, two plans
  }

  test("key-type mismatch fails loudly at build time") {
    val lInt = left.withColumn("user_id", col("user_id").cast("int"))
    val e = intercept[IllegalArgumentException] {
      AsOfPhys.asofJoinBroadcast(lInt, right, "user_id", "cust", "ts",
        "odate", valueCols = Seq("price"), tieBreak = "o_id")
    }
    assert(e.getMessage.contains("key types differ"))
  }
}
