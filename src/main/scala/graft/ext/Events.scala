package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators over the `events` table (TESTDATA.md):
  * JSON prop extraction, event-time tumbling windows, gap sessionization,
  * and broadcast dimension-join enrichment. The streaming (readStream)
  * versions of the window/session shapes live in
  * [[graft.streaming.EventsStream]].
  */
object Events {

  /** Per-group z-score outlier flagging with EXACT cross-engine
    * arithmetic — the anomaly probe of an events pipeline (fraud spikes,
    * instrumentation bugs, unit mixups), kept oracle-certifiable by never
    * touching a float: |v − μ| > kσ is squared and cleared of divisions
    * into the integer comparison
    *
    *   (n·v − sv)² > k²·(n·svv − sv²)
    *
    * over cent-quantized values (v = floor(value·100 + 0.5)), with the
    * products lifted to decimal(38,0) — a double σ would drift in the
    * last ulp and flip boundary rows between engines. Headroom: n·v and
    * the decimal squares hold to ~10¹⁹ row-count·cent products / 10³⁸
    * squared — beyond that, widen the quantization or shard the window.
    *
    * Plan: one partial-aggregated shuffle for the per-group moment sums
    * (3 longs per group), broadcast back (group cardinality is tiny), and
    * the flag itself is a scan-side filter — the event mass never
    * shuffles, at any scale. */
  def outliers(events: DataFrame, groupCol: String, valueCol: String,
               sigmas: Int = 3): DataFrame = {
    require(sigmas > 0, "sigmas must be positive")
    val q = events.select(col("event_id"), col(groupCol),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("value_c"))
    val stats = q.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(col("value_c")).as("__sv"),
        sum(col("value_c") * col("value_c")).as("__svv"))
    val dec = "decimal(19,0)"
    val root = (col("__n") * col("value_c") - col("__sv")).cast(dec)
    val lhs = root * root
    val rhs = lit(sigmas.toLong * sigmas) *
      (col("__n").cast(dec) * col("__svv") - col("__sv").cast(dec) * col("__sv"))
    q.join(broadcast(stats), groupCol)
      .filter(lhs > rhs)
      .select(col("event_id"), col(groupCol), col("value_c"))
  }

  /** The [[outliers]] flag test applied against an EXTERNALLY-maintained
    * moment state ([[Olap.momentState]] shape: group, n, sv, svv) instead
    * of moments computed in-query — the model-serving split: the state is
    * learned elsewhere (a streaming drain, yesterday's persisted state, a
    * merged multi-shard state) and the flag pass is a broadcast join +
    * scan-side filter over the data being scored. Identical integer
    * arithmetic, so a state maintained over the SAME rows flags the
    * identical set as the in-query computation — which is exactly what
    * `stream_outliers` certifies end-to-end. */
  def outliersFromState(events: DataFrame, state: DataFrame,
                        groupCol: String, valueCol: String,
                        sigmas: Int = 3): DataFrame = {
    require(sigmas > 0, "sigmas must be positive")
    val q = events.select(col("event_id"), col(groupCol),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("value_c"))
    val dec = "decimal(38,0)"
    val root = col("n").cast(dec) * col("value_c") - col("sv")
    val lhs = root * root
    val rhs = lit(sigmas.toLong * sigmas) *
      (col("n").cast(dec) * col("svv") - col("sv") * col("sv"))
    q.join(broadcast(state), groupCol)
      .filter(lhs > rhs)
      .select(col("event_id"), col(groupCol), col("value_c"))
  }

  /** MAD (median-absolute-deviation) anomaly flags — the ROBUST dual of
    * [[outliers]]: mean/stddev z-scores move with the very anomalies they
    * hunt (one 1000× spike inflates σ until nothing else flags), while
    * the median and MAD have a 50% breakdown point. Flagged: rows with
    * |x − median| > k·MAD, evaluated entirely in integer arithmetic —
    * values quantized to cents, medians carried DOUBLED (`med2`, so even
    * groups stay integral), deviations doubled again (`mad4`), and the
    * test `2·ad2 > k·mad4` clears every denominator. Any engine replays
    * it bit-for-bit; MAD = 0 (over half the group identical) flags every
    * deviating row, the standard degenerate-MAD behavior.
    *
    * Cost shape: the value mass shuffles on the group key ONCE. Both
    * rank selections (the median and the deviation median) run inside
    * that single hash partitioning as window stages — rank by value, a
    * whole-partition conditional sum broadcasts `med2` to every row of
    * its group without aggregating the frame away, then rank by
    * deviation and repeat for `mad4`. The second selection needs only a
    * per-partition re-SORT (Spark's EnsureRequirements sees the
    * partitioning already satisfied — asserted in `PlanShapeSpec`);
    * exact MAD cannot avoid that second sort, since deviation ranks
    * depend on the median. The sketch path for wide groups is
    * [[TextStats.groupQuantiles]]'s rank arithmetic over an aggregated
    * distribution. */
  def madOutliers(events: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val byG = Window.partitionBy(col(groupCol))
    // "(__rn = lo or hi) middle selection; odd groups (lo = hi) count the
    // single middle twice via the ×2 — the DOUBLED median, always integral
    def mid2(rankCol: String, valCol: String) =
      sum(when(col(rankCol) === expr("(__n + 1) div 2") ||
          col(rankCol) === expr("(__n + 2) div 2"), col(valCol)))
        .over(byG) * when(col("__n") % 2 === 1, 2).otherwise(1)
    events.select(col("event_id"), col(groupCol),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("value_c"))
      .withColumn("__rn", row_number().over(byG.orderBy(col("value_c"))))
      .withColumn("__n", count(lit(1)).over(byG))
      .withColumn("med2", mid2("__rn", "value_c"))
      .withColumn("ad2", abs(col("value_c") * 2 - col("med2")))
      .withColumn("__rn2", row_number().over(byG.orderBy(col("ad2"))))
      .withColumn("mad4", mid2("__rn2", "ad2"))
      .filter(col("ad2") * 2 > lit(k.toLong) * col("mad4"))
      .select(col("event_id"), col(groupCol), col("value_c"))
  }

  /** `props` is a JSON string column; extract `$.k` as a typed value.
    * `get_json_object` is a codegen'd scalar — no shuffle, scan-parallel. */
  def jsonProps(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** Hourly tumbling-window aggregate. Uses date_trunc (stringified for
    * engine-portable output); the streaming variant uses window() +
    * watermark. One shuffle on (hour, event_type) with partial aggregation.
    *
    * The value sum goes through decimal(18,2): double summation order varies
    * with partitioning, so a double sum is not reproducible across runs or
    * engines; decimal accumulation is exact, and the final cast back to
    * double is deterministic. */
  def hourly(events: DataFrame): DataFrame =
    events.groupBy(
        date_trunc("hour", col("ts")).cast("string").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** The per-user event ordering every sequential operator here shares
    * ([[sessions]], [[transitions]]). The event_id tiebreak is
    * determinism-critical: two events with identical (user_id, ts) would
    * otherwise make lag() order — session boundaries, transition pairs —
    * nondeterministic, and the DuckDB oracles pin the same
    * (ts, event_id) order. */
  private def byUser: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  /** Gap-based sessionization: a new session starts when the per-user gap
    * exceeds `gapMinutes`. Interval comparison on full-precision timestamps
    * (no epoch truncation). Two shuffles: one window partition on user_id,
    * one groupBy — the canonical distributed formulation. */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gap = expr(s"INTERVAL $gapMinutes MINUTES")
    val flagged = events.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts") > col("prev_ts") + gap, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("s_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("s_end"))
  }

  /** Per-user inter-arrival statistics: the gap (exact integer
    * MICROSECONDS — no float truncation anywhere) between consecutive
    * events of the same user, aggregated to count/avg/min/max. The lag
    * window and the groupBy share the user_id partitioning, so the plan
    * is one shuffle + one map-side-combined aggregate; ties on ts are
    * ordered by event_id like every other window here, and since equal
    * timestamps yield the same gap multiset under any tie order, the
    * output is engine-portable by construction. Users with a single
    * event have no gap and are excluded (rather than emitting nulls).
    *
    * The mean is the cleared-denominator integer `floor(10⁴·Σgap / n)`
    * (1e-4 µs quantization), NOT a float `avg()`: DuckDB's avg(BIGINT)
    * streams through a double accumulator, and at sf0.1 the
    * association-order noise reached the rounded 4th decimal — a float
    * mean over exact integers is a portability bug waiting for enough
    * rows. Computed by the split identity
    * `10⁴·(s div n) + (10⁴·(s mod n)) div n` so the INTERMEDIATE never
    * overflows Long even with dirty epoch-zero timestamps (one
    * 54-year gap makes the naive 10⁴·Σgap ≈ 1.7e19 > 2⁶³): Σgap itself
    * is bounded by the table's time span (centuries before Long
    * saturates) and 10⁴·(s mod n) < 10⁴·n. The oracle computes the
    * same identity over DuckDB's HUGEINT sum — identical on every
    * input whose MEAN fits the declared bigint (a >29-year mean is out
    * of the result domain on both engines, loudly). */
  def interArrival(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg((count(lit(1)) + 1).as("n_events"),
        expr("10000 * (sum(gap_us) div count(1)) + " +
          "(10000 * (sum(gap_us) % count(1))) div count(1)")
          .as("avg_gap_us_e4"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))

  /** Hour-over-hour growth per event type: hourly counts with the
    * previous hour's count, absolute delta, and percent change — the
    * trend line every ops dashboard draws. The lag window runs over the
    * AGGREGATED hourly frame (|types|·|hours| rows, metadata-sized next
    * to the events), partitioned by event_type; the raw table is touched
    * once by the partial-aggregated groupBy. The first hour of each type
    * has no predecessor: delta/pct are null, not fabricated zeros. The
    * percent arithmetic is (n−prev)·100.0/prev in that fixed order — one
    * integer subtract, one exact double product, ONE division — so any
    * engine reproduces it bit-for-bit. */
  def hourlyGrowth(events: DataFrame): DataFrame =
    growthOverHourly(events
      .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n")))

  /** The lag/delta/pct step of [[hourlyGrowth]] over an ALREADY-built
    * (hour, event_type, n) frame — exposed so the streaming drain can
    * finalize with the identical arithmetic (`stream_growth` certifies
    * against the same oracle as `events_growth`). */
  def growthOverHourly(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    hourly
      .select(col("hour"), col("event_type"), col("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col("hour"), col("event_type"), col("n"),
        (col("n") - col("prev_n")).as("delta"),
        round((col("n") - col("prev_n")) * lit(100.0) / col("prev_n"), 4)
          .as("pct"))
  }

  /** New-vs-returning daily split: each active user counts as "new" on
    * their first-ever active day and "returning" after. Same scale shape
    * as [[retention]]: the distinct (user, day) activity frame is built
    * FIRST (~|users|·|days|, far smaller than the raw events), the
    * first-day window and the daily counts both run on it. */
  def newVsReturning(events: DataFrame): DataFrame = {
    val activity = events
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
          .as("day"),
        col("user_id"))
      .distinct()
    val firstDay = min(col("day")).over(Window.partitionBy(col("user_id")))
    activity
      .withColumn("first_day", firstDay)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
  }

  /** DAU / trailing-window MAU stickiness per day. Exact rolling distinct
    * without rolling-distinct state: the distinct (user, day) activity
    * frame is built once, then each active day CONTRIBUTES itself to the
    * `windowDays` following days (a bounded explode of the metadata-sized
    * frame, ×windowDays), and the trailing distinct collapses to a plain
    * count(DISTINCT) per (target day, user) — no window function ever
    * sees user-level data. Days with zero activity emit no row (there is
    * nothing to report a ratio against). Ratio = exact integer per-mille,
    * like [[graft.ext.Skew.keySkew]]. */
  def stickiness(events: DataFrame, windowDays: Int = 30): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val activity = events
      .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
      .distinct()
    val dau = activity.groupBy(col("d"))
      .agg(count(lit(1)).as("dau"))
    val contrib = activity.select(col("user_id"),
      explode(sequence(col("d"),
        col("d") + expr(s"INTERVAL ${windowDays - 1} DAYS"),
        expr("INTERVAL 1 DAY"))).as("d"))
    val mau = contrib.groupBy(col("d"))
      .agg(count_distinct(col("user_id")).as("mau"))
    dau.join(mau, Seq("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("mau"),
        expr("(dau * 1000) div mau").as("stickiness_pm"))
  }

  /** Cumulative unique users by day — the growth curve: each day's new
    * users (first-ever activity, via [[newVsReturning]]'s frame) plus
    * the running total. A running count(DISTINCT) is unbounded-state at
    * scale; counting each user ONCE, on their first day, then cumsum —
    * the first-seen trick — gives the identical curve from a bounded
    * aggregate. The global window runs over the per-DAY frame (|days|
    * rows, metadata-sized), never over users or events. */
  def cumulativeUsers(events: DataFrame): DataFrame =
    newVsReturning(events)
      .select(col("day"), col("n_new"))
      .withColumn("cum_users",
        // deliberately UNPARTITIONED window ("WindowExec: No Partition
        // Defined" at runtime is expected): input is the aggregated
        // per-day frame, |days| rows, metadata-sized at any corpus scale
        sum(col("n_new")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Per-user event-type transition counts — the first-order Markov /
    * user-journey matrix ("what do users do right after X"). One lag
    * window per user (deterministic (ts, event_id) order, like
    * [[sessions]]) + one partial-aggregated count shuffle over the
    * |types|² transition cells. */
  def transitions(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))

  /** Cohort retention matrix: users bucketed by the DAY of their first
    * event (the cohort), counted on each later active day as an offset
    * from it — the standard growth-analytics triangle.
    *
    * Shape: distinct active (user, day) pairs first — the daily-activity
    * frame is ~|users|·|days|, orders of magnitude smaller than the raw
    * events, and everything downstream (cohort min, self-join, cell
    * counts) runs on it. Two hash shuffles on the user key + one on the
    * (cohort, offset) cell; after the distinct, cell counts need no
    * count(DISTINCT) — (user, day) is already unique. The cohort day is
    * stringified for engine-portable output. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__day"))
      .distinct()
    val cohorts = days.groupBy(col("__u")).agg(min(col("__day")).as("__coh"))
    days.join(cohorts, "__u")
      .groupBy(date_format(col("__coh"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("__day"), col("__coh")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Dimension enrichment: customer → nation → region. Both dims are
    * broadcast — at 100 TB the fact side never shuffles for these joins
    * (nation is 25 rows, region 5; the broadcast hint makes it explicit
    * rather than relying on autoBroadcastJoinThreshold). */
  def enrichCustomer(customer: DataFrame, nation: DataFrame,
                     region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation),
        customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region),
        nation("n_regionkey") === region("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))

  /** TPC-H-Q5-shaped multiway star join: lineitem → orders → customer →
    * nation, revenue per nation. The first two joins are big-to-big —
    * hash shuffles on their equi-keys (the only correct shape when both
    * sides are fact-scale); nation is an explicit broadcast. Every input
    * is column-pruned to its join keys + payload BEFORE the joins so the
    * shuffles carry the minimum bytes; revenue is quantized to 1e-4 per
    * row (two IEEE ops, engine-exact) and summed as longs, so the
    * aggregate is order-independent and externally reproducible. */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, nation: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("__rev"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        (sum(floor(col("__rev") * 1e4 + 0.5).cast("long")).cast("double")
          / 1e4).as("revenue"))

  /** Revenue per market segment: fact (orders) joins the customer dim with
    * an explicit broadcast, then one partial-aggregated shuffle. */
  def revenueBySegment(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(
        broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        orders("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        // decimal accumulation: exact, order-independent (see hourly)
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
}
