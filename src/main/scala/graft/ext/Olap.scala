package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-level OLAP aggregation — ROLLUP, CUBE, pivot, distinct-count.
  * The reference's analytics surface stops at single-level history
  * aggregates (/root/reference/main.py:263-276); these are the standard
  * report shapes a warehouse user expects on top of the same engine, each
  * expressed as ONE declarative aggregate so Catalyst plans an Expand +
  * single hash-partitioned aggregation with map-side partials — the
  * multi-level report costs one shuffle, not one scan per level.
  */
object Olap {

  /** Exact, order-independent sum of a money-like double column: quantize
    * each value with floor(x·scale + 0.5) — two IEEE double ops, bit-exact
    * in every engine — and sum the resulting longs. A double sum would vary
    * with partitioning; a double→decimal CAST disagrees across engines on
    * boundary values (see SparkEntry's emb_centroids note). The quotient
    * sum/scale is exact as long as the integer sum stays below 2^53. */
  def quantizedSum(c: Column, scale: Double = 1e4): Column =
    sum(floor(c * scale + 0.5).cast("long"))

  /** ROLLUP over `dims` (hierarchical subtotals: (a,b), (a), ()) with row
    * count and an exact total of `valCol`. `gid` is Spark's grouping_id()
    * bit vector — 1-bit = dimension aggregated away — which DuckDB's
    * GROUPING(...) reproduces verbatim. One Expand + one shuffle. */
  def rollupStats(df: DataFrame, dims: Seq[String], valCol: String,
                  scale: Double = 1e4): DataFrame =
    df.rollup(dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (quantizedSum(col(valCol), scale).cast("double") / scale)
          .as("total"),
        grouping_id().cast("long").as("gid"))

  /** CUBE over `dims` (every subset of the dimensions). Same shape and
    * exactness contract as [[rollupStats]]; 2^|dims| grouping sets expand
    * map-side, still one shuffle. */
  def cubeStats(df: DataFrame, dims: Seq[String], valCol: String,
                scale: Double = 1e4): DataFrame =
    df.cube(dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (quantizedSum(col(valCol), scale).cast("double") / scale)
          .as("total"),
        grouping_id().cast("long").as("gid"))

  /** Explicit GROUPING SETS — the general form [[rollupStats]]/[[cubeStats]]
    * are shorthands of: exactly the requested subtotal combinations, no
    * more (rollup can't express "(b) but not ()"; cube computes every
    * subset whether wanted or not — at 2^|dims| Expand rows per input row,
    * unrequested sets are pure waste at scale). Same exactness contract:
    * quantized money total, grouping_id bit vector, one Expand + one
    * partial-aggregated shuffle. */
  def groupingSetsStats(df: DataFrame, sets: Seq[Seq[String]],
                        dims: Seq[String], valCol: String,
                        scale: Double = 1e4): DataFrame =
    df.groupingSets(sets.map(_.map(col)), dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (quantizedSum(col(valCol), scale).cast("double") / scale)
          .as("total"),
        grouping_id().cast("long").as("gid"))

  /** Pivot `pivotCol` into one count column per EXPLICIT value. Passing the
    * value list matters at scale: without it Spark first runs a distinct
    * scan over the pivot column to discover values (an extra job over the
    * whole table) and the output schema becomes data-dependent. Empty
    * cells are 0, not null, matching the conditional-aggregation dual any
    * SQL engine writes. */
  def pivotCounts(df: DataFrame, rowCol: String, pivotCol: String,
                  values: Seq[String]): DataFrame = {
    require(values.nonEmpty && !values.exists(_.contains("`")),
      "pivot values must be non-empty and backtick-free")
    require(values.map(_.toLowerCase).distinct.size == values.size,
      s"pivot values must be distinct case-insensitively (output columns " +
        s"are n_<lowercase value>): ${values.mkString(", ")}")
    df.groupBy(col(rowCol))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
      .select(col(rowCol) +: values.map(v =>
        coalesce(col(s"`$v`"), lit(0L)).as(s"n_${v.toLowerCase}")): _*)
  }

  /** Running (cumulative) total of `valCol` per `partCol`, ordered by
    * (`orderCol`, `tieCol`) — the balance-over-time / cumulative-revenue
    * report. One hash shuffle on the partition key + an in-partition sort;
    * the running frame is ROWS UNBOUNDED PRECEDING..CURRENT, which Spark
    * evaluates in a single streaming pass over each partition (no
    * per-row re-scan). The tie column must make the order total or the
    * intermediate cumulative values are nondeterministic. Accumulation is
    * decimal (exact, order-independent), surfaced as double. */
  def runningTotal(df: DataFrame, partCol: String, orderCol: String,
                   tieCol: String, valCol: String): DataFrame = {
    require(!df.columns.contains("running_total"),
      "input already has a 'running_total' column — alias it first " +
        "(withColumn would silently overwrite it)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_total",
      sum(col(valCol).cast("decimal(18,2)")).over(w).cast("double"))
  }

  /** Top-n rows per group by `rankCol` descending, ties broken by
    * `tieCol` — the "top customers per segment" report. One partitioned
    * ranking window; the filter on row_number keeps state at n rows per
    * group, never materializing a global sort. */
  def topNPerGroup(df: DataFrame, groupCol: String, rankCol: String,
                   tieCol: String, n: Int): DataFrame = {
    require(!df.columns.contains("rnk"),
      "input already has a 'rnk' column — alias it first " +
        "(withColumn would silently overwrite it)")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rnk",
        row_number().over(Window.partitionBy(col(groupCol))
          .orderBy(col(rankCol).desc, col(tieCol).asc)).cast("long"))
      .filter(col("rnk") <= n)
  }

  /** Distinct-count per group: the cardinality report (distinct users per
    * event type, distinct documents per source, ...). Spark plans
    * count(DISTINCT x) as a two-stage aggregate — partial distinct on
    * (group, x) before the shuffle, so the wire carries one row per
    * distinct pair, never one per input row. The approximate-at-scale
    * dual is [[Hll.distinctEstimate]] — a portable HyperLogLog whose
    * sketch an external oracle replays exactly (built-in
    * approx_count_distinct could never be certified). */
  def distinctCounts(df: DataFrame, groupCol: String,
                     targetCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count_distinct(col(targetCol)).as("n_distinct"),
        count(lit(1)).as("n_rows"))

  /** Per-group mode: the most frequent value, ties broken by the value
    * itself — deterministic where `mode()` built-ins are engine-defined
    * on ties. Partial-aggregated (group, value) counts, then a
    * WindowGroupLimit-pruned rank: the wire carries one row per distinct
    * (group, value), never one per input row. */
  def modeStats(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col(valCol))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col(valCol).as("mode"), col("cnt"))
  }

  /** Per-group WEIGHTED median — the volume-weighted dual of the plain
    * median (median price weighted by quantity traded): the smallest
    * cent-quantized value whose cumulative weight reaches half the
    * group's total (`2·cum ≥ W`, the lower weighted median — exact
    * integer arithmetic, no interpolation, engine-portable where
    * interpolating built-ins aren't).
    *
    * Determinism: weights are pre-aggregated per (group, value) BEFORE
    * the running sum, so equal values can never straddle the crossing in
    * an order-dependent way; the wire carries one row per distinct
    * (group, value). One groupBy + one window + one final min — all
    * partitioned by group, no global sort. */
  def weightedMedian(df: DataFrame, groupCol: String, valCol: String,
                     wCol: String): DataFrame = {
    // No fan-out before the quantize pass: it is light relative to the
    // (group, value) aggregate's shuffle, and the extra exchange measured
    // slower (r21 driver bench: 2.02 → 3.32 s, retry-confirmed).
    val q = df.select(col(groupCol),
        floor(col(valCol) * 100 + 0.5).cast("long").as("__v"),
        col(wCol).cast("long").as("__w"))
      .where(col("__w") > 0)
      .groupBy(col(groupCol), col("__v"))
      .agg(sum(col("__w")).as("__wv"))
    val cum = sum(col("__wv")).over(Window.partitionBy(col(groupCol))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val tot = sum(col("__wv")).over(Window.partitionBy(col(groupCol)))
    q.select(col(groupCol), col("__v"), cum.as("__cum"), tot.as("__tot"))
      .where(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col("__v")).as("wmedian_c"))
  }

  /** Bounded ordered string aggregation: the k lexicographically-first
    * distinct values per group, joined into one string — "show me example
    * members" without the unbounded `collect_set` footgun. The ranking
    * window prunes to k rows per group PER MAP PARTITION
    * (WindowGroupLimit) before the shuffle, so group size never reaches
    * the wire; the final array holds ≤ k elements by construction. */
  def topKStringAgg(df: DataFrame, groupCol: String, valCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
    df.select(col(groupCol), col(valCol)).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col(groupCol))
      .agg(concat_ws(",", array_sort(collect_list(col(valCol))))
        .as("top_vals"))
  }

  /** Exact per-group mean and population variance of a money column,
    * certified: values quantize to integer cents, the three moment sums
    * (n, Σv, Σv²) accumulate in decimal(38,0) — 128-bit exact, the same
    * trick as [[graft.ext.Events.outliers]] — and the only floating-point
    * steps are ONE cast and ONE division each for mean = Σv/n and
    * var = (n·Σv² − (Σv)²)/n², in that fixed literal order. A built-in
    * `var_pop` could never be certified: engines disagree on the
    * accumulation scheme (Welford vs naive) in the last ulps.
    *
    * Cost: one partial-aggregated shuffle of three numbers per group —
    * the moments formulation never needs the mean first, so it is
    * single-pass at any scale. */
  def momentStats(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame =
    finalizeMoments(momentState(df, groupCol, valueCol), groupCol)

  /** The mergeable per-group moment state (n, Σv, Σv²) behind
    * [[momentStats]] — exposed because the three sums are ASSOCIATIVE:
    * states computed over disjoint slices (yesterday's corpus + today's
    * delta, one state per shard/day/source) merge by plain addition into
    * exactly the full-recompute state. That makes aggregate maintenance
    * incremental: persist the state, add each new batch's state, finalize
    * on read — the base data is scanned once ever, the same contract as
    * [[Hll.merge]] for distincts and the fingerprint index for dedup. */
  def momentState(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    val vc = floor(col(valueCol) * 100 + 0.5).cast("decimal(38,0)")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(vc).as("sv"), sum(vc * vc).as("svv"))
  }

  /** Merge moment states from disjoint slices: group-wise sums. */
  def mergeMomentStates(states: Seq[DataFrame], groupCol: String): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    states.reduce(_.unionByName(_))
      .groupBy(col(groupCol))
      .agg(sum(col("n")).cast("long").as("n"), sum(col("sv")).as("sv"),
        sum(col("svv")).as("svv"))
  }

  /** One cast + one division per statistic, as documented on
    * [[momentStats]]. */
  def finalizeMoments(state: DataFrame, groupCol: String): DataFrame = {
    val big = (c: Column) => c.cast("decimal(38,0)")
    state.select(col(groupCol), col("n"),
      round(col("sv").cast("double") / col("n"), 4).as("mean_c"),
      round((big(col("n")) * col("svv") - col("sv") * col("sv"))
          .cast("double") /
        (big(col("n")) * big(col("n"))).cast("double"), 4).as("var_c"))
  }

  /** Exact per-group Pearson correlation of two money columns — the
    * co-moment extension of [[momentStats]]: both sides quantize to
    * integer cents, the five sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate
    * in decimal(38,0), and the only floating-point steps are two
    * correctly-rounded sqrts and ONE division in a fixed literal order.
    * Built-in `corr` accumulates doubles co-moment-style (partitioning-
    * order-dependent, engine-divergent in the last ulps) and could never
    * be certified. Zero-variance groups emit null, not NaN. */
  def corrStats(df: DataFrame, groupCol: String, xCol: String,
                yCol: String): DataFrame = {
    val xc = floor(col(xCol) * 100 + 0.5).cast("decimal(38,0)")
    val yc = floor(col(yCol) * 100 + 0.5).cast("decimal(38,0)")
    val big = (c: Column) => c.cast("decimal(38,0)")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(xc).as("sx"), sum(yc).as("sy"),
        sum(xc * yc).as("sxy"), sum(xc * xc).as("sxx"),
        sum(yc * yc).as("syy"))
      .select(col(groupCol), col("n"), {
        val n = big(col("n"))
        val varx = (n * col("sxx") - col("sx") * col("sx")).cast("double")
        val vary = (n * col("syy") - col("sy") * col("sy")).cast("double")
        val cov = (n * col("sxy") - col("sx") * col("sy")).cast("double")
        when(varx === 0d || vary === 0d, lit(null).cast("double"))
          .otherwise(round(cov / (sqrt(varx) * sqrt(vary)), 4)).as("corr")
      })
  }

  /** Per-group argmax/argmin via `max_by`/`min_by` — "the id of each
    * group's first/latest row" in ONE partial-aggregating pass: each map
    * task keeps a single running (key, id) pair per group, so the shuffle
    * carries one row per group per task instead of the window-function
    * formulation's full-table sort exchange.
    *
    * `max_by` on ties is engine-defined, so the ordering key is made
    * TOTAL before the aggregate: epoch-micros and the id are zero-padded
    * into one lexicographic string (micros < 10^15 and ids < 10^12 —
    * loudly out-of-range values would widen the pad, not corrupt the
    * order, because both fields are non-negative). The same key
    * expression replays verbatim in any SQL engine, which is what makes
    * the per-group winners certifiable at all. */
  def argExtremes(df: DataFrame, groupCol: String, idCol: String,
                  tsCol: String): DataFrame = {
    // NTZ columns cast through the (UTC) session zone so the epoch the
    // key embeds is the wall-clock micros any SQL replay computes
    val ordKey = concat(
      lpad(unix_micros(col(tsCol).cast("timestamp")).cast("string"), 16, "0"),
      lpad(col(idCol).cast("string"), 12, "0"))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        min_by(col(idCol), ordKey).as("first_id"),
        max_by(col(idCol), ordKey).as("last_id"),
        date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
  }
}
