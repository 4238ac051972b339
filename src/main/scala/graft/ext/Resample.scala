package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling onto a fixed grid with gap fill — the missing
  * piece between raw event streams and anything that assumes regular
  * intervals (anomaly baselines, growth rates, seasonal decomposition):
  * an hour with no events must become an explicit zero/carried row, not
  * a silent hole that shifts every lag() downstream.
  */
object Resample {

  /** Hourly grid per key over each key's own [min, max] span:
    *  - `n_events` — 0 on generated gap rows (the count really is zero);
    *  - `sum_c`    — cent-quantized value sum, NULL on gaps (the sum is
    *                 unobserved, not zero — zero-filling a gauge lies);
    *  - `ffill_c`  — last observed `sum_c` carried forward (the standard
    *                 gauge imputation), NULL until the key's first
    *                 observation.
    *
    * Plan: one (key, hour) aggregate; a per-key span aggregate whose
    * `sequence`+`explode` materializes the grid (bounded by the LOUD
    * `maxGridHours` total measured first — a key spanning years at
    * minute grain is a config error, not something to discover as an
    * executor OOM); one left join back on (key, hour); one per-key
    * ordered window for the carry. Grid generation is distributed — each
    * key's rows explode on its own executor, nothing driver-side. */
  def hourlyGapFill(events: DataFrame, keyCol: String = "event_type",
                    tsCol: String = "ts", valCol: String = "value",
                    maxGridHours: Long = 10000000L): DataFrame = {
    // persisted (TrackedCache lifecycle): the span aggregate, the loud
    // guard action, and the final grid join all read agg
    val agg = TrackedCache.persistTracked(
      events.groupBy(col(keyCol).as("__key"),
          date_trunc("hour", col(tsCol)).as("__h"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col(valCol) * 100 + 0.5).cast("long")).as("sum_c")))
    val span = agg.groupBy(col("__key"))
      .agg(min(col("__h")).as("mn"), max(col("__h")).as("mx"))
      .withColumn("hours",
        (unix_timestamp(col("mx")) - unix_timestamp(col("mn"))) / 3600 + 1)
    val total = span.agg(coalesce(sum(col("hours")), lit(0L)).cast("long"))
      .head().getLong(0)
    require(total <= maxGridHours,
      s"hourlyGapFill: grid would hold $total rows (cap $maxGridHours) — " +
        "span × keys is out of budget; coarsen the grain or cap the span")
    val grid = span.select(col("__key"),
      explode(sequence(col("mn"), col("mx"), expr("interval 1 hour")))
        .as("__h"))
    val w = Window.partitionBy(col("__key")).orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("__key", "__h"), "left")
      .select(col("__key").as(keyCol),
        date_format(col("__h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("sum_c"),
        last(col("sum_c"), ignoreNulls = true).over(w).as("ffill_c"))
  }
}
