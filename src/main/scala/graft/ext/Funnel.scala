package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — how many users performed step 1, then step 2
  * at or after their step-1 time, then step 3 at or after that, ... The
  * canonical product-analytics query over an event stream.
  *
  * Shape: one aggregation per step, chained. Stage k's frame is
  * (user, tₖ = earliest step-k event at/after tₖ₋₁); each round is a
  * filtered scan of the events (predicate pushed to the source), an
  * equi-join on the user key against the (strictly shrinking) reached
  * set, and a map-side-combined min aggregation. No window over the whole
  * per-user history, no collect — the number of shuffles is the number of
  * funnel steps (fixed, small), each on the user key, and AQE broadcasts
  * the reached set as soon as it is small enough. The final per-stage
  * counts union k single-row aggregates — one job end to end.
  */
object Funnel {

  /** The per-step reached frames: element k is (__u, __t) — users whose
    * ordered steps 1..k+1 all happened, with the earliest admissible
    * step-(k+1) time. Shared by [[stages]] (counts) and [[latency]]
    * (first-to-last conversion time). */
  private def chain(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // reached(k): users whose earliest admissible step-k event is t
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t"))
    steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("__u2"), col(tsCol).as("__ts"))
        .join(prev, col("__u2") === col("__u"))
        .filter(col("__ts") >= col("__t"))
        .groupBy(col("__u2").as("__u"))
        .agg(min(col("__ts")).as("__t"))
    }
  }

  /** @return one row per funnel step: (stage 1-based, step name, n_users),
    *         n_users non-increasing in stage */
  def stages(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame =
    chain(events, userCol, typeCol, tsCol, steps).zip(steps).zipWithIndex
      .map { case ((r, step), i) =>
        r.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("stage"), lit(step).as("step"),
            col("n_users"))
      }.reduce(_.unionByName(_))

  /** Per-user conversion latency for FULL completions: the exact integer
    * microseconds from the first step's earliest event to the earliest
    * admissible completion of the last step. Same chained shape as
    * [[stages]] — the completer set is the smallest frame in the chain,
    * so the closing join is broadcast-sized; no per-user event history is
    * ever windowed or collected. */
  def latency(events: DataFrame, userCol: String, typeCol: String,
              tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "latency needs at least two funnel steps")
    val frames = chain(events, userCol, typeCol, tsCol, steps)
    val us = (c: Column) => unix_micros(c.cast("timestamp"))
    val first = frames.head.select(col("__u"), col("__t").as("__t0"))
    frames.last.join(first, "__u")
      .select(col("__u").as(userCol),
        date_format(col("__t0"), "yyyy-MM-dd HH:mm:ss").as("started"),
        (us(col("__t")) - us(col("__t0"))).as("latency_us"))
  }
}
