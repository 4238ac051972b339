package graft.ext

import org.apache.spark.sql.DataFrame
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

  /** @return one row per funnel step: (stage 1-based, step name, n_users),
    *         n_users non-increasing in stage */
  def stages(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // reached(k): users whose earliest admissible step-k event is t
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("__u2"), col(tsCol).as("__ts"))
        .join(prev, col("__u2") === col("__u"))
        .filter(col("__ts") >= col("__t"))
        .groupBy(col("__u2").as("__u"))
        .agg(min(col("__ts")).as("__t"))
    }
    reached.zip(steps).zipWithIndex.map { case ((r, step), i) =>
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("stage"), lit(step).as("step"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }
}
