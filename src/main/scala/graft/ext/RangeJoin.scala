package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match point rows to interval rows with the same
  * key where `start <= t < end`. Spark has no native interval-join
  * operator; the naive theta-join (`p.key = i.key AND p.t >= i.start AND
  * p.t < i.end`) keeps the equality conjunct, so Spark CAN plan a hash
  * join on the key — but then every point meets every interval of that
  * key before the time filter runs, which is quadratic per key (a user
  * with 10k events × 10k windows = 10^8 candidate rows).
  *
  * The scale shape is time bucketing: quantize time into fixed-width
  * buckets, emit each interval once per bucket it covers, and equi-join on
  * (key, bucket). Candidates per point collapse from |intervals-per-key|
  * to |intervals overlapping its bucket|; the exact `start <= t < end`
  * predicate then filters within the joined bucket. A point lives in
  * exactly ONE bucket, so a matching pair meets exactly once — no
  * post-join dedup. Replication cost is ceil(len/width)+1 rows per
  * interval: pick the bucket width near the typical interval length.
  */
object RangeJoin {

  /** Inner point-in-interval join: all `points` columns plus all
    * `intervals` columns for each match. Column sets must be disjoint
    * (alias before calling — this is a binary operator, not a projection).
    *
    * @param bucketSeconds time-bucket width; correctness never depends on
    *                      it, only the replication/selectivity trade-off
    * @param maxBucketsPerInterval loud per-row guard on interval
    *                      replication: one corrupt or sentinel far-future
    *                      end timestamp would otherwise build a
    *                      multi-gigabyte bucket array in a single row and
    *                      OOM an executor — fail naming the span instead
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointKey: String, intervalKey: String,
                      pointTs: String, startTs: String, endTs: String,
                      bucketSeconds: Long = 600L,
                      maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    require(maxBucketsPerInterval > 0, "replication cap must be positive")
    val reserved = Set("__pb", "__ib")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) ++
      (points.columns.toSet ++ intervals.columns.toSet).intersect(reserved)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint and must not use the " +
        s"operator's working names (${reserved.mkString(", ")}); " +
        s"offending: ${overlap.mkString(", ")} — alias first")
    val width = bucketSeconds * 1000000L // micros
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / width).cast("long")
    val p = points.withColumn("__pb", bucketOf(col(pointTs)))
    // one row per bucket the interval touches; empty/negative intervals
    // produce an empty sequence and simply never match
    val span = bucketOf(col(endTs)) - bucketOf(col(startTs)) + 1L
    val i = intervals.withColumn("__ib",
      explode(when(col(endTs) <= col(startTs), array().cast("array<long>"))
        .when(span > maxBucketsPerInterval,
          raise_error(concat(lit("pointInInterval: interval spans "),
            span.cast("string"),
            lit(s" buckets (> $maxBucketsPerInterval) — widen " +
              "bucketSeconds, cap interval lengths, or raise " +
              "maxBucketsPerInterval"))).cast("array<long>"))
        .otherwise(sequence(bucketOf(col(startTs)), bucketOf(col(endTs))))))
    p.join(i,
        p(pointKey) === i(intervalKey) && col("__pb") === col("__ib") &&
          p(pointTs) >= i(startTs) && p(pointTs) < i(endTs))
      .drop("__pb", "__ib")
  }

  /** Interval×interval overlap join — the other half of the range-join
    * family: pairs with the same key whose half-open spans intersect
    * (`l.start < r.end AND r.start < l.end`). Same bucketing scale shape
    * as [[pointInInterval]], with one twist: BOTH sides replicate, so a
    * pair can share several buckets — the join keeps a pair only in the
    * pair's FIRST shared bucket (`max` of the two start buckets), which
    * makes every overlapping pair meet exactly once WITHOUT a post-join
    * distinct (a distinct would shuffle the full match set again).
    *
    * Same loud replication cap per side, same correctness-independent
    * width choice: pick `bucketSeconds` near the typical span length. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      bucketSeconds: Long = 600L,
                      maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    require(maxBucketsPerInterval > 0, "replication cap must be positive")
    val reserved = Set("__lb", "__rb")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) ++
      (left.columns.toSet ++ right.columns.toSet).intersect(reserved)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint and must not use the " +
        s"operator's working names (${reserved.mkString(", ")}); " +
        s"offending: ${overlap.mkString(", ")} — alias first")
    val width = bucketSeconds * 1000000L // micros
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / width).cast("long")
    def replicate(df: DataFrame, startC: String, endC: String,
                  out: String) = {
      val span = bucketOf(col(endC)) - bucketOf(col(startC)) + 1L
      df.withColumn(out,
        explode(when(col(endC) <= col(startC), array().cast("array<long>"))
          .when(span > maxBucketsPerInterval,
            raise_error(concat(lit("intervalOverlap: interval spans "),
              span.cast("string"),
              lit(s" buckets (> $maxBucketsPerInterval) — widen " +
                "bucketSeconds, cap interval lengths, or raise " +
                "maxBucketsPerInterval"))).cast("array<long>"))
          .otherwise(sequence(bucketOf(col(startC)), bucketOf(col(endC))))))
    }
    val l = replicate(left, leftStart, leftEnd, "__lb")
    val r = replicate(right, rightStart, rightEnd, "__rb")
    l.join(r,
        l(leftKey) === r(rightKey) && col("__lb") === col("__rb") &&
          l(leftStart) < r(rightEnd) && r(rightStart) < l(leftEnd) &&
          col("__lb") === greatest(bucketOf(l(leftStart)),
            bucketOf(r(rightStart))))
      .drop("__lb", "__rb")
  }
}
