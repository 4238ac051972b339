package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single most recent
  * right row with the same key whose time is at or before the left row's
  * time. The staple of feature backfills ("the user's latest order when
  * this event happened") that Spark has no native operator for.
  *
  * Shape: tag + union + ONE window pass — the distributed merge join.
  * Both sides hash-partition once on the key, sort within partitions by
  * (time, side, tie-break), and every left row reads
  * `last(<right value>, ignoreNulls)` over the preceding frame. There is
  * no join operator in the plan at all: no candidate-pair explosion, no
  * broadcast requirement, and the per-partition state while scanning is
  * one running value per value column. At any scale the cost is a single
  * shuffle of |L| + |R| rows — the plan a 100× scale-up wants.
  *
  * Contrast with the naive formulations this replaces: an inequality
  * theta-join (`l.key = r.key AND r.t <= l.t` + window max) plans as a
  * broadcast-nested-loop and explodes quadratically per key; a correlated
  * subquery per row doesn't distribute at all.
  */
object AsOf {

  /** Working names the merge plan owns on the union frame, plus the
    * output-side pick names — a caller's left column with any of these
    * would be silently clobbered, so every entry is checked up front. */
  private val Reserved =
    Set("__k", "__t", "__side", "__ord", "__tie", "__vs",
      "__bk", "__fw", "__asof")

  /** Left-outer as-of join.
    *
    * @param valueCols right-side columns to carry onto each left row,
    *                  emitted as `asof_<name>` (null when the key has no
    *                  right row at or before the left time)
    * @param tieBreak  right-side column ordering simultaneous right rows:
    *                  the row with the LARGEST tie-break at the latest
    *                  admissible time wins, making the result
    *                  deterministic even when (key, time) repeats
    * @param toleranceMicros the pandas `merge_asof(tolerance=…)` staleness
    *                  budget: a match farther than this many microseconds
    *                  from the left time yields NULL instead — "latest
    *                  price, but only within 5 minutes". Applied as one
    *                  row-local predicate on the matched time; the plan
    *                  (one shuffle, one window) is unchanged.
    * @param allowExactMatches pandas' exclusive-boundary flag: `false`
    *                  makes the join STRICT (`r.t < l.t`; forward
    *                  `r.t > l.t`) by flipping which side sorts first at
    *                  equal instants — again zero plan change
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               valueCols: Seq[String], tieBreak: String,
               toleranceMicros: Option[Long] = None,
               allowExactMatches: Boolean = true): DataFrame =
    merge(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      tieBreak, forward = false, toleranceMicros, allowExactMatches)

  /** Forward as-of join — the mirror: for each left row, the single
    * EARLIEST right row with the same key whose time is at or after the
    * left row's time (inclusive). The "next event after" staple: next
    * order after a click, next maintenance after a fault, label lookup
    * at horizon start. Simultaneous right rows resolve to the SMALLEST
    * tie-break (the mirror of the backward join's largest-at-latest
    * rule), so the result is deterministic either direction. Identical
    * plan shape and cost: one shuffle of |L|+|R| rows, one window pass,
    * no join operator. `toleranceMicros`/`allowExactMatches` as in
    * [[asofJoin]] (here the budget bounds how far AHEAD the match may
    * be; strict means `r.t > l.t`). */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      valueCols: Seq[String], tieBreak: String,
                      toleranceMicros: Option[Long] = None,
                      allowExactMatches: Boolean = true): DataFrame =
    merge(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      tieBreak, forward = true, toleranceMicros, allowExactMatches)

  /** Nearest as-of join (pandas `merge_asof(direction='nearest')`): for
    * each left row, the right row with the same key whose time is
    * CLOSEST in either direction — equal distances prefer BACKWARD (the
    * pandas rule), within a direction the usual determinism holds
    * (backward: largest tie at the latest admissible instant; forward:
    * smallest tie at the earliest). Same single-shuffle merge shape as
    * [[asofJoin]]: ONE union sort carries TWO window frames (preceding
    * `last` = backward candidate, following `first` = forward
    * candidate) over the identical ordering, then a row-local pick by
    * |Δt| — Spark plans both frames in one Window over one exchange,
    * so the cost is the backward join's cost plus one projection. An
    * equal-time right row is only visible to the backward frame, which
    * is exactly where a zero-distance match must land anyway. */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      valueCols: Seq[String], tieBreak: String,
                      toleranceMicros: Option[Long] = None,
                      allowExactMatches: Boolean = true): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    require(!valueCols.contains("__mt"),
      "'__mt' is the merge plan's matched-time slot inside the candidate " +
        "struct — rename the value column")
    toleranceMicros.foreach(t => require(t >= 0,
      s"toleranceMicros must be >= 0, got $t"))
    val leftCols = left.columns.toSeq
    val clashes = leftCols.filter(Reserved) ++
      leftCols.filter(c => valueCols.exists(v => s"asof_$v" == c))
    require(clashes.isEmpty,
      s"asofJoin reserved/output name collision on left side: " +
        s"${clashes.mkString(", ")}")
    // the matched row's own time rides INSIDE the candidate struct —
    // the pick needs it for |Δt|
    val vsType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__mt",
        org.apache.spark.sql.types.TimestampType) +:
        valueCols.map(c => org.apache.spark.sql.types.StructField(c,
          right.schema(c).dataType)))
    val lTagged = left.select(
      (Seq(col(leftKey).as("__k"),
        col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__side"),
        lit(null).cast(right.schema(tieBreak).dataType).as("__tie"),
        lit(null).cast(vsType).as("__vs")) ++
        leftCols.map(col)): _*)
    val rTagged = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        (Seq(col(rightKey).as("__k"),
          col(rightTime).cast("timestamp").as("__t"),
          lit(0).as("__side"),
          col(tieBreak).as("__tie"),
          struct((col(rightTime).cast("timestamp").as("__mt") +:
            valueCols.map(col)): _*).as("__vs")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // one ordering serves both directions: rights at a left row's exact
    // instant sort before it (inclusive backward), among equal-time
    // rights `last` over the preceding frame picks the largest tie and
    // `first` over the following frame the smallest — the two
    // directions' documented tie rules from one sort. Exclusive
    // (allowExactMatches = false) needs the BACKWARD frame to also skip
    // equal-time rights, which the shared sort position cannot express
    // (sorted-after is invisible to the preceding frame but VISIBLE to
    // the following one), so strict mode gives the backward frame its
    // own ordering with lefts first at equal instants — Spark plans the
    // second Window as one extra sort over the same single exchange.
    val orderFwd = Seq(col("__t").asc_nulls_first, col("__side").asc,
      col("__tie").asc)
    val orderBack =
      if (allowExactMatches) orderFwd
      else Seq(col("__t").asc_nulls_first, col("__side").desc,
        col("__tie").asc)
    val wBack = Window.partitionBy(col("__k")).orderBy(orderBack: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col("__k")).orderBy(orderFwd: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // pandas applies the tolerance PER DIRECTION before the nearest
    // pick: an out-of-budget backward candidate must lose to an
    // in-budget forward one even when it is closer, so each candidate
    // nulls independently first
    def withinTol(cand: org.apache.spark.sql.Column,
                  dist: org.apache.spark.sql.Column) =
      toleranceMicros match {
        case None => cand
        case Some(tol) =>
          when(cand.isNotNull && dist <= tol, cand)
            .otherwise(lit(null).cast(vsType))
      }
    lTagged.unionByName(rTagged)
      .select((leftCols.map(col) :+ col("__side") :+ col("__t") :+
        last(col("__vs"), ignoreNulls = true).over(wBack).as("__bk") :+
        first(col("__vs"), ignoreNulls = true).over(wFwd).as("__fw")): _*)
      .filter(col("__side") === 1)
      .withColumn("__bk", withinTol(col("__bk"),
        unix_micros(col("__t")) - unix_micros(col("__bk.__mt"))))
      .withColumn("__fw", withinTol(col("__fw"),
        unix_micros(col("__fw.__mt")) - unix_micros(col("__t"))))
      .withColumn("__asof",
        // a NULL-time left row matches nothing (it sorts before every
        // right row, so the FOLLOWING frame would otherwise see all)
        when(col("__t").isNull, lit(null).cast(vsType))
          .when(col("__bk").isNull, col("__fw"))
          .when(col("__fw").isNull, col("__bk"))
          .otherwise(when(
            unix_micros(col("__fw.__mt")) - unix_micros(col("__t")) <
              unix_micros(col("__t")) - unix_micros(col("__bk.__mt")),
            col("__fw")).otherwise(col("__bk"))))
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  private def merge(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    leftTime: String, rightTime: String,
                    valueCols: Seq[String], tieBreak: String,
                    forward: Boolean,
                    toleranceMicros: Option[Long] = None,
                    allowExactMatches: Boolean = true): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    require(!valueCols.contains("__mt"),
      "'__mt' is the merge plan's matched-time slot inside the candidate " +
        "struct — rename the value column")
    toleranceMicros.foreach(t => require(t >= 0,
      s"toleranceMicros must be >= 0, got $t"))
    val leftCols = left.columns.toSeq
    // the merge plan owns these working names and re-emits every left
    // column by name on the right side; a caller whose frame already uses
    // one would get ambiguous resolution, so fail loudly up front
    val clashes = leftCols.filter(Reserved) ++
      leftCols.filter(c => valueCols.exists(v => s"asof_$v" == c))
    require(clashes.isEmpty,
      s"asofJoin reserved/output name collision on left side: " +
        s"${clashes.mkString(", ")} (reserved: ${Reserved.mkString(", ")}; " +
        s"outputs: ${valueCols.map(v => s"asof_$v").mkString(", ")})")
    // the value columns ride in ONE struct so last(_, ignoreNulls) picks an
    // entire right row atomically: selecting each value column with its own
    // last() would tear columns across different right rows whenever the
    // latest admissible row holds a NULL in one of them (struct-of-row is
    // never null for a right row, even if every member is). The matched
    // row's own time rides in the struct's `__mt` slot — the tolerance
    // predicate needs it, and it costs 8 bytes per right row.
    val vsType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__mt",
        org.apache.spark.sql.types.TimestampType) +:
        valueCols.map(c => org.apache.spark.sql.types.StructField(c,
          right.schema(c).dataType)))
    // `__ord` is the equal-instant sort slot: right rows sort BEFORE
    // left rows (0 < 1) to make the boundary inclusive, AFTER them
    // (2 > 1) when allowExactMatches = false — pandas' strict
    // inequality from one literal, zero plan change
    val rightOrd = if (allowExactMatches) 0 else 2
    val lTagged = left.select(
      (Seq(col(leftKey).as("__k"),
        // one time type for the union: the testdata mixes TIMESTAMP_NTZ
        // (orders) with micros-truncated TIMESTAMP (events); session
        // timezone is UTC so the cast is instant-preserving
        col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__side"),
        lit(1).as("__ord"),
        lit(null).cast(right.schema(tieBreak).dataType).as("__tie"),
        lit(null).cast(vsType).as("__vs")) ++
        leftCols.map(col)): _*)
    val rTagged = right
      // SQL comparison semantics: a right row with a NULL key or NULL time
      // satisfies neither `r.key = l.key` nor `r.t <= l.t` — it must never
      // match. (A NULL-key/time LEFT row still flows through: it sorts
      // before any real right row in its partition and yields NULL values.)
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        (Seq(col(rightKey).as("__k"),
          col(rightTime).cast("timestamp").as("__t"),
          lit(0).as("__side"),
          lit(rightOrd).as("__ord"),
          col(tieBreak).as("__tie"),
          struct((col(rightTime).cast("timestamp").as("__mt") +:
            valueCols.map(col)): _*).as("__vs")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // right rows sort BEFORE left rows at equal time => the join is
    // inclusive (backward: right.t <= left.t; forward: right.t >= left.t);
    // among right rows at one instant the winner (backward: largest tie;
    // forward: smallest tie) sorts LAST so last() picks it up. The
    // forward direction is the same scan over time reversed: descending
    // time, descending tie.
    val w =
      if (forward)
        // desc_nulls_first on BOTH reversed keys: a NULL-time LEFT row
        // must still match nothing (plain desc sorts NULLs last, where
        // it would see every right row), and a NULL tie-break must LOSE
        // to any real tie exactly as it does backward (asc = nulls
        // first) — plain desc would sort the null tie last and last()
        // would pick it over the documented smallest real tie-break
        Window.partitionBy(col("__k"))
          .orderBy(col("__t").desc_nulls_first, col("__ord").asc,
            col("__tie").desc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy(col("__k"))
          .orderBy(col("__t").asc, col("__ord").asc, col("__tie").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = lTagged.unionByName(rTagged)
      .select((leftCols.map(col) :+ col("__side") :+ col("__t")) :+
        last(col("__vs"), ignoreNulls = true).over(w).as("__asof"): _*)
      .filter(col("__side") === 1)
    // staleness budget: the signed distance to the matched time is
    // non-negative by construction (backward: t − mt; forward: mt − t),
    // so one row-local comparison nulls out over-budget matches
    val bounded = toleranceMicros match {
      case None => picked
      case Some(tol) =>
        val dist =
          if (forward)
            unix_micros(col("__asof.__mt")) - unix_micros(col("__t"))
          else unix_micros(col("__t")) - unix_micros(col("__asof.__mt"))
        picked.withColumn("__asof",
          when(col("__asof").isNotNull && dist <= tol, col("__asof"))
            .otherwise(lit(null).cast(vsType)))
    }
    bounded.select(leftCols.map(col) ++
      valueCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
