package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.TimestampType

/** As-of join as a WHOLE custom operator: logical node → planner strategy
  * → physical broadcast-binary-search exec, the Catalyst extension path
  * for operators whose semantics the relational algebra can't express as
  * one node (SparkSessionExtensions / `spark.experimental.extraStrategies`).
  *
  * This is the BROADCAST-DIM physical plan for the same point-in-time
  * semantics as [[graft.ext.AsOf.asofJoin]] (latest right row per key at
  * or before each left time, inclusive, ties to the largest tie-break):
  * the right side collects once, groups per key into a time-sorted array,
  * and ships to every executor; each left partition then streams through
  * a per-row O(log n) binary search with ZERO shuffle of the left side.
  *
  * When to pick which (the BroadcastHashJoin / SortMergeJoin duality):
  *  - right side is a dimension (quotes, prices, slowly-changing configs,
  *    ≤ [[AsOfPhys.DefaultMaxBuildRows]] rows): THIS exec — the 100 TB
  *    left side never moves, cost is a map-side probe;
  *  - right side is itself fact-sized: the merge-window compose in
  *    [[graft.ext.AsOf]] — one |L|+|R| shuffle, no broadcast requirement.
  * The build-side cap fails loudly with that routing advice rather than
  * silently OOMing the driver.
  *
  * Reference tie-in: the reference engine has no as-of operator at all
  * (its data model is point lookups, /root/reference/No_Sql.py:379-445);
  * this is part of the certified extension surface (SURVEY.md §2.10), and
  * exists in mature engines as e.g. DuckDB's ASOF JOIN and Pandas
  * merge_asof — semantics cross-checked against the DuckDB formulation in
  * the `join_asof_phys` oracle.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTie: Attribute,
    rightValues: Seq[Attribute],
    outAttrs: Seq[AttributeReference],
    maxBuildRows: Long,
    toleranceMicros: Option[Long] = None,
    allowExactMatches: Boolean = true) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  /** The asof_* columns are born here, not read from a child. */
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one-to-one logical → physical mapping. Injected via
  * `spark.experimental.extraStrategies` (the public per-session hook) by
  * [[AsOfPhys.ensureRegistered]]; equally registrable at session build
  * time through `SparkSessionExtensions.injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right), j.leftKey,
        j.leftTime, j.rightKey, j.rightTime, j.rightTie, j.rightValues,
        j.outAttrs, j.maxBuildRows, j.toleranceMicros,
        j.allowExactMatches) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: broadcast the grouped+sorted right side, binary
  * search per left row.
  *
  * Contracts (identical to the merge-window compose, property-tested in
  * `AsOfPhysSpec`):
  *  - both time columns are TimestampType (micros) — the builder casts;
  *  - inclusive: a right row AT the left time is admissible;
  *  - among right rows at the latest admissible time the LARGEST tie-break
  *    wins (the build sort is (time asc, tie asc); the probe takes the
  *    last entry ≤ t);
  *  - right rows with NULL key or NULL time match nothing (builder filters,
  *    exec re-checks); left rows with NULL key/time survive with NULL
  *    asof_* values (left-outer).
  *
  * Scale shape: the left side keeps its partitioning (`outputPartitioning
  * = left.outputPartitioning` — downstream ops see no exchange), the probe
  * is whole-partition streaming over an UnsafeProjection, and driver
  * memory is bounded by the loud build cap. AQE coexists: the strategy
  * plans inside whatever stage the adaptive planner hands it.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTie: Attribute,
    rightValues: Seq[Attribute],
    outAttrs: Seq[AttributeReference],
    maxBuildRows: Long,
    toleranceMicros: Option[Long] = None,
    allowExactMatches: Boolean = true) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  private def idx(attrs: Seq[Attribute], a: Attribute, side: String): Int = {
    val i = attrs.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"AsOfJoinExec: $a not found in $side output $attrs")
    i
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val rOut = right.output
    val kI = idx(rOut, rightKey, "right")
    val tI = idx(rOut, rightTime, "right")
    val tieI = idx(rOut, rightTie, "right")
    val vIs = rightValues.map(idx(rOut, _, "right"))
    val vTypes = rightValues.map(_.dataType)
    require(rightTime.dataType == TimestampType && leftTime.dataType == TimestampType,
      "AsOfJoinExec: both time columns must be TimestampType (builder casts)")
    val tieOrd = TypeUtils.getInterpretedOrdering(rightTie.dataType)
    val tieType = rightTie.dataType
    val keyType = rightKey.dataType

    val buildRows = right.executeCollect()
    require(buildRows.length <= maxBuildRows,
      s"AsOfJoinExec build side has ${buildRows.length} rows (cap " +
        s"$maxBuildRows): this exec broadcasts the right " +
        "side; for a fact-sized right side use graft.ext.AsOf.asofJoin " +
        "(merge-window, one |L|+|R| shuffle, no broadcast)")

    // group → sort (time asc, tie asc) → parallel arrays per key
    val grouped = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[(Long, Any, InternalRow)]]()
    buildRows.foreach { r =>
      if (!r.isNullAt(kI) && !r.isNullAt(tI)) {
        val k = r.get(kI, keyType)
        val vals = new GenericInternalRow(vIs.zip(vTypes).map {
          case (i, dt) => if (r.isNullAt(i)) null else r.get(i, dt)
        }.toArray[Any])
        val buf = grouped.computeIfAbsent(k,
          _ => scala.collection.mutable.ArrayBuffer.empty[(Long, Any, InternalRow)])
        buf += ((r.getLong(tI), if (r.isNullAt(tieI)) null else r.get(tieI, tieType), vals))
      }
    }
    val index = new java.util.HashMap[Any, (Array[Long], Array[InternalRow])](grouped.size())
    grouped.forEach { (k, buf) =>
      // NULL tie sorts FIRST (loses ties) — SQL "ORDER BY tie ASC NULLS FIRST"
      val sorted = buf.sortWith { case ((t1, x1, _), (t2, x2, _)) =>
        if (t1 != t2) t1 < t2
        else if (x1 == null) x2 != null
        else if (x2 == null) false
        else tieOrd.compare(x1, x2) < 0
      }
      index.put(k, (sorted.map(_._1).toArray, sorted.map(_._3).toArray))
    }
    val bcast = sparkContext.broadcast(index)

    val lOut = left.output
    val lkI = idx(lOut, leftKey, "left")
    val ltI = idx(lOut, leftTime, "left")
    val lKeyType = leftKey.dataType
    val numVals = outAttrs.length
    val outputAttrs = output
    val inclusive = allowExactMatches
    val tol = toleranceMicros.getOrElse(Long.MaxValue)
    left.execute().mapPartitions { iter =>
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val nullVals = new GenericInternalRow(numVals)
      val m = bcast.value
      iter.map { lrow =>
        var matched: InternalRow = nullVals
        if (!lrow.isNullAt(lkI) && !lrow.isNullAt(ltI)) {
          val grp = m.get(lrow.get(lkI, lKeyType))
          if (grp != null) {
            val (times, vals) = grp
            val t = lrow.getLong(ltI)
            // upper bound: first index with times(i) > t (inclusive) /
            // times(i) >= t (strict — allowExactMatches = false)
            var lo = 0
            var hi = times.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              val admissible =
                if (inclusive) times(mid) <= t else times(mid) < t
              if (admissible) lo = mid + 1 else hi = mid
            }
            // tolerance: the latest admissible entry must also be within
            // the staleness budget (t - match time, non-negative here)
            if (lo > 0 && t - times(lo - 1) <= tol) matched = vals(lo - 1)
          }
        }
        proj(joined(lrow, matched))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Injected optimizer rule: push left-side filters THROUGH the custom
  * [[AsOfJoin]] node down to the probe child, where Catalyst's stock
  * rules carry them on into the scan (`PushedFilters`).
  *
  * Catalyst cannot see through an unknown node — without this rule a
  * `WHERE` on a probe column sits ABOVE the join and every left row is
  * joined first, filtered after. The push is semantics-preserving
  * because the operator is left-outer and 1:1: each left row yields
  * exactly one output row whose left columns pass through verbatim, so
  * any predicate over left columns commutes with the join. Predicates
  * touching the produced `asof_*` columns stay above. This is the
  * custom-operator half of the optimizer-extension surface
  * (`experimental.extraOptimizations` /
  * `SparkSessionExtensions.injectOptimizerRule`).
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Builder + registration for the physical as-of join. */
object AsOfPhys {

  /** Loud driver-memory bound on the broadcast build side. 5M rows of
    * (8 B time + a few value fields) is low-hundreds of MB — the same
    * order as Spark's own broadcast threshold guidance. */
  val DefaultMaxBuildRows: Int = 5000000

  /** Idempotently add the strategy + optimizer rule to the session's
    * planner (public `experimental.extraStrategies` /
    * `extraOptimizations` hooks). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(AsOfJoinStrategy))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!cs.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
  }

  /** The documented duality made executable: route to the broadcast
    * exec when the right side's row count (one action) fits the cap,
    * else to the merge-window compose — the operator-level analogue of
    * Spark's own BroadcastHashJoin / SortMergeJoin selection, with the
    * threshold explicit instead of a stats estimate. */
  def asofJoinAuto(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   valueCols: Seq[String], tieBreak: String,
                   maxBuildRows: Long = DefaultMaxBuildRows.toLong,
                   toleranceMicros: Option[Long] = None,
                   allowExactMatches: Boolean = true): DataFrame =
    if (right.count() <= maxBuildRows)
      asofJoinBroadcast(left, right, leftKey, rightKey, leftTime, rightTime,
        valueCols, tieBreak, maxBuildRows, toleranceMicros,
        allowExactMatches)
    else
      graft.ext.AsOf.asofJoin(left, right, leftKey, rightKey, leftTime,
        rightTime, valueCols, tieBreak, toleranceMicros, allowExactMatches)

  /** Left-outer as-of join through [[AsOfJoinExec]] — same signature and
    * semantics as [[graft.ext.AsOf.asofJoin]] (outputs `asof_<col>`,
    * inclusive, largest-tie-wins), different physical plan: broadcast +
    * binary search instead of union + window. */
  def asofJoinBroadcast(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTime: String, rightTime: String,
                        valueCols: Seq[String], tieBreak: String,
                        maxBuildRows: Long = DefaultMaxBuildRows.toLong,
                        toleranceMicros: Option[Long] = None,
                        allowExactMatches: Boolean = true): DataFrame = {
    require(valueCols.nonEmpty, "asofJoinBroadcast needs at least one value column")
    toleranceMicros.foreach(t => require(t >= 0,
      s"toleranceMicros must be >= 0, got $t"))
    val spark = left.sparkSession
    ensureRegistered(spark)
    val leftCols = left.columns.toSeq
    val reserved = Set("__asof_t", "__k", "__t", "__tie")
    val clashes = leftCols.filter(reserved) ++
      leftCols.filter(c => valueCols.exists(v => s"asof_$v" == c))
    require(clashes.isEmpty,
      s"asofJoinBroadcast reserved/output name collision: ${clashes.mkString(", ")}")

    // one working column carries the normalized probe time; dropped after
    val lPrep = left.select(
      leftCols.map(col) :+ col(leftTime).cast("timestamp").as("__asof_t"): _*)
    val rPrep = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(Seq(col(rightKey).as("__k"),
        col(rightTime).cast("timestamp").as("__t"),
        col(tieBreak).as("__tie")) ++ valueCols.map(col): _*)

    val lPlan = analyzed(lPrep)
    val rPlan = analyzed(rPrep)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output}"))
    require(attr(lPlan, leftKey).dataType == attr(rPlan, "__k").dataType,
      s"asofJoinBroadcast: key types differ (${attr(lPlan, leftKey).dataType} " +
        s"vs ${attr(rPlan, "__k").dataType}) — cast one side first")
    val valueAttrs = valueCols.map(attr(rPlan, _))
    val outAttrs = valueAttrs.map(v =>
      AttributeReference(s"asof_${v.name}", v.dataType, nullable = true)())
    val node = AsOfJoin(lPlan, rPlan,
      attr(lPlan, leftKey), attr(lPlan, "__asof_t"),
      attr(rPlan, "__k"), attr(rPlan, "__t"), attr(rPlan, "__tie"),
      valueAttrs, outAttrs, maxBuildRows, toleranceMicros,
      allowExactMatches)
    GraftBridge.ofRows(spark, node).drop("__asof_t")
  }

  private def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
