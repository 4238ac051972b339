package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the audit pass run before any corpus is
  * admitted to a training mix: per-column null counts, exact distinct
  * cardinalities, and min/max ranges, emitted as one tidy row per column.
  *
  * Plan shape: ONE aggregation over the table computes every per-column
  * statistic (Spark plans the multiple count-distincts as a single Expand
  * + two-phase aggregate — each input row expands to one row per distinct
  * column, partially aggregated map-side before the shuffle), then a
  * row-local `stack` unpivots the 1×(4·k) result into k rows. The table is
  * scanned exactly once regardless of how many columns are profiled, and
  * the shuffle carries only partial aggregates — never raw rows.
  *
  * Exact distinct counts are the deliberate choice here (they're what a
  * data audit needs, and they oracle-certify); at 100 TB swap in the
  * certified [[Hll]] sketch per column and keep the same output shape.
  *
  * min/max are emitted as strings so heterogeneous column types share one
  * schema; doubles must be quantized by the CALLER to integer columns
  * first (string renderings of raw doubles are engine-specific).
  */
object Profile {

  /** Profile `cols` of `df`: (col_name, n_nulls, n_distinct, min_val,
    * max_val), one row per profiled column, ordered as given. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // row-local unpivot of the single wide row into one row per column
    val stacked = cols.map { c =>
      s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stacked) " +
        "as (col_name, n_nulls, n_distinct, min_val, max_val)"))
  }
}
