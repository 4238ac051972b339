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

  /** Sketch-based profile for 100 TB audits: same shape as [[columns]]
    * but the per-column distinct count comes from the certified [[Hll]]
    * registers instead of exact `count_distinct`. Exact distinct on a
    * near-unique key (the id column every table has) shuffles every
    * distinct value — a full-column shuffle at 100 TB; the HLL form
    * shuffles at most 64 register partials per column. Cost shape: the
    * unpivoted (col_name, value) frame feeds two aggregations (plain
    * stats at col grain, registers at col×reg grain), so the table is
    * scanned twice, column-pruned — two cheap scans beat one scan plus a
    * full-key shuffle as soon as the table outgrows memory.
    *
    * Columns must be INTEGRAL (caller quantizes doubles, exactly like
    * [[columns]]'s cents contract): the register hash is a long fold,
    * and a silent cast-to-long of a string would profile NULLs.
    * Output: (col_name, n_nulls, n_regs, isum, hll_estimate, min_val,
    * max_val) — the register-state triple is the same certifiable
    * surface as [[Hll.finalize]]. */
  def columnsSketch(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    import org.apache.spark.sql.types._
    cols.foreach { c =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case other => throw new IllegalArgumentException(
          s"columnsSketch profiles integral columns only, '$c' is " +
            s"${other.simpleString} — quantize it to a long first")
      }
    }
    val unpivoted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("long").as("v"))): _*))
      .as("x")).select(col("x.col_name").as("col_name"), col("x.v").as("v"))
    val stats = unpivoted.groupBy(col("col_name"))
      .agg(count(when(col("v").isNull, lit(1))).as("n_nulls"),
        min(col("v")).cast("string").as("min_val"),
        max(col("v")).cast("string").as("max_val"))
    val hll = Hll.distinctEstimate(unpivoted, "col_name", "v")
    hll.join(stats, "col_name")
      .select(col("col_name"), col("n_nulls"), col("n_regs"), col("isum"),
        col("hll_estimate"), col("min_val"), col("max_val"))
  }

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
    // fanOut: the k-column count-distinct plans as an Expand (k rows out
    // per row in) + partial aggregate BEFORE any exchange — on a
    // single-file scan that whole k× expansion runs on one task (Par)
    val wide = Par.fanOut(df).agg(aggs.head, aggs.tail: _*)
    // row-local unpivot of the single wide row into one row per column
    val stacked = cols.map { c =>
      s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stacked) " +
        "as (col_name, n_nulls, n_distinct, min_val, max_val)"))
  }
}
