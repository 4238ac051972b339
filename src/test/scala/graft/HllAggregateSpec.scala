package graft

import graft.ext.Hll
import graft.functions.HllFunctions.hll_sketch
import org.apache.spark.sql.functions._

/** The native TypedImperativeAggregate sketch must be bit-identical to
  * the certified column formulation on every input shape. */
class HllAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g")).agg(hll_sketch(col("k")).as("s"))
      .select(col("g"), col("s.n_regs"), col("s.isum"), col("s.hll_estimate"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  private def viaColumns(df: org.apache.spark.sql.DataFrame) =
    Hll.distinctEstimate(df, "g", "k")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  test("bit-identical to the register-rows formulation, nulls skipped") {
    val rnd = new scala.util.Random(41L)
    val rows = (1 to 5000).map { _ =>
      (s"g${rnd.nextInt(4)}",
        if (rnd.nextInt(20) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong() % 100000L)) // negatives too
    }
    val df = rows.toDF("g", "k").repartition(7)
    assert(viaAgg(df) == viaColumns(df))
  }

  test("empty groups never appear; single-row group estimates agree") {
    val df = Seq(("a", 1L), ("b", 42L)).toDF("g", "k")
    assert(viaAgg(df) == viaColumns(df))
  }

  test("non-numeric keys are rejected at analysis, like Hll.registers") {
    val df = Seq(("a", "oops")).toDF("g", "k")
    val e = intercept[Exception] {
      df.groupBy(col("g")).agg(hll_sketch(col("k"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("numeric") ||
      e.getMessage.contains("hll_sketch"))
  }
}
