package graft

import graft.ext.Hll
import org.apache.spark.sql.functions._

/** Portable-HLL sketch: accuracy envelope, state bounds, determinism. */
class HllSpec extends SparkSpec {

  test("estimate tracks exact distinct within the m=64 error envelope") {
    import spark.implicits._
    // 500 distinct keys, each duplicated 3x — duplicates must not move
    // the estimate (register max-merge)
    val rows = (1L to 500L).flatMap(k => Seq.fill(3)(("g", k)))
    val df = rows.toDF("grp", "key")
    val r = Hll.distinctEstimate(df, "grp", "key").head()
    val est = r.getDouble(3)
    // raw HLL standard error is ~13% at m=64; 3 sigma ≈ 40%
    assert(est > 500 * 0.6 && est < 500 * 1.4, s"estimate $est vs 500")
    assert(r.getLong(1) <= Hll.Registers)
  }

  test("duplicates never change the sketch state") {
    import spark.implicits._
    val once = (1L to 100L).map(("g", _)).toDF("grp", "key")
    val thrice = (1L to 100L).flatMap(k => Seq.fill(3)(("g", k)))
      .toDF("grp", "key")
    val a = Hll.distinctEstimate(once, "grp", "key").head()
    val b = Hll.distinctEstimate(thrice, "grp", "key").head()
    assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2) &&
      a.getDouble(3) == b.getDouble(3))
  }

  test("insertion order and partitioning do not change the state") {
    import spark.implicits._
    val keys = (1L to 200L)
    val fwd = keys.map(("g", _)).toDF("grp", "key").repartition(7)
    val rev = keys.reverse.map(("g", _)).toDF("grp", "key").repartition(2)
    val a = Hll.distinctEstimate(fwd, "grp", "key").head()
    val b = Hll.distinctEstimate(rev, "grp", "key").head()
    assert(a.getLong(2) == b.getLong(2) && a.getDouble(3) == b.getDouble(3))
  }

  test("null keys count nothing; empty groups emit no row") {
    import spark.implicits._
    val df = Seq(("g", Some(1L)), ("g", None), ("h", None))
      .toDF("grp", "key")
    val out = Hll.distinctEstimate(df, "grp", "key").collect()
    assert(out.length == 1 && out.head.getString(0) == "g" &&
      out.head.getLong(1) == 1L)
  }

  test("non-numeric keys are rejected loudly, not silently NULL-hashed") {
    import spark.implicits._
    val df = Seq(("g", "doc-1")).toDF("grp", "key")
    val e = intercept[IllegalArgumentException](
      Hll.distinctEstimate(df, "grp", "key"))
    assert(e.getMessage.contains("must be numeric"))
  }

  test("merge of split sketches equals the direct sketch of the union") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (s"g${i % 3}", i % 137))
      .toDF("grp", "key")
    val a = Hll.registers(df.filter($"key" % 2 === 0), "grp", "key")
    val b = Hll.registers(df.filter($"key" % 2 === 1), "grp", "key")
    val merged = Hll.merge(a, b)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Hll.registers(df, "grp", "key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == direct) // bit-identical state, not just close estimates
  }

  test("merge is idempotent: A merged with itself is A") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("g", i)).toDF("grp", "key")
    val a = Hll.registers(df, "grp", "key")
    val twice = Hll.merge(a, a)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val once = a.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(twice == once)
  }
}
