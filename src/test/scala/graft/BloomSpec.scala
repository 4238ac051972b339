package graft

import graft.ext.Bloom
import org.apache.spark.sql.functions._

/** Bloom runtime-filter correctness: no false negatives ever, the pruned
  * join is row-identical to the plain join, and the prune actually removes
  * the bulk of a selective fact scan. */
class BloomSpec extends SparkSpec {

  test("every built key passes the probe (no false negatives)") {
    import spark.implicits._
    // adversarial shapes: sequential runs, negatives, zero, wide spread
    val keys = ((-50L to 50L) ++ (1L to 200L).map(_ * 1000003L) ++
      Seq(Long.MinValue / 2, Long.MaxValue / 2)).toDF("k")
    val arr = Bloom.buildWords(keys, "k", words = 64, k = 5)
    val missed = keys.filter(!Bloom.mightContain(col("k"), arr, 5)).count()
    assert(missed == 0L)
  }

  test("bloomPrunedJoin == plain join, and the prune is selective") {
    import spark.implicits._
    val fact = (1L to 5000L).map(i => (i, i % 997, i * 2.0))
      .toDF("rowid", "fk", "v")
    val dim = Seq(3L, 17L, 500L, 996L).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("rowid", "name").collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq
    val pruned = Bloom.bloomPrunedJoin(fact, dim, "fk", "dk", words = 64)
      .select("rowid", "name").collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq
    assert(pruned == plain)
    // selectivity: the probe keeps the ~4/997 matching sliver plus a small
    // FP tail, nowhere near the full scan
    val arr = Bloom.buildWords(dim, "dk", words = 64, k = 5)
    val kept = fact.filter(Bloom.mightContain(col("fk"), arr, 5)).count()
    assert(kept < 500L, s"bloom kept $kept of 5000 — not selective")
    assert(kept >= plain.map(_._1).distinct.size.toLong)
  }

  test("null keys: build sets no bits, probe filters them out") {
    import spark.implicits._
    val dim = Seq(Some(1L), None, Some(2L)).toDF("dk")
    val arr = Bloom.buildWords(dim, "dk", words = 16, k = 3)
    val fact = Seq(Some(1L), None, Some(99L)).toDF("fk")
    val kept = fact.filter(Bloom.mightContain(col("fk"), arr, 3))
      .collect().flatMap(r => Option(if (r.isNullAt(0)) null else r.getLong(0)))
    assert(kept.contains(1L) && !kept.contains(null))
  }

  test("degenerate sizes are rejected loudly") {
    import spark.implicits._
    val dim = Seq(1L).toDF("dk")
    intercept[IllegalArgumentException](Bloom.buildWords(dim, "dk", words = 0))
    intercept[IllegalArgumentException](Bloom.mightContain(col("x"), Array.empty[Long]))
  }

  test("string keys: pruned join == plain join (no silent empty result)") {
    import spark.implicits._
    val fact = (1 to 2000).map(i => (i.toLong, s"doc-${i % 499}"))
      .toDF("rowid", "fk")
    val dim = Seq("doc-3", "doc-17", "doc-250", "doc-498")
      .map(d => (d, s"meta-$d")).toDF("dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("rowid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(plain.nonEmpty) // the bug this guards against returned empty
    val pruned = Bloom.bloomPrunedJoin(fact, dim, "fk", "dk", words = 64)
      .select("rowid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(pruned == plain)
    // and the prune is still selective on the 499 distinct string keys
    val arr = Bloom.buildWords(dim, "dk", words = 64)
    val kept = fact.filter(
      Bloom.mightContain(col("fk"), arr, 5, isString = true)).count()
    assert(kept < 500L, s"bloom kept $kept of 2000 — not selective")
  }

  test("unsupported and mismatched key types are rejected loudly") {
    import spark.implicits._
    val arrDim = Seq(Tuple1(Seq(1L))).toDF("dk") // array key: no sane fold
    intercept[IllegalArgumentException](Bloom.buildWords(arrDim, "dk"))
    val sFact = Seq(Tuple1("a")).toDF("fk")
    val nDim = Seq(Tuple1(1L)).toDF("dk")
    intercept[IllegalArgumentException](
      Bloom.bloomPrunedJoin(sFact, nDim, "fk", "dk"))
  }

  test("probe runs inside whole-stage codegen") {
    import spark.implicits._
    val dim = Seq(1L, 2L).toDF("dk")
    val arr = Bloom.buildWords(dim, "dk", words = 16)
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // deterministic filter over LocalRelation at optimization time
    val probed = spark.range(100).toDF("fk")
      .filter(Bloom.mightContain(col("fk"), arr))
    val stages = probed.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.nonEmpty, "bloom probe fell out of whole-stage codegen:\n" +
      probed.queryExecution.executedPlan)
    val inCodegen = stages.exists(_.collectLeaves().nonEmpty) &&
      stages.exists(w => w.toString.contains("bloomprobe") ||
        w.child.toString.toLowerCase.contains("bloomprobe"))
    assert(inCodegen, s"probe not inside a codegen stage:\n${stages.head}")
  }
}
