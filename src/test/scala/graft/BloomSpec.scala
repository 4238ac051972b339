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
}
