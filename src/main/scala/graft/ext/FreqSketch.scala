package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min frequency sketch with ENGINE-PORTABLE internals — the
  * heavy-hitter companion to the certified-HLL distinct sketch
  * ([[Hll]]): bounded-size approximate term frequencies for corpus audit
  * dashboards, boilerplate detection, and vocabulary drift tracking.
  *
  * Every step is arithmetic any SQL engine replays bit-for-bit:
  *
  *  - d=3 hash rows: Rabin–Karp code-point folds acc·aⱼ + cp, each
  *    modulo its own prime < 2³¹ (the same construction [[Dedup]]'s
  *    SimHash oracle replays with `list_reduce`); every intermediate
  *    stays below 2⁶² so no engine-specific overflow is exercised;
  *  - cell = fold mod width; the sketch is the (row, cell) → count table,
  *    at most d·w rows regardless of input size;
  *  - estimate(term) = minⱼ cell(j, hⱼ(term)) — the count-min bound:
  *    never under the true count, over only on all-rows collision.
  *
  * Cost shape: the corpus aggregates to DISTINCT-term counts first (one
  * map-side-partial shuffle — the only pass over raw data), the sketch is
  * then a ≤ d·w-row re-aggregation of those counts: insertion is additive,
  * so pre-aggregated weighted insert is numerically identical to
  * per-occurrence streaming insert. Probing broadcasts: probe terms join
  * the d·w-row sketch, never the corpus.
  *
  * Empty tokens ('' from repeated separators) are dropped on both engines
  * — an empty code-point fold has no SQL dual (`list_reduce([])` errors).
  */
object FreqSketch {

  /** (multiplier, prime modulus) per sketch row — primes just below 2³¹,
    * multipliers coprime and small so acc·a + cp < 2⁶² always holds. */
  val Rows: Seq[(Long, Long)] = Seq(
    (31L, 2147483647L),   // 2^31 - 1 (M31)
    (131L, 2147483629L),  // largest prime < M31
    (1031L, 2147483587L)) // next prime down
  val Width: Int = 512

  /** Rabin–Karp fold of `s`'s code points: fold(acc·a + cp) mod p. */
  private def polyFold(s: Column, a: Long, p: Long): Column =
    aggregate(filter(split(s, ""), c => length(c) > 0), lit(0L),
      (acc, c) => pmod(acc * a + ascii(c), lit(p)))

  /** Exact per-term occurrence counts — the single raw-data pass. */
  def termCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** The sketch STATE: (row, cell, cnt) — ≤ d·w rows, mergeable by sum. */
  def sketch(counts: DataFrame): DataFrame = {
    val cells = Rows.zipWithIndex.map { case ((a, p), j) =>
      struct(lit(j).as("row"),
        pmod(polyFold(col("term"), a, p), lit(Width.toLong)).as("cell"))
    }
    counts
      .select(explode(array(cells: _*)).as("rc"), col("cnt"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Estimate the heaviest `k` terms: exact top-k (deterministic term
    * tie-break) probed against the sketch — (term, exact_cnt, est_cnt),
    * est ≥ exact by the count-min guarantee. The exact counts frame is
    * computed once and tracked-persisted (top-k AND sketch read it). */
  def estimateTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = TrackedCache.persistTracked(termCounts(df, textCol))
    val top = counts.orderBy(col("cnt").desc, col("term").asc).limit(k)
      .withColumnRenamed("cnt", "exact_cnt")
    val probes = Rows.zipWithIndex.map { case ((a, p), j) =>
      struct(lit(j).as("row"),
        pmod(polyFold(col("term"), a, p), lit(Width.toLong)).as("cell"))
    }
    top
      .select(col("term"), col("exact_cnt"),
        explode(array(probes: _*)).as("rc"))
      .join(sketch(counts), col("rc.row") === col("row") &&
        col("rc.cell") === col("cell"))
      .groupBy(col("term"), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
  }
}
